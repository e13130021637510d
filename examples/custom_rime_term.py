#!/usr/bin/env python
"""Define a custom fused-RIME Term and run it.

TPU-native analogue of the reference's
``experimental/rime/fused/examples/custom_brightness_term.py``: a
``ModelFlux`` term substitutes the standard Brightness term with a
user-supplied per-(source, chan, corr) flux array, via the Term protocol
(ARGS pulled from the dataset, ``sample(state) -> TermValue``). The MS is
replaced by a synthetic observation.

Usage: python examples/custom_rime_term.py
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.ops.cplx import Cplx, to_numpy
    from africanus_tpu.rime.fused import RimeSpecification, rime
    from africanus_tpu.rime.fused.terms import Term, TermValue

    class ModelFlux(Term):
        """Custom flux provider: (source, chan, corr) model_flux array
        replaces the Brightness term's stokes->corr machinery."""

        ARGS = ("model_flux",)

        def sample(self, state) -> TermValue:
            flux = jnp.asarray(state["model_flux"])  # (src, chan, corr)
            ncorr = flux.shape[2]
            comps = tuple(
                Cplx(flux[:, None, :, c], jnp.zeros_like(flux[:, None, :, c]))
                for c in range(ncorr)
            )
            kind = {1: "scalar", 2: "diag", 4: "full"}[ncorr]
            return TermValue(kind, comps)

    rng = np.random.default_rng(0)
    nsrc, ntime, nant, nchan = 6, 3, 7, 16
    a1u, a2u = np.triu_indices(nant, 1)
    nrow = a1u.size * ntime
    ds = dict(
        time=np.repeat(5.03e9 + np.arange(ntime) * 8.0, a1u.size),
        antenna1=np.tile(a1u, ntime),
        antenna2=np.tile(a2u, ntime),
        feed1=np.zeros(nrow, np.int32),
        feed2=np.zeros(nrow, np.int32),
        radec=rng.uniform(-0.01, 0.01, (nsrc, 2)) + np.array([0.8, -0.7]),
        phase_dir=np.array([0.8, -0.7]),
        uvw=rng.uniform(-1000, 1000, (nrow, 3)),
        chan_freq=np.linspace(0.856e9, 1.712e9, nchan),
        model_flux=rng.uniform(0.1, 1.0, (nsrc, nchan, 4)),
    )

    spec = RimeSpecification(
        "(Kpq, Cpq): [I,Q,U,V] -> [XX,XY,YX,YY]", terms={"C": ModelFlux}
    )
    vis = to_numpy(rime(spec, ds))
    print(f"device: {jax.devices()[0]}")
    print(f"custom-term vis: {vis.shape}, |vis| max {np.abs(vis).max():.4f}")

    # cross-check against the explicit K x flux composition: use the
    # pair-native phase_delay_ri (the complex-dtype wrapper builds a
    # device complex array, which the TPU backend cannot represent)
    from africanus_tpu.coordinates import radec_to_lm
    from africanus_tpu.rime import phase_delay_ri

    lm = np.asarray(radec_to_lm(ds["radec"], ds["phase_dir"]))
    k_ri = phase_delay_ri(lm, ds["uvw"], ds["chan_freq"])
    k = np.asarray(k_ri.re) + 1j * np.asarray(k_ri.im)
    expected = (k[..., None] * ds["model_flux"][:, None]).sum(axis=0)
    err = np.abs(vis - expected).max() / np.abs(expected).max()
    print(f"max rel err vs explicit composition: {err:.2e}")
    assert err < 1e-6


if __name__ == "__main__":
    main()
