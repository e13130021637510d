#!/usr/bin/env python
"""Predict visibilities from shapelet sources.

TPU-native analogue of the reference's
``africanus/rime/examples/predict_shapelet.py`` CLI: shapelet component
sky model → K phase · shapelet envelope · brightness → Jones-chain
predict. Measurement-Set IO is replaced by a synthetic array layout (no
daskms/casacore in this environment).

Usage: python examples/predict_shapelet.py
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.coordinates import radec_to_lm
    from africanus_tpu.model.coherency import convert_ri
    from africanus_tpu.model.shape.shapelets import _shapelet_core
    from africanus_tpu.model.spectral import spectral_model
    from africanus_tpu.ops.cplx import Cplx, to_numpy
    from africanus_tpu.rime.phase import phase_delay_ri
    from africanus_tpu.rime.predict import predict_vis_ri

    rng = np.random.default_rng(0)
    f32 = np.float32

    # shapelet components: per-source beta scales + coefficient grids
    nsrc, nmax = 3, 4
    radec = np.deg2rad(
        np.array([[60.02, -50.5], [60.00, -50.52], [59.98, -50.49]])
    )
    phase_dir = radec.mean(axis=0)
    beta = rng.uniform(1e-3, 3e-3, (nsrc, 2))
    coeffs = rng.normal(size=(nsrc, nmax, nmax)) * 0.2
    coeffs[:, 0, 0] = 1.0  # dominant gaussian-like mode
    stokes = np.stack(
        [rng.uniform(0.5, 2.0, nsrc), rng.uniform(-0.1, 0.1, nsrc),
         rng.uniform(-0.1, 0.1, nsrc), np.zeros(nsrc)], axis=1
    )
    spi = rng.uniform(-0.8, -0.5, (nsrc, 1, 4))

    # synthetic KAT-7-like observation
    nant, ntime, nchan = 7, 8, 32
    a1u, a2u = np.triu_indices(nant, 1)
    nbl = a1u.size
    antenna1 = np.tile(a1u, ntime)
    antenna2 = np.tile(a2u, ntime)
    time_index = np.repeat(np.arange(ntime), nbl)
    nrow = time_index.size
    uvw = rng.uniform(-1000, 1000, (nrow, 3))
    freq = np.linspace(0.856e9, 1.712e9, nchan)
    ref_freq = np.full(nsrc, 1.2e9)

    lm = np.asarray(radec_to_lm(radec, phase_dir))
    delta_lm = np.array([1e-6, 1e-6])

    def predict(uvw, lm, freq):
        # K term: (src, row, chan) phase
        k = phase_delay_ri(lm, uvw, freq)
        # shapelet envelope: (row, chan, src) -> (src, row, chan)
        env = _shapelet_core(uvw, freq, jnp.asarray(coeffs, jnp.float32),
                             jnp.asarray(beta, jnp.float32),
                             jnp.asarray(delta_lm, jnp.float32))
        env = Cplx(env.re.transpose(2, 0, 1), env.im.transpose(2, 0, 1))
        # brightness: stokes spectrum -> XX,XY,YX,YY
        spec = spectral_model(jnp.asarray(stokes, jnp.float32),
                              jnp.asarray(spi, jnp.float32),
                              jnp.asarray(ref_freq, jnp.float32), freq)
        b = convert_ri(Cplx(spec, jnp.zeros_like(spec)),
                       ["I", "Q", "U", "V"], ["XX", "XY", "YX", "YY"])
        coh = Cplx(
            (k.re * env.re - k.im * env.im)[..., None] * b.re[:, None]
            - (k.re * env.im + k.im * env.re)[..., None] * b.im[:, None],
            (k.re * env.im + k.im * env.re)[..., None] * b.re[:, None]
            + (k.re * env.re - k.im * env.im)[..., None] * b.im[:, None],
        )
        return predict_vis_ri(time_index, antenna1, antenna2,
                              source_coh=coh)

    fn = jax.jit(predict)
    t0 = time.perf_counter()
    out = fn(jnp.asarray(uvw, f32), jnp.asarray(lm, f32),
             jnp.asarray(freq, f32))
    vis = to_numpy(out)
    dt = time.perf_counter() - t0

    print(f"device: {jax.devices()[0]}")
    print(f"predicted vis: {vis.shape} in {dt:.2f}s (incl. compile)")
    print(f"|vis| range: [{np.abs(vis).min():.4f}, {np.abs(vis).max():.4f}]")


if __name__ == "__main__":
    main()
