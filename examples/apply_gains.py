#!/usr/bin/env python
"""Apply gains to visibilities and undo them (corrupt → correct).

TPU-native analogue of the reference's
``calibration/utils/examples/apply_gains_to_ms.py`` /
``apply_gains_time_varying_sources.py``: time-varying DIAG_DIAG gains
corrupt a model predicted from moving sources
(compute_and_corrupt_vis), then correct_vis recovers the model. The MS
and gain tables are synthetic.

Usage: python examples/apply_gains.py
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

    from africanus_tpu.calibration.utils import (
        chunkify_rows,
        compute_and_corrupt_vis_ri,
        correct_vis_ri,
    )
    from africanus_tpu.ops.cplx import Cplx, to_numpy

    rng = np.random.default_rng(0)
    f32 = np.float32
    ntime, nant, nchan, ndir = 8, 7, 32, 1
    a1u, a2u = np.triu_indices(nant, 1)
    nbl = a1u.size
    antenna1 = np.tile(a1u, ntime)
    antenna2 = np.tile(a2u, ntime)
    time = np.repeat(np.arange(ntime, dtype=np.float64), nbl)
    _, tbi, tbc = chunkify_rows(time, 1)
    nrow = antenna1.size

    # time-varying source positions + per-time gains (DIAG_DIAG)
    uvw = rng.uniform(-1000, 1000, (nrow, 3)).astype(f32)
    freq = np.linspace(0.856e9, 1.712e9, nchan).astype(f32)
    lm = (rng.uniform(-1, 1, (ntime, ndir, 2)) * 1e-3).astype(f32)
    model = Cplx(
        jnp.asarray(
            rng.uniform(0.5, 2.0, (ntime, nchan, ndir, 2)).astype(f32)
        ),
        jnp.asarray(np.zeros((ntime, nchan, ndir, 2), f32)),
    )
    phases = rng.uniform(-0.5, 0.5, (ntime, nant, nchan, ndir, 2)).astype(f32)
    jones = Cplx(jnp.asarray(np.cos(phases)), jnp.asarray(np.sin(phases)))

    corrupt = jax.jit(
        lambda j, m: compute_and_corrupt_vis_ri(
            tbi, tbc, antenna1, antenna2, j, m, uvw, freq, lm
        )
    )
    vis = corrupt(jones, model)
    print(f"device: {jax.devices()[0]}")
    print(f"corrupted vis: {to_numpy(vis).shape}")

    # correcting with the true gains must undo the per-antenna phases
    correct = jax.jit(
        lambda j, v: correct_vis_ri(tbi, tbc, antenna1, antenna2, j, v,
                                    np.zeros((nrow, nchan, 2), bool))
    )
    fixed = to_numpy(correct(jones, vis))

    # the corrected data equal the (phased) model sum over directions
    k = np.asarray(to_numpy(corrupt(
        Cplx(jnp.ones_like(jones.re), jnp.zeros_like(jones.im)), model
    )))
    err = np.abs(fixed - k).max() / np.abs(k).max()
    print(f"max rel err corrected vs uncorrupted: {err:.2e}")
    assert err < 1e-5


if __name__ == "__main__":
    main()
