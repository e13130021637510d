#!/usr/bin/env python
"""End-to-end selfcal loop (BASELINE config 5): simulate gain-corrupted
data → phase-only Gauss-Newton solve → correct → image → Hogbom CLEAN.

TPU-native analogue of the reference's calibration + deconv example
workflows (africanus/calibration/utils/examples).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import os

    import jax

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.calibration import (
        chunkify_rows,
        corrupt_vis_ri,
        correct_vis_ri,
        gauss_newton_ri,
    )
    from africanus_tpu.deconv.hogbom import hogbom_clean
    from africanus_tpu.gridding.wgridder.core import grid_adjoint
    from africanus_tpu.ops.cplx import Cplx, to_numpy

    rng = np.random.default_rng(7)
    f32 = np.float32
    from africanus_tpu.constants import c as C  # noqa: E402

    # observation: 16 antennas, 8 times
    nant, ntime, nchan = 16, 8, 16
    a1u, a2u = np.triu_indices(nant, 1)
    ant1 = np.tile(a1u, ntime).astype(np.int32)
    ant2 = np.tile(a2u, ntime).astype(np.int32)
    time_col = np.repeat(np.arange(ntime, dtype=np.float64), a1u.size)
    _, tbi, tbc = chunkify_rows(time_col, 1)
    nrow = ant1.size

    # sky: two point sources -> model visibilities via the DFT
    npix = 64
    cell = 2.0 * np.pi / 180 / npix
    freq = np.linspace(1.0e9, 1.2e9, nchan)
    uvw = ((rng.uniform(size=(nrow, 3)) - 0.5) / (cell * freq[-1] / C)).astype(f32)

    from africanus_tpu.dft import im_to_vis_ri

    lm = np.array([[0.0, 0.0], [0.003, -0.002]], f32)
    image = np.array([[1.0], [0.6]], f32)[:, None, :].repeat(nchan, 1)
    model = jax.jit(im_to_vis_ri)(image, uvw, lm, freq.astype(f32))
    model4 = Cplx(
        np.stack([np.asarray(model.re)[..., 0]] * 2, -1)[:, :, None, :],
        np.stack([np.asarray(model.im)[..., 0]] * 2, -1)[:, :, None, :],
    )  # (row, chan, dir=1, corr=2)

    # corrupt with random phases
    true_phase = rng.uniform(-0.5, 0.5, (ntime, nant, nchan, 1, 2)).astype(f32)
    true_g = Cplx(np.cos(true_phase), np.sin(true_phase))
    data = jax.jit(
        lambda g, m: corrupt_vis_ri(tbi, tbc, ant1, ant2, g, m)
    )(true_g, model4)
    print("simulated corrupted data:", data.re.shape)

    # solve
    flag = np.zeros((nrow, nchan, 2), bool)
    weight = np.ones((nrow, nchan, 2), f32)
    g0 = Cplx(np.ones(true_phase.shape, f32), np.zeros(true_phase.shape, f32))
    t0 = time.perf_counter()
    solve = jax.jit(
        lambda g, d, m, w: gauss_newton_ri(
            tbi, tbc, ant1, ant2, g, d, flag, m, w, tol=1e-6, maxiter=60
        )
    )
    gains, jhj, jhr, iters = jax.block_until_ready(
        solve(g0, data, model4, weight)
    )
    print(f"gauss-newton converged in {int(iters)} iterations "
          f"({time.perf_counter()-t0:.2f}s incl. compile)")

    # correct + image + clean (each stage one jitted call: eager op-by-op
    # dispatch costs ~30 ms per op through the device tunnel)
    @jax.jit
    def correct_and_image(gains, data):
        corrected = correct_vis_ri(tbi, tbc, ant1, ant2, gains, data, flag)
        return grid_adjoint(
            uvw, freq.astype(f32),
            Cplx(corrected.re[..., 0], corrected.im[..., 0]),
            None, npix, npix, cell, cell, 1e-4, False,
        )

    dirty = np.asarray(jax.block_until_ready(correct_and_image(gains, data)))

    # a PSF for CLEAN
    ones = Cplx(np.ones((nrow, nchan), f32), np.zeros((nrow, nchan), f32))
    psf = np.asarray(
        jax.jit(
            lambda o: grid_adjoint(uvw, freq.astype(f32), o, None, 2 * npix,
                                   2 * npix, cell, cell, 1e-4, False)
        )(ones)
    )
    # hogbom_clean expects the PSF peak at pixel (npix-1, npix-1) of the
    # (2npix, 2npix) array; the FFT-centred gridder peaks at (npix, npix)
    psf = np.roll(psf, (-1, -1), axis=(0, 1))
    psf = psf / psf.max()
    clean, resid = jax.jit(
        lambda d, p: hogbom_clean(d, p, gamma=0.2, threshold=0.1, niter=200)
    )(dirty.astype(f32), psf.astype(f32))
    clean = np.asarray(clean)
    peak = np.unravel_index(np.argmax(clean), clean.shape)
    print(f"CLEAN peak at pixel {peak} (image centre = "
          f"({npix//2}, {npix//2}))")
    print(f"residual max: {float(np.asarray(resid).max()):.4f} "
          f"(dirty max was {dirty.max():.4f})")


if __name__ == "__main__":
    main()
