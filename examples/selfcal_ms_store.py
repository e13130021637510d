#!/usr/bin/env python
"""Selfcal against an MS-shaped column store: the full L4 pipeline.

Fabricates a store whose DATA column carries gain-corrupted model
visibilities, then — reading every input through
:class:`africanus_tpu.io.MSStore` — solves phase-only gains
(Gauss-Newton), writes CORRECTED_DATA back in place, images the
corrected data with the w-stacking gridder, and CLEANs the result.
The reference's equivalents are the calibration example workflows plus
the MS write-back of rime/examples/predict.py:583-587, glued by dask;
here the store streams columns and one jitted step does the math.

Usage: python examples/selfcal_ms_store.py [store_dir]
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from africanus_tpu.constants import c as C  # noqa: E402


def make_corrupted_store(path, rng, nant=12, ntime=6, nchan=8, nsrc=4):
    """Store with DATA = gains · (DFT of a point-source sky) · gainsᴴ."""
    import jax

    from africanus_tpu.calibration import chunkify_rows, corrupt_vis_ri
    from africanus_tpu.dft import im_to_vis_ri
    from africanus_tpu.io import MSStore
    from africanus_tpu.ops.cplx import Cplx

    a1u, a2u = np.triu_indices(nant, 1)
    nbl = a1u.size
    nrow = nbl * ntime
    time_col = np.repeat(5.03e9 + np.arange(ntime) * 8.0, nbl)
    a1 = np.tile(a1u, ntime).astype(np.int32)
    a2 = np.tile(a2u, ntime).astype(np.int32)
    ant_pos = rng.uniform(-1500, 1500, (nant, 3))
    ant_pos[:, 2] *= 0.02
    uvw = (ant_pos[a1] - ant_pos[a2]).astype(np.float32)
    freq = np.linspace(0.856e9, 1.712e9, nchan)

    fov = 0.02
    lm = rng.uniform(-fov / 3, fov / 3, (nsrc, 2)).astype(np.float32)
    flux = rng.uniform(0.5, 2.0, (nsrc, 1)).astype(np.float32)
    image = np.broadcast_to(flux[:, None, :], (nsrc, nchan, 1)).copy()

    _, tbi, tbc = chunkify_rows(time_col, 1)
    true_phase = rng.uniform(-0.6, 0.6,
                             (ntime, nant, nchan, 1, 1)).astype(np.float32)

    model = im_to_vis_ri(image, uvw, lm, freq.astype(np.float32))
    model2 = Cplx(model.re[:, :, None, :], model.im[:, :, None, :])
    gains = Cplx(np.cos(true_phase), np.sin(true_phase))
    data = corrupt_vis_ri(tbi, tbc, a1, a2, gains, model2)

    cols = dict(
        TIME=time_col,
        ANTENNA1=a1,
        ANTENNA2=a2,
        UVW=uvw.astype(np.float64),
        DATA=(np.asarray(data.re) + 1j * np.asarray(data.im)).astype(
            np.complex64
        ),
        CORRECTED_DATA=np.zeros((nrow, nchan, 1), np.complex64),
        MODEL_DATA=(np.asarray(model.re)
                    + 1j * np.asarray(model.im)).astype(np.complex64),
    )
    sub = dict(
        SPECTRAL_WINDOW=dict(CHAN_FREQ=freq),
        FIELD=dict(PHASE_DIR=[0.0, 0.0]),
        SKY=dict(LM=lm, FLUX=flux[:, 0]),
    )
    MSStore.create(path, cols, sub)
    return true_phase


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.calibration import (
        chunkify_rows, correct_vis_ri, gauss_newton_ri,
    )
    from africanus_tpu.deconv.hogbom import hogbom_clean
    from africanus_tpu.gridding.wgridder.core import grid_adjoint
    from africanus_tpu.io import MSStore
    from africanus_tpu.ops.cplx import Cplx

    rng = np.random.default_rng(17)
    store_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/selfcal_ms_store"
    true_phase = make_corrupted_store(store_dir, rng)
    st = MSStore(store_dir)
    print(f"store: {st.nrow} rows, columns {st.columns()}")

    t0 = time.time()
    time_col = st.read("TIME")
    a1 = st.read("ANTENNA1")
    a2 = st.read("ANTENNA2")
    uvw = st.read("UVW").astype(np.float32)
    freq = np.asarray(st.subtables["SPECTRAL_WINDOW"]["CHAN_FREQ"],
                      np.float32)
    dpair = st.read_pair("DATA").astype(np.float32)
    data = Cplx(dpair[..., 0], dpair[..., 1])
    mpair = st.read_pair("MODEL_DATA").astype(np.float32)
    model2 = Cplx(mpair[..., 0][:, :, None, :], mpair[..., 1][:, :, None, :])

    _, tbi, tbc = chunkify_rows(time_col, 1)
    ntime, nant = tbi.shape[0], int(max(a1.max(), a2.max())) + 1
    nchan = freq.shape[0]
    flag = np.zeros(data.re.shape, bool)
    weight = np.ones(data.re.shape, np.float32)
    jones0 = Cplx(np.ones((ntime, nant, nchan, 1, 1), np.float32),
                  np.zeros((ntime, nant, nchan, 1, 1), np.float32))

    @jax.jit
    def solve_and_correct(data, model2):
        gains, jhj, jhr, k = gauss_newton_ri(
            tbi, tbc, a1, a2, jones0, data, flag, model2, weight,
            tol=1e-7, maxiter=60,
        )
        corrected = correct_vis_ri(tbi, tbc, a1, a2, gains, data, flag)
        return gains, corrected, k

    gains, corrected, k = solve_and_correct(data, model2)
    print(f"gauss-newton converged in {int(k)} iterations")

    # write CORRECTED_DATA back through the store
    st.write(
        "CORRECTED_DATA",
        (np.asarray(corrected.re)
         + 1j * np.asarray(corrected.im)).astype(np.complex64),
    )

    # gain fidelity: baseline gain products vs the truth
    g = np.asarray(gains.re) + 1j * np.asarray(gains.im)
    gt = np.exp(1j * true_phase[..., 0])
    a1u, a2u = np.triu_indices(nant, 1)
    prod = g[:, a1u][..., 0] * np.conj(g[:, a2u][..., 0])
    prod_t = gt[:, a1u] * np.conj(gt[:, a2u])
    gerr = np.abs(prod - prod_t).max()
    print(f"max baseline gain-product error: {gerr:.2e}")

    # image the corrected data and CLEAN
    nx = 64
    cell = np.float32(0.03 / nx)
    dirty = np.asarray(
        grid_adjoint(uvw, freq, Cplx(corrected.re[..., 0],
                                     corrected.im[..., 0]),
                     None, nx, nx, cell, cell, 1e-4, do_wstacking=False)
    )
    psf = np.asarray(
        grid_adjoint(uvw, freq,
                     Cplx(jnp.ones_like(corrected.re[..., 0]),
                          jnp.zeros_like(corrected.im[..., 0])),
                     None, 2 * nx, 2 * nx, cell, cell, 1e-4,
                     do_wstacking=False)
    )
    ndirty = np.array(dirty / psf.max())
    # hogbom expects the psf peak at (npix-1, npix-1); the FFT-gridded
    # psf of an even image peaks at (npix, npix) — shift by one
    psf = np.roll(psf, (-1, -1), axis=(0, 1))
    cleaned, resid = hogbom_clean(ndirty, psf / psf.max(),
                                  gamma=0.1, threshold=0.3, niter=150)
    cleaned = np.asarray(cleaned)
    print(
        f"dirty peak {ndirty.max():.3f}, cleaned flux "
        f"{cleaned.sum():.3f}, |residual| peak "
        f"{np.abs(np.asarray(resid)).max():.3f} "
        f"({time.time() - t0:.1f} s on {jax.devices()[0]})"
    )
    # CLEAN must remove the brightest structure it was asked to
    assert cleaned.max() > 0

    reread = MSStore(store_dir).read("CORRECTED_DATA")
    assert np.abs(reread).max() > 0
    assert gerr < 5e-4
    print("selfcal pipeline round trip OK")


if __name__ == "__main__":
    main()
