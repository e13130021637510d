#!/usr/bin/env python
"""Apply a phase screen to an MS-shaped column store, then calibrate it.

TPU-native counterpart of the reference's
calibration/utils/examples/apply_phase_screen_to_ms.py (310 lines):
simulate differential-TEC-like gains as a per-antenna *linear phase
screen* over the sky — φ(l, m) = (α₀ + α₁·l + α₂·m)/ν̄ per (time,
antenna, corr) — corrupt per-direction point-source model visibilities
with ``compute_and_corrupt_vis`` and write them to the store's DATA
column in row chunks; then run the phase-only Gauss-Newton solver on
the result and check the recovered gain products against the screen
(the reference's ``calibrate`` leg and its assert).

Differences by design: the MS is an :class:`africanus_tpu.io.MSStore`
(daskms/pyrap are not in this environment; the sky model is a SKY
subtable instead of a Tigger .lsm), and the chunked dask graph becomes
a jitted step mapped over row chunks.

Usage: python examples/apply_phase_screen_ms_store.py [store_dir]
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_screen(lm, freq, n_time, n_ant, n_corr, rng):
    """Linear phase screens: φ = basis(l, m)·α per (time, ant, corr),
    scaled by 1/ν_norm (reference make_screen semantics). Returns the
    (time, ant, chan, dir, corr) phases and the (time, ant, 3, corr)
    screen coefficients."""
    n_dir = lm.shape[0]
    basis = np.stack(
        [np.ones(n_dir), lm[:, 0], lm[:, 1]], axis=1
    )  # (dir, 3)
    alphas = 0.05 * rng.standard_normal((n_time, n_ant, 3, n_corr))
    freq_norm = freq / freq.max()
    # (t, a, dir, c) screens -> broadcast over chan with 1/ν scaling
    screen = np.einsum("dk,takc->tadc", basis, alphas)
    phases = screen[:, :, None, :, :] / freq_norm[None, None, :, None, None]
    return phases, alphas


def fabricate_store(path, rng, nant=10, ntime=8, nchan=12, nsrc=3):
    from africanus_tpu.io import MSStore

    a1u, a2u = np.triu_indices(nant, 1)
    nbl = a1u.size
    time_col = np.repeat(5.03e9 + np.arange(ntime) * 8.0, nbl)
    nrow = time_col.size
    ant_pos = rng.uniform(-2000, 2000, (nant, 3))
    ant_pos[:, 2] *= 0.02
    a1 = np.tile(a1u, ntime).astype(np.int32)
    a2 = np.tile(a2u, ntime).astype(np.int32)
    uvw = (ant_pos[a1] - ant_pos[a2]).astype(np.float64)
    freq = np.linspace(0.856e9, 1.712e9, nchan)
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2))
    flux = rng.uniform(0.5, 2.0, nsrc)

    MSStore.create(
        path,
        dict(
            TIME=time_col,
            ANTENNA1=a1,
            ANTENNA2=a2,
            UVW=uvw,
            DATA=np.zeros((nrow, nchan, 1), np.complex64),
            FLAG=np.zeros((nrow, nchan, 1), bool),
        ),
        dict(
            SPECTRAL_WINDOW=dict(CHAN_FREQ=freq),
            FIELD=dict(PHASE_DIR=[0.0, 0.0]),
            SKY=dict(LM=lm, FLUX=flux),
        ),
    )


def main():
    import jax

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from africanus_tpu.calibration import (
        chunkify_rows,
        gauss_newton_ri,
    )
    from africanus_tpu.calibration.utils import compute_and_corrupt_vis_ri
    from africanus_tpu.io import MSStore
    from africanus_tpu.ops.cplx import Cplx

    rng = np.random.default_rng(23)
    store_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/phase_screen_ms_store"
    if not (Path(store_dir) / "meta.json").exists():
        fabricate_store(store_dir, rng)
    store = MSStore(store_dir)

    time_col = store.read("TIME")
    a1 = store.read("ANTENNA1")
    a2 = store.read("ANTENNA2")
    freq = np.asarray(store.subtables["SPECTRAL_WINDOW"]["CHAN_FREQ"])
    lm = np.asarray(store.subtables["SKY"]["LM"])
    flux = np.asarray(store.subtables["SKY"]["FLUX"])
    nant = int(max(a1.max(), a2.max())) + 1
    nchan, nsrc = freq.size, lm.shape[0]

    utimes_per_chunk = 4
    row_chunks, tbi, tbc = chunkify_rows(time_col, utimes_per_chunk)
    n_time = tbi.size

    # flat-spectrum point-source model per direction, diagonal corr
    model = np.broadcast_to(
        flux[None, None, :, None], (n_time, nchan, nsrc, 1)
    ).astype(np.float64)
    lm_t = np.broadcast_to(lm[None], (n_time, nsrc, 2))

    phases, alphas = make_screen(lm, freq, n_time, nant, 1, rng)
    jones = Cplx(np.cos(phases), np.sin(phases))
    print(f"screen: {alphas.shape} coefficients over {n_time} times, "
          f"{nant} antennas")

    # corrupt per row chunk and write DATA back in place
    @jax.jit
    def corrupt_chunk(tbi_c, tbc_c, a1_c, a2_c, jones_c, model_c, uvw_c,
                      lm_c):
        return compute_and_corrupt_vis_ri(
            tbi_c, tbc_c, a1_c, a2_c, jones_c, model_c, uvw_c,
            jnp.asarray(freq), lm_c,
        )

    row0 = 0
    t0 = 0
    for chunk in row_chunks:
        rows = slice(row0, row0 + chunk)
        tsl = slice(t0, t0 + utimes_per_chunk)
        nt_c = min(utimes_per_chunk, n_time - t0)
        uvw_c = store.read("UVW", rows)
        out = corrupt_chunk(
            tbi[tsl] - tbi[t0], tbc[tsl], a1[rows] , a2[rows],
            Cplx(jones.re[tsl], jones.im[tsl]), model[tsl], uvw_c,
            lm_t[tsl],
        )
        store.write(
            "DATA",
            (np.asarray(out.re) + 1j * np.asarray(out.im)).astype(
                np.complex64
            ),
            rows,
        )
        row0 += chunk
        t0 += nt_c
    print(f"wrote corrupted DATA: {row0} rows in {len(row_chunks)} chunks")

    # calibrate leg (reference calibrate(): phase-only Gauss-Newton on
    # the corrupted column) — gains are per (time, ant, chan, dir, corr)
    data = store.read("DATA")
    data_ri = Cplx(np.ascontiguousarray(data.real).astype(np.float64),
                   np.ascontiguousarray(data.imag).astype(np.float64))
    uvw = store.read("UVW")
    weight = np.ones((data.shape[0], nchan, 1))
    flag = store.read("FLAG")

    # per-direction model visibilities (uncorrupted K·flux)
    from africanus_tpu.constants import minus_two_pi_over_c

    l, m = lm[:, 0], lm[:, 1]
    n = np.sqrt(1.0 - l * l - m * m)
    dot = (uvw[:, 0, None] * l + uvw[:, 1, None] * m
           + uvw[:, 2, None] * (n - 1.0))
    p = minus_two_pi_over_c * dot[:, None, :] * freq[None, :, None]
    mod = Cplx(
        (np.cos(p) / n) * flux[None, None, :],
        (np.sin(p) / n) * flux[None, None, :],
    )
    model_vis = Cplx(mod.re[..., None], mod.im[..., None])

    jones0 = Cplx(
        np.ones((n_time, nant, nchan, nsrc, 1)),
        np.zeros((n_time, nant, nchan, nsrc, 1)),
    )
    gains, _, _, k = jax.jit(
        lambda d: gauss_newton_ri(tbi, tbc, a1, a2, jones0, d, flag,
                                  model_vis, weight, tol=1e-8, maxiter=120)
    )(data_ri)
    print(f"gauss-newton converged in {int(k)} iterations")

    # recovered gain *products* must match the screen's (phase-only
    # solutions have a per-time/chan unitary ambiguity)
    g = np.asarray(gains.re) + 1j * np.asarray(gains.im)
    gt = np.exp(1j * phases)
    a1u, a2u = np.triu_indices(nant, 1)
    prod = g[:, a1u] * np.conj(g[:, a2u])
    prod_t = gt[:, a1u] * np.conj(gt[:, a2u])
    err = np.abs(prod - prod_t).max()
    print(f"max gain-product error vs screen: {err:.2e}")
    assert err < 1e-3, err
    print("phase screen applied and recovered OK")


if __name__ == "__main__":
    main()
