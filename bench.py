#!/usr/bin/env python
"""Headline benchmark: MeerKAT-64 full RIME predict (BASELINE.json config 2).

Runs the flagship RIME predict step (phase delay K × gaussian envelope ×
4-corr spectral brightness, source-summed, DIE gains applied) on the default
device (the real TPU chip under the driver) with device-resident inputs, and
compares against a vectorised numpy float64 implementation of the same
computation on the host CPU (the reference's numba kernels are not
installable in this environment — numpy-vectorised is the stand-in
single-node baseline; the reference's own kernels are row/src/chan scalar
loops of the same arithmetic).

Prints ONE JSON line:
  {"metric": ..., "value": Mvis/s, "unit": "Mvis/s", "vs_baseline": ratio}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NSRC = 100
NANT = 64  # MeerKAT-64 -> 2016 baselines
NTIME = 4
NCHAN = 128
NCORR = 4
REPS = 20


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_inputs(nchan, dtype):
    from __graft_entry__ import _flagship

    rng = np.random.default_rng(7)
    args = _flagship(nsrc=NSRC, ntime=NTIME, nant=NANT, nchan=nchan, rng=rng)
    return tuple(
        a.astype(dtype) if np.issubdtype(a.dtype, np.floating) else a
        for a in args
    )


def np_predict(ti, a1, a2, lm, uvw, freq, stokes, spi, ref_freq, gs, gphase):
    """Vectorised numpy float64 oracle of the same RIME predict."""
    C = 2.99792458e8
    # spectral model (std base): stokes * (nu/nu0)^sum(spi)
    ratio = freq[None, :] / ref_freq[:, None]
    alpha = spi.sum(axis=1)  # (src, 4)
    flux = stokes[:, None, :] * ratio[:, :, None] ** alpha[:, None, :]
    # stokes -> corr
    I, Q, U, V = (flux[..., i] for i in range(4))
    b = np.stack([I + Q, U + 1j * V, U - 1j * V, I - Q], axis=-1)
    # K term
    l, m = lm[:, 0], lm[:, 1]
    n = np.sqrt(np.maximum(1 - l * l - m * m, 0)) - 1
    dot = (
        l[:, None] * uvw[None, :, 0]
        + m[:, None] * uvw[None, :, 1]
        + n[:, None] * uvw[None, :, 2]
    )
    p = (-2 * np.pi / C) * dot[:, :, None] * freq
    K = np.cos(p) + 1j * np.sin(p)
    # gaussian envelope
    fwhm = 2 * np.sqrt(2 * np.log(2))
    gscale = np.sqrt(2) * np.pi / (fwhm * C)
    emaj, emin, ang = gs[:, 0], gs[:, 1], gs[:, 2]
    el, em = emaj * np.sin(ang), emaj * np.cos(ang)
    er = emin / np.where(emaj == 0, 1, emaj)
    u1 = (uvw[None, :, 0] * em[:, None] - uvw[None, :, 1] * el[:, None]) * er[:, None]
    v1 = uvw[None, :, 0] * el[:, None] + uvw[None, :, 1] * em[:, None]
    sf = freq * gscale
    env = np.exp(-((u1[:, :, None] * sf) ** 2 + (v1[:, :, None] * sf) ** 2))
    # source contraction + DIE gains
    vis = np.einsum("srf,sfc->rfc", K * env, b)
    g = np.exp(1j * gphase)
    gp = g[ti, a1]
    gq = g[ti, a2]
    return gp * vis * np.conj(gq)


def bench_cpu_baseline():
    nchan = 16
    args = make_inputs(nchan, np.float64)
    # warm-up + timed
    np_predict(*args)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = np_predict(*args)
    dt = (time.perf_counter() - t0) / reps
    nvis = out.shape[0] * out.shape[1] * NCORR
    mvis = nvis / dt / 1e6
    log(f"cpu numpy baseline: {dt*1e3:.1f} ms for {nvis/1e6:.2f} Mvis "
        f"-> {mvis:.1f} Mvis/s")
    return mvis, out, args


def bench_tpu(use_pallas=True):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from __graft_entry__ import _predict_step, _predict_step_pallas

    step = _predict_step_pallas if use_pallas else _predict_step

    args = make_inputs(NCHAN, np.float32)
    dargs = jax.device_put(args)
    nrow = dargs[0].shape[0]

    # REPS iterations inside one jit call: the per-dispatch tunnel latency
    # (~30 ms through the axon HTTP proxy) would otherwise dominate. A tiny
    # per-iteration uvw perturbation defeats loop-invariant hoisting.
    @jax.jit
    def loop(ti, a1, a2, lm, uvw, freq, stokes, spi, ref_freq, gs, gphase):
        def body(carry, i):
            uvw_i = uvw + (i * 1e-12).astype(uvw.dtype)
            out = step(
                ti, a1, a2, lm, uvw_i, freq, stokes, spi, ref_freq, gs, gphase
            )
            return carry + out.re[0, 0, 0], None

        c, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
        return c

    # NOTE: jax.block_until_ready does NOT synchronize on the axon
    # backend; fetching the scalar value is the only reliable barrier.
    float(np.asarray(loop(*dargs)))  # compile + run
    t0 = time.perf_counter()
    float(np.asarray(loop(*dargs)))
    dt = (time.perf_counter() - t0) / REPS
    nvis = nrow * NCHAN * NCORR
    mvis = nvis / dt / 1e6
    log(f"tpu: {dt*1e3:.2f} ms/iter for {nvis/1e6:.2f} Mvis -> {mvis:.1f} "
        f"Mvis/s on {jax.devices()[0].platform}:{jax.devices()[0].device_kind}")
    return mvis


def check_accuracy():
    """Small-shape numerical agreement: device f32 vs numpy f64."""
    import jax
    from __graft_entry__ import _predict_step

    args = make_inputs(8, np.float32)
    out = jax.jit(_predict_step)(*jax.device_put(args))
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    want = np_predict(*(a.astype(np.float64)
                        if np.issubdtype(a.dtype, np.floating) else a
                        for a in args))
    err = np.abs(got - want).max() / np.abs(want).max()
    log(f"accuracy f32 vs f64 oracle: max rel err {err:.2e}")
    return float(err)


def main():
    err = check_accuracy()
    cpu_mvis, _, _ = bench_cpu_baseline()
    tpu_mvis = bench_tpu()
    result = {
        "metric": "MeerKAT-64 full RIME predict (K*gauss*B 4-corr, DIE gains)",
        "value": round(tpu_mvis, 2),
        "unit": "Mvis/s",
        "vs_baseline": round(tpu_mvis / cpu_mvis, 2),
        "baseline": "numpy-f64 vectorised single CPU (numba unavailable)",
        "max_rel_err_vs_f64": err,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
