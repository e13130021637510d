#!/usr/bin/env python
"""Benchmark suite across the framework's hot paths.

Each benchmark prints one JSON line {"bench", "value", "unit", ...}.
``bench.py`` at the repo root remains the driver's single-line contract
(flagship Pallas predict); this suite covers the breadth: DFT, RIME
predict, gridding/degridding (Pallas tiles vs XLA scatter), calibration
and averaging.

Usage:
  python benchmarks/run.py                 # all, production-ish sizes
  python benchmarks/run.py --quick         # small sizes (CPU smoke)
  python benchmarks/run.py predict dirty   # subset by name
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

C = 2.99792458e8


def _emit(bench, value, unit, **extra):
    print(json.dumps(dict(bench=bench, value=round(value, 3), unit=unit,
                          **extra)), flush=True)


def bench_predict(quick):
    """Flagship fused Pallas RIME predict (see bench.py for the contract)."""
    import jax.numpy as jnp
    import jax
    from africanus_tpu.ops.pallas_predict import predict_kb_pallas
    from africanus_tpu.utils.profiling import measure

    nsrc, nant, ntime, nchan = (8, 16, 2, 32) if quick else (104, 64, 4, 128)
    nbl = nant * (nant - 1) // 2
    nrow = nbl * ntime
    rng = np.random.default_rng(0)
    f32 = np.float32

    from africanus_tpu.ops.cplx import Cplx

    # pad rows/sources to the kernel's tile multiples
    nrow = -(-nrow // 128) * 128
    uvw = rng.uniform(-3000, 3000, (nrow, 3)).astype(f32)
    lm = (rng.uniform(-1, 1, (nsrc, 2)) * 1e-2).astype(f32)
    freq = np.linspace(0.856e9, 1.712e9, nchan).astype(f32)
    n = np.sqrt(1 - (lm**2).sum(1))
    phase_dot = (
        (uvw[None, :, 0] * lm[:, None, 0]
         + uvw[None, :, 1] * lm[:, None, 1]
         + uvw[None, :, 2] * (n - 1)[:, None]) * (2.0 * np.pi / C)
    ).astype(f32)
    scaled_freq = (freq * 1e-9).astype(f32)
    u1 = np.broadcast_to(uvw[:, 0], (nsrc, nrow)).astype(f32)
    v1 = np.broadcast_to(uvw[:, 1], (nsrc, nrow)).astype(f32)
    b = Cplx(
        jnp.asarray(rng.normal(size=(nsrc, nchan, 4)).astype(f32)),
        jnp.asarray(rng.normal(size=(nsrc, nchan, 4)).astype(f32)),
    )

    if jax.default_backend() != "tpu":
        _emit("predict_pallas", 0, "Mvis/s", skipped="needs TPU")
        return

    dt = measure(
        lambda pd: predict_kb_pallas(pd, jnp.asarray(u1), jnp.asarray(v1),
                                     jnp.asarray(freq),
                                     jnp.asarray(scaled_freq), b).re,
        jnp.asarray(phase_dot), reps=10,
    )
    # (row, chan) rate; multiply by 4 corrs to compare with bench.py
    _emit("predict_pallas", nrow * nchan / dt / 1e6, "Mvis/s",
          shape=[nsrc, nrow, nchan, 4])


def bench_dft(quick):
    """im_to_vis einsum DFT (MXU path)."""
    import jax.numpy as jnp
    from africanus_tpu.dft import im_to_vis_ri
    from africanus_tpu.utils.profiling import measure

    nsrc, nrow, nchan = (16, 512, 16) if quick else (128, 8064, 64)
    rng = np.random.default_rng(0)
    f32 = np.float32
    uvw = rng.uniform(-3000, 3000, (nrow, 3)).astype(f32)
    lm = (rng.uniform(-1, 1, (nsrc, 2)) * 1e-2).astype(f32)
    freq = np.linspace(0.856e9, 1.712e9, nchan).astype(f32)
    image = rng.normal(size=(nsrc, nchan, 1)).astype(f32)

    dt = measure(
        lambda im: im_to_vis_ri(im, jnp.asarray(uvw), jnp.asarray(lm),
                                jnp.asarray(freq)).re,
        jnp.asarray(image), reps=10,
    )
    _emit("dft_im_to_vis", nrow * nchan / dt / 1e6, "Mvis/s",
          shape=[nsrc, nrow, nchan])

    # adjoint at an imaging shape (many pixels, few channels): the
    # pixel-lane fused kernel's home regime (ops/pallas_dft.py)
    from africanus_tpu.dft import vis_to_im_ri
    from africanus_tpu.ops.cplx import Cplx

    npix, nrow2, nchan2 = (256, 2048, 4) if quick else (4096, 20000, 8)
    lm2 = (rng.uniform(-1, 1, (npix, 2)) * 1e-2).astype(f32)
    uvw2 = rng.uniform(-3000, 3000, (nrow2, 3)).astype(f32)
    freq2 = np.linspace(0.856e9, 1.712e9, nchan2)
    vis = Cplx(rng.normal(size=(nrow2, nchan2, 1)).astype(f32),
               rng.normal(size=(nrow2, nchan2, 1)).astype(f32))
    flags = np.zeros((nrow2, nchan2, 1), bool)

    dt = measure(
        lambda v, u, l, fl: vis_to_im_ri(v, u, l, freq2, fl),
        vis, jnp.asarray(uvw2), jnp.asarray(lm2), jnp.asarray(flags),
        reps=10,
    )
    _emit("dft_vis_to_im", nrow2 * nchan2 * npix / dt / 1e9,
          "Gvis-pix/s", shape=[npix, nrow2, nchan2])


def _grid_problem(quick):
    rng = np.random.default_rng(0)
    nx = 128 if quick else 512
    nrow, nchan = (4000, 2) if quick else (50000, 4)
    cell = 2.0 * np.pi / 180 / nx
    freq = 1e9 + np.arange(nchan) * (2e8 / nchan)
    uvw = (rng.uniform(size=(nrow, 3)) - 0.5) / (cell * freq[-1] / C)
    uvw[:, 2] *= 0.2
    vre = rng.normal(size=(nrow, nchan)).astype(np.float32)
    vim = rng.normal(size=(nrow, nchan)).astype(np.float32)
    return nx, cell, freq, uvw, vre, vim


def bench_dirty(quick):
    """w-stacked dirty image, Pallas tiles vs XLA scatter."""
    import jax
    import jax.numpy as jnp
    from africanus_tpu.gridding.wgridder.core import grid_adjoint, make_plan
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.utils.profiling import measure

    nx, cell, freq, uvw, vre, vim = _grid_problem(quick)
    nvis = vre.size
    on_tpu = jax.default_backend() == "tpu"

    for use_tiles in ((True, False) if on_tpu else (False,)):
        plan = make_plan(uvw, freq, nx, nx, cell, cell, 1e-5, True,
                         use_tiles=use_tiles)
        dt = measure(
            lambda v: grid_adjoint(uvw, freq, v, None, nx, nx, cell, cell,
                                   1e-5, True, plan=plan,
                                   use_tiles=use_tiles),
            Cplx(jnp.asarray(vre), jnp.asarray(vim)), reps=3,
        )
        name = "dirty_tiles" if use_tiles else "dirty_scatter"
        _emit(name, nvis / dt / 1e6, "Mvis/s",
              shape=[nx, nx], nplanes=plan["nplanes"])


def bench_degrid(quick):
    """w-stacked degrid, Pallas tiles vs XLA gather."""
    import jax
    import jax.numpy as jnp
    from africanus_tpu.gridding.wgridder.core import degrid_ri, make_plan
    from africanus_tpu.utils.profiling import measure

    nx, cell, freq, uvw, _, _ = _grid_problem(quick)
    nvis = uvw.shape[0] * freq.shape[0]
    rng = np.random.default_rng(1)
    image = rng.normal(size=(nx, nx)).astype(np.float32)
    on_tpu = jax.default_backend() == "tpu"

    for use_tiles in ((True, False) if on_tpu else (False,)):
        plan = make_plan(uvw, freq, nx, nx, cell, cell, 1e-5, True,
                         use_tiles=use_tiles)
        dt = measure(
            lambda im: degrid_ri(uvw, freq, im, None, cell, cell, 1e-5,
                                 True, plan=plan, use_tiles=use_tiles).re,
            jnp.asarray(image), reps=3,
        )
        name = "degrid_tiles" if use_tiles else "degrid_gather"
        _emit(name, nvis / dt / 1e6, "Mvis/s", shape=[nx, nx])


def bench_calibration(quick):
    """Phase-only Gauss-Newton selfcal iteration throughput (DIAG_DIAG)."""
    import jax.numpy as jnp
    from africanus_tpu.calibration.phase_only import gauss_newton_ri
    from africanus_tpu.calibration.utils import chunkify_rows
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.utils.profiling import measure

    nant, ntime, nchan = (7, 4, 8) if quick else (64, 16, 64)
    ncorr = 2
    a1u, a2u = np.triu_indices(nant, 1)
    nbl = a1u.size
    a1 = np.tile(a1u, ntime)
    a2 = np.tile(a2u, ntime)
    tvals = np.repeat(np.arange(ntime, dtype=np.float64), nbl)
    _, tbi, tbc = chunkify_rows(tvals, 1)
    nrow = a1.size
    rng = np.random.default_rng(0)
    f32 = np.float32
    model = Cplx(
        jnp.asarray(rng.uniform(1, 2, (nrow, nchan, 1, ncorr)).astype(f32)),
        jnp.asarray(rng.uniform(-0.1, 0.1,
                                (nrow, nchan, 1, ncorr)).astype(f32)),
    )
    vis = Cplx(model.re.sum(2) + 0.01, model.im.sum(2) - 0.01)
    flag = np.zeros((nrow, nchan, ncorr), bool)
    wgt = jnp.ones((nrow, nchan, ncorr), f32)
    jones = Cplx(jnp.ones((ntime, nant, nchan, 1, ncorr), f32),
                 jnp.zeros((ntime, nant, nchan, 1, ncorr), f32))

    dt = measure(
        lambda v: gauss_newton_ri(tbi, tbc, a1, a2, jones, v, flag, model,
                                  wgt, tol=1e-12, maxiter=10)[0].re,
        vis, reps=3,
    )
    _emit("gauss_newton_10it", nrow * nchan * ncorr * 10 / dt / 1e6,
          "Mvis-iter/s", shape=[nrow, nchan, ncorr])


def bench_averaging(quick):
    """time_and_channel averaging throughput (map on host, avg on device)."""
    import jax.numpy as jnp
    from africanus_tpu.averaging import (channel_mapper, row_average,
                                         row_chan_average, row_mapper)
    from africanus_tpu.utils.profiling import measure

    nant, ntime, nchan, ncorr = (7, 8, 16, 2) if quick else (64, 40, 256, 4)
    a1u, a2u = np.triu_indices(nant, 1)
    nbl = a1u.size
    a1 = np.tile(a1u, ntime)
    a2 = np.tile(a2u, ntime)
    tvals = np.repeat(np.arange(ntime, dtype=np.float64) * 2.0 + 5e9, nbl)
    interval = np.full(tvals.shape, 2.0)
    nrow = tvals.size
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    meta = row_mapper(tvals, interval, a1, a2, time_bin_secs=8.0)
    map_dt = time.perf_counter() - t0
    chan_meta = channel_mapper(nchan, 4)

    f32 = np.float32
    vre = rng.normal(size=(nrow, nchan, ncorr)).astype(f32)
    flag = np.zeros(vre.shape, np.uint8)

    from africanus_tpu.ops.cplx import Cplx
    dt = measure(
        lambda v: row_chan_average(meta, chan_meta,
                                   visibilities=Cplx(v, v), flag=flag
                                   ).visibilities.re,
        jnp.asarray(vre), reps=5,
    )
    _emit("time_chan_average", nrow * nchan * ncorr / dt / 1e6, "Mvis/s",
          host_map_ms=round(map_dt * 1e3, 1))


def bench_beam(quick):
    """Beam DDE chain (BASELINE.md config 3): cube interpolation +
    parallactic rotation + feed rotation, MeerKAT-like L-band."""
    import jax.numpy as jnp
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.ops.jones import mul2x2
    from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde_ri
    from africanus_tpu.rime.feeds import feed_rotation_ri
    from africanus_tpu.utils.profiling import measure

    nsrc, ntime, nant, nchan = (4, 2, 7, 16) if quick else (16, 4, 64, 1024)
    blw = bmh = 65
    bnud = 16 if quick else 32
    rng = np.random.default_rng(0)
    f32 = np.float32

    beam = Cplx(
        jnp.asarray(rng.normal(size=(blw, bmh, bnud, 2, 2)).astype(f32)),
        jnp.asarray(rng.normal(size=(blw, bmh, bnud, 2, 2)).astype(f32) * 0.1),
    )
    extents = np.array([[-1e-2, 1e-2], [-1e-2, 1e-2]], f32)
    bfmap = np.linspace(0.8e9, 1.8e9, bnud).astype(f32)
    lm = (rng.uniform(-1, 1, (nsrc, 2)) * 5e-3).astype(f32)
    pa = rng.uniform(-np.pi, np.pi, (ntime, nant)).astype(f32)
    pe = np.zeros((ntime, nant, nchan, 2), f32)
    ascale = np.ones((nant, nchan, 2), f32)
    freq = np.linspace(0.856e9, 1.712e9, nchan).astype(f32)

    def chain(pa_t):
        e = beam_cube_dde_ri(beam, extents, bfmap, lm, pa_t, pe, ascale,
                             freq)  # (src, time, ant, chan, 2, 2)
        l = feed_rotation_ri(pa_t)  # (time, ant, 2, 2)
        return mul2x2(Cplx(l.re[None, :, :, None], l.im[None, :, :, None]),
                      e).re

    dt = measure(chain, jnp.asarray(pa), reps=5)
    n = nsrc * ntime * nant * nchan
    _emit("beam_dde_chain", n / dt / 1e6, "Msamples/s",
          shape=[nsrc, ntime, nant, nchan])


ALL = dict(predict=bench_predict, dft=bench_dft, dirty=bench_dirty,
           degrid=bench_degrid, calibration=bench_calibration,
           averaging=bench_averaging, beam=bench_beam)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=list(ALL))
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import os
    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    for name in args.names:
        try:
            ALL[name](args.quick)
        except Exception as e:  # keep the suite going
            _emit(name, 0, "error", error=repr(e)[:200])


if __name__ == "__main__":
    main()
