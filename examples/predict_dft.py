#!/usr/bin/env python
"""DFT predict example (BASELINE config 1: KAT-7-style point-source predict).

TPU-native analogue of the reference's ``africanus/dft/examples/predict.py``
with the Measurement-Set IO replaced by a synthetic observation (no
casacore in this environment): builds a sky model, predicts visibilities
through the public API on whatever device JAX selects, and reports
throughput.

Usage: python examples/predict_dft.py [--nsrc 100] [--nchan 64] [--ntime 10]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nsrc", type=int, default=100)
    p.add_argument("--nant", type=int, default=7)
    p.add_argument("--nchan", type=int, default=64)
    p.add_argument("--ntime", type=int, default=10)
    args = p.parse_args()

    import os

    import jax

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.coordinates import radec_to_lm
    from africanus_tpu.dft import im_to_vis_ri
    from africanus_tpu.model.coherency import convert_ri
    from africanus_tpu.model.spectral import spectral_model
    from africanus_tpu.ops.cplx import to_numpy

    rng = np.random.default_rng(42)
    f32 = np.float32
    nbl = args.nant * (args.nant - 1) // 2
    nrow = nbl * args.ntime

    pc = np.array([0.5, -0.6], f32)
    radec = (pc + rng.uniform(-0.02, 0.02, (args.nsrc, 2))).astype(f32)
    uvw = rng.uniform(-1000.0, 1000.0, (nrow, 3)).astype(f32)
    freq = np.linspace(0.856e9, 1.712e9, args.nchan).astype(f32)
    stokes = rng.uniform(0.1, 1.0, (args.nsrc, 1)).astype(f32)
    spi = rng.normal(scale=0.2, size=(args.nsrc, 1, 1)).astype(f32)
    ref_freq = np.full(args.nsrc, 1.2e9, f32)

    @jax.jit
    def predict(radec, uvw, freq, stokes, spi, ref_freq, jitter=0.0):
        lm = radec_to_lm(radec, pc)
        flux = spectral_model(stokes, spi, ref_freq, freq, base="std")
        corr = convert_ri(flux, ["I"], ["XX", "YY"], implicit_stokes=True)
        return im_to_vis_ri(corr, uvw + jitter, lm, freq)

    dargs = jax.device_put((radec, uvw, freq, stokes, spi, ref_freq))
    out = predict(*dargs)
    _ = float(np.asarray(out.re).ravel()[0])  # warm-up + fetch barrier
    # block_until_ready lies on the axon backend and repeated identical
    # dispatches can be result-reused: amortise DISTINCT dispatches
    # (inert uvw jitter) and fetch a value as the only reliable barrier
    # (CLAUDE.md timing rules)
    t0 = time.perf_counter()
    reps = 5
    for i in range(reps):
        out = predict(*dargs, jitter=np.float32((i + 1) * 1e-12))
        _ = float(np.asarray(out.re).ravel()[0])
    dt = (time.perf_counter() - t0) / reps

    vis = to_numpy(out)
    nvis = nrow * args.nchan * 2
    print(f"device: {jax.devices()[0]}")
    print(f"predicted vis: {vis.shape} {vis.dtype}")
    print(f"throughput: {nvis / dt / 1e6:.1f} Mvis/s ({dt*1e3:.2f} ms/call)")
    print(f"sample: vis[0, 0] = {vis[0, 0]}")


if __name__ == "__main__":
    main()
