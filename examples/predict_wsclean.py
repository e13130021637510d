#!/usr/bin/env python
"""Predict visibilities from a WSClean component list.

TPU-native analogue of the reference's ``africanus/rime/examples/predict.py``
CLI: sky model → RIME predict. The Measurement-Set subtables are replaced by
a synthetic array layout (no daskms/casacore in this environment); the sky
model is a standard WSClean component file.

Usage: python examples/predict_wsclean.py [components.txt]
(writes a demo component file if none is given)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEMO_MODEL = """\
Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='1.2e9', MajorAxis, MinorAxis, Orientation
s0,POINT,04:00:05.0,-50.30.00.0,1.2,[-0.7],false,1.2e9,,,
s1,GAUSSIAN,04:01:10.0,-50.28.30.0,0.8,[-0.5,0.05],true,1.2e9,60.0,30.0,45.0
s2,POINT,03:59:30.0,-50.31.00.0,0.4,[],false,,,,
"""


def main():
    import os

    import jax

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.coordinates import radec_to_lm
    from africanus_tpu.model.wsclean import load
    from africanus_tpu.ops.cplx import to_numpy
    from africanus_tpu.rime.wsclean_predict import wsclean_predict_ri

    if len(sys.argv) > 1:
        model_file = sys.argv[1]
    else:
        model_file = "/tmp/demo_components.txt"
        Path(model_file).write_text(DEMO_MODEL)
        print(f"wrote demo component list to {model_file}")

    sources = dict(load(model_file))
    nsrc = len(sources["Name"])
    print(f"loaded {nsrc} components: {sources['Name']}")

    radec = np.stack([sources["Ra"], sources["Dec"]], axis=1)
    phase_dir = radec.mean(axis=0)
    source_type = np.array(sources["Type"])
    flux = np.array(sources["I"])
    max_coeffs = max(len(c) for c in sources["SpectralIndex"])
    coeffs = np.zeros((nsrc, max(max_coeffs, 1)))
    for i, c in enumerate(sources["SpectralIndex"]):
        coeffs[i, : len(c)] = c
    log_poly = np.array(sources["LogarithmicSI"])
    ref_freq = np.array(sources["ReferenceFrequency"])
    gauss_shape = np.stack(
        [sources["MajorAxis"], sources["MinorAxis"], sources["Orientation"]],
        axis=1,
    )

    # synthetic KAT-7-like observation
    rng = np.random.default_rng(0)
    nant, ntime, nchan = 7, 10, 64
    a1, a2 = np.triu_indices(nant, 1)
    nrow = a1.size * ntime
    uvw = rng.uniform(-1000, 1000, (nrow, 3))
    freq = np.linspace(0.856e9, 1.712e9, nchan)

    lm = np.asarray(radec_to_lm(radec, phase_dir))

    f32 = np.float32
    fn = jax.jit(
        lambda u, l, fl, co, lp, rf, gs, fq: wsclean_predict_ri(
            u, l, source_type, fl, co, lp, rf, gs, fq
        )
    )
    # fetch inside the timed region: block_until_ready lies on the axon
    # backend — a value fetch is the only reliable barrier (CLAUDE.md)
    t0 = time.perf_counter()
    out = fn(
        uvw.astype(f32), lm.astype(f32), flux.astype(f32),
        coeffs.astype(f32), log_poly, ref_freq.astype(f32),
        gauss_shape.astype(f32), freq.astype(f32),
    )
    vis = to_numpy(out)
    dt = time.perf_counter() - t0
    print(f"device: {jax.devices()[0]}")
    print(f"predicted vis: {vis.shape} in {dt:.2f}s (incl. compile)")
    print(f"|vis| range: [{np.abs(vis).min():.4f}, {np.abs(vis).max():.4f}]")


if __name__ == "__main__":
    main()
