#!/usr/bin/env python
"""End-to-end MS-shaped IO pipeline: read -> predict -> MODEL_DATA write.

TPU-native analogue of the reference's flagship example
(``africanus/rime/examples/predict.py:531-587``): it reads a Measurement
Set, parses a Tigger sky model, predicts model visibilities and writes
MODEL_DATA back. daskms/casacore are absent from this environment, so
the MS is an :class:`africanus_tpu.io.MSStore` — a directory of
memory-mapped ``.npy`` columns with JSON subtables — and the sky model a
standard WSClean component list. The pipeline streams row chunks through
one jitted predict and writes each chunk back in place, then re-opens
the store and verifies the round trip.

Usage: python examples/predict_to_ms_store.py [store_dir]
"""

import os
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


def make_store(path, nant=16, ntime=12, nchan=64):
    """Fabricate an MS-shaped store for a synthetic observation."""
    from africanus_tpu.io import MSStore

    rng = np.random.default_rng(11)
    a1u, a2u = np.triu_indices(nant, 1)
    nbl = a1u.size
    nrow = nbl * ntime
    time_col = np.repeat(5.03e9 + np.arange(ntime) * 8.0, nbl)
    ant_pos = rng.uniform(-2000, 2000, (nant, 3))
    ant_pos[:, 2] *= 0.05
    uvw = ant_pos[np.tile(a1u, ntime)] - ant_pos[np.tile(a2u, ntime)]
    chan_freq = np.linspace(0.856e9, 1.712e9, nchan)
    data = np.zeros((nrow, nchan, 1), np.complex64)
    columns = dict(
        TIME=time_col,
        ANTENNA1=np.tile(a1u, ntime).astype(np.int32),
        ANTENNA2=np.tile(a2u, ntime).astype(np.int32),
        UVW=uvw,
        DATA=data,
        MODEL_DATA=np.zeros_like(data),
        FLAG=np.zeros(data.shape, bool),
    )
    subtables = dict(
        FIELD=dict(PHASE_DIR=[1.0472, -0.8813]),  # ~04h00, -50.5 deg
        SPECTRAL_WINDOW=dict(CHAN_FREQ=chan_freq),
        ANTENNA=dict(POSITION=ant_pos),
    )
    return MSStore.create(path, columns, subtables)


def main():
    import jax

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.coordinates import radec_to_lm
    from africanus_tpu.io import MSStore
    from africanus_tpu.model.wsclean import load
    from africanus_tpu.rime.wsclean_predict import wsclean_predict_ri

    store_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/demo_ms_store"
    if not (Path(store_dir) / "meta.json").exists():
        make_store(store_dir)
        print(f"fabricated synthetic MS store at {store_dir}")
    store = MSStore(store_dir)
    print(f"store: {store.nrow} rows, columns {store.columns()}")

    model_file = Path(store_dir) / "sky_model.txt"
    model_file.write_text(DEMO_MODEL)
    sources = dict(load(str(model_file)))
    nsrc = len(sources["Name"])

    phase_dir = np.asarray(store.subtables["FIELD"]["PHASE_DIR"])
    chan_freq = np.asarray(
        store.subtables["SPECTRAL_WINDOW"]["CHAN_FREQ"], np.float32
    )

    radec = np.stack([sources["Ra"], sources["Dec"]], axis=1)
    lm = np.asarray(radec_to_lm(radec, phase_dir), np.float32)
    source_type = np.array(sources["Type"])
    flux = np.array(sources["I"], np.float32)
    ncoeff = max(max(len(c) for c in sources["SpectralIndex"]), 1)
    coeffs = np.zeros((nsrc, ncoeff), np.float32)
    for i, c in enumerate(sources["SpectralIndex"]):
        coeffs[i, : len(c)] = c
    log_poly = np.array(
        [bool(x) for x in sources["LogarithmicSI"]]
    )
    ref_freq = np.array(
        [x if x else 1.2e9 for x in sources["ReferenceFrequency"]],
        np.float32,
    )
    # wsclean.load already converts MajorAxis/MinorAxis arcsec→radians
    # and Orientation deg→radians (model/wsclean/file_model.py
    # _CONVERTERS) — use the loaded radian values directly
    gauss_shape = np.stack(
        [
            np.array([x or 0.0 for x in sources["MajorAxis"]]),
            np.array([x or 0.0 for x in sources["MinorAxis"]]),
            np.array([x or 0.0 for x in sources["Orientation"]]),
        ],
        axis=1,
    ).astype(np.float32)

    @jax.jit
    def predict(uvw):
        out = wsclean_predict_ri(
            uvw, lm, source_type, flux, coeffs, log_poly, ref_freq,
            gauss_shape, chan_freq,
        )
        return out.re, out.im

    t0 = time.time()
    chunk = 4096
    nvis = 0
    for sl, uvw in store.iter_chunks(chunk, "UVW"):
        re, im = predict(uvw.astype(np.float32))
        model = np.asarray(re) + 1j * np.asarray(im)
        store.write("MODEL_DATA", model.astype(np.complex64), sl)
        nvis += model.size
    dt = time.time() - t0
    print(
        f"predicted + wrote {nvis / 1e6:.2f} Mvis of MODEL_DATA "
        f"in {dt:.2f} s ({nvis / dt / 1e6:.1f} Mvis/s incl. IO) "
        f"on {jax.devices()[0]}"
    )

    # verify the round trip through a fresh handle
    reopened = MSStore(store_dir)
    got = reopened.read("MODEL_DATA", slice(0, 8))
    re, im = predict(reopened.read("UVW", slice(0, 8)).astype(np.float32))
    want = np.asarray(re) + 1j * np.asarray(im)
    err = np.abs(got - want).max()
    print(f"round-trip max abs err vs re-predict: {err:.2e}")
    assert err < 1e-6
    assert np.abs(got).max() > 0


if __name__ == "__main__":
    main()
