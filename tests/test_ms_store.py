"""Unit tests for the MS-shaped column store (africanus_tpu/io)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.io import MSStore


@pytest.fixture
def store(tmp_path, rng):
    nrow, nchan = 20, 4
    cols = dict(
        TIME=np.repeat(np.arange(5.0), 4),
        UVW=rng.normal(size=(nrow, 3)),
        DATA=(rng.normal(size=(nrow, nchan, 2))
              + 1j * rng.normal(size=(nrow, nchan, 2))).astype(np.complex64),
        MODEL_DATA=np.zeros((nrow, nchan, 2), np.complex64),
    )
    sub = dict(SPECTRAL_WINDOW=dict(CHAN_FREQ=np.linspace(1e9, 2e9, nchan)))
    return MSStore.create(tmp_path / "ms", cols, sub), cols


def test_roundtrip_and_complex_split(store):
    st, cols = store
    assert st.nrow == 20
    assert "DATA" in st.columns()
    assert_allclose(st.read("UVW"), cols["UVW"])
    assert_allclose(st.read("DATA"), cols["DATA"])
    # pair view carries split re/im with a trailing axis of 2
    pair = st.read_pair("DATA")
    assert pair.shape == cols["DATA"].shape + (2,)
    assert_allclose(pair[..., 0], cols["DATA"].real)
    # subtables survive the JSON round trip
    assert_allclose(
        st.subtables["SPECTRAL_WINDOW"]["CHAN_FREQ"],
        np.linspace(1e9, 2e9, 4),
    )


def test_row_slice_write_and_reopen(store, tmp_path):
    st, cols = store
    new = (np.ones((5, 4, 2)) + 2j * np.ones((5, 4, 2))).astype(np.complex64)
    st.write("MODEL_DATA", new, slice(5, 10))
    re = MSStore(st.path)
    got = re.read("MODEL_DATA")
    assert_allclose(got[5:10], new)
    assert_allclose(got[:5], 0)


def test_iter_chunks(store):
    st, cols = store
    seen = 0
    for sl, uvw, data in st.iter_chunks(7, "UVW", "DATA"):
        assert uvw.shape[0] == data.shape[0] == sl.stop - sl.start
        assert_allclose(uvw, cols["UVW"][sl])
        seen += uvw.shape[0]
    assert seen == st.nrow


def test_errors(store, tmp_path):
    st, cols = store
    with pytest.raises(KeyError):
        st.read("NOPE")
    with pytest.raises(ValueError, match="not a complex column"):
        st.read_pair("UVW")
    with pytest.raises(FileNotFoundError):
        MSStore(tmp_path / "missing")
    with pytest.raises(ValueError, match="rows"):
        MSStore.create(tmp_path / "bad",
                       dict(A=np.zeros(3), B=np.zeros(4)))


def test_ms_store_stream_rows_predict_roundtrip(tmp_path, rng):
    """Integration: MSStore columns streamed through stream_rows into a
    jitted DFT predict, MODEL_DATA written back chunk by chunk — the full
    out-of-core read → predict → write pipeline on one synthetic MS."""
    import jax

    from africanus_tpu.dft import im_to_vis_ri
    from africanus_tpu.parallel import stream_rows

    nrow, nchan, nsrc = 50, 4, 3
    cols = dict(
        UVW=rng.uniform(-1000, 1000, (nrow, 3)),
        MODEL_DATA=np.zeros((nrow, nchan, 1), np.complex64),
    )
    sub = dict(SPECTRAL_WINDOW=dict(
        CHAN_FREQ=np.linspace(1e9, 2e9, nchan)))
    st = MSStore.create(tmp_path / "ms", cols, sub)

    lm = rng.uniform(-0.01, 0.01, (nsrc, 2)).astype(np.float32)
    image = rng.uniform(0.1, 1.0, (nsrc, nchan, 1)).astype(np.float32)
    freq = np.asarray(st.subtables["SPECTRAL_WINDOW"]["CHAN_FREQ"],
                      np.float32)

    def predict(tree, valid):
        out = im_to_vis_ri(image, tree["uvw"], lm, freq)
        return out.re, out.im

    uvw = st.read("UVW").astype(np.float32)
    re, im = stream_rows(predict, {"uvw": uvw}, chunk=16)
    model = (re + 1j * im).astype(np.complex64)

    # chunked write-back, then reopen and compare against one-shot
    for start in range(0, nrow, 16):
        sl = slice(start, min(start + 16, nrow))
        st.write("MODEL_DATA", model[sl], sl)
    got = MSStore(st.path).read("MODEL_DATA")

    one = im_to_vis_ri(image, uvw, lm, freq)
    want = (np.asarray(one.re) + 1j * np.asarray(one.im)).astype(np.complex64)
    assert_allclose(got, want, rtol=1e-6, atol=1e-7)
