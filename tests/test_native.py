"""Native C++ mapper cores vs the pure-python fallbacks (identical
semantics required)."""

import numpy as np
from numpy.testing import assert_allclose, assert_array_equal
import pytest

from africanus_tpu import native
from africanus_tpu.averaging import row_mapper
from africanus_tpu.averaging.bda_mapping import bda_mapper


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native mappers unavailable"
)


@pytest.fixture
def obs(rng):
    ntime, nant = 12, 7
    ants = [(a, b) for a in range(nant) for b in range(a, nant)]  # incl auto
    nbl = len(ants)
    time = np.repeat(5.03e9 + np.arange(ntime) * 2.0, nbl)
    interval = np.full(time.shape, 2.0)
    a1 = np.array([a for _ in range(ntime) for a, _ in ants])
    a2 = np.array([b for _ in range(ntime) for _, b in ants])
    flag_row = (rng.uniform(size=time.shape) < 0.3).astype(np.uint8)
    scale = rng.uniform(10, 5000, nbl)
    uvw = np.zeros((time.shape[0], 3))
    for t in range(ntime):
        ang = 1e-3 * t
        for b in range(nbl):
            uvw[t * nbl + b] = scale[b] * np.array(
                [np.cos(ang), np.sin(ang), 0.01 * np.sin(ang)]
            )
    return time, interval, a1, a2, flag_row, uvw


def _with_python_fallback(monkeypatch, fn):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_error", RuntimeError("forced off"))
    try:
        return fn()
    finally:
        monkeypatch.setattr(native, "_load_error", None)


def test_row_mapper_native_matches_python(monkeypatch, obs):
    time, interval, a1, a2, flag_row, _ = obs
    nat = row_mapper(time, interval, a1, a2, flag_row=flag_row,
                     time_bin_secs=5.0)
    py = _with_python_fallback(
        monkeypatch,
        lambda: row_mapper(time, interval, a1, a2, flag_row=flag_row,
                           time_bin_secs=5.0),
    )
    assert_array_equal(nat.map, py.map)
    assert_allclose(nat.time, py.time, rtol=1e-15)
    assert_allclose(nat.interval, py.interval, rtol=1e-15)
    assert_array_equal(nat.flag_row, py.flag_row)


def test_bda_mapper_native_matches_python(monkeypatch, obs):
    time, interval, a1, a2, flag_row, uvw = obs
    nchan = 8
    chan_freq = np.linspace(0.856e9, 1.712e9, nchan)
    chan_width = np.full(nchan, (chan_freq[-1] - chan_freq[0]) / (nchan - 1))
    kw = dict(flag_row=None, decorrelation=0.95, min_nchan=1)

    args = (time, interval, a1, a2, uvw, chan_width, chan_freq, 1.0)
    nat = bda_mapper(*args, **kw)
    py = _with_python_fallback(monkeypatch, lambda: bda_mapper(*args, **kw))

    assert_array_equal(nat.map, py.map)
    assert_array_equal(nat.offsets, py.offsets)
    assert_allclose(nat.decorr_chan_width, py.decorr_chan_width, rtol=1e-12)
    assert_allclose(nat.time, py.time, rtol=1e-15)
    assert_allclose(nat.interval, py.interval, rtol=1e-15)
    assert_allclose(nat.chan_width, py.chan_width, rtol=1e-12)


def test_native_speedup(obs):
    """Native path must be drastically faster at scale (sanity bound)."""
    import time as timer

    ntime, nbl = 60, 2016
    ants = [(a, b) for a in range(64) for b in range(a + 1, 64)]
    time_col = np.repeat(np.arange(ntime) * 2.0 + 5e9, nbl)
    interval = np.full(time_col.shape, 2.0)
    a1 = np.array([ants[i][0] for _ in range(ntime) for i in range(nbl)])
    a2 = np.array([ants[i][1] for _ in range(ntime) for i in range(nbl)])

    t0 = timer.perf_counter()
    meta = row_mapper(time_col, interval, a1, a2, time_bin_secs=8.0)
    dt = timer.perf_counter() - t0
    assert meta.time.shape[0] == 15 * nbl  # 60 x 2s samples -> 15 bins of 8s
    # pure python took ~0.5s for 1/3 of these rows; the generous
    # bound tolerates a loaded CI machine without losing the signal
    assert dt < 5.0
