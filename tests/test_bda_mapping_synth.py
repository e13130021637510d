"""Synthesized-observation BDA mapping tests.

Port of the reference's structural BDA-mapper suite
(/root/reference/africanus/averaging/tests/test_bda_mapping.py:232-296)
at its depth: uvw coordinates are synthesized for a realistic array
tracking a phase centre over 36 timesteps — the reference does this with
pyrap/casacore (unavailable here); this port derives hour angles from
the package's own GAST (utils/astrometry.py) and applies the standard
equatorial uvw rotation, which is all the mapper needs (physically
smooth tracks with short and long baselines). The mapper's output
invariants are checked exactly, plus C++/python binner-core equivalence
on the same observation.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from africanus_tpu.averaging.bda_mapping import _bda_mapper_impl, bda_mapper


@pytest.fixture(scope="module")
def obs_times():
    # 36 timesteps of ~8 s, MJD seconds (reference fixture cadence)
    return 5.03373334e9 + 7.99661697 * np.arange(36)


@pytest.fixture(scope="module")
def array_layout():
    """Realistic layout: a ~1 km dense core plus outriggers to ~10 km,
    on the VLA's approximate geodetic site."""
    rng = np.random.default_rng(42)
    nant = 24
    # local east/north offsets [m]
    core = rng.normal(scale=400.0, size=(nant - 4, 2))
    arms = np.array(
        [[6000.0, 0.0], [-4500.0, 2500.0], [0.0, -8000.0], [3000.0, 7000.0]]
    )
    en = np.vstack([core, arms])
    up = rng.normal(scale=10.0, size=(nant, 1))
    lat = np.deg2rad(34.08)
    lon = np.deg2rad(-107.62)
    # local ENU -> earth-centred equatorial offsets
    e, n, u = en[:, 0], en[:, 1], up[:, 0]
    x = -np.sin(lat) * n + np.cos(lat) * u
    y = e
    z = np.cos(lat) * n + np.sin(lat) * u
    return np.stack([x, y, z], axis=1), lat, lon


def synthesize_uvw(ants_eq, lon, times, phase_dir, auto_correlations):
    """Baseline uvw tracks from equatorial antenna offsets: the standard
    rotation by hour angle H = GAST + lon − RA and declination."""
    from africanus_tpu.utils.astrometry import gast_from_mjd_seconds

    ra, dec = phase_dir
    nant = ants_eq.shape[0]
    k = 0 if auto_correlations else 1
    a1, a2 = np.triu_indices(nant, k)
    gast = np.asarray(gast_from_mjd_seconds(times, xp=np))
    H = gast + lon - ra

    rows = []
    for h in H:
        sh, ch = np.sin(h), np.cos(h)
        sd, cd = np.sin(dec), np.cos(dec)
        rot = np.array(
            [
                [sh, ch, 0.0],
                [-sd * ch, sd * sh, cd],
                [cd * ch, -cd * sh, sd],
            ]
        )
        ant_uvw = ants_eq @ rot.T
        rows.append(ant_uvw[a1] - ant_uvw[a2])
    return (
        np.tile(a1, times.size).astype(np.int32),
        np.tile(a2, times.size).astype(np.int32),
        np.concatenate(rows, axis=0),
    )


@pytest.fixture(scope="module", params=[False, True])
def synthesized_obs(request, obs_times, array_layout):
    ants_eq, _, lon = array_layout
    phase_dir = (5.1461782, -1.11199629)
    a1, a2, uvw = synthesize_uvw(ants_eq, lon, obs_times, phase_dir,
                                 request.param)
    return a1, a2, uvw


@pytest.fixture(scope="module")
def chan_meta():
    nchan = 4096
    chan_width = np.full(nchan, 0.856e9 / nchan)
    chan_freq = 0.856e9 + np.cumsum(np.concatenate([[0], chan_width[1:]]))
    return chan_freq, chan_width


@pytest.mark.parametrize("decorrelation", [0.95])
@pytest.mark.parametrize("min_nchan", [1])
def test_bda_mapper_synthesized(obs_times, synthesized_obs, chan_meta,
                                decorrelation, min_nchan):
    """Reference test_bda_mapper invariants on the synthesized track
    (ref test_bda_mapping.py:232-268)."""
    chan_freq, chan_width = chan_meta
    a1, a2, uvw = synthesized_obs
    nbl = a1.size // obs_times.size
    time = np.repeat(obs_times, nbl)
    interval = np.full(time.size, 7.99661697)
    flag_row = np.zeros(time.size, np.int8)
    max_uvw_dist = np.sqrt((uvw**2).sum(axis=1)).max()

    row_meta = bda_mapper(
        time, interval, a1, a2, uvw, chan_width, chan_freq, max_uvw_dist,
        flag_row=flag_row, max_fov=3.0, decorrelation=decorrelation,
        min_nchan=min_nchan,
    )

    # averaging must actually happen on the short-baseline core
    assert row_meta.offsets[-1] < time.size * chan_freq.size

    # channel-0 output indices of the input rows enumerate the output
    # row starts exactly
    offsets = np.unique(row_meta.map[np.arange(time.size), 0])
    assert_array_equal(offsets, row_meta.offsets[:-1])
    assert row_meta.map.max() + 1 == row_meta.offsets[-1]

    # per-bin output channel counts divide nchan exactly
    num_chan = np.diff(row_meta.offsets)
    _, remainder = np.divmod(chan_width.shape[0], num_chan)
    assert np.all(remainder == 0)
    decorr_cw = chan_width.sum() / num_chan
    assert_array_equal(decorr_cw, row_meta.decorr_chan_width)

    # monotone non-decreasing map along channels of any row
    assert np.all(np.diff(row_meta.map, axis=1) >= 0)

    # every output slot receives at least one input channel's width
    assert np.all(row_meta.chan_width > 0)

    # interval of each output row covers its inputs
    out_iv = row_meta.interval[row_meta.map[:, 0]]
    assert np.all(out_iv + 1e-9 >= interval)


def test_bda_mapper_auto_corrs_single_channel(obs_times, array_layout,
                                              chan_meta):
    """Auto-correlation baselines average every row of a bin and keep a
    single output channel (reference Binner auto_corr semantics)."""
    chan_freq, chan_width = chan_meta
    ants_eq, _, lon = array_layout
    a1, a2, uvw = synthesize_uvw(ants_eq, lon, obs_times,
                                 (5.1461782, -1.11199629), True)
    nbl = a1.size // obs_times.size
    time = np.repeat(obs_times, nbl)
    interval = np.full(time.size, 7.99661697)

    row_meta = bda_mapper(
        time, interval, a1, a2, uvw, chan_width, chan_freq, None,
        decorrelation=0.95,
    )
    auto_rows = np.nonzero(a1 == a2)[0]
    num_chan = np.diff(row_meta.offsets)
    out_rows_of_autos = np.unique(
        np.searchsorted(
            row_meta.offsets, row_meta.map[auto_rows, 0], side="right"
        ) - 1
    )
    counts = np.bincount(
        np.searchsorted(row_meta.offsets, row_meta.map[:, 0],
                        side="right") - 1
    )
    # every auto-corr output bin spanning >1 input row collapses to one
    # output channel
    multi = out_rows_of_autos[counts[out_rows_of_autos] > 1]
    assert multi.size > 0
    assert np.all(num_chan[multi] == 1)


def test_native_binner_matches_python(obs_times, array_layout):
    """C++ bda_binner_core and the python _Binner produce identical
    mappings on the synthesized observation (smaller channel count to
    keep the python loop tractable)."""
    from africanus_tpu import native

    if not native.available():
        pytest.skip("native cores unavailable")

    ants_eq, _, lon = array_layout
    a1, a2, uvw = synthesize_uvw(ants_eq[:10], lon, obs_times[:12],
                                 (5.1461782, -1.11199629), False)
    nbl = a1.size // 12
    time = np.repeat(obs_times[:12], nbl)
    interval = np.full(time.size, 7.99661697)
    nchan = 64
    chan_width = np.full(nchan, 0.856e9 / nchan)
    chan_freq = 0.856e9 + np.cumsum(np.concatenate([[0], chan_width[1:]]))

    orig = native.available
    try:
        native.available = lambda: False
        py = _bda_mapper_impl(time, interval, a1, a2, uvw, chan_width,
                              chan_freq, None, decorrelation=0.95)
    finally:
        native.available = orig
    cc = _bda_mapper_impl(time, interval, a1, a2, uvw, chan_width,
                          chan_freq, None, decorrelation=0.95)

    assert_array_equal(py.map, cc.map)
    assert_array_equal(py.offsets, cc.offsets)
    assert_allclose(py.decorr_chan_width, cc.decorr_chan_width)
    assert_allclose(py.time, cc.time)
    assert_allclose(py.interval, cc.interval)
    assert_allclose(py.chan_width, cc.chan_width)


def test_plan_cache_hit_and_eviction(obs_times, array_layout):
    """The content-keyed plan cache returns the identical object for
    identical inputs and misses when any input changes."""
    ants_eq, _, lon = array_layout
    a1, a2, uvw = synthesize_uvw(ants_eq[:8], lon, obs_times[:6],
                                 (5.1461782, -1.11199629), False)
    nbl = a1.size // 6
    time = np.repeat(obs_times[:6], nbl)
    interval = np.full(time.size, 8.0)
    nchan = 16
    chan_width = np.full(nchan, 1e7)
    chan_freq = 1e9 + np.arange(nchan) * 1e7

    m1 = bda_mapper(time, interval, a1, a2, uvw, chan_width, chan_freq,
                    None, decorrelation=0.95)
    m2 = bda_mapper(time, interval, a1, a2, uvw, chan_width, chan_freq,
                    None, decorrelation=0.95)
    assert m2 is m1

    m3 = bda_mapper(time, interval, a1, a2, uvw + 1e-3, chan_width,
                    chan_freq, None, decorrelation=0.95)
    assert m3 is not m1

    m4 = bda_mapper(time, interval, a1, a2, uvw, chan_width, chan_freq,
                    None, decorrelation=0.9)
    assert m4 is not m1
