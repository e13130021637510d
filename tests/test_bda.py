"""BDA mapping + averaging tests (reference: averaging/bda_mapping.py,
bda_avg.py). Synthesises a short observation with short and long baselines:
short baselines decorrelate slowly and must be averaged more aggressively."""

import numpy as np
from numpy.testing import assert_allclose, assert_array_equal
import pytest

from africanus_tpu.averaging.bda_mapping import bda_mapper
from africanus_tpu.averaging.bda_avg import bda, row_average, row_chan_average


@pytest.fixture
def bda_obs(rng):
    """10 times x 3 baselines; baseline 0 short, baseline 2 long."""
    ntime = 10
    ants = [(0, 1), (0, 2), (1, 2)]
    nbl = len(ants)
    time = np.repeat(5.03e9 + np.arange(ntime) * 2.0, nbl)
    interval = np.full(time.shape, 2.0)
    antenna1 = np.array([a for _ in range(ntime) for a, _ in ants])
    antenna2 = np.array([b for _ in range(ntime) for _, b in ants])

    # uvw tracks slowly: short baseline moves little, long moves a lot
    scale = np.array([10.0, 1000.0, 8000.0])
    uvw = np.zeros((time.shape[0], 3))
    for t in range(ntime):
        for b in range(nbl):
            r = t * nbl + b
            ang = 1e-3 * t
            uvw[r] = scale[b] * np.array(
                [np.cos(ang), np.sin(ang), 0.01 * np.sin(ang)]
            )

    nchan = 8
    chan_freq = np.linspace(0.856e9, 1.712e9, nchan)
    chan_width = np.full(nchan, (chan_freq[-1] - chan_freq[0]) / (nchan - 1))
    return dict(
        time=time, interval=interval, antenna1=antenna1, antenna2=antenna2,
        uvw=uvw, chan_freq=chan_freq, chan_width=chan_width,
        nchan=nchan, ntime=ntime, nbl=nbl,
    )


def test_bda_mapper_structure(bda_obs):
    o = bda_obs
    meta = bda_mapper(
        o["time"], o["interval"], o["antenna1"], o["antenna2"], o["uvw"],
        o["chan_width"], o["chan_freq"],
        max_uvw_dist=np.sqrt((o["uvw"] ** 2).sum(axis=1)).max(),
        decorrelation=0.95,
    )
    nrow, nchan = o["time"].shape[0], o["nchan"]
    assert meta.map.shape == (nrow, nchan)
    out_row_chans = meta.time.shape[0]
    # every input cell maps to a valid flat output
    assert meta.map.min() >= 0 and meta.map.max() < out_row_chans
    # offsets are monotone with runs covering the output exactly
    assert meta.offsets[0] == 0 and meta.offsets[-1] == out_row_chans
    assert (np.diff(meta.offsets.astype(int)) >= 1).all()
    # compression must occur (fewer output row-chans than input cells)
    assert out_row_chans < nrow * nchan
    # each output position receives a consistent time
    assert (meta.time > 0).all()
    assert (meta.interval > 0).all()


def test_bda_mapper_validation(bda_obs):
    o = bda_obs
    args = (o["time"], o["interval"], o["antenna1"], o["antenna2"], o["uvw"],
            o["chan_width"], o["chan_freq"], 1.0)
    with pytest.raises(ValueError, match="decorrelation"):
        bda_mapper(*args, decorrelation=1.5)
    with pytest.raises(ValueError, match="max_fov"):
        bda_mapper(*args, max_fov=100.0)
    t2 = o["time"].copy()
    t2[3] = t2[0]
    with pytest.raises(ValueError, match="Duplicate"):
        bda_mapper(t2, o["interval"], o["antenna1"], o["antenna2"], o["uvw"],
                   o["chan_width"], o["chan_freq"], 1.0)


def test_bda_averages_preserve_totals(rng, bda_obs):
    """Weighted bin means must reproduce constant inputs exactly, and the
    weight-spectrum output must conserve the total weight."""
    o = bda_obs
    nrow, nchan, ncorr = o["time"].shape[0], o["nchan"], 2
    vis = np.full((nrow, nchan, ncorr), 2.5 + 0.5j)
    ws = rng.uniform(0.5, 2.0, vis.shape)
    flag = np.zeros(vis.shape, bool)
    flag_row = np.zeros(nrow, np.uint8)

    out = bda(
        o["time"], o["interval"], o["antenna1"], o["antenna2"],
        flag_row=flag_row, uvw=o["uvw"], chan_freq=o["chan_freq"],
        chan_width=o["chan_width"], visibilities=vis, flag=flag,
        weight_spectrum=ws, decorrelation=0.95,
    )
    v = np.asarray(out.visibilities)
    # averaging a constant gives the constant
    assert_allclose(v, 2.5 + 0.5j, rtol=1e-12)
    # total weight is conserved
    assert_allclose(np.asarray(out.weight_spectrum).sum(), ws.sum(), rtol=1e-12)
    assert not np.asarray(out.flag).any()


def test_bda_flagged_bin_handling(rng, bda_obs):
    o = bda_obs
    nrow, nchan, ncorr = o["time"].shape[0], o["nchan"], 1
    vis = rng.normal(size=(nrow, nchan, ncorr)) + 0j
    ws = np.ones(vis.shape)
    # flag one entire baseline's rows
    flag_row = np.zeros(nrow, np.uint8)
    flag_row[o["antenna1"] == 0] = 0  # keep
    flag = np.zeros(vis.shape, bool)
    flag[:, 2, :] = True  # one channel fully flagged

    out = bda(
        o["time"], o["interval"], o["antenna1"], o["antenna2"],
        flag_row=flag_row, uvw=o["uvw"], chan_freq=o["chan_freq"],
        chan_width=o["chan_width"], visibilities=vis, flag=flag,
        weight_spectrum=ws, decorrelation=0.95,
    )
    # flagged-channel data lands in bins that may mix with unflagged chans;
    # bins receiving only flagged data must be flagged
    f = np.asarray(out.flag)
    v = np.asarray(out.visibilities)
    assert np.isfinite(v).all()
    # flagged bins still have averaged values (flagged-sample average)
    if f.any():
        assert np.abs(v[f]).max() > 0


def test_bda_row_average_broadcast(rng, bda_obs):
    """Row-averaged columns are broadcast along each output row's run."""
    o = bda_obs
    nrow = o["time"].shape[0]
    meta = bda_mapper(
        o["time"], o["interval"], o["antenna1"], o["antenna2"], o["uvw"],
        o["chan_width"], o["chan_freq"], 1.0, decorrelation=0.95,
    )
    uvw = o["uvw"]
    out = row_average(meta, o["antenna1"], o["antenna2"], uvw=uvw,
                      exposure=o["interval"])
    u = np.asarray(out.uvw)
    offs = meta.offsets.astype(int)
    for i in range(len(offs) - 1):
        run = u[offs[i]:offs[i + 1]]
        assert np.abs(run - run[0]).max() == 0.0  # constant along run
    # antenna labels survive
    assert set(np.asarray(out.antenna1)) <= set(o["antenna1"])


def test_bda_compresses_short_baselines_more(bda_obs):
    o = bda_obs
    meta = bda_mapper(
        o["time"], o["interval"], o["antenna1"], o["antenna2"], o["uvw"],
        o["chan_width"], o["chan_freq"], 1.0, decorrelation=0.95,
    )
    # count output bins per baseline: short baseline (scale 10) must have
    # no more bins than the long one (scale 8000)
    nbl, ntime, nchan = o["nbl"], o["ntime"], o["nchan"]
    bins = {}
    for b in range(nbl):
        rows = np.arange(b, ntime * nbl, nbl)
        bins[b] = len(set(meta.map[rows].ravel().tolist()))
    assert bins[0] <= bins[2]


def test_bda_mapper_reference_invariants(bda_obs):
    """The reference's test_bda_mapper structural assertions
    (averaging/tests/test_bda_mapping.py:231-273): first-channel map
    values enumerate the offsets; the per-bin channel count divides
    nchan exactly; decorr_chan_width = total bandwidth / num_chan."""
    o = bda_obs
    meta = bda_mapper(
        o["time"], o["interval"], o["antenna1"], o["antenna2"], o["uvw"],
        o["chan_width"], o["chan_freq"],
        max_uvw_dist=np.sqrt((o["uvw"] ** 2).sum(axis=1)).max(),
        decorrelation=0.95,
    )
    nrow = o["time"].shape[0]
    offsets = np.unique(np.asarray(meta.map)[np.arange(nrow), 0])
    assert_array_equal(offsets, np.asarray(meta.offsets)[:-1])
    assert np.asarray(meta.map).max() + 1 == meta.offsets[-1]

    num_chan = np.diff(np.asarray(meta.offsets))
    _, remainder = np.divmod(o["chan_width"].shape[0], num_chan)
    assert np.all(remainder == 0)
    decorr_cw = o["chan_width"].sum() / num_chan
    assert_allclose(np.asarray(meta.decorr_chan_width), decorr_cw)


@pytest.mark.parametrize("decorrelation", [0.90, 0.95, 0.99])
def test_bda_decorrelation_monotone(bda_obs, decorrelation):
    """Lower decorrelation tolerance must never produce MORE compression
    (a monotonicity property of the sinc-based bin growth)."""
    o = bda_obs
    mx = np.sqrt((o["uvw"] ** 2).sum(axis=1)).max()

    def nout(d):
        meta = bda_mapper(
            o["time"], o["interval"], o["antenna1"], o["antenna2"],
            o["uvw"], o["chan_width"], o["chan_freq"],
            max_uvw_dist=mx, decorrelation=d,
        )
        return meta.time.shape[0]

    assert nout(decorrelation) <= nout(min(decorrelation + 0.04, 0.999))
