"""Time+channel averaging parity vs literal numpy oracles of the reference
loops (averaging/time_and_channel_mapping.py, time_and_channel_avg.py)."""

import numpy as np
from numpy.testing import assert_allclose, assert_array_equal
import pytest

from africanus_tpu.averaging import (
    row_mapper,
    channel_mapper,
    row_average,
    row_chan_average,
    chan_average,
    time_and_channel,
)


@pytest.fixture
def synth_obs(rng):
    """Synthesised observation: 3 baselines x 6 times, interval 1s."""
    ntime, nbl = 6, 3
    ants = [(0, 1), (0, 2), (1, 2)]
    time = np.repeat(np.arange(ntime, dtype=np.float64) * 1.0 + 5000.0, nbl)
    interval = np.full(time.shape, 1.0)
    antenna1 = np.array([a for _ in range(ntime) for a, _ in ants])
    antenna2 = np.array([b for _ in range(ntime) for _, b in ants])
    flag_row = (rng.uniform(size=time.shape) < 0.3).astype(np.uint8)
    return time, interval, antenna1, antenna2, flag_row


def test_channel_mapper():
    chan_map, out_chans = channel_mapper(10, 3)
    assert_array_equal(chan_map, [0, 0, 0, 1, 1, 1, 2, 2, 2, 3])
    assert out_chans == 4


def test_row_mapper_bins(synth_obs):
    time, interval, a1, a2, flag_row = synth_obs
    meta = row_mapper(time, interval, a1, a2, flag_row=flag_row, time_bin_secs=2.0)

    nbl = 3
    # 6 times, bins of 2s with 1s intervals -> 3 bins per baseline
    assert meta.time.shape[0] == 3 * nbl
    # each input row maps somewhere valid
    assert meta.map.max() < meta.time.shape[0]
    # intervals sum to 2 per bin
    assert_allclose(meta.interval, 2.0)
    # recompute time average using the map (docstring invariant,
    # time_and_channel_mapping.py:133-147)
    counts = np.zeros(meta.time.shape[0])
    tsum = np.zeros(meta.time.shape[0])
    np.add.at(tsum, meta.map, time)
    np.add.at(counts, meta.map, 1)
    assert_allclose(tsum / counts, meta.time, rtol=1e-12)
    # bin flagged iff all contributing rows flagged
    fsum = np.zeros(meta.time.shape[0])
    np.add.at(fsum, meta.map, flag_row)
    assert_array_equal(meta.flag_row.astype(bool), fsum == counts)


def test_row_mapper_duplicate_rows(synth_obs):
    time, interval, a1, a2, _ = synth_obs
    time2 = time.copy()
    time2[3] = time2[0]  # duplicate (time, bl)
    with pytest.raises(ValueError, match="Duplicate"):
        row_mapper(time2, interval, a1, a2)


def test_row_average(rng, synth_obs):
    time, interval, a1, a2, flag_row = synth_obs
    nrow = time.shape[0]
    meta = row_mapper(time, interval, a1, a2, flag_row=flag_row, time_bin_secs=2.0)
    out_rows = meta.time.shape[0]

    uvw = rng.normal(size=(nrow, 3))
    tc = time + rng.normal(scale=0.01, size=nrow)
    exp = interval * 0.9
    weight = rng.uniform(0.5, 2.0, (nrow, 2))
    sigma = rng.uniform(0.5, 2.0, (nrow, 2))

    out = row_average(meta, a1, a2, flag_row=flag_row, time_centroid=tc,
                      exposure=exp, uvw=uvw, weight=weight, sigma=sigma)

    # oracle: literal reference loops
    counts = np.zeros(out_rows)
    uvw_o = np.zeros((out_rows, 3))
    tc_o = np.zeros(out_rows)
    exp_o = np.zeros(out_rows)
    w_o = np.zeros((out_rows, 2))
    s_o = np.zeros((out_rows, 2))
    sw_o = np.zeros((out_rows, 2))
    a1_o = np.zeros(out_rows, a1.dtype)
    a2_o = np.zeros(out_rows, a2.dtype)
    for ri, ro in enumerate(meta.map):
        if flag_row[ri] == meta.flag_row[ro]:
            uvw_o[ro] += uvw[ri]
            tc_o[ro] += tc[ri]
            exp_o[ro] += exp[ri]
            w_o[ro] += weight[ri]
            s_o[ro] += sigma[ri] ** 2 * weight[ri] ** 2
            sw_o[ro] += weight[ri]
            counts[ro] += 1
        a1_o[ro] = a1[ri]
        a2_o[ro] = a2[ri]
    pos = counts > 0
    uvw_o[pos] /= counts[pos, None]
    tc_o[pos] /= counts[pos]
    s_o = np.where(sw_o != 0, s_o / np.where(sw_o == 0, 1, sw_o) ** 2, s_o)
    s_o = np.sqrt(s_o)

    assert_array_equal(np.asarray(out.antenna1), a1_o)
    assert_array_equal(np.asarray(out.antenna2), a2_o)
    assert_allclose(np.asarray(out.uvw), uvw_o, rtol=1e-12)
    assert_allclose(np.asarray(out.time_centroid), tc_o, rtol=1e-12)
    assert_allclose(np.asarray(out.exposure), exp_o, rtol=1e-12)
    assert_allclose(np.asarray(out.weight), w_o, rtol=1e-12)
    assert_allclose(np.asarray(out.sigma), s_o, rtol=1e-12)


def np_row_chan_avg(meta, chan_meta, flag_row, vis, flag, ws):
    """Literal oracle of reference row_chan_average (vis + weight_spectrum)."""
    chan_map, out_chans = chan_meta
    out_rows = meta.time.shape[0]
    nrow, nchan, ncorr = vis.shape
    out_shape = (out_rows, out_chans, ncorr)

    counts = np.zeros(out_shape, np.uint32)
    for ri, ro in enumerate(meta.map):
        rf = flag_row[ri] != 0
        for fi, fo in enumerate(chan_map):
            for co in range(ncorr):
                flagged = rf or flag[ri, fi, co] != 0
                if not flagged:
                    counts[ro, fo, co] += 1

    out_flag = counts == 0
    vis_o = np.zeros(out_shape, vis.dtype)
    wsum = np.zeros(out_shape)
    ws_o = np.zeros(out_shape)
    for ri, ro in enumerate(meta.map):
        rf = flag_row[ri] != 0
        for fi, fo in enumerate(chan_map):
            for co in range(ncorr):
                flagged = rf or flag[ri, fi, co] != 0
                if flagged != out_flag[ro, fo, co]:
                    continue
                w = ws[ri, fi, co]
                vis_o[ro, fo, co] += vis[ri, fi, co] * w
                wsum[ro, fo, co] += w
                ws_o[ro, fo, co] += w
    sel = wsum != 0
    vis_o[sel] /= wsum[sel]
    return vis_o, out_flag, ws_o


def test_row_chan_average(rng, synth_obs):
    time, interval, a1, a2, flag_row = synth_obs
    nrow = time.shape[0]
    nchan, ncorr = 8, 2
    meta = row_mapper(time, interval, a1, a2, flag_row=flag_row, time_bin_secs=2.0)
    chan_meta = channel_mapper(nchan, 4)

    vis = rng.normal(size=(nrow, nchan, ncorr)) + 1j * rng.normal(
        size=(nrow, nchan, ncorr)
    )
    flag = rng.uniform(size=vis.shape) < 0.2
    ws = rng.uniform(0.5, 2.0, vis.shape)

    out = row_chan_average(meta, chan_meta, flag_row=flag_row,
                           visibilities=vis, flag=flag, weight_spectrum=ws)
    vis_o, flag_o, ws_o = np_row_chan_avg(meta, chan_meta, flag_row, vis,
                                          flag, ws)
    assert_allclose(np.asarray(out.visibilities), vis_o, rtol=1e-11, atol=1e-12)
    assert_array_equal(np.asarray(out.flag), flag_o)
    assert_allclose(np.asarray(out.weight_spectrum), ws_o, rtol=1e-12)


def test_row_chan_average_tuple_vis(rng, synth_obs):
    """Tuple-of-visibilities input (reference @intrinsic tuple support)."""
    time, interval, a1, a2, flag_row = synth_obs
    nrow, nchan, ncorr = time.shape[0], 4, 1
    meta = row_mapper(time, interval, a1, a2, flag_row=flag_row, time_bin_secs=2.0)
    chan_meta = channel_mapper(nchan, 2)
    v1 = rng.normal(size=(nrow, nchan, ncorr)) + 0j
    v2 = rng.normal(size=(nrow, nchan, ncorr)) + 0j
    flag = np.zeros(v1.shape, bool)

    out = row_chan_average(meta, chan_meta, flag_row=flag_row,
                           visibilities=(v1, v2), flag=flag)
    single1 = row_chan_average(meta, chan_meta, flag_row=flag_row,
                               visibilities=v1, flag=flag)
    assert isinstance(out.visibilities, tuple)
    assert_allclose(np.asarray(out.visibilities[0]),
                    np.asarray(single1.visibilities), rtol=1e-12)


def test_chan_average(rng):
    nchan = 9
    chan_meta = channel_mapper(nchan, 3)
    freq = np.linspace(1e9, 2e9, nchan)
    width = np.full(nchan, 1e6)
    out = chan_average(chan_meta, chan_freq=freq, chan_width=width)
    assert_allclose(np.asarray(out.chan_freq), freq.reshape(3, 3).mean(axis=1))
    assert_allclose(np.asarray(out.chan_width), 3e6)


def test_time_and_channel_end_to_end(rng, synth_obs):
    time, interval, a1, a2, flag_row = synth_obs
    nrow, nchan, ncorr = time.shape[0], 6, 2
    vis = rng.normal(size=(nrow, nchan, ncorr)) + 1j * rng.normal(
        size=(nrow, nchan, ncorr)
    )
    flag = rng.uniform(size=vis.shape) < 0.2
    # the reference validates flag_row against flag (merge_flags,
    # shared.py:19): a row is row-flagged iff every flag is set
    fr_bool = np.asarray(flag_row).astype(bool)
    flag[fr_bool] = True
    full = flag.reshape(nrow, -1).all(axis=1) & ~fr_bool
    flag[full, 0, 0] = False
    freq = np.linspace(1e9, 2e9, nchan)

    out = time_and_channel(
        time, interval, a1, a2, flag_row=flag_row, visibilities=vis,
        flag=flag, chan_freq=freq, time_bin_secs=2.0, chan_bin_size=2,
    )
    assert out.time.shape[0] == 9
    assert np.asarray(out.visibilities).shape == (9, 3, ncorr)
    assert out.chan_freq.shape[0] == 3
    assert out.flag.shape == (9, 3, ncorr)
    # averaging with bin size 1 in both axes is (sorted) identity
    out_id = time_and_channel(
        time, interval, a1, a2, flag_row=flag_row, visibilities=vis,
        flag=flag, chan_freq=freq, time_bin_secs=1.0, chan_bin_size=1,
    )
    assert out_id.time.shape[0] == nrow
    got = np.asarray(out_id.visibilities)[np.asarray(out_id.time).argsort(kind="stable")]
    # identity map: every output row contains exactly its input row's data
    perm = np.asarray(row_mapper(time, interval, a1, a2,
                                 flag_row=flag_row, time_bin_secs=1.0).map)
    assert_allclose(np.asarray(out_id.visibilities)[perm], vis, rtol=1e-12)


def test_merge_flags(rng):
    from africanus_tpu.averaging import merge_flags

    flag = rng.uniform(size=(10, 4, 2)) < 0.4
    derived = merge_flags(None, flag)
    assert_array_equal(derived.astype(bool),
                       flag.reshape(10, -1).all(axis=1))

    fr = derived
    assert merge_flags(fr, flag) is fr  # consistent pair validates
    assert merge_flags(fr, None) is fr
    assert merge_flags(None, None) is None
    bad = fr.copy()
    bad[0] = 1 - bad[0]
    with pytest.raises(ValueError, match="mismatch"):
        merge_flags(bad, flag)


def test_row_chan_average_nonuniform_chan_map(rng, synth_obs):
    """Arbitrary (non channel_mapper) channel maps take the scatter
    fallback and must agree with the oracle."""
    time, interval, a1, a2, flag_row = synth_obs
    nrow, nchan, ncorr = time.shape[0], 7, 2
    meta = row_mapper(time, interval, a1, a2, flag_row=flag_row,
                      time_bin_secs=2.0)
    # ragged bins: sizes 1, 2, 4
    chan_map = np.array([0, 1, 1, 2, 2, 2, 2])
    chan_meta = (chan_map, 3)

    vis = rng.normal(size=(nrow, nchan, ncorr)) + 1j * rng.normal(
        size=(nrow, nchan, ncorr)
    )
    flag = rng.uniform(size=vis.shape) < 0.2
    ws = rng.uniform(0.5, 2.0, vis.shape)

    out = row_chan_average(meta, chan_meta, flag_row=flag_row,
                           visibilities=vis, flag=flag, weight_spectrum=ws)
    vis_o, flag_o, ws_o = np_row_chan_avg(meta, chan_meta, flag_row, vis,
                                          flag, ws)
    assert_allclose(np.asarray(out.visibilities), vis_o, rtol=1e-11,
                    atol=1e-12)
    assert_array_equal(np.asarray(out.flag), flag_o)
    assert_allclose(np.asarray(out.weight_spectrum), ws_o, rtol=1e-12)


def _oracle_bins(time, interval, a1, a2, flag_row, time_bin_secs):
    """Independent transcription of the reference's binning semantics
    (averaging/tests/test_time_and_channel_averaging.py:140-201): per
    baseline, a bin closes when time + interval/2 − bin_low exceeds
    time_bin_secs; unflagged ("effective") rows define the bin content
    unless the whole bin is flagged, in which case the nominal rows do.
    Returns a list of (avg_time, (a, b), effective_rows, nominal_rows)
    sorted on averaged time."""
    out = []
    for (p, q) in {(x, y) for x, y in zip(a1, a2)}:
        rows = [i for i in np.argsort(time, kind="stable")
                if a1[i] == p and a2[i] == q]
        eff, nom, bin_low = [], [], None
        bins = []
        for ri in rows:
            half = interval[ri] / 2
            if not nom:
                bin_low = time[ri] - half
            elif time[ri] + half - bin_low > time_bin_secs:
                bins.append((eff or nom, nom))
                eff, nom = [], []
                bin_low = time[ri] - half
            if not flag_row[ri]:
                eff.append(ri)
            nom.append(ri)
        if nom:
            bins.append((eff or nom, nom))
        out.extend(
            (time[np.array(n)].mean(), (p, q), e, n) for e, n in bins
        )
    return sorted(out, key=lambda t: (t[0], t[1]))


@pytest.mark.parametrize("flagged_rows", [[], [8, 9], [4], [0, 1]])
@pytest.mark.parametrize("time_bin_secs", [1, 2, 3, 4])
@pytest.mark.parametrize("chan_bin_size", [1, 3, 5])
def test_averager_sweep(rng, flagged_rows, time_bin_secs, chan_bin_size):
    """The reference's test_averager sweep: averaged times/visibilities
    against a from-scratch python oracle over every (flagging, time bin,
    channel bin) combination."""
    ntime, nchan, ncorr = 5, 5, 2
    ants = [(0, 1), (0, 2), (1, 2)]
    time = np.repeat(np.arange(ntime, dtype=np.float64) + 5000.0,
                     len(ants))
    interval = np.full(time.shape, 1.0)
    a1 = np.array([a for _ in range(ntime) for a, _ in ants])
    a2 = np.array([b for _ in range(ntime) for _, b in ants])
    flag_row = np.zeros(time.shape, np.uint8)
    flag_row[flagged_rows] = 1
    nrow = time.shape[0]
    vis = rng.normal(size=(nrow, nchan, ncorr)) + 1j * rng.normal(
        size=(nrow, nchan, ncorr)
    )
    freq = np.linspace(1e9, 2e9, nchan)

    out = time_and_channel(
        time, interval, a1, a2, flag_row=flag_row, visibilities=vis,
        chan_freq=freq, time_bin_secs=float(time_bin_secs),
        chan_bin_size=chan_bin_size,
    )
    got_time = np.asarray(out.time)
    got_vis = np.asarray(out.visibilities)
    got_fr = np.asarray(out.flag_row)

    bins = _oracle_bins(time, interval, a1, a2, flag_row, time_bin_secs)
    assert got_time.shape[0] == len(bins)

    # match output rows to oracle bins via (time, baseline)
    order = np.lexsort((np.asarray(out.antenna2), np.asarray(out.antenna1),
                        got_time))
    nchan_out = -(-nchan // chan_bin_size)
    for k, (t_avg, (p, q), erows, nrows) in enumerate(bins):
        r = order[k]
        assert_allclose(got_time[r], t_avg, rtol=1e-12)
        assert (np.asarray(out.antenna1)[r],
                np.asarray(out.antenna2)[r]) == (p, q)
        assert got_fr[r] == (1 if all(flag_row[i] for i in nrows) else 0)
        e = np.array(erows)
        for cb in range(nchan_out):
            ch = slice(cb * chan_bin_size,
                       min((cb + 1) * chan_bin_size, nchan))
            want = vis[e, ch].mean(axis=(0, 1))
            assert_allclose(got_vis[r, cb], want, rtol=1e-10)


@pytest.mark.parametrize("time_bin_secs", [2, 3])
@pytest.mark.parametrize("chan_bin_size", [2, 5])
def test_averager_weighted_sigma_sweep(rng, time_bin_secs, chan_bin_size):
    """Weighted-visibility and sigma_spectrum semantics against the
    reference's formulas (test_time_and_channel_averaging.py _calc_sigma:
    sigma_out² = Σσ²w² / (Σw)²; vis_out = Σ w·v / Σw)."""
    ntime, nchan, ncorr = 4, 10, 2
    ants = [(0, 1), (1, 2)]
    time = np.repeat(np.arange(ntime, dtype=np.float64) + 100.0, len(ants))
    interval = np.full(time.shape, 1.0)
    a1 = np.array([a for _ in range(ntime) for a, _ in ants])
    a2 = np.array([b for _ in range(ntime) for _, b in ants])
    nrow = time.shape[0]
    vis = rng.normal(size=(nrow, nchan, ncorr)) + 1j * rng.normal(
        size=(nrow, nchan, ncorr)
    )
    ws = rng.uniform(0.5, 2.0, (nrow, nchan, ncorr))
    ss = rng.uniform(0.5, 2.0, (nrow, nchan, ncorr))
    freq = np.linspace(1e9, 2e9, nchan)

    out = time_and_channel(
        time, interval, a1, a2, visibilities=vis, weight_spectrum=ws,
        sigma_spectrum=ss, chan_freq=freq,
        time_bin_secs=float(time_bin_secs), chan_bin_size=chan_bin_size,
    )
    got_vis = np.asarray(out.visibilities)
    got_ws = np.asarray(out.weight_spectrum)
    got_ss = np.asarray(out.sigma_spectrum)

    bins = _oracle_bins(time, interval, a1, a2,
                        np.zeros(nrow, np.uint8), time_bin_secs)
    order = np.lexsort((np.asarray(out.antenna2), np.asarray(out.antenna1),
                        np.asarray(out.time)))
    nchan_out = -(-nchan // chan_bin_size)
    for k, (t_avg, (p, q), erows, nrows) in enumerate(bins):
        r = order[k]
        e = np.array(erows)
        for cb in range(nchan_out):
            ch = slice(cb * chan_bin_size,
                       min((cb + 1) * chan_bin_size, nchan))
            w = ws[e, ch].reshape(-1, ncorr)
            v = vis[e, ch].reshape(-1, ncorr)
            s = ss[e, ch].reshape(-1, ncorr)
            wsum = w.sum(axis=0)
            assert_allclose(got_vis[r, cb], (w * v).sum(0) / wsum,
                            rtol=1e-10)
            assert_allclose(got_ws[r, cb], wsum, rtol=1e-10)
            want_sig = np.sqrt((s**2 * w**2).sum(0) / wsum**2)
            assert_allclose(got_ss[r, cb], want_sig, rtol=1e-10)


def test_chan_average_all_fields_and_ragged_tail(rng):
    """Field semantics (reference chan_average:681): chan_freq averages,
    chan_width/effective_bw/resolution sum — including a ragged final
    bin when the bin size does not divide nchan."""
    nchan, size = 10, 4  # bins of 4, 4, 2
    chan_meta = channel_mapper(nchan, size)
    freq = np.linspace(1e9, 2e9, nchan)
    width = rng.uniform(1e5, 2e5, nchan)
    ebw = rng.uniform(1e5, 2e5, nchan)
    res = rng.uniform(1e5, 2e5, nchan)
    out = chan_average(chan_meta, chan_freq=freq, chan_width=width,
                       effective_bw=ebw, resolution=res)
    bins = [slice(0, 4), slice(4, 8), slice(8, 10)]
    assert_allclose(np.asarray(out.chan_freq),
                    [freq[b].mean() for b in bins], rtol=1e-12)
    assert_allclose(np.asarray(out.chan_width),
                    [width[b].sum() for b in bins], rtol=1e-12)
    assert_allclose(np.asarray(out.effective_bw),
                    [ebw[b].sum() for b in bins], rtol=1e-12)
    assert_allclose(np.asarray(out.resolution),
                    [res[b].sum() for b in bins], rtol=1e-12)
    # absent fields stay None
    out2 = chan_average(chan_meta, chan_freq=freq)
    assert out2.chan_width is None and out2.resolution is None


def test_row_average_field_semantics(rng, synth_obs):
    """Row-level fields (reference row_average:76): time_centroid and
    exposure average/sum over *effective* rows; uvw/weight/sigma follow
    the documented weighting."""
    time, interval, a1, a2, flag_row = synth_obs
    meta = row_mapper(time, interval, a1, a2, flag_row=flag_row,
                      time_bin_secs=2.0)
    nrow = time.shape[0]
    tc = time + rng.uniform(0, 0.5, nrow)
    exp = rng.uniform(0.5, 1.5, nrow)
    out = row_average(meta, a1, a2, flag_row=flag_row,
                      time_centroid=tc, exposure=exp)
    m = np.asarray(meta.map)
    fr = np.asarray(flag_row, bool)
    for ro in range(np.asarray(out.antenna1).shape[0]):
        rows = np.nonzero(m == ro)[0]
        eff = rows[~fr[rows]] if (~fr[rows]).any() else rows
        assert_allclose(np.asarray(out.time_centroid)[ro],
                        tc[eff].mean(), rtol=1e-12)
        assert_allclose(np.asarray(out.exposure)[ro], exp[eff].sum(),
                        rtol=1e-12)


def test_time_and_channel_derives_flag_row_from_flag(rng):
    """FLAG without FLAG_ROW (the common MS case): fully-flagged rows
    must be excluded from row averages and the output flag_row derived
    (reference time_and_channel_avg.py:902 merge_flags)."""
    time = np.array([1.0, 2.0])  # same baseline, one 2 s bin
    interval = np.ones(2)
    a1 = np.zeros(2, np.int32)
    a2 = np.ones(2, np.int32)
    uvw = np.array([[10.0, 0, 0], [20.0, 0, 0]])
    vis = np.ones((2, 1, 1), np.complex128)
    flag = np.array([[[0]], [[1]]], np.uint8)  # row 1 fully flagged

    out = time_and_channel(
        time, interval, a1, a2, uvw=uvw, visibilities=vis, flag=flag,
        time_bin_secs=2.0,
    )
    assert out.flag_row is not None
    assert out.time.shape[0] == 1
    # only the unflagged row contributes to the uvw bin average
    assert_allclose(np.asarray(out.uvw)[0], [10.0, 0, 0])


def test_bda_derives_flag_row_from_flag(rng):
    """Same contract for BDA (reference bda_avg.py:820)."""
    from africanus_tpu.averaging import bda

    nrow, nchan = 6, 4
    time = np.repeat([1.0, 2.0, 3.0], 2)
    interval = np.ones(nrow)
    a1 = np.tile([0, 0], 3).astype(np.int32)
    a2 = np.tile([1, 2], 3).astype(np.int32)
    uvw = rng.normal(size=(nrow, 3)) * 10
    freq = np.linspace(1e9, 1.1e9, nchan)
    width = np.full(nchan, 0.1e9 / nchan)
    vis = rng.normal(size=(nrow, nchan, 1)) + 0j
    flag = np.zeros((nrow, nchan, 1), np.uint8)
    flag[1] = 1  # one row fully flagged

    out = bda(time, interval, a1, a2, uvw=uvw, chan_freq=freq,
              chan_width=width, visibilities=vis, flag=flag,
              decorrelation=0.95)
    assert out.flag_row is not None
    arr = np.asarray(out.flag_row)
    assert arr.any() and not arr.all()


def test_bda_requires_uvw():
    from africanus_tpu.averaging import bda

    with pytest.raises(TypeError, match="uvw"):
        bda(np.array([1.0]), np.ones(1), np.zeros(1, np.int32),
            np.ones(1, np.int32), chan_freq=np.array([1e9]),
            chan_width=np.array([1e6]))
