"""Time and channel averaging of visibility data.

TPU-native equivalent of reference
``africanus/averaging/time_and_channel_avg.py`` (time_and_channel:764,
row_average:76, row_chan_average:414, chan_average:681). The reference's
per-row/chan/corr accumulation loops become vectorised scatter-adds
(``.at[map].add`` → XLA segment sums) with flag-consistency masks; output
shapes are static because the row/channel maps are built on the host
(time_and_channel_mapping.py).

Effective averaging semantics (reference :556-594): flagged samples are
excluded from a bin unless the *whole* bin is flagged, in which case the
flagged samples define it; a sample contributes only when its flag state
matches the output bin's flag state.

Visibility-like inputs may be single arrays (complex on CPU), Cplx pairs,
or tuples thereof (the reference's @intrinsic tuple handling,
time_and_channel_avg.py:278).

Performance note: XLA scatter on TPU caps at ~1.4e8 elements/s, so the
(row, chan, corr) accumulations are instead expressed as *padded
gather+sum*: the host builds, per output bin, the (padded) list of
contributing input rows; the device gathers whole row payloads
(contiguous, bandwidth-bound) and mask-reduces. Channel bins from
``channel_mapper`` are contiguous/uniform and reduce by reshape. A
scatter fallback remains for arbitrary user-supplied channel maps.
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np
import jax
import jax.numpy as jnp

from africanus_tpu.averaging.time_and_channel_mapping import (
    channel_mapper,
    row_mapper,
)

__all__ = [
    "row_average",
    "row_chan_average",
    "chan_average",
    "time_and_channel",
    "RowAverageOutput",
    "RowChanAverageOutput",
    "ChannelAverageOutput",
    "AverageOutput",
]

_row_output_fields = [
    "antenna1",
    "antenna2",
    "time_centroid",
    "exposure",
    "uvw",
    "weight",
    "sigma",
]
RowAverageOutput = namedtuple("RowAverageOutput", _row_output_fields)

_rowchan_output_fields = ["visibilities", "flag", "weight_spectrum", "sigma_spectrum"]
RowChanAverageOutput = namedtuple("RowChanAverageOutput", _rowchan_output_fields)

_chan_output_fields = ["chan_freq", "chan_width", "effective_bw", "resolution"]
ChannelAverageOutput = namedtuple("ChannelAverageOutput", _chan_output_fields)

AverageOutput = namedtuple(
    "AverageOutput",
    ["time", "interval", "flag_row"]
    + _row_output_fields
    + _chan_output_fields
    + _rowchan_output_fields,
)


from africanus_tpu.utils.plancache import LRUCache, content_key

_GATHER_TABLE_CACHE = LRUCache(8)


def _bin_gather_table(row_map, out_rows):
    """Host-side inverse of a row map: (out_rows, R) input-row indices +
    validity mask, R = largest bin. Content-cached: selfcal loops call
    the averager every iteration with identical maps, and both the row
    and row-chan stages need the same table."""
    row_map = np.asarray(row_map)
    key = content_key((row_map,), int(out_rows))
    hit = _GATHER_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    return _GATHER_TABLE_CACHE.put(
        key, _bin_gather_table_impl(row_map, out_rows)
    )


def _bin_gather_table_impl(row_map, out_rows):
    nrow = row_map.shape[0]
    order = np.argsort(row_map, kind="stable")
    counts = np.bincount(row_map, minlength=out_rows)
    r = max(int(counts.max()), 1) if nrow else 1
    starts = np.zeros(out_rows, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    slot = np.arange(nrow) - starts[row_map[order]]
    row_sel = np.zeros((out_rows, r), np.int32)
    row_valid = np.zeros((out_rows, r), bool)
    row_sel[row_map[order], slot] = order
    row_valid[row_map[order], slot] = True
    return row_sel, row_valid


def _uniform_chan_bins(chan_map, out_chans):
    """(bin_size, chan_valid) when channel bins are the contiguous uniform
    layout produced by channel_mapper, else None."""
    chan_map = np.asarray(chan_map)
    nchan = chan_map.shape[0]
    if nchan == 0 or out_chans == 0:
        return None
    b = -(-nchan // out_chans)
    if not np.array_equal(chan_map, np.arange(nchan) // b):
        return None
    valid = (np.arange(out_chans)[:, None] * b + np.arange(b)) < nchan
    return b, valid


def _tree_scatter_add(out_shape_leaf, tree, idx, mask=None):
    """Scatter-add every leaf of ``tree`` (array/Cplx/tuple) at ``idx``."""

    def one(x):
        x = jnp.asarray(x)
        if mask is not None:
            x = x * mask.astype(x.dtype)
        return jnp.zeros(out_shape_leaf(x), x.dtype).at[idx].add(x)

    return jax.tree_util.tree_map(one, tree)


def row_average(
    meta,
    ant1,
    ant2,
    flag_row=None,
    time_centroid=None,
    exposure=None,
    uvw=None,
    weight=None,
    sigma=None,
):
    """Average row-indexed columns into output bins (reference
    row_average:76-258). ``meta`` is a RowMapOutput."""
    row_map_np = np.asarray(meta.map)
    out_rows = meta.time.shape[0]
    row_sel_np, row_valid_np = _bin_gather_table(row_map_np, out_rows)
    return _row_average_core(
        jnp.asarray(row_sel_np), jnp.asarray(row_valid_np),
        jnp.asarray(row_map_np.astype(np.int32)),
        None if meta.flag_row is None else jnp.asarray(meta.flag_row),
        ant1, ant2, flag_row, time_centroid, exposure, uvw, weight, sigma,
    )


def _row_average_core(row_sel, row_valid, map32, meta_flag_row,
                      ant1, ant2, flag_row, time_centroid, exposure,
                      uvw, weight, sigma):
    out_rows = row_sel.shape[0]
    ant1 = jnp.asarray(ant1)
    ant2 = jnp.asarray(ant2)

    if flag_row is not None and meta_flag_row is not None:
        match_in = jnp.asarray(flag_row) == meta_flag_row[map32]
        match = match_in[row_sel] & row_valid
    else:
        match = row_valid

    counts = match.sum(axis=1, dtype=jnp.uint32)

    def _masked(x):
        shape = (1,) * (x.ndim - 2)
        return jnp.where(match.reshape(match.shape + shape), x, 0)

    def mean_rows(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        acc = _masked(x[row_sel]).sum(axis=1)
        c = counts.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return jnp.where(c > 0, acc / jnp.maximum(c, 1), acc)

    def sum_rows(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        return _masked(x[row_sel]).sum(axis=1)

    # reference loop semantics: the *last* contributing row's antenna wins
    last = row_sel[
        jnp.arange(out_rows),
        jnp.maximum(row_valid.sum(axis=1) - 1, 0),
    ]
    ant1_avg = ant1[last]
    ant2_avg = ant2[last]

    uvw_avg = mean_rows(uvw)
    tc_avg = mean_rows(time_centroid)
    exp_avg = sum_rows(exposure)
    weight_avg = sum_rows(weight)

    sigma_avg = None
    if sigma is not None:
        sigma = jnp.asarray(sigma)
        if weight is not None:
            wt = jnp.asarray(weight)
        else:
            wt = jnp.ones_like(sigma)
        acc = _masked((sigma**2 * wt**2)[row_sel]).sum(axis=1)
        wsum = _masked(wt[row_sel]).sum(axis=1)
        acc = jnp.where(
            wsum != 0.0, acc / jnp.where(wsum == 0.0, 1.0, wsum) ** 2, acc
        )
        sigma_avg = jnp.sqrt(acc)

    return RowAverageOutput(
        ant1_avg, ant2_avg, tc_avg, exp_avg, uvw_avg, weight_avg, sigma_avg
    )


def _flags_and_counts(row_map, chan_map, out_shape, flag_row, flag, in_shape):
    """Input flag state, output bin flags and the contribution mask."""
    nrow, nchan, ncorr = in_shape
    if flag_row is not None:
        rf = (jnp.asarray(flag_row) != 0)[:, None, None]
    else:
        rf = jnp.zeros((nrow, 1, 1), bool)
    if flag is not None:
        ff = jnp.asarray(flag) != 0
        flagged_in = rf | ff
    else:
        flagged_in = jnp.broadcast_to(rf, in_shape)

    idx = (row_map[:, None], chan_map[None, :])
    counts = jnp.zeros(out_shape, jnp.uint32).at[idx].add(
        (~flagged_in).astype(jnp.uint32)
    )
    out_flag = counts == 0  # completely flagged bins (all covered bins have data)
    match = flagged_in == out_flag[row_map[:, None], chan_map[None, :]]
    return flagged_in, out_flag, match


def row_chan_average(
    row_meta,
    chan_meta,
    flag_row=None,
    weight=None,
    visibilities=None,
    flag=None,
    weight_spectrum=None,
    sigma_spectrum=None,
):
    """Average (row, chan, corr) data into output bins (reference
    row_chan_average:414-660).

    Contiguous/uniform channel bins (the ``channel_mapper`` layout) take
    the padded gather+sum fast path; arbitrary channel maps fall back to
    scatter-adds.
    """
    chan_map_np, out_chans = chan_meta

    # infer (nchan, ncorr) from whichever input is present
    probe = None
    for cand in (visibilities, flag, weight_spectrum, sigma_spectrum):
        if cand is not None:
            probe = cand
            break
    if probe is None:
        return RowChanAverageOutput(None, None, None, None)
    leaf = jax.tree_util.tree_leaves(probe)[0]
    nrow, nchan, ncorr = leaf.shape

    ucb = _uniform_chan_bins(chan_map_np, out_chans)
    if ucb is not None:
        return _row_chan_average_gather(
            row_meta, out_chans, ucb, flag_row, weight, visibilities, flag,
            weight_spectrum, sigma_spectrum, nrow, nchan, ncorr,
        )
    return _row_chan_average_scatter(
        row_meta, chan_meta, flag_row, weight, visibilities, flag,
        weight_spectrum, sigma_spectrum, nrow, nchan, ncorr,
    )


def _row_chan_average_gather(row_meta, out_chans, ucb, flag_row, weight,
                             visibilities, flag, weight_spectrum,
                             sigma_spectrum, nrow, nchan, ncorr):
    out_rows = row_meta.time.shape[0]
    _, chan_valid_np = ucb
    row_sel_np, row_valid_np = _bin_gather_table(row_meta.map, out_rows)
    return _row_chan_gather_core(
        jnp.asarray(row_sel_np), jnp.asarray(row_valid_np),
        jnp.asarray(chan_valid_np), flag_row, weight, visibilities,
        flag, weight_spectrum, sigma_spectrum,
    )


def _row_chan_gather_core(row_sel, row_valid, chan_valid, flag_row,
                          weight, visibilities, flag, weight_spectrum,
                          sigma_spectrum):
    # infer shapes from the arrays (jit-safe statics)
    probe = None
    for cand in (visibilities, flag, weight_spectrum, sigma_spectrum):
        if cand is not None:
            probe = cand
            break
    nrow, nchan, ncorr = jax.tree_util.tree_leaves(probe)[0].shape
    out_rows, r = row_sel.shape
    out_chans, bsize = chan_valid.shape
    npad = out_chans * bsize - nchan
    in_shape = (nrow, nchan, ncorr)

    def g(x):
        """(nrow, nchan, ncorr) → (out_rows, R, out_chans, B, ncorr)."""
        x = jnp.asarray(x)
        if npad:
            x = jnp.pad(x, ((0, 0), (0, npad), (0, 0)))
        return x[row_sel].reshape(out_rows, r, out_chans, bsize, ncorr)

    valid = row_valid[:, :, None, None, None] & chan_valid[None, None, :, :,
                                                           None]

    have_flags = flag_row is not None or flag is not None
    if have_flags:
        if flag_row is not None:
            rf = (jnp.asarray(flag_row) != 0)[:, None, None]
        else:
            rf = jnp.zeros((nrow, 1, 1), bool)
        if flag is not None:
            flagged_in = rf | (jnp.asarray(flag) != 0)
        else:
            flagged_in = jnp.broadcast_to(rf, in_shape)
        fg = g(flagged_in)
        counts = (valid & ~fg).sum(axis=(1, 3), dtype=jnp.uint32)
        out_flag = counts == 0
        match = (fg == out_flag[:, None, :, None, :]) & valid
    else:
        out_flag = None
        match = valid

    flag_avg = out_flag if flag is not None else None

    def wt_of():
        if weight_spectrum is not None:
            return jnp.asarray(weight_spectrum)
        if weight is not None:
            w = jnp.asarray(weight)
            return jnp.broadcast_to(w[:, None, :], in_shape)
        return jnp.ones(in_shape)

    def msum(x):
        return jnp.where(match, x, 0).sum(axis=(1, 3))

    vis_avg = None
    if visibilities is not None:
        wg = g(wt_of())
        wsum = msum(wg)
        safe_wsum = jnp.where(wsum == 0.0, 1.0, wsum)

        def avg_one(v):
            acc = msum(g(v) * wg.astype(jnp.asarray(v).dtype))
            return jnp.where(wsum != 0.0, acc / safe_wsum.astype(acc.dtype),
                             acc)

        vis_avg = jax.tree_util.tree_map(avg_one, visibilities)

    ws_avg = None
    if weight_spectrum is not None:
        ws_avg = msum(g(weight_spectrum))

    ss_avg = None
    if sigma_spectrum is not None:
        ss = jnp.asarray(sigma_spectrum)
        wt = wt_of()
        acc = msum(g(ss**2 * wt**2))
        wsum = msum(g(wt))
        acc = jnp.where(
            wsum != 0.0, acc / jnp.where(wsum == 0.0, 1.0, wsum) ** 2, acc
        )
        ss_avg = jnp.sqrt(acc)

    return RowChanAverageOutput(vis_avg, flag_avg, ws_avg, ss_avg)


def _row_chan_average_scatter(row_meta, chan_meta, flag_row, weight,
                              visibilities, flag, weight_spectrum,
                              sigma_spectrum, nrow, nchan, ncorr):
    row_map = jnp.asarray(np.asarray(row_meta.map).astype(np.int32))
    chan_map_np, out_chans = chan_meta
    chan_map = jnp.asarray(np.asarray(chan_map_np).astype(np.int32))
    out_rows = row_meta.time.shape[0]

    in_shape = (nrow, nchan, ncorr)
    out_shape = (out_rows, out_chans, ncorr)
    idx = (row_map[:, None], chan_map[None, :])

    have_flags = flag_row is not None or flag is not None
    if have_flags:
        _, out_flag, match = _flags_and_counts(
            row_map, chan_map, out_shape, flag_row, flag, in_shape
        )
    else:
        out_flag = None
        match = jnp.ones(in_shape, bool)

    flag_avg = out_flag if flag is not None else None

    def wt_of():
        if weight_spectrum is not None:
            return jnp.asarray(weight_spectrum)
        if weight is not None:
            w = jnp.asarray(weight)
            return jnp.broadcast_to(w[:, None, :], in_shape)
        return jnp.ones(in_shape)

    vis_avg = None
    if visibilities is not None:
        wt = wt_of()
        wsum = jnp.zeros(out_shape, wt.dtype).at[idx].add(
            wt * match.astype(wt.dtype)
        )
        safe_wsum = jnp.where(wsum == 0.0, 1.0, wsum)

        def avg_one(v):
            v = jnp.asarray(v)
            acc = jnp.zeros(out_shape, v.dtype).at[idx].add(
                v * (wt * match.astype(wt.dtype)).astype(v.dtype)
            )
            return jnp.where(wsum != 0.0, acc / safe_wsum.astype(v.dtype), acc)

        vis_avg = jax.tree_util.tree_map(avg_one, visibilities)

    ws_avg = None
    if weight_spectrum is not None:
        ws = jnp.asarray(weight_spectrum)
        ws_avg = jnp.zeros(out_shape, ws.dtype).at[idx].add(
            ws * match.astype(ws.dtype)
        )

    ss_avg = None
    if sigma_spectrum is not None:
        ss = jnp.asarray(sigma_spectrum)
        wt = wt_of()
        m = match.astype(ss.dtype)
        acc = jnp.zeros(out_shape, ss.dtype).at[idx].add(ss**2 * wt**2 * m)
        wsum = jnp.zeros(out_shape, ss.dtype).at[idx].add(wt * m)
        acc = jnp.where(wsum != 0.0, acc / jnp.where(wsum == 0.0, 1.0, wsum) ** 2, acc)
        ss_avg = jnp.sqrt(acc)

    return RowChanAverageOutput(vis_avg, flag_avg, ws_avg, ss_avg)


def chan_average(
    chan_meta, chan_freq=None, chan_width=None, effective_bw=None, resolution=None
):
    """Average channel-indexed columns (reference chan_average:681)."""
    chan_map_np, out_chans = chan_meta
    chan_map = jnp.asarray(np.asarray(chan_map_np).astype(np.int32))
    counts = jnp.zeros(out_chans, jnp.uint32).at[chan_map].add(1)

    def mean(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        acc = jnp.zeros(out_chans, x.dtype).at[chan_map].add(x)
        return acc / counts.astype(x.dtype)

    def total(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        return jnp.zeros(out_chans, x.dtype).at[chan_map].add(x)

    return ChannelAverageOutput(
        mean(chan_freq), total(chan_width), total(effective_bw), total(resolution)
    )


@jax.jit
def _tc_core(row_sel, row_valid, map32, meta_flag_row, chan_map32,
             chan_valid, ant1, ant2, flag_row, time_centroid, exposure,
             uvw, weight, sigma, chan_freq, chan_width, effective_bw,
             resolution, visibilities, flag, weight_spectrum,
             sigma_spectrum):
    """All three averaging stages fused into ONE device dispatch (the
    per-call tunnel cost is ~30 ms — see CLAUDE.md; bda() does the
    same via _bda_core). Requires the uniform channel-bin layout
    (always true for channel_mapper output)."""
    row_out = _row_average_core(
        row_sel, row_valid, map32, meta_flag_row, ant1, ant2, flag_row,
        time_centroid, exposure, uvw, weight, sigma,
    )

    out_chans = chan_valid.shape[0]
    counts = jnp.zeros(out_chans, jnp.uint32).at[chan_map32].add(1)

    def mean(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        acc = jnp.zeros(out_chans, x.dtype).at[chan_map32].add(x)
        return acc / counts.astype(x.dtype)

    def total(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        return jnp.zeros(out_chans, x.dtype).at[chan_map32].add(x)

    chan_out = ChannelAverageOutput(
        mean(chan_freq), total(chan_width), total(effective_bw),
        total(resolution),
    )

    if any(c is not None for c in (visibilities, flag, weight_spectrum,
                                   sigma_spectrum)):
        rowchan_out = _row_chan_gather_core(
            row_sel, row_valid, chan_valid, flag_row, weight,
            visibilities, flag, weight_spectrum, sigma_spectrum,
        )
    else:
        rowchan_out = RowChanAverageOutput(None, None, None, None)
    return row_out, chan_out, rowchan_out


def time_and_channel(
    time,
    interval,
    antenna1,
    antenna2,
    time_centroid=None,
    exposure=None,
    flag_row=None,
    uvw=None,
    weight=None,
    sigma=None,
    chan_freq=None,
    chan_width=None,
    effective_bw=None,
    resolution=None,
    visibilities=None,
    flag=None,
    weight_spectrum=None,
    sigma_spectrum=None,
    time_bin_secs=1.0,
    chan_bin_size=1,
):
    """Full time+channel averaging (reference time_and_channel:764-960).

    Mapping construction (data-dependent output sizes) runs on the host;
    the averaging itself is jax scatter-add code with static shapes.
    Returns an AverageOutput namedtuple of averaged columns (None where the
    corresponding input was None).
    """
    # derive row flags from per-visibility flags (and validate their
    # consistency when both are given) — reference semantics
    # (time_and_channel_avg.py:902): a fully-flagged row must be
    # excluded from uvw/centroid/exposure/weight/sigma bin averages
    # even when the caller only supplies FLAG
    from africanus_tpu.averaging.shared import merge_flags

    flag_row = merge_flags(
        None if flag_row is None else np.asarray(flag_row),
        None if flag is None else np.asarray(flag),
    )

    row_meta = row_mapper(
        np.asarray(time),
        np.asarray(interval),
        np.asarray(antenna1),
        np.asarray(antenna2),
        flag_row=flag_row,
        time_bin_secs=time_bin_secs,
    )

    # channel count from any chan-indexed input
    nchan = None
    for cand in (visibilities, flag, weight_spectrum, sigma_spectrum):
        if cand is not None:
            nchan = jax.tree_util.tree_leaves(cand)[0].shape[1]
            break
    if nchan is None:
        for cand in (chan_freq, chan_width, effective_bw, resolution):
            if cand is not None:
                nchan = np.asarray(cand).shape[0]
                break
    if nchan is None:
        nchan = 0
    chan_meta = channel_mapper(nchan, chan_bin_size)

    chan_map_np, out_chans = chan_meta
    ucb = _uniform_chan_bins(chan_map_np, out_chans)
    if ucb is None and nchan:
        # non-uniform channel maps never come from channel_mapper; keep
        # the eager three-stage path for that (public-API) case
        row_out = row_average(
            row_meta, antenna1, antenna2, flag_row=flag_row,
            time_centroid=time_centroid, exposure=exposure, uvw=uvw,
            weight=weight, sigma=sigma,
        )
        chan_out = chan_average(
            chan_meta, chan_freq=chan_freq, chan_width=chan_width,
            effective_bw=effective_bw, resolution=resolution,
        )
        rowchan_out = row_chan_average(
            row_meta, chan_meta, flag_row=flag_row, weight=weight,
            visibilities=visibilities, flag=flag,
            weight_spectrum=weight_spectrum, sigma_spectrum=sigma_spectrum,
        )
    else:
        row_map_np = np.asarray(row_meta.map)
        out_rows = row_meta.time.shape[0]
        row_sel_np, row_valid_np = _bin_gather_table(row_map_np, out_rows)
        if ucb is None:  # nchan == 0: inert single-bin table
            chan_valid_np = np.zeros((max(out_chans, 1), 1), bool)
        else:
            chan_valid_np = ucb[1]
        row_out, chan_out, rowchan_out = _tc_core(
            jnp.asarray(row_sel_np), jnp.asarray(row_valid_np),
            jnp.asarray(row_map_np.astype(np.int32)),
            None if row_meta.flag_row is None
            else jnp.asarray(row_meta.flag_row),
            jnp.asarray(np.asarray(chan_map_np).astype(np.int32)),
            jnp.asarray(chan_valid_np),
            antenna1, antenna2, flag_row, time_centroid, exposure, uvw,
            weight, sigma, chan_freq, chan_width, effective_bw,
            resolution, visibilities, flag, weight_spectrum,
            sigma_spectrum,
        )

    return AverageOutput(
        jnp.asarray(row_meta.time),
        jnp.asarray(row_meta.interval),
        None if flag_row is None else jnp.asarray(row_meta.flag_row),
        *row_out,
        *chan_out,
        *rowchan_out,
    )
