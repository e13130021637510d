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
    row_map = jnp.asarray(np.asarray(meta.map).astype(np.int32))
    out_rows = meta.time.shape[0]
    ant1 = jnp.asarray(ant1)
    ant2 = jnp.asarray(ant2)

    if flag_row is not None and meta.flag_row is not None:
        match = jnp.asarray(flag_row) == jnp.asarray(meta.flag_row)[row_map]
    else:
        match = jnp.ones(row_map.shape, bool)

    counts = jnp.zeros(out_rows, jnp.uint32).at[row_map].add(
        match.astype(jnp.uint32)
    )

    def mean_rows(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        acc = _tree_scatter_add(lambda a: (out_rows,) + a.shape[1:], x, row_map,
                                match.reshape((-1,) + (1,) * (x.ndim - 1)))
        c = counts.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return jnp.where(c > 0, acc / jnp.maximum(c, 1), acc)

    def sum_rows(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        return _tree_scatter_add(lambda a: (out_rows,) + a.shape[1:], x, row_map,
                                 match.reshape((-1,) + (1,) * (x.ndim - 1)))

    ant1_avg = jnp.zeros(out_rows, ant1.dtype).at[row_map].set(ant1)
    ant2_avg = jnp.zeros(out_rows, ant2.dtype).at[row_map].set(ant2)

    uvw_avg = mean_rows(uvw)
    tc_avg = mean_rows(time_centroid)
    exp_avg = sum_rows(exposure)
    weight_avg = sum_rows(weight)

    sigma_avg = None
    if sigma is not None:
        sigma = jnp.asarray(sigma)
        m = match[:, None].astype(sigma.dtype)
        if weight is not None:
            wt = jnp.asarray(weight)
        else:
            wt = jnp.ones_like(sigma)
        sva = sigma**2 * wt**2 * m
        swt = wt * m
        acc = jnp.zeros((out_rows,) + sigma.shape[1:], sigma.dtype).at[row_map].add(sva)
        wsum = jnp.zeros((out_rows,) + sigma.shape[1:], sigma.dtype).at[row_map].add(swt)
        acc = jnp.where(wsum != 0.0, acc / jnp.where(wsum == 0.0, 1.0, wsum) ** 2, acc)
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
    row_chan_average:414-660)."""
    row_map = jnp.asarray(np.asarray(row_meta.map).astype(np.int32))
    chan_map_np, out_chans = chan_meta
    chan_map = jnp.asarray(np.asarray(chan_map_np).astype(np.int32))
    out_rows = row_meta.time.shape[0]

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
    row_meta = row_mapper(
        np.asarray(time),
        np.asarray(interval),
        np.asarray(antenna1),
        np.asarray(antenna2),
        flag_row=None if flag_row is None else np.asarray(flag_row),
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

    return AverageOutput(
        jnp.asarray(row_meta.time),
        jnp.asarray(row_meta.interval),
        None if flag_row is None else jnp.asarray(row_meta.flag_row),
        *row_out,
        *chan_out,
        *rowchan_out,
    )
