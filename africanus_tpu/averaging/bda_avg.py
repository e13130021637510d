"""Baseline-dependent averaging of visibility data.

TPU-native equivalent of reference ``africanus/averaging/bda_avg.py``
(bda:655, row_average:33, row_chan_average:397). Outputs are ragged
(row, chan)-flattened arrays with per-row channel counts described by
``meta.offsets``; the accumulation loops become scatter-adds into the flat
output with flag-consistency masks, and the "broadcast along the run"
steps become gathers from host-computed run-start indices.
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np
import jax
import jax.numpy as jnp

from africanus_tpu.averaging.bda_mapping import bda_mapper, RowMapOutput

__all__ = ["row_average", "row_chan_average", "bda", "AverageOutput"]

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

AverageOutput = namedtuple(
    "AverageOutput",
    list(RowMapOutput._fields) + _row_output_fields + _rowchan_output_fields,
)


def _run_starts(offsets, out_row_chans):
    """Host: for each flat output position, the start of its row run."""
    offsets = np.asarray(offsets)
    nchan_per_run = np.diff(offsets.astype(np.int64))
    return np.repeat(offsets[:-1].astype(np.int32), nchan_per_run), nchan_per_run


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
    """BDA row averaging (reference bda_avg.py:33-255): values accumulate at
    each run's first output position then broadcast along the run."""
    out_row_chans = meta.time.shape[0]
    row0 = jnp.asarray(np.asarray(meta.map)[:, 0].astype(np.int32))
    starts_np, _ = _run_starts(meta.offsets, out_row_chans)
    starts = jnp.asarray(starts_np)

    ant1 = jnp.asarray(ant1)
    ant2 = jnp.asarray(ant2)

    if flag_row is not None and meta.flag_row is not None:
        match = jnp.asarray(flag_row) == jnp.asarray(meta.flag_row)[row0]
    else:
        match = jnp.ones(row0.shape, bool)

    counts = jnp.zeros(out_row_chans, jnp.uint32).at[row0].add(
        match.astype(jnp.uint32)
    )

    ant1_avg = jnp.zeros(out_row_chans, ant1.dtype).at[row0].set(ant1)[starts]
    ant2_avg = jnp.zeros(out_row_chans, ant2.dtype).at[row0].set(ant2)[starts]

    def mean_rows(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        m = match.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        acc = jnp.zeros((out_row_chans,) + x.shape[1:], x.dtype).at[row0].add(x * m)
        c = counts.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        acc = jnp.where(c > 0, acc / jnp.maximum(c, 1), acc)
        return acc[starts]

    def sum_rows(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        m = match.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        acc = jnp.zeros((out_row_chans,) + x.shape[1:], x.dtype).at[row0].add(x * m)
        return acc[starts]

    uvw_avg = mean_rows(uvw)
    tc_avg = mean_rows(time_centroid)
    exp_avg = sum_rows(exposure)
    weight_avg = sum_rows(weight)

    sigma_avg = None
    if sigma is not None:
        sigma = jnp.asarray(sigma)
        m = match[:, None].astype(sigma.dtype)
        wt = jnp.asarray(weight) if weight is not None else jnp.ones_like(sigma)
        shape = (out_row_chans,) + sigma.shape[1:]
        acc = jnp.zeros(shape, sigma.dtype).at[row0].add(sigma**2 * wt**2 * m)
        wsum = jnp.zeros(shape, sigma.dtype).at[row0].add(wt * m)
        acc = jnp.where(wsum != 0.0, acc / jnp.where(wsum == 0.0, 1.0, wsum) ** 2, acc)
        sigma_avg = jnp.sqrt(acc)[starts]

    return RowAverageOutput(
        ant1_avg, ant2_avg, tc_avg, exp_avg, uvw_avg, weight_avg, sigma_avg
    )


def row_chan_average(
    meta,
    flag_row=None,
    weight=None,
    visibilities=None,
    flag=None,
    weight_spectrum=None,
    sigma_spectrum=None,
):
    """BDA (row, chan) averaging into the flat ragged output (reference
    bda_avg.py:397-640)."""
    out_row_chans = meta.time.shape[0]
    rc_map = jnp.asarray(np.asarray(meta.map).astype(np.int32))  # (row, chan)

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
    out_shape = (out_row_chans, ncorr)
    idx = rc_map  # advanced index over first out dim

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
        counts = jnp.zeros(out_shape, jnp.uint32).at[idx].add(
            (~flagged_in).astype(jnp.uint32)
        )
        out_flag = counts == 0
        match = flagged_in == out_flag[idx]
    else:
        out_flag = None
        match = jnp.ones(in_shape, bool)

    flag_avg = out_flag if flag is not None else None

    def wt_of():
        if weight_spectrum is not None:
            return jnp.asarray(weight_spectrum)
        if weight is not None:
            return jnp.broadcast_to(jnp.asarray(weight)[:, None, :], in_shape)
        return jnp.ones(in_shape)

    vis_avg = None
    if visibilities is not None:
        wt = wt_of()
        wm = wt * match.astype(wt.dtype)
        wsum = jnp.zeros(out_shape, wt.dtype).at[idx].add(wm)
        safe = jnp.where(wsum == 0.0, 1.0, wsum)

        def avg_one(v):
            v = jnp.asarray(v)
            acc = jnp.zeros(out_shape, v.dtype).at[idx].add(v * wm.astype(v.dtype))
            return jnp.where(wsum != 0.0, acc / safe.astype(v.dtype), acc)

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


def bda(
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
    max_uvw_dist=None,
    max_fov=3.0,
    decorrelation=0.98,
    time_bin_secs=None,
    min_nchan=1,
):
    """Full baseline-dependent averaging (reference bda_avg.py:655-733).

    Mapping (ragged, serial) runs on the host; the averaging is jax
    scatter-add code over the flat (row·chan) output.
    """
    if chan_width is None or chan_freq is None:
        raise ValueError("chan_freq and chan_width must be provided")

    if max_uvw_dist is None and uvw is not None:
        max_uvw_dist = float(np.sqrt((np.asarray(uvw) ** 2).sum(axis=1)).max())

    meta = bda_mapper(
        np.asarray(time),
        np.asarray(interval),
        np.asarray(antenna1),
        np.asarray(antenna2),
        np.asarray(uvw),
        np.asarray(chan_width),
        np.asarray(chan_freq),
        max_uvw_dist,
        flag_row=None if flag_row is None else np.asarray(flag_row),
        max_fov=max_fov,
        decorrelation=decorrelation,
        time_bin_secs=time_bin_secs,
        min_nchan=min_nchan,
    )

    row_out = row_average(
        meta, antenna1, antenna2, flag_row=flag_row,
        time_centroid=time_centroid, exposure=exposure, uvw=uvw,
        weight=weight, sigma=sigma,
    )
    rowchan_out = row_chan_average(
        meta, flag_row=flag_row, weight=weight, visibilities=visibilities,
        flag=flag, weight_spectrum=weight_spectrum,
        sigma_spectrum=sigma_spectrum,
    )

    return AverageOutput(
        jnp.asarray(meta.map),
        jnp.asarray(meta.offsets),
        jnp.asarray(meta.decorr_chan_width),
        jnp.asarray(meta.time),
        jnp.asarray(meta.interval),
        jnp.asarray(meta.chan_width),
        None if flag_row is None else jnp.asarray(meta.flag_row),
        *row_out,
        *rowchan_out,
    )
