"""Baseline-dependent averaging of visibility data.

TPU-native equivalent of reference ``africanus/averaging/bda_avg.py``
(bda:655, row_average:33, row_chan_average:397). Outputs are ragged
(row, chan)-flattened arrays with per-row channel counts described by
``meta.offsets``; the accumulation loops become host-planned padded
gather+sums (XLA scatter is ~1.4e8 elem/s on TPU — see
time_and_channel_avg.py), and the "broadcast along the run" steps become
gathers from host-computed run indices.
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np
import jax
import jax.numpy as jnp

from africanus_tpu.averaging.bda_mapping import bda_mapper, RowMapOutput
from africanus_tpu.averaging.time_and_channel_avg import _bin_gather_table

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
    """BDA row averaging (reference bda_avg.py:33-255): values accumulate
    per output *run* (one bin per averaged row) then broadcast along the
    run's flat output positions."""
    out_row_chans = meta.time.shape[0]
    offsets = np.asarray(meta.offsets)
    row0_np = np.asarray(meta.map)[:, 0]
    run_starts = offsets[:-1].astype(np.int64)
    nruns = run_starts.shape[0]
    nchan_per_run = np.diff(offsets.astype(np.int64))
    # run index of each input row, and of each flat output position
    row_run_np = np.searchsorted(run_starts, row0_np, side="right") - 1
    out_run = jnp.asarray(
        np.repeat(np.arange(nruns, dtype=np.int64), nchan_per_run)
    )

    row_sel_np, row_valid_np = _bin_gather_table(row_run_np, nruns)
    row_sel = jnp.asarray(row_sel_np)
    row_valid = jnp.asarray(row_valid_np)

    ant1 = jnp.asarray(ant1)
    ant2 = jnp.asarray(ant2)

    if flag_row is not None and meta.flag_row is not None:
        row0 = jnp.asarray(row0_np.astype(np.int32))
        match_in = (
            jnp.asarray(flag_row) == jnp.asarray(meta.flag_row)[row0]
        )
        match = match_in[row_sel] & row_valid
    else:
        match = row_valid

    counts = match.sum(axis=1, dtype=jnp.uint32)

    # reference loop semantics: the last contributing row's antenna wins
    last = row_sel[
        jnp.arange(nruns), jnp.maximum(row_valid.sum(axis=1) - 1, 0)
    ]
    ant1_avg = ant1[last][out_run]
    ant2_avg = ant2[last][out_run]

    def _masked(x):
        shape = (1,) * (x.ndim - 2)
        return jnp.where(match.reshape(match.shape + shape), x, 0)

    def mean_rows(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        acc = _masked(x[row_sel]).sum(axis=1)
        c = counts.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        acc = jnp.where(c > 0, acc / jnp.maximum(c, 1), acc)
        return acc[out_run]

    def sum_rows(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        return _masked(x[row_sel]).sum(axis=1)[out_run]

    uvw_avg = mean_rows(uvw)
    tc_avg = mean_rows(time_centroid)
    exp_avg = sum_rows(exposure)
    weight_avg = sum_rows(weight)

    sigma_avg = None
    if sigma is not None:
        sigma = jnp.asarray(sigma)
        wt = jnp.asarray(weight) if weight is not None else jnp.ones_like(sigma)
        acc = _masked((sigma**2 * wt**2)[row_sel]).sum(axis=1)
        wsum = _masked(wt[row_sel]).sum(axis=1)
        acc = jnp.where(
            wsum != 0.0, acc / jnp.where(wsum == 0.0, 1.0, wsum) ** 2, acc
        )
        sigma_avg = jnp.sqrt(acc)[out_run]

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
    rc_map_np = np.asarray(meta.map)  # (row, chan) → flat output slot

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

    # inverse table over the flat (row·chan) input space
    sel_np, valid_np = _bin_gather_table(rc_map_np.ravel(), out_row_chans)
    sel = jnp.asarray(sel_np)
    validb = jnp.asarray(valid_np)[:, :, None]

    def g(x):
        """(nrow, nchan, ncorr) → (out_row_chans, R, ncorr)."""
        return jnp.asarray(x).reshape(nrow * nchan, ncorr)[sel]

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
        counts = (validb & ~fg).sum(axis=1, dtype=jnp.uint32)
        out_flag = counts == 0
        match = (fg == out_flag[:, None, :]) & validb
    else:
        out_flag = None
        match = validb

    flag_avg = out_flag if flag is not None else None

    def wt_of():
        if weight_spectrum is not None:
            return jnp.asarray(weight_spectrum)
        if weight is not None:
            return jnp.broadcast_to(jnp.asarray(weight)[:, None, :], in_shape)
        return jnp.ones(in_shape)

    def msum(x):
        return jnp.where(match, x, 0).sum(axis=1)

    vis_avg = None
    if visibilities is not None:
        wg = g(wt_of())
        wsum = msum(wg)
        safe = jnp.where(wsum == 0.0, 1.0, wsum)

        def avg_one(v):
            acc = msum(g(v) * wg.astype(jnp.asarray(v).dtype))
            return jnp.where(wsum != 0.0, acc / safe.astype(acc.dtype), acc)

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
