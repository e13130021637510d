"""Sharded (row-chunked) baseline-dependent averaging.

TPU analogue of the reference's dask BDA wrapper
(``africanus/averaging/dask.py`` bda:~100 — every dask row block is
independently binned by ``bda_mapper`` and averaged): rows are split
into ``mesh.shape['row']`` contiguous chunks, each chunk is binned on
the host exactly as the reference bins each block, the per-chunk gather
tables are padded to common shapes and stacked on a shard axis, and ONE
``shard_map`` dispatch averages every chunk in parallel. Per-chunk
independence is the reference's own semantics — BDA bins never span
dask block boundaries there either.

Outputs are stacked per-shard ragged arrays of shape
``(nshard, out_max, …)`` plus ``nout`` (per-shard valid row-chan
counts): rows past a shard's count are inert padding (zero values,
flagged if flags are produced).
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from africanus_tpu.averaging.bda_avg import (
    _row_average_core,
    _row_chan_average_core,
    _BdaTables,
    bda_mapper,
)
from africanus_tpu.averaging.shared import merge_flags
from africanus_tpu.averaging.time_and_channel_avg import _bin_gather_table

__all__ = ["sharded_bda", "ShardedBdaOutput",
           "sharded_time_and_channel", "ShardedTcOutput"]

ShardedBdaOutput = namedtuple(
    "ShardedBdaOutput",
    [
        "nout",            # (nshard,) valid row-chan counts
        "nruns",           # (nshard,) valid averaged-row (run) counts
        "time",            # (nshard, out_max) bin times (padding: 0)
        "interval",
        "chan_width",
        "decorr_chan_width",  # (nshard, runs_max) per averaged row
        "antenna1",        # (nshard, out_max)
        "antenna2",
        "uvw",             # (nshard, out_max, 3)
        "visibilities",    # (nshard, out_max, ncorr) tree like the input
        "flag",
        "weight_spectrum",
    ],
)


def _pad2(a, r, c, fill=0):
    return np.pad(np.asarray(a), ((0, r - a.shape[0]), (0, c - a.shape[1])),
                  constant_values=fill)


def _pad1(a, n, fill=0):
    a = np.asarray(a)
    return np.pad(a, [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1),
                  constant_values=fill)


def sharded_bda(
    mesh,
    time,
    interval,
    antenna1,
    antenna2,
    uvw,
    chan_freq,
    chan_width,
    visibilities,
    flag=None,
    weight_spectrum=None,
    max_uvw_dist=None,
    max_fov=3.0,
    decorrelation=0.98,
    time_bin_secs=None,
    min_nchan=1,
):
    """Row-sharded BDA: per-shard host binning + one SPMD average.

    Parameters mirror :func:`africanus_tpu.averaging.bda` (the
    host-metadata columns are concrete numpy; ``visibilities`` may be a
    pytree, e.g. a Cplx pair). Rows must divide ``mesh.shape['row']``.

    Returns :class:`ShardedBdaOutput` with per-shard stacked arrays.
    """
    nshard = mesh.shape["row"]
    time = np.asarray(time)
    nrow = time.shape[0]
    if nrow % nshard:
        raise ValueError(f"{nrow} rows do not divide {nshard} row shards")
    rp = nrow // nshard
    nchan = np.asarray(chan_freq).shape[0]

    flag_np = None if flag is None else np.asarray(flag)

    # host binning per shard (= per dask block in the reference)
    metas, tbls = [], []
    for s in range(nshard):
        sl = slice(s * rp, (s + 1) * rp)
        fr = merge_flags(None, None if flag_np is None else flag_np[sl])
        meta = bda_mapper(
            time[sl], np.asarray(interval)[sl],
            np.asarray(antenna1)[sl], np.asarray(antenna2)[sl],
            np.asarray(uvw)[sl], np.asarray(chan_width),
            np.asarray(chan_freq), max_uvw_dist,
            flag_row=fr, max_fov=max_fov, decorrelation=decorrelation,
            time_bin_secs=time_bin_secs, min_nchan=min_nchan,
        )
        offsets = np.asarray(meta.offsets).astype(np.int64)
        rc_map = np.asarray(meta.map)
        row0 = rc_map[:, 0]
        run_starts = offsets[:-1]
        nruns = run_starts.shape[0]
        row_run = np.searchsorted(run_starts, row0, side="right") - 1
        out_run = np.repeat(
            np.arange(nruns, dtype=np.int32), np.diff(offsets)
        )
        row_sel, row_valid = _bin_gather_table(row_run, nruns)
        rc_sel, rc_valid = _bin_gather_table(
            rc_map.ravel(), meta.time.shape[0]
        )
        metas.append(meta)
        tbls.append(dict(
            row_sel=row_sel, row_valid=row_valid, out_run=out_run,
            row0=row0.astype(np.int32), rc_sel=rc_sel, rc_valid=rc_valid,
        ))

    out_max = max(m.time.shape[0] for m in metas)
    runs_max = max(t["row_sel"].shape[0] for t in tbls)
    rw = max(t["row_sel"].shape[1] for t in tbls)
    cw = max(t["rc_sel"].shape[1] for t in tbls)

    stacked = dict(
        row_sel=np.stack([_pad2(t["row_sel"], runs_max, rw) for t in tbls]),
        row_valid=np.stack(
            [_pad2(t["row_valid"], runs_max, rw, False) for t in tbls]
        ),
        out_run=np.stack([_pad1(t["out_run"], out_max) for t in tbls]),
        row0=np.stack([t["row0"] for t in tbls]),
        rc_sel=np.stack([_pad2(t["rc_sel"], out_max, cw) for t in tbls]),
        rc_valid=np.stack(
            [_pad2(t["rc_valid"], out_max, cw, False) for t in tbls]
        ),
        meta_flag_row=np.stack(
            [_pad1(np.zeros(m.time.shape[0], np.uint8)
                   if m.flag_row is None else np.asarray(m.flag_row),
                   out_max) for m in metas]
        ),
        flag_row=np.stack(
            [np.zeros(rp, np.uint8) if flag_np is None
             else merge_flags(None, flag_np[s * rp:(s + 1) * rp])
             for s in range(nshard)]
        ),
    )
    meta_cols = {
        k: np.stack(
            [_pad1(np.asarray(getattr(m, k), np.float64), out_max)
             for m in metas]
        )
        for k in ("time", "interval", "chan_width")
    }
    meta_cols["decorr_chan_width"] = np.stack(
        [_pad1(np.asarray(m.decorr_chan_width, np.float64), runs_max)
         for m in metas]
    )
    nout = np.array([m.time.shape[0] for m in metas], np.int32)
    nruns_s = np.array([t["row_sel"].shape[0] for t in tbls], np.int32)

    data = dict(visibilities=visibilities)
    if flag is not None:
        data["flag"] = flag
    if weight_spectrum is not None:
        data["weight_spectrum"] = weight_spectrum

    def local(tbl_s, ant1_s, ant2_s, uvw_s, data_s):
        # every sharded input carries a leading length-1 shard axis
        tbl_s = jax.tree_util.tree_map(lambda a: a[0], tbl_s)
        ant1_s, ant2_s, uvw_s = ant1_s[0], ant2_s[0], uvw_s[0]
        data_s = jax.tree_util.tree_map(lambda a: a[0], data_s)
        tbl = _BdaTables(
            row_sel=tbl_s["row_sel"], row_valid=tbl_s["row_valid"],
            out_run=tbl_s["out_run"], row0=tbl_s["row0"],
            rc_sel=tbl_s["rc_sel"], rc_valid=tbl_s["rc_valid"],
            meta_dev=None,
        )
        row_out = _row_average_core(
            tbl, tbl_s["meta_flag_row"], ant1_s, ant2_s,
            tbl_s["flag_row"], None, None, uvw_s, None, None,
        )
        rc_out = _row_chan_average_core(
            tbl, tbl_s["flag_row"], None,
            data_s["visibilities"], data_s.get("flag"),
            data_s.get("weight_spectrum"), None,
        )
        pad = lambda x: jax.tree_util.tree_map(
            lambda a: _jpad(a, out_max)[None], x)
        return (pad(row_out.antenna1), pad(row_out.antenna2),
                pad(row_out.uvw), pad(rc_out.visibilities),
                pad(rc_out.flag) if rc_out.flag is not None else None,
                pad(rc_out.weight_spectrum)
                if rc_out.weight_spectrum is not None else None)

    def _jpad(a, n):
        return jnp.pad(
            a, [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        )

    shard = P("row")
    tbl_in = {k: jnp.asarray(v) for k, v in stacked.items()}
    tbl_spec = {k: shard for k in tbl_in}
    data_in = {
        k: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).reshape(
                (nshard, rp) + np.shape(a)[1:]), v)
        for k, v in data.items()
    }
    data_spec = {k: jax.tree_util.tree_map(lambda _: shard, v)
                 for k, v in data.items()}

    a1_in = np.asarray(antenna1).reshape(nshard, rp)
    a2_in = np.asarray(antenna2).reshape(nshard, rp)
    uvw_in = np.asarray(uvw).reshape(nshard, rp, 3)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(tbl_spec, shard, shard, shard, data_spec),
        out_specs=shard,
        check_vma=False,
    )
    a1o, a2o, uvwo, viso, flago, wso = fn(
        tbl_in, jnp.asarray(a1_in), jnp.asarray(a2_in),
        jnp.asarray(uvw_in), data_in,
    )
    return ShardedBdaOutput(
        nout=nout,
        nruns=nruns_s,
        time=meta_cols["time"],
        interval=meta_cols["interval"],
        chan_width=meta_cols["chan_width"],
        decorr_chan_width=meta_cols["decorr_chan_width"],
        antenna1=a1o, antenna2=a2o, uvw=uvwo,
        visibilities=viso, flag=flago, weight_spectrum=wso,
    )


ShardedTcOutput = namedtuple(
    "ShardedTcOutput",
    [
        "nout",            # (nshard,) valid output-row counts
        "time",            # (nshard, out_max) bin-mean times (padding 0)
        "interval",
        "chan_freq",       # (out_chans,) — channel bins are global
        "chan_width",
        "antenna1",        # (nshard, out_max)
        "antenna2",
        "time_centroid",
        "exposure",
        "uvw",             # (nshard, out_max, 3)
        "weight",
        "sigma",
        "visibilities",    # (nshard, out_max, out_chans, ncorr) tree
        "flag",
        "weight_spectrum",
        "sigma_spectrum",
    ],
)


def sharded_time_and_channel(
    mesh,
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
    visibilities=None,
    flag=None,
    weight_spectrum=None,
    sigma_spectrum=None,
    time_bin_secs=1.0,
    chan_bin_size=1,
):
    """Row-sharded time+channel averaging.

    Mirrors the reference's dask ``time_and_channel`` wrapper
    (``africanus/averaging/dask.py``): rows split into
    ``mesh.shape['row']`` contiguous chunks, each chunk binned on the
    host by ``row_mapper`` (exactly as each dask block is), the padded
    per-chunk gather tables stacked on a shard axis, and ONE shard_map
    dispatch averages every chunk. Channel bins are row-independent and
    computed once globally. Bins never span chunk boundaries — the
    reference's own block semantics.

    Returns :class:`ShardedTcOutput`; output rows past a shard's
    ``nout`` are inert padding.
    """
    from africanus_tpu.averaging.time_and_channel_avg import (
        _row_average_core as _tc_row_core,
        _row_chan_gather_core,
        _uniform_chan_bins,
        chan_average,
    )
    from africanus_tpu.averaging.time_and_channel_mapping import (
        channel_mapper,
        row_mapper,
    )

    nshard = mesh.shape["row"]
    time = np.asarray(time)
    nrow = time.shape[0]
    if nrow % nshard:
        raise ValueError(f"{nrow} rows do not divide {nshard} row shards")
    rp = nrow // nshard

    nchan = None
    for cand in (visibilities, flag, weight_spectrum, sigma_spectrum):
        if cand is not None:
            nchan = jax.tree_util.tree_leaves(cand)[0].shape[1]
            break
    if nchan is None:
        raise ValueError("at least one (row, chan, corr) input required")

    flag_np = None if flag is None else np.asarray(flag)
    frow_np = None if flag_row is None else np.asarray(flag_row)

    metas, tbls = [], []
    for s in range(nshard):
        sl = slice(s * rp, (s + 1) * rp)
        fr = merge_flags(
            None if frow_np is None else frow_np[sl],
            None if flag_np is None else flag_np[sl],
        )
        meta = row_mapper(
            time[sl], np.asarray(interval)[sl],
            np.asarray(antenna1)[sl], np.asarray(antenna2)[sl],
            flag_row=fr, time_bin_secs=time_bin_secs,
        )
        out_rows = meta.time.shape[0]
        row_sel, row_valid = _bin_gather_table(
            np.asarray(meta.map), out_rows
        )
        metas.append(meta)
        tbls.append(dict(
            row_sel=row_sel, row_valid=row_valid,
            map32=np.asarray(meta.map).astype(np.int32),
            meta_flag_row=(
                np.zeros(out_rows, np.uint8) if meta.flag_row is None
                else np.asarray(meta.flag_row)),
            flag_row=(np.zeros(rp, np.uint8) if fr is None
                      else np.asarray(fr)),
        ))

    out_max = max(m.time.shape[0] for m in metas)
    rw = max(t["row_sel"].shape[1] for t in tbls)
    stacked = dict(
        row_sel=np.stack([_pad2(t["row_sel"], out_max, rw) for t in tbls]),
        row_valid=np.stack(
            [_pad2(t["row_valid"], out_max, rw, False) for t in tbls]
        ),
        map32=np.stack([t["map32"] for t in tbls]),
        meta_flag_row=np.stack(
            [_pad1(t["meta_flag_row"], out_max) for t in tbls]
        ),
        flag_row=np.stack([t["flag_row"] for t in tbls]),
    )
    nout = np.array([m.time.shape[0] for m in metas], np.int32)
    t_col = np.stack([_pad1(np.asarray(m.time), out_max) for m in metas])
    i_col = np.stack(
        [_pad1(np.asarray(m.interval), out_max) for m in metas]
    )

    # channel bins are global; uniform by construction (channel_mapper)
    chan_meta = channel_mapper(nchan, chan_bin_size)
    ucb = _uniform_chan_bins(*chan_meta)
    chan_valid = ucb[1]
    chan_out = chan_average(chan_meta, chan_freq=chan_freq,
                            chan_width=chan_width)

    row_data = {}
    for k, v in (("uvw", uvw), ("weight", weight), ("sigma", sigma),
                 ("time_centroid", time_centroid),
                 ("exposure", exposure)):
        if v is not None:
            row_data[k] = v
    rc_data = {}
    for k, v in (("visibilities", visibilities), ("flag", flag),
                 ("weight_spectrum", weight_spectrum),
                 ("sigma_spectrum", sigma_spectrum)):
        if v is not None:
            rc_data[k] = v

    def local(tbl_s, ant1_s, ant2_s, row_s, rc_s):
        tbl_s = jax.tree_util.tree_map(lambda a: a[0], tbl_s)
        ant1_s, ant2_s = ant1_s[0], ant2_s[0]
        row_s = jax.tree_util.tree_map(lambda a: a[0], row_s)
        rc_s = jax.tree_util.tree_map(lambda a: a[0], rc_s)
        row_out = _tc_row_core(
            tbl_s["row_sel"], tbl_s["row_valid"], tbl_s["map32"],
            tbl_s["meta_flag_row"], ant1_s, ant2_s, tbl_s["flag_row"],
            row_s.get("time_centroid"), row_s.get("exposure"),
            row_s.get("uvw"), row_s.get("weight"), row_s.get("sigma"),
        )
        rc_out = _row_chan_gather_core(
            tbl_s["row_sel"], tbl_s["row_valid"], jnp.asarray(chan_valid),
            tbl_s["flag_row"], row_s.get("weight"),
            rc_s.get("visibilities"), rc_s.get("flag"),
            rc_s.get("weight_spectrum"), rc_s.get("sigma_spectrum"),
        )
        add = lambda x: jax.tree_util.tree_map(lambda a: a[None], x)
        return (add(row_out.antenna1), add(row_out.antenna2),
                add(row_out.time_centroid), add(row_out.exposure),
                add(row_out.uvw), add(row_out.weight),
                add(row_out.sigma), add(rc_out.visibilities),
                add(rc_out.flag), add(rc_out.weight_spectrum),
                add(rc_out.sigma_spectrum))

    shard = P("row")
    tbl_in = {k: jnp.asarray(v) for k, v in stacked.items()}
    resh = lambda a: jnp.asarray(a).reshape((nshard, rp) + np.shape(a)[1:])
    row_in = {k: jax.tree_util.tree_map(resh, v)
              for k, v in row_data.items()}
    rc_in = {k: jax.tree_util.tree_map(resh, v)
             for k, v in rc_data.items()}
    spec_of = lambda d: {k: jax.tree_util.tree_map(lambda _: shard, v)
                         for k, v in d.items()}

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=({k: shard for k in tbl_in}, shard, shard,
                  spec_of(row_data), spec_of(rc_data)),
        out_specs=shard,
        check_vma=False,
    )
    (a1o, a2o, tco, expo, uvwo, wto, sgo, viso, flago, wso,
     sso) = fn(
        tbl_in,
        jnp.asarray(np.asarray(antenna1).reshape(nshard, rp)),
        jnp.asarray(np.asarray(antenna2).reshape(nshard, rp)),
        row_in, rc_in,
    )
    return ShardedTcOutput(
        nout=nout, time=t_col, interval=i_col,
        chan_freq=chan_out.chan_freq, chan_width=chan_out.chan_width,
        antenna1=a1o, antenna2=a2o, time_centroid=tco, exposure=expo,
        uvw=uvwo, weight=wto, sigma=sgo, visibilities=viso, flag=flago,
        weight_spectrum=wso, sigma_spectrum=sso,
    )
