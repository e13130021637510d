"""Sharded calibration: residual application and phase-only solving.

The reference parallelises calibration with dask over row chunks cut on
unique-time boundaries (``chunkify_rows``; calibration/utils/dask.py and
phase_only/dask.py) — the per-chunk solves are independent because gains
are per (time, antenna) and every row of a time bin lives in one chunk.
The TPU analogue keeps that decomposition: time bins are split into one
group per device, each device runs the jitted Gauss-Newton solve on its
own rows (dispatch is asynchronous, so devices work concurrently), and
the per-bin gains concatenate back. ``sharded_residual_vis`` is the
row-parallel residual under ``shard_map`` with bin-aligned shards.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from africanus_tpu.ops.cplx import Cplx, cplx

__all__ = ["sharded_residual_vis", "sharded_gauss_newton"]


def _bin_shards(time_bin_indices, time_bin_counts, nshard):
    """Split time bins into ``nshard`` contiguous groups with equal bin
    counts (rows per group may differ; bins must divide evenly)."""
    tbi = np.asarray(time_bin_indices)
    tbc = np.asarray(time_bin_counts)
    nbins = tbi.shape[0]
    if nbins % nshard:
        raise ValueError(f"{nbins} time bins must divide over {nshard} "
                         f"shards")
    per = nbins // nshard
    groups = []
    for s in range(nshard):
        bins = slice(s * per, (s + 1) * per)
        row0 = int(tbi[bins.start])
        row1 = int(tbi[bins.stop - 1] + tbc[bins.stop - 1])
        groups.append((bins, row0, row1))
    return groups


def sharded_residual_vis(mesh, time_bin_indices, time_bin_counts,
                         antenna1, antenna2, jones, vis, flag, model):
    """residual_vis with rows sharded over the mesh "row" axis.

    Shards are cut on time-bin boundaries (each shard carries whole
    bins, like the reference's chunkify_rows contract) and must carry
    equal row counts; the gains' time axis shards alongside. Returns the
    row-sharded residual.
    """
    from africanus_tpu.calibration.utils import residual_vis_ri

    tbi = np.asarray(time_bin_indices)
    tbc = np.asarray(time_bin_counts)
    nshard = mesh.shape["row"]
    groups = _bin_shards(tbi, tbc, nshard)
    rows_per = {r1 - r0 for _, r0, r1 in groups}
    if len(rows_per) != 1:
        raise ValueError("bin groups must carry equal row counts "
                         f"(got {sorted(rows_per)}); pad the time axis")
    per = tbi.shape[0] // nshard

    # per-shard bin indices, rebased to the shard's first row
    tbi_l = np.stack([tbi[b] - r0 for b, r0, _ in groups])
    tbc_l = np.stack([tbc[b] for b, _, _ in groups])

    g = cplx(jones)
    v = cplx(vis)
    m = cplx(model)

    def local(tbi_s, tbc_s, a1_s, a2_s, g_s, v_s, f_s, m_s):
        return residual_vis_ri(tbi_s[0], tbc_s[0], a1_s, a2_s, g_s, v_s,
                               f_s, m_s)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("row"), P("row"), P("row"), P("row"),
                  Cplx(P("row"), P("row")), Cplx(P("row"), P("row")),
                  P("row"), Cplx(P("row"), P("row"))),
        out_specs=Cplx(P("row"), P("row")),
    )
    return fn(jnp.asarray(tbi_l), jnp.asarray(tbc_l),
              jnp.asarray(antenna1), jnp.asarray(antenna2), g, v,
              jnp.asarray(flag), m)


def sharded_gauss_newton(mesh, time_bin_indices, time_bin_counts,
                         antenna1, antenna2, jones, vis, flag, model,
                         weight, tol=1e-4, maxiter=100):
    """Phase-only Gauss-Newton solve parallelised over time-bin groups.

    Gains are per (time, antenna): bins are independent, so each device
    solves its own bin group (the reference's dask time-chunk
    decomposition, phase_only/dask.py). The solver's host-planned gather
    tables differ per group, so groups run as per-device jitted calls —
    dispatch is asynchronous and the devices overlap. Returns
    (jones, jhj, jhr, max iterations over groups).
    """
    from africanus_tpu.calibration.phase_only import gauss_newton_ri

    tbi = np.asarray(time_bin_indices)
    tbc = np.asarray(time_bin_counts)
    a1 = np.asarray(antenna1)
    a2 = np.asarray(antenna2)
    devices = list(mesh.devices.ravel())
    groups = _bin_shards(tbi, tbc, len(devices))

    g = cplx(jones)
    v = cplx(vis)
    m = cplx(model)
    flag = np.asarray(flag)
    weight = np.asarray(weight)

    parts = []
    for dev, (bins, row0, row1) in zip(devices, groups):
        rows = slice(row0, row1)
        # flag/weight are pure data: ship them as device operands, not
        # closed-over jaxpr constants (a vis-sized constant inflates
        # every per-group executable and its upload through the tunnel).
        # Only tbi/tbc/a1/a2 stay concrete — the solver's host gather
        # planning needs their values at trace time.
        args = jax.device_put(
            (
                Cplx(g.re[bins], g.im[bins]),
                Cplx(v.re[rows], v.im[rows]),
                Cplx(m.re[rows], m.im[rows]),
                flag[rows],
                weight[rows],
            ),
            dev,
        )
        solve = jax.jit(
            lambda gg, vv, mm, ff, ww, _tbi=tbi[bins] - row0,
            _tbc=tbc[bins], _a1=a1[rows], _a2=a2[rows]:
            gauss_newton_ri(_tbi, _tbc, _a1, _a2, gg, vv, ff, mm, ww,
                            tol=tol, maxiter=maxiter)
        )
        parts.append(solve(*args))

    # results live on different devices: gather to host before
    # concatenating (the fetch is the natural barrier; every group has
    # been computing concurrently until here)
    gains = Cplx(
        np.concatenate([np.asarray(p[0].re) for p in parts], axis=0),
        np.concatenate([np.asarray(p[0].im) for p in parts], axis=0),
    )
    jhj = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)
    jhr = Cplx(
        np.concatenate([np.asarray(p[2].re) for p in parts], axis=0),
        np.concatenate([np.asarray(p[2].im) for p in parts], axis=0),
    )
    iters = int(max(int(p[3]) for p in parts))
    return gains, jhj, jhr, iters
