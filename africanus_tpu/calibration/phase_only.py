"""Phase-only Gauss-Newton gain calibration.

TPU-native equivalent of reference
``africanus/calibration/phase_only/phase_only.py`` (gauss_newton:243,
compute_jhj:110, compute_jhr:168, compute_jhj_and_jhr:30). DIAG_DIAG mode:
the Jacobian of V_pq = g_p m g_q* w.r.t. the phase of g_p is
i·g_p·m·g_q*, so JᴴJ is |g_p m g_q*|² and JᴴR = ∓i·conj(g_p m g_q*)·R.

The reference's per-time-bin row loops with += into the (time, ant) gain
table become one gather (per-row gains) plus, when antenna/time metadata
is concrete (the normal case — it is host data), a host-planned padded
*gather+sum* over each (time, ant) bin's contributing baseline-sides:
XLA scatter tops out at ~1.4e8 elem/s on TPU while contiguous-payload
gathers run at bandwidth. Traced metadata falls back to scatter-adds.
The outer while-loop is a ``lax.while_loop`` carrying the gain *phases*.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from africanus_tpu.ops.cplx import Cplx, cplx
from africanus_tpu.calibration.utils import (
    DIAG_DIAG,
    check_type,
    residual_vis_ri,
    _row_time_index,
)

__all__ = [
    "compute_jhj",
    "compute_jhr",
    "compute_jhj_and_jhr",
    "gauss_newton",
    "gauss_newton_ri",
]


def _ant_gather_table(time_bin_indices, time_bin_counts, antenna1,
                      antenna2, ntime, nant):
    """Host inverse table: per (time, ant) bin, the padded list of
    contributing baseline-sides (side p = row, side q = row + nrow).
    None when the metadata is traced (scatter fallback)."""
    try:
        tbi = np.asarray(time_bin_indices)
        tbc = np.asarray(time_bin_counts)
        a1 = np.asarray(antenna1)
        a2 = np.asarray(antenna2)
    except Exception:
        return None
    from africanus_tpu.averaging.time_and_channel_avg import (
        _bin_gather_table,
    )

    nrow = a1.shape[0]
    # chunked callers pass absolute row offsets — rebaseline like the
    # reference (phase_only.py:137 'time_bin_indices -= ...min()');
    # without this the slices fall out of bounds and numpy silently
    # yields empty assignments (everything lands in time bin 0)
    if tbi.size:
        tbi = tbi - tbi.min()
    t_row = np.zeros(nrow, np.int64)
    for ti, (s, c) in enumerate(zip(tbi, tbc)):
        t_row[int(s) : int(s) + int(c)] = ti
    bins = np.concatenate([t_row * nant + a1, t_row * nant + a2])
    return _bin_gather_table(bins, ntime * nant)


def _gather_bin_sum(tbl, contrib_p, contrib_q, out_shape):
    """Sum per-(time, ant) bins of the stacked side contributions."""
    sel, valid = tbl
    sel = jnp.asarray(sel)
    mask = jnp.asarray(valid)[(...,) + (None,) * (len(out_shape) - 2)]
    x = jnp.concatenate([contrib_p, contrib_q], axis=0)
    g = x[sel]
    return jnp.where(mask, g, 0).sum(axis=1).reshape(out_shape)


def _jac_terms(g, t, antenna1, antenna2, model, flag):
    """Common per-row pieces: jac = g_p·m·conj(g_q) (sign applied later)."""
    gp = g[t, antenna1]  # (row, chan, dir, corr)
    gq = g[t, antenna2]
    m = cplx(model)  # (row, chan, dir, corr)
    jac = gp * m * gq.conj()

    flag = jnp.asarray(flag)
    keep = ~jnp.any(flag != 0, axis=-1)  # (row, chan)
    keep = keep[:, :, None, None].astype(jac.re.dtype)
    return Cplx(jac.re * keep, jac.im * keep)


def compute_jhj(
    time_bin_indices, time_bin_counts, antenna1, antenna2, jones, model, flag
):
    """Diagonal of JᴴJ per (time, ant, chan, dir, corr) — real array
    (reference phase_only.py:110)."""
    g = cplx(jones)
    mode = check_type(g, cplx(model), vis_type="model")
    if mode != DIAG_DIAG:
        # reference zeroes the jacobian outside DIAG_DIAG (phase_only.py:16-21)
        return jnp.zeros(g.shape, g.re.dtype)

    tbl = _ant_gather_table(time_bin_indices, time_bin_counts, antenna1,
                            antenna2, g.shape[0], g.shape[1])
    antenna1 = jnp.asarray(antenna1)
    antenna2 = jnp.asarray(antenna2)
    t = _row_time_index(time_bin_indices, antenna1.shape[0])

    jac = _jac_terms(g, t, antenna1, antenna2, model, flag)
    jac2 = jac.re * jac.re + jac.im * jac.im  # |i·jac|² == |jac|²

    if tbl is not None:
        return _gather_bin_sum(tbl, jac2, jac2, g.shape)

    jhj = jnp.zeros(g.shape, g.re.dtype)
    jhj = jhj.at[t, antenna1].add(jac2)
    jhj = jhj.at[t, antenna2].add(jac2)
    return jhj


def compute_jhr(
    time_bin_indices, time_bin_counts, antenna1, antenna2, jones, residual, model, flag
):
    """JᴴR per (time, ant, chan, dir, corr) — complex-valued
    (reference phase_only.py:168). Returns a Cplx pair if ``jones`` is a
    pair, else a complex array."""
    pair_in = isinstance(jones, Cplx)
    g = cplx(jones)
    mode = check_type(g, cplx(model), vis_type="model")
    if mode != DIAG_DIAG:
        zeros = jnp.zeros(g.shape, g.re.dtype)
        out = Cplx(zeros, zeros)
        return out if pair_in else lax.complex(out.re, out.im)

    tbl = _ant_gather_table(time_bin_indices, time_bin_counts, antenna1,
                            antenna2, g.shape[0], g.shape[1])
    antenna1 = jnp.asarray(antenna1)
    antenna2 = jnp.asarray(antenna2)
    t = _row_time_index(time_bin_indices, antenna1.shape[0])

    jac = _jac_terms(g, t, antenna1, antenna2, model, flag)
    r = cplx(residual)  # (row, chan, corr)
    r = Cplx(r.re[:, :, None, :], r.im[:, :, None, :])  # broadcast over dir

    # p-antenna: conj(i·jac)·r = -i·conj(jac)·r ; q-antenna: conj(-i·jac)·r
    cjr = jac.conj() * r
    contrib_p = Cplx(cjr.im, -cjr.re)  # -i · cjr
    contrib_q = Cplx(-cjr.im, cjr.re)  # +i · cjr

    if tbl is not None:
        jre = _gather_bin_sum(tbl, contrib_p.re, contrib_q.re, g.shape)
        jim = _gather_bin_sum(tbl, contrib_p.im, contrib_q.im, g.shape)
    else:
        zre = jnp.zeros(g.shape, g.re.dtype)
        zim = jnp.zeros(g.shape, g.re.dtype)
        jre = zre.at[t, antenna1].add(contrib_p.re).at[
            t, antenna2
        ].add(contrib_q.re)
        jim = zim.at[t, antenna1].add(contrib_p.im).at[
            t, antenna2
        ].add(contrib_q.im)
    out = Cplx(jre, jim)
    return out if pair_in else lax.complex(out.re, out.im)


def compute_jhj_and_jhr(
    time_bin_indices, time_bin_counts, antenna1, antenna2, jones, residual, model, flag
):
    """Gauss-Newton normal-equation terms for the phase-only solver.

    Returns the diagonal JhJ and the data-residual projection JhR in
    one call (reference ``phase_only/phase_only.py:30``
    compute_jhj_and_jhr). DIAG_DIAG mode only, matching the
    reference's own limitation (``phase_only.py:56-57``).

    Parameters
    ----------
    time_bin_indices, time_bin_counts : (utime,) int row-chunk layout
    antenna1, antenna2 : (row,) int
    jones : (utime, ant, chan, dir, corr) complex current gains
    residual, model : (row, chan, dir, corr) complex
    flag : (row, chan, dir, corr) bool (True kills the sample)

    Returns
    -------
    (jhj, jhr) — both (utime, ant, chan, dir, corr), real/complex per
    the reference convention.
    """
    mode = check_type(cplx(jones), cplx(residual))
    if mode != DIAG_DIAG:
        raise NotImplementedError("only the DIAG_DIAG mode is implemented (reference parity)")
    jhj = compute_jhj(
        time_bin_indices, time_bin_counts, antenna1, antenna2, jones, model, flag
    )
    jhr = compute_jhr(
        time_bin_indices, time_bin_counts, antenna1, antenna2, jones, residual,
        model, flag,
    )
    return jhj, jhr


def gauss_newton_ri(
    time_bin_indices,
    time_bin_counts,
    antenna1,
    antenna2,
    jones,
    vis,
    flag,
    model,
    weight,
    tol=1e-4,
    maxiter=100,
):
    """Pair-native phase-only Gauss-Newton solve (reference
    phase_only.py:243-308). Returns (jones, jhj, jhr, iterations)."""
    g0 = cplx(jones)
    v = cplx(vis)
    m = cplx(model)
    mode = check_type(g0, v)
    if mode != DIAG_DIAG:
        raise NotImplementedError("only DIAG_DIAG mode is implemented (reference parity)")

    weight = jnp.asarray(weight)
    sqrtw = jnp.sqrt(weight)
    v = Cplx(v.re * sqrtw, v.im * sqrtw)
    m = Cplx(m.re * sqrtw[:, :, None], m.im * sqrtw[:, :, None])

    # Host metadata FIRST, before any jnp conversion: under jit,
    # jnp.asarray(host_array) yields a tracer and np.asarray(tracer)
    # throws, which would silently drop _ant_gather_table to None and
    # the whole solve onto the ~1.4e8 elem/s XLA scatter path (3x the
    # iteration time at SKA-mid shapes).
    tbl = _ant_gather_table(time_bin_indices, time_bin_counts, antenna1,
                            antenna2, g0.shape[0], g0.shape[1])

    # JHJ is phase-independent in DIAG_DIAG mode (|g|=1): compute once
    # (raw antenna args — compute_jhj builds its own host table)
    jhj = compute_jhj(
        time_bin_indices, time_bin_counts, antenna1, antenna2, g0, m, flag
    )
    safe = jnp.where(jhj == 0.0, 1.0, jhj)

    antenna1 = jnp.asarray(antenna1)
    antenna2 = jnp.asarray(antenna2)
    nrow = antenna1.shape[0]

    # Fused iteration body: the per-row Jacobian g_p·m·conj(g_q) is
    # computed ONCE and feeds both the residual and JᴴR (the unfused
    # residual_vis_ri + compute_jhr pair gathers the gains and rebuilds
    # it twice; fusing measures 1.7 ms/iter vs 4.6 at SKA-mid shapes).
    # Flag masking rides the model: a masked jac is zero at flagged
    # cells, so conj(jac)·r vanishes there regardless of r — identical
    # contributions to the reference's explicit residual zeroing
    # (residual_vis.py:108).
    t = _row_time_index(time_bin_indices, nrow)
    flag = jnp.asarray(flag)
    keep = ~jnp.any(flag.reshape(flag.shape[0], flag.shape[1], -1) != 0,
                    axis=-1)
    keep = keep[:, :, None, None].astype(m.re.dtype)
    mk = Cplx(m.re * keep, m.im * keep)
    gshape = g0.shape

    def bin_sum(contrib_p, contrib_q):
        if tbl is not None:
            return _gather_bin_sum(tbl, contrib_p, contrib_q, gshape)
        out = jnp.zeros(gshape, contrib_p.dtype)
        return out.at[t, antenna1].add(contrib_p).at[
            t, antenna2
        ].add(contrib_q)

    phases0 = jnp.arctan2(g0.im, g0.re)
    zeros = jnp.zeros_like(phases0)

    def cond(state):
        _, _, eps, k = state
        return (eps > tol) & (k < maxiter)

    def body(state):
        phases, _, _, k = state
        g = Cplx(jnp.cos(phases), jnp.sin(phases))
        gp = Cplx(g.re[t, antenna1], g.im[t, antenna1])
        gq = Cplx(g.re[t, antenna2], g.im[t, antenna2])
        jac = gp * mk * gq.conj()  # (row, chan, dir, corr)
        r = Cplx(v.re - jac.re.sum(axis=2), v.im - jac.im.sum(axis=2))
        cjr = jac.conj() * Cplx(r.re[:, :, None, :], r.im[:, :, None, :])
        # p-antenna: conj(i·jac)·r = -i·cjr ; q-antenna: conj(-i·jac)·r
        jhr = Cplx(bin_sum(cjr.im, -cjr.im), bin_sum(-cjr.re, cjr.re))
        # 0.5·Re(JHR/JHJ) phase update (reference :301); guard zero JHJ
        update = 0.5 * jnp.where(jhj == 0.0, 0.0, jhr.re / safe)
        eps = jnp.abs(update).max()
        return phases + update, jhr, eps, k + 1

    init = (phases0, Cplx(zeros, zeros), jnp.asarray(jnp.inf, phases0.dtype), 0)
    phases, jhr, _, k = lax.while_loop(cond, body, init)

    return Cplx(jnp.cos(phases), jnp.sin(phases)), jhj, jhr, k


def gauss_newton(
    time_bin_indices,
    time_bin_counts,
    antenna1,
    antenna2,
    jones,
    vis,
    flag,
    model,
    weight,
    tol=1e-4,
    maxiter=100,
):
    """Complex-dtype phase-only Gauss-Newton solve (reference API parity)."""
    g, jhj, jhr, k = gauss_newton_ri(
        time_bin_indices,
        time_bin_counts,
        antenna1,
        antenna2,
        jones,
        vis,
        flag,
        model,
        weight,
        tol=tol,
        maxiter=maxiter,
    )
    return lax.complex(g.re, g.im), jhj, lax.complex(jhr.re, jhr.im), k
