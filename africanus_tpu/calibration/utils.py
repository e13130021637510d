"""Calibration utilities: gain application/removal and residuals.

TPU-native equivalents of reference ``africanus/calibration/utils/``:
check_type (utils.py:11), chunkify_rows (utils.py:45), corrupt_vis
(corrupt_vis.py:59), correct_vis (correct_vis.py:62), residual_vis
(residual_vis.py:63), compute_and_corrupt_vis (compute_and_corrupt_vis.py:76).

Gain modes follow the reference enumeration:
- DIAG_DIAG (0): jones (time, ant, chan, dir, corr), vis (row, chan, corr)
- DIAG (1):      jones (time, ant, chan, dir, 2),   vis (row, chan, 2, 2)
- FULL (2):      jones (time, ant, chan, dir, 2, 2), vis (row, chan, 2, 2)

The reference's per-time-bin row loops become a per-row time-index gather
(rows are contiguous per unique time, so the map is a searchsorted over the
bin starts); everything else is fused elementwise complex arithmetic on
split re/im pairs summed over the direction axis.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from africanus_tpu.ops.cplx import Cplx, cplx

__all__ = [
    "DIAG_DIAG",
    "DIAG",
    "FULL",
    "check_type",
    "chunkify_rows",
    "corrupt_vis",
    "corrupt_vis_ri",
    "correct_vis",
    "correct_vis_ri",
    "residual_vis",
    "residual_vis_ri",
    "compute_and_corrupt_vis",
    "compute_and_corrupt_vis_ri",
]

DIAG_DIAG = 0
DIAG = 1
FULL = 2


def check_type(jones, vis, vis_type="vis"):
    """Classify the gain mode from jones/vis dimension counts
    (reference utils.py:11-42)."""
    if vis_type == "vis":
        vis_ndim = (3, 4)
    elif vis_type == "model":
        vis_ndim = (4, 5)
    else:
        raise ValueError("Unknown vis_type")

    vis_axes = np.ndim(vis) if not isinstance(vis, Cplx) else vis.re.ndim
    jones_axes = np.ndim(jones) if not isinstance(jones, Cplx) else jones.re.ndim

    if vis_axes == vis_ndim[0]:
        if jones_axes != 5:
            raise RuntimeError(
                "Jones axes not compatible with visibility axes. "
                f"Expected length 5 but got length {jones_axes}"
            )
        return DIAG_DIAG
    if vis_axes == vis_ndim[1]:
        if jones_axes == 5:
            return DIAG
        if jones_axes == 6:
            return FULL
        raise RuntimeError("jones array rank does not match any supported mode")
    raise RuntimeError("vis array rank does not match any supported mode")


def chunkify_rows(time, utimes_per_chunk):
    """Row chunking aligned to unique times (reference utils.py:45-57).

    Returns (row_chunks, time_bin_indices, time_bin_counts).
    """
    time = np.asarray(time)
    utimes, counts = np.unique(time, return_counts=True)
    n_time = len(utimes)
    if utimes_per_chunk <= 0:
        utimes_per_chunk = n_time
    row_chunks = [
        int(np.sum(counts[i : i + utimes_per_chunk]))
        for i in range(0, n_time, utimes_per_chunk)
    ]
    tbi = np.zeros(n_time, dtype=np.int32)
    tbi[1:] = np.cumsum(counts)[:-1]
    return tuple(row_chunks), tbi, counts.astype(np.int32)


def _row_time_index(time_bin_indices, nrow):
    """Per-row unique-time index from bin starts (bins are contiguous)."""
    tbi = jnp.asarray(time_bin_indices)
    tbi = tbi - tbi.min()
    rows = jnp.arange(nrow)
    return jnp.searchsorted(tbi, rows, side="right") - 1


def _validate_corrs(*pairs):
    for name, x in pairs:
        if x.shape[-1] > 2:
            raise ValueError("at most 2 correlations are supported here")


def corrupt_vis_ri(
    time_bin_indices, time_bin_counts, antenna1, antenna2, jones, model
) -> Cplx:
    """Apply (possibly direction-dependent) gains to model visibilities:
    V_pq = Σ_s G_p,s · M_pq,s · G_q,sᴴ. Pair-native."""
    g = cplx(jones)
    m = cplx(model)
    mode = check_type(g, m, vis_type="model")
    _validate_corrs(("model", m), ("jones", g))

    antenna1 = jnp.asarray(antenna1)
    antenna2 = jnp.asarray(antenna2)
    nrow = antenna1.shape[0]
    t = _row_time_index(time_bin_indices, nrow)

    gp = g[t, antenna1]  # (row, chan, dir, corr…)
    gq = g[t, antenna2]

    if mode == DIAG_DIAG:
        prod = gp * m * gq.conj()  # (row, chan, dir, corr)
        return Cplx(prod.re.sum(axis=2), prod.im.sum(axis=2))
    if mode == DIAG:
        # gp (row,chan,dir,2), m (row,chan,dir,2,2)
        out = gp[..., :, None] * m * gq.conj()[..., None, :]
        return Cplx(out.re.sum(axis=2), out.im.sum(axis=2))
    # FULL: gp (row,chan,dir,2,2)
    from africanus_tpu.ops import jones as j2

    prod = j2.mul2x2(gp, j2.mul2x2_hr(m, gq))
    return Cplx(prod.re.sum(axis=2), prod.im.sum(axis=2))


def corrupt_vis(time_bin_indices, time_bin_counts, antenna1, antenna2, jones, model):
    """Complex-dtype corrupt_vis (reference parity: corrupt_vis.py:59)."""
    out = corrupt_vis_ri(
        time_bin_indices, time_bin_counts, antenna1, antenna2, jones, model
    )
    return lax.complex(out.re, out.im)


def _inv2x2(a: Cplx) -> Cplx:
    """Inverse over trailing (2, 2) dims of a Cplx array."""
    a00 = Cplx(a.re[..., 0, 0], a.im[..., 0, 0])
    a01 = Cplx(a.re[..., 0, 1], a.im[..., 0, 1])
    a10 = Cplx(a.re[..., 1, 0], a.im[..., 1, 0])
    a11 = Cplx(a.re[..., 1, 1], a.im[..., 1, 1])
    det = a00 * a11 - a01 * a10
    inv_det2 = 1.0 / (det.re * det.re + det.im * det.im)
    inv_det = Cplx(det.re * inv_det2, -det.im * inv_det2)

    def stack(b00, b01, b10, b11):
        re = jnp.stack(
            [jnp.stack([b00.re, b01.re], -1), jnp.stack([b10.re, b11.re], -1)], -2
        )
        im = jnp.stack(
            [jnp.stack([b00.im, b01.im], -1), jnp.stack([b10.im, b11.im], -1)], -2
        )
        return Cplx(re, im)

    return stack(a11 * inv_det, -a01 * inv_det, -a10 * inv_det, a00 * inv_det)


def correct_vis_ri(
    time_bin_indices, time_bin_counts, antenna1, antenna2, jones, vis, flag
) -> Cplx:
    """Remove direction-independent gains: V_corrected = G_p⁻¹ V (G_qᴴ)⁻¹.
    Flagged (row, chan) cells are zeroed (reference correct_vis.py:111)."""
    g = cplx(jones)
    v = cplx(vis)
    mode = check_type(g, v)
    _validate_corrs(("vis", v), ("jones", g))
    if g.shape[3] > 1:
        raise ValueError(
            "cannot correct with direction-dependent jones (n_dir > 1)"
        )

    antenna1 = jnp.asarray(antenna1)
    antenna2 = jnp.asarray(antenna2)
    flag = jnp.asarray(flag)
    nrow = antenna1.shape[0]
    t = _row_time_index(time_bin_indices, nrow)

    gp = g[t, antenna1][:, :, 0]  # (row, chan, corr…) — single direction
    gq = g[t, antenna2][:, :, 0]

    if mode == DIAG_DIAG:
        denom = gp * gq.conj()
        inv = 1.0 / (denom.re * denom.re + denom.im * denom.im)
        out = v * Cplx(denom.re * inv, -denom.im * inv)
    elif mode == DIAG:
        denom = gp[..., :, None] * gq.conj()[..., None, :]  # (row,chan,2,2)
        inv = 1.0 / (denom.re * denom.re + denom.im * denom.im)
        out = v * Cplx(denom.re * inv, -denom.im * inv)
    else:  # FULL
        from africanus_tpu.ops import jones as j2

        gp_inv = _inv2x2(gp)
        gqh_inv = _inv2x2(j2.hermitian(gq))
        out = j2.mul2x2(gp_inv, j2.mul2x2(v, gqh_inv))

    # zero flagged cells: flag has vis shape
    keep = ~jnp.any(
        flag.reshape(flag.shape[0], flag.shape[1], -1) != 0, axis=-1
    )
    keep = keep.reshape(keep.shape + (1,) * (out.re.ndim - 2))
    return Cplx(jnp.where(keep, out.re, 0.0), jnp.where(keep, out.im, 0.0))


def correct_vis(
    time_bin_indices, time_bin_counts, antenna1, antenna2, jones, vis, flag
):
    """Complex-dtype correct_vis (reference parity: correct_vis.py:62)."""
    out = correct_vis_ri(
        time_bin_indices, time_bin_counts, antenna1, antenna2, jones, vis, flag
    )
    return lax.complex(out.re, out.im)


def residual_vis_ri(
    time_bin_indices, time_bin_counts, antenna1, antenna2, jones, vis, flag, model
) -> Cplx:
    """Residual V − Σ_s G_p,s M_s G_q,sᴴ; flagged cells are zeroed
    (reference residual_vis.py:108 skips them, leaving zeros)."""
    v = cplx(vis)
    corrupted = corrupt_vis_ri(
        time_bin_indices, time_bin_counts, antenna1, antenna2, jones, model
    )
    flag = jnp.asarray(flag)
    out = v - corrupted
    keep = ~jnp.any(
        flag.reshape(flag.shape[0], flag.shape[1], -1) != 0, axis=-1
    )
    keep = keep.reshape(keep.shape + (1,) * (out.re.ndim - 2))
    return Cplx(jnp.where(keep, out.re, 0.0), jnp.where(keep, out.im, 0.0))


def residual_vis(
    time_bin_indices, time_bin_counts, antenna1, antenna2, jones, vis, flag, model
):
    """Complex-dtype residual_vis (reference parity: residual_vis.py:63)."""
    out = residual_vis_ri(
        time_bin_indices, time_bin_counts, antenna1, antenna2, jones, vis, flag, model
    )
    return lax.complex(out.re, out.im)


def compute_and_corrupt_vis_ri(
    time_bin_indices, time_bin_counts, antenna1, antenna2, jones, model, uvw, freq, lm
) -> Cplx:
    """Predict from time-variable point-source models and corrupt with
    time-variable gains (reference compute_and_corrupt_vis.py:76).

    model : (utime, chan, dir, corr…); lm : (utime, dir, 2);
    jones : (utime, ant, chan, dir, corr…); returns (row, chan, corr…).
    """
    from africanus_tpu.constants import minus_two_pi_over_c

    g = cplx(jones)
    m = cplx(model)
    mode = check_type(g, m, vis_type="model")
    _validate_corrs(("model", m), ("jones", g))

    antenna1 = jnp.asarray(antenna1)
    antenna2 = jnp.asarray(antenna2)
    uvw = jnp.asarray(uvw)
    freq = jnp.asarray(freq)
    lm = jnp.asarray(lm)
    nrow = antenna1.shape[0]
    t = _row_time_index(time_bin_indices, nrow)

    # per-row source geometry from the row's time bin
    l = lm[t, :, 0]  # noqa: E741  (row, dir)
    mm = lm[t, :, 1]
    n = jnp.sqrt(1.0 - l * l - mm * mm)
    dot = (
        uvw[:, 0, None] * l + uvw[:, 1, None] * mm + uvw[:, 2, None] * (n - 1.0)
    )  # (row, dir)
    p = minus_two_pi_over_c * dot[:, None, :] * freq[None, :, None]  # (row,chan,dir)
    kre = jnp.cos(p) / n[:, None, :]
    kim = jnp.sin(p) / n[:, None, :]

    mrow = m[t]  # (row, chan, dir, corr…)
    corr_dims = mrow.re.ndim - 3
    K = Cplx(
        kre.reshape(kre.shape + (1,) * corr_dims),
        kim.reshape(kim.shape + (1,) * corr_dims),
    )
    src_vis = mrow * K  # (row, chan, dir, corr…)

    gp = g[t, antenna1]
    gq = g[t, antenna2]

    if mode == DIAG_DIAG:
        prod = gp * src_vis * gq.conj()
        return Cplx(prod.re.sum(axis=2), prod.im.sum(axis=2))
    if mode == DIAG:
        out = gp[..., :, None] * src_vis * gq.conj()[..., None, :]
        return Cplx(out.re.sum(axis=2), out.im.sum(axis=2))
    from africanus_tpu.ops import jones as j2

    prod = j2.mul2x2(gp, j2.mul2x2_hr(src_vis, gq))
    return Cplx(prod.re.sum(axis=2), prod.im.sum(axis=2))


def compute_and_corrupt_vis(
    time_bin_indices, time_bin_counts, antenna1, antenna2, jones, model, uvw, freq, lm
):
    """Predict model visibilities from (lm, uvw, freq) and corrupt them
    with time-variable gains in one call (complex output; reference
    ``calibration/utils/compute_and_corrupt_vis.py:76``).

    Parameters
    ----------
    time_bin_indices, time_bin_counts : (utime,) int row-chunk layout
        per unique time (from :func:`chunkify_rows`)
    antenna1, antenna2 : (row,) int
    jones : (utime, ant, chan, dir, corr...) complex gains
    model : (utime, chan, dir, corr...) complex model coherencies
    uvw : (row, 3) float metres
    freq : (chan,) float Hz
    lm : (dir, 2) float direction cosines per direction

    Returns
    -------
    (row, chan, corr...) complex corrupted model visibilities.
    """
    out = compute_and_corrupt_vis_ri(
        time_bin_indices, time_bin_counts, antenna1, antenna2, jones, model, uvw,
        freq, lm,
    )
    return lax.complex(out.re, out.im)
