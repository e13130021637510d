"""predict_vis — the RIME Jones-chain visibility predictor.

V_pq = G_p ( B_pq + Σ_s E_ps X_pqs E_qs^H ) G_q^H

TPU-native equivalent of reference ``africanus/rime/predict.py`` (predict_vis
:466, overload :505, sum_coherencies_factory :193, apply_dies_factory :342,
predict_checks :380) and of the CUDA kernel ``rime/cuda/predict.cu.j2``.

Design notes
------------
- The reference specialises a numba closure per optional-argument
  combination; here the same dispatch is plain trace-time Python — absent
  arguments never enter the XLA graph.
- Antenna-indexed Jones terms (src, time, ant, chan, corr…) are gathered to
  rows with one XLA gather, after which the whole chain is a fused VPU
  elementwise complex pipeline on split re/im pairs
  (:mod:`africanus_tpu.ops.jones`), summed over the source axis.
- ``source_block`` chunks the source dimension through ``lax.scan``,
  bounding peak memory exactly like the reference dask layer's
  LinearReduction (rime/dask_predict.py:64) — accumulation happens in the
  carry instead of a serialized task chain.
- Under ``shard_map`` shard rows (and/or channels) across the mesh;
  antenna-indexed arrays are replicated, matching the reference's
  requirement that the antenna dimension be unchunked
  (rime/dask_predict.py:478-489).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from africanus_tpu.ops.cplx import Cplx, cplx
from africanus_tpu.ops import jones as j2

__all__ = ["predict_vis", "predict_vis_ri", "apply_gains", "apply_gains_ri"]


def _check_args(dde1, coh, dde2, die1, bvis, die2):
    """Mirror of reference predict_checks (rime/predict.py:380-463)."""
    have_ddes1, have_ddes2 = dde1 is not None, dde2 is not None
    have_dies1, have_dies2 = die1 is not None, die2 is not None

    if have_ddes1 ^ have_ddes2:
        raise ValueError("dde1_jones and dde2_jones must be present or absent together")
    if have_dies1 ^ have_dies2:
        raise ValueError("die1_jones and die2_jones must be present or absent together")

    have_ddes = have_ddes1 and have_ddes2
    have_coh = coh is not None
    have_dies = have_dies1 and have_dies2
    have_bvis = bvis is not None

    def ndim(x):
        return x.re.ndim

    if have_ddes and ndim(dde1) not in (5, 6):
        raise ValueError(f"dde1_jones.ndim {ndim(dde1)} not in (5, 6)")
    if have_ddes and ndim(dde1) != ndim(dde2):
        raise ValueError("dde1_jones and dde2_jones rank mismatch")
    if have_coh and ndim(coh) not in (4, 5):
        raise ValueError(f"source_coh.ndim {ndim(coh)} not in (4, 5)")
    if have_dies and ndim(die1) not in (4, 5):
        raise ValueError(f"die1_jones.ndim {ndim(die1)} not in (4, 5)")
    if have_dies and ndim(die1) != ndim(die2):
        raise ValueError("die1_jones and die2_jones rank mismatch")
    if have_bvis and ndim(bvis) not in (3, 4):
        raise ValueError(f"base_vis.ndim {ndim(bvis)} not in (3, 4)")

    # All present terms must agree on the correlation layout
    sizes = []
    if have_ddes:
        n = ndim(dde1)
        sizes.append([n, n - 1, n - 2, n - 1])
    if have_coh:
        n = ndim(coh)
        sizes.append([n + 1, n, n - 1, n])
    if have_dies:
        n = ndim(die1)
        sizes.append([n + 1, n, n - 1, n])
    if have_bvis:
        n = ndim(bvis)
        sizes.append([n + 2, n + 1, n, n + 1])
    if not all(sizes[0] == s for s in sizes[1:]):
        raise ValueError(
            "A rank pre-condition failed "
            "(missing values are ignored):\n"
            "dde_jones{1,2}.ndim == source_coh.ndim + 1\n"
            "dde_jones{1,2}.ndim == base_vis.ndim + 2\n"
            "dde_jones{1,2}.ndim == die_jones{1,2}.ndim + 1"
        )

    # 2x2 iff the dde ndim is 6 / coh ndim 5 / die ndim 5 / bvis ndim 4
    if have_ddes:
        full = ndim(dde1) == 6
    elif have_coh:
        full = ndim(coh) == 5
    elif have_dies:
        full = ndim(die1) == 5
    elif have_bvis:
        full = ndim(bvis) == 4
    else:
        raise ValueError(
            "Insufficient inputs to infer the output visibility shape"
        )

    return have_ddes, have_coh, have_dies, have_bvis, full


def _jones_chain(a1, x, a2, full):
    """A1 · X · A2ᴴ (or the available subset) for one source block.

    diag layout: elementwise a1 * x * conj(a2);
    2x2 layout: explicit component products (ops/jones.py).
    """
    if a1 is not None and x is not None:
        if full:
            return j2.mul2x2(a1, j2.mul2x2_hr(x, a2))
        return a1 * x * a2.conj()
    if a1 is not None:
        if full:
            return j2.mul2x2_hr(a1, a2)
        return a1 * a2.conj()
    return x


def predict_vis_ri(
    time_index,
    antenna1,
    antenna2,
    dde1_jones=None,
    source_coh=None,
    dde2_jones=None,
    die1_jones=None,
    base_vis=None,
    die2_jones=None,
    source_block: int | None = None,
) -> Cplx:
    """Pair-native predict_vis.

    Parameters
    ----------
    time_index : (row,) int array — indices into the time dimension of the
        dde/die terms, normalised internally by subtracting the row-block
        minimum (reference semantics, predict.py:585).
    antenna1, antenna2 : (row,) int arrays
    dde1_jones, dde2_jones : (src, time, ant, chan, corr…) Cplx/array
    source_coh : (src, row, chan, corr…) Cplx/array
    die1_jones, die2_jones : (time, ant, chan, corr…) Cplx/array
    base_vis : (row, chan, corr…) Cplx/array
    source_block : optional int — scan the source axis in blocks of this
        size to bound memory (requires src % source_block == 0).

    Returns
    -------
    Cplx with (row, chan, corr…) components.
    """
    time_index = jnp.asarray(time_index)
    antenna1 = jnp.asarray(antenna1)
    antenna2 = jnp.asarray(antenna2)

    opt = [dde1_jones, source_coh, dde2_jones, die1_jones, base_vis, die2_jones]
    dde1, coh, dde2, die1, bvis, die2 = (
        cplx(a) if a is not None else None for a in opt
    )

    have_ddes, have_coh, have_dies, have_bvis, full = _check_args(
        dde1, coh, dde2, die1, bvis, die2
    )

    tmin = jnp.min(time_index)
    ti = time_index - tmin

    def source_sum(dde1, coh, dde2):
        """Σ_s A1·X·A2ᴴ with row-gathered DDEs."""
        if have_ddes:
            a1 = dde1[:, ti, antenna1]  # (src, row, chan, corr…)
            a2 = dde2[:, ti, antenna2]
        else:
            a1 = a2 = None
        prod = _jones_chain(a1, coh, a2, full)
        return Cplx(jnp.sum(prod.re, axis=0), jnp.sum(prod.im, axis=0))

    if not have_ddes and not have_coh:
        out = None
    elif source_block is None:
        out = source_sum(dde1, coh, dde2)
    else:
        nsrc = (dde1 if have_ddes else coh).shape[0]
        if nsrc % source_block != 0:
            raise ValueError(
                f"source count {nsrc} not divisible by source_block {source_block}"
            )
        nblock = nsrc // source_block

        def reblock(x):
            if x is None:
                return None
            return x.reshape((nblock, source_block) + x.shape[1:])

        bdde1, bcoh, bdde2 = reblock(dde1), reblock(coh), reblock(dde2)

        def body(acc, blk):
            d1, c, d2 = blk
            s = source_sum(d1, c, d2)
            return Cplx(acc.re + s.re, acc.im + s.im), None

        # probe one block for the output shape/dtype
        shape_probe = source_sum(
            bdde1[0] if bdde1 is not None else None,
            bcoh[0] if bcoh is not None else None,
            bdde2[0] if bdde2 is not None else None,
        )
        zero = Cplx(jnp.zeros_like(shape_probe.re), jnp.zeros_like(shape_probe.im))

        xs = tuple(b for b in (bdde1, bcoh, bdde2) if b is not None)

        def body_wrap(acc, xs_blk):
            it = iter(xs_blk)
            d1 = next(it) if bdde1 is not None else None
            c = next(it) if bcoh is not None else None
            d2 = next(it) if bdde2 is not None else None
            return body(acc, (d1, c, d2))

        out, _ = lax.scan(body_wrap, zero, xs)

    if have_bvis:
        out = bvis if out is None else out + bvis

    if have_dies:
        g1 = die1[ti, antenna1]  # (row, chan, corr…)
        g2 = die2[ti, antenna2]
        if out is None:
            # Reference semantics: dies-only starts from a zero visibility
            # buffer (predict.py:288-300 output_factory), so G·0·Gᴴ = 0.
            shape = (time_index.shape[0],) + die1.shape[2:]
            zeros = jnp.zeros(shape, die1.re.dtype)
            out = Cplx(zeros, zeros)
        elif full:
            out = j2.mul2x2(g1, j2.mul2x2_hr(out, g2))
        else:
            out = g1 * out * g2.conj()

    if out is None:
        raise ValueError(
            "Insufficient inputs to infer the output visibility shape"
        )
    return out


def predict_vis(
    time_index,
    antenna1,
    antenna2,
    dde1_jones=None,
    source_coh=None,
    dde2_jones=None,
    die1_jones=None,
    base_vis=None,
    die2_jones=None,
    source_block: int | None = None,
):
    """Complex-dtype predict_vis (reference API parity; rime/predict.py:466).

    Returns (row, chan, corr…) complex visibilities.
    """
    opt = [dde1_jones, source_coh, dde2_jones, die1_jones, base_vis, die2_jones]
    present = [jnp.asarray(a) for a in opt if a is not None]
    if not present:
        raise ValueError(
            "Insufficient inputs to infer the output visibility shape"
        )
    out_dtype = jnp.result_type(*(a.dtype for a in present))
    if not jnp.issubdtype(out_dtype, jnp.complexfloating):
        out_dtype = jnp.result_type(out_dtype, jnp.complex64)

    out = predict_vis_ri(
        time_index,
        antenna1,
        antenna2,
        dde1_jones,
        source_coh,
        dde2_jones,
        die1_jones,
        base_vis,
        die2_jones,
        source_block=source_block,
    )
    real_dtype = jnp.finfo(out_dtype).dtype
    return lax.complex(out.re.astype(real_dtype), out.im.astype(real_dtype))


def apply_gains_ri(time_index, antenna1, antenna2, gains1, vis, gains2) -> Cplx:
    """Apply DIE gains to visibilities: G_p · V_pq · G_qᴴ (pair-native).

    Reference: ``africanus/rime/predict.py:622`` (apply_gains =
    predict_vis with die/base_vis only).
    """
    return predict_vis_ri(
        time_index,
        antenna1,
        antenna2,
        die1_jones=gains1,
        base_vis=vis,
        die2_jones=gains2,
    )


def apply_gains(time_index, antenna1, antenna2, gains1, vis, gains2):
    """Apply direction-independent gains to visibilities.

    ``G_p · V_pq · G_q^H`` per row — a convenience alias for
    :func:`predict_vis` with only ``die{1,2}_jones`` and ``base_vis``
    set (reference ``rime/predict.py:622``).

    Parameters
    ----------
    time_index : (row,) int, index of each row's unique time
    antenna1, antenna2 : (row,) int antenna indices
    gains1, gains2 : (time, ant, chan, corr...) complex gains
        (corr as 1/2/2x2 trailing dims, like predict_vis DIE terms)
    vis : (row, chan, corr...) complex visibilities

    Returns
    -------
    (row, chan, corr...) complex corrupted visibilities.
    """
    return predict_vis(
        time_index,
        antenna1,
        antenna2,
        die1_jones=gains1,
        base_vis=vis,
        die2_jones=gains2,
    )
