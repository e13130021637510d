"""Pallas tile-binned convolutional gridder (TPU scatter replacement).

TPU scatter (XLA sorted segment-sum) tops out around ~1.4e8 scattered
elements/s, capping convolutional gridding well under 1 Mvis/s. This
kernel implements SURVEY.md's "hard part #1": visibilities are binned to
uv tiles on the host (gridding geometry is host metadata — uvw is
concrete at plan time), packed into fixed-size entry groups per tile, and
each tile accumulates its samples' W×W ES-kernel windows into a
VMEM-resident padded tile. Each window is owned by exactly the tile
containing its start cell; it spreads into that tile's core and
bottom/right halo, and :func:`assemble_tiles` folds halos back onto
neighbouring tiles with grid wraparound (single ownership keeps the fold
additive-exact).

w-stacking rides the same machinery: each visibility becomes ~W "virtual
samples", one per touched w-plane, with a per-entry ``scale`` (the w-axis
ES tap) and a ``plane`` index folded into the tile id. Real visibility
values stay traced; only geometry/weights are host metadata.

Mosaic constraints shape the inner loop (probed on this toolchain):
- dynamic *lane* slicing is unsupported → the window's lane position is
  baked into the ES argument: tap values are evaluated *at absolute lane
  coordinates* with a lane iota, so no shift is ever needed;
- dynamic *sublane* slicing is supported only at 8-aligned offsets → the
  window start row is aligned down to a multiple of 8 (``pl.multiple_of``
  hint) and the whole W×W window lands as ONE (blk, lanes) block
  read-modify-write, blk = round_up(W+7, 8) (16 for W ≤ 9, 24 up to 17 —
  the worst-case sub-8 shift of 7 must fit above the support); the sub-8
  row shift is folded into the ES argument, and rows outside the support
  evaluate to zero;
- per-entry scalars (row offset, fractional coords, vis values) live in
  SMEM blocks, which allow dynamic scalar indexing;
- SMEM is ~1 MB per buffer set → only O(group) scalars may live there,
  which is why ES taps are computed in-kernel rather than precomputed;
- ``lax.fori_loop`` in pallas only supports unroll ∈ {1, full} → the
  entry loop is unrolled by hand (8×) to pipeline load→compute→RMW.

Groups of one tile are consecutive in the Pallas grid so the output block
stays VMEM-resident across them; each tile's first group zero-initialises
it. Axis convention matches gridding/wgridder/core.py: grid rows are u,
columns v.
"""

from __future__ import annotations

import logging
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["plan_tiles", "plan_tiles_table", "plan_tiles_wstack",
           "grid_tiles_pallas", "grid_tiles_table_pallas",
           "grid_tiles_wstack_pallas", "assemble_tiles",
           "assemble_wstack_tiles", "extract_tiles",
           "extract_wstack_tiles", "degrid_tiles_pallas",
           "degrid_tiles_table_pallas", "degrid_tiles_wstack_pallas",
           "grid_tiles_wstack_mxu", "degrid_tiles_wstack_mxu",
           "grid_tiles_mxu", "degrid_tiles_mxu", "wstack_use_mxu",
           "tiles_use_mxu", "TILES_USE_MXU",
           "tile_pad_geometry", "default_tiles", "pack_supergroups",
           "choose_tile", "pack_shard_plans", "PLAN_ARRAY_KEYS",
           "WSTACK_PLAN_ARRAY_KEYS", "TABLE_PLAN_ARRAY_KEYS"]

log = logging.getLogger(__name__)

# Route default for the fused w-stack path. The MXU matmul kernels
# measured 2.2x (grid, 4.4 -> 9.6 Mvis/s) and 1.6x (degrid, 6.4 -> 10.2)
# over the scatter/gather kernels on v5e at the config-4 shape
# (benchmarks/RESULTS.md). Their per-plane dots are dense over the whole
# w-stack, so the advantage shrinks as nplanes grows past the ~support
# planes a sample actually touches — wstack_use_mxu caps the route.
WSTACK_USE_MXU = True

# Independent toggle for the plain plan_tiles MXU route (2D tile
# kernels) so disabling one route never silently changes the other.
TILES_USE_MXU = True


def wstack_use_mxu(plan):
    """True when the MXU matmul route should serve this fused plan.

    The route's cost multiplier is the per-group plane-loop depth:
    ``nwin`` (the sorted plan's w-window, ≈ support + group-boundary
    spread) when window metadata is present, the whole stack otherwise.
    Deep w-stacks therefore stay on the MXU as long as the plan was
    built with ``sort_planes``. Plane-blocked plans are MXU-only by
    construction (the scatter kernels reject them)."""
    if not plan.get("wstack_fused", False):
        return False
    if "plane_block" in plan or plan.get("subs", 1) > 1:
        return True
    depth = plan.get("nwin", plan["nplanes"])
    return WSTACK_USE_MXU and depth <= 3 * plan["support"]


def tiles_use_mxu(plan):
    """True when the MXU matmul route should serve a :func:`plan_tiles`
    plan. The dense dots cost tpad_r*tpad_c MACs per sample regardless
    of the WxW window, so the route only wins on small padded tiles: at
    (144, 128) it measured 1.4-1.6x the scatter/gather kernels (grid
    45.8 -> 64.6, degrid 38.7 -> 61.4 Mvis/s 4-corr; 1-corr 11.5 ->
    16.8 Msamples/s), while at the old 256-target tiles (272, 384) the
    ~8x dense-area cost would lose; plan_tiles defaults to MXU-friendly
    tiles accordingly."""
    return (TILES_USE_MXU
            and not plan.get("wstack_fused", False)
            and plan["tpad_r"] * plan["tpad_c"] <= 144 * 128)


PLAN_ARRAY_KEYS = ("first", "group_tile", "ir_loc", "uf", "vfa", "scale",
                   "sample_pack")

# fused w-stack plan format (plan_tiles_wstack): one entry per sample,
# per-plane taps in wsc, per-group w-window base in pbase; vis_slot is
# appended by pack_shard_plans
WSTACK_PLAN_ARRAY_KEYS = ("first", "group_tile", "ir_loc", "uf", "vfa",
                          "p0", "wsc", "pbase", "sample_pack")

# table-mode plan format (plan_tiles_table): quantized taps read from a
# shared oversampled kernel table (Perley-polyhedron AA kernels)
TABLE_PLAN_ARRAY_KEYS = ("first", "group_tile", "ir_loc", "dsh", "ic_loc",
                         "fr", "fc", "scale", "sample_pack")


def _round_up(x, m):
    return -(-x // m) * m


def choose_tile(n, target=256):
    """Largest divisor of ``n`` that is ≤ target (tiles must divide the
    grid so halo wraparound is a clean block roll)."""
    for t in range(min(target, n), 0, -1):
        if n % t == 0:
            return t
    return n


def tile_pad_geometry(tile_r, tile_c, support):
    """Padded-tile geometry shared by every plan format and the VMEM
    budget gate in gridding/wgridder/core.py: returns (blk, tpad_r,
    tpad_c). blk is the 8-aligned row-window covering the worst sub-8
    shift (7) plus the support (16 for W ≤ 9, 24 for W ≤ 17); rows pad
    to 8 (with room for the aligned blk-row RMW at the last start
    offset), cols to 128 — a W halo on each side throughout."""
    w = support
    blk = _round_up(w + 7, 8)
    max_r0a = ((tile_r + w - 1) // 8) * 8
    tpad_r = max(_round_up(tile_r + 2 * w, 8), max_r0a + blk)
    tpad_c = _round_up(tile_c + 2 * w, 128)
    return blk, tpad_r, tpad_c


def default_tiles(nu, nv, support):
    """The tile edges :func:`plan_tiles` / :func:`plan_tiles_table` pick
    when none are given (MXU-friendly: 128-row tiles, one padded
    128-lane column block). Exposed so callers can pre-check
    ``support <= min(tiles)`` and fall back to scatter instead of
    crashing (gridding/wgridder/core.py)."""
    return (choose_tile(nu, 128),
            choose_tile(nv, max(support, 128 - 2 * support)))


def _plan_setup(n, nu, nv, w, tile_r, tile_c, sample_id, scale, plane,
                nplanes):
    """Shared geometry validation + payload coercion for the tile
    planners (plan_tiles / plan_tiles_table): default tile pick,
    divisibility/support checks, and sample_id/scale/plane defaults."""
    if tile_r is None or tile_c is None:
        # MXU-friendly default (see tiles_use_mxu): 128-row tiles and a
        # column tile whose padded width stays at one 128-lane block
        dr, dc = default_tiles(nu, nv, w)
        tile_r = dr if tile_r is None else tile_r
        tile_c = dc if tile_c is None else tile_c
    if nu % tile_r or nv % tile_c:
        raise ValueError(f"tiles ({tile_r},{tile_c}) must divide ({nu},{nv})")
    if w > min(tile_r, tile_c):
        raise ValueError(f"support {w} exceeds tile ({tile_r},{tile_c})")

    sample_id = (np.arange(n, dtype=np.int64) if sample_id is None
                 else np.asarray(sample_id))
    scale = (np.ones(n, np.float32) if scale is None
             else np.asarray(scale, np.float32))
    plane = (np.zeros(n, np.int64) if plane is None
             else np.asarray(plane, np.int64))

    ntr = nu // tile_r
    ntc = nv // tile_c
    ntiles = nplanes * ntr * ntc
    return tile_r, tile_c, sample_id, scale, plane, ntr, ntc, ntiles


def plan_tiles(iu0, iv0, uf, vf, support, beta, nu, nv, tile_r=None,
               tile_c=None, group=1024, sample_id=None, scale=None,
               plane=None, nplanes=1):
    """Host-side tile binning.

    Parameters
    ----------
    iu0, iv0 : (E,) int window start coordinates. May be negative or
        ≥ nu/nv: windows wrap modulo the grid (handled by halo fold-back
        in :func:`assemble_tiles`). Requires support ≤ tile.
    uf, vf : (E,) float fractional positions relative to the window start
        (u_pix − iu0); tap t's ES argument is (uf − t)·2/W.
    support : W; beta : ES shape parameter.
    nu, nv : grid shape (rows=u, cols=v). Tiles must divide them.
    tile_r, tile_c : tile edges (default: largest divisors ≤ 128 /
        ≤ 128−2W — one 128-lane padded block, the MXU-route sweet spot).
    group : entries per kernel invocation.
    sample_id : (E,) int index into the flat visibility array for each
        (virtual) sample; default ``arange(E)``.
    scale : (E,) float weight applied to the visibility (w-plane ES tap
        for w-stacking); default 1.
    plane : (E,) int w-plane per virtual sample; default 0.
    nplanes : number of w-planes.

    Returns
    -------
    plan dict of packed (ngroups, …) entry arrays + geometry.
    """
    iu0 = np.asarray(iu0)
    iv0 = np.asarray(iv0)
    uf = np.asarray(uf, np.float32)
    vf = np.asarray(vf, np.float32)
    n = iu0.shape[0]
    w = support

    (tile_r, tile_c, sample_id, scale, plane, ntr, ntc,
     ntiles) = _plan_setup(n, nu, nv, w, tile_r, tile_c, sample_id,
                           scale, plane, nplanes)

    # each window is owned by EXACTLY the tile containing its start cell:
    # its whole extent fits in that tile's core + bottom/right halo, and
    # assemble_tiles folds the halos onto neighbouring tiles (with wrap).
    # Single ownership is what makes the fold additive-exact.
    tr_raw = iu0 // tile_r
    tc_raw = iv0 // tile_c
    tile_ids = ((plane * ntr + tr_raw % ntr) * ntc + tc_raw % ntc).astype(
        np.int64
    )

    # local window coords inside the padded tile (W halo each side),
    # relative to the *unwrapped* tile origin — wraparound is resolved by
    # assemble_tiles' halo roll. Row starts align down to a multiple of
    # 8 (Mosaic sublane constraint) with the sub-8 shift folded into the
    # u fractional coordinate; v coordinates are absolute in the tile.
    ir_all = (iu0 - tr_raw * tile_r + w).astype(np.int32)
    ic_all = (iv0 - tc_raw * tile_c + w).astype(np.int32)
    ir_al_in = (ir_all // 8) * 8
    uf_abs = (uf + (ir_all - ir_al_in)).astype(np.float32)
    vf_abs = (vf + ic_all).astype(np.float32)

    (ngroups, group_tile, group_base, first, pads) = _pack_entries(
        tile_ids, ntiles, group,
        pad_f32=-2.0 * w,
        sample_id=sample_id, ir=ir_al_in, ic=ic_all,
        uf=uf_abs, vf=vf_abs, scale=scale,
    )

    blk, tpad_r, tpad_c = tile_pad_geometry(tile_r, tile_c, w)

    return dict(
        tile_r=tile_r, tile_c=tile_c, support=w, beta=float(beta),
        ntr=ntr, ntc=ntc, nu=nu, nv=nv, nplanes=nplanes,
        tpad_r=tpad_r, tpad_c=tpad_c, blk=blk,
        ngroups=ngroups, group=group,
        group_tile=group_tile.astype(np.int32),
        sample_pack=pads["sample"], ir_loc=pads["ir"],
        uf=pads["uf"], vfa=pads["vf"],
        scale=pads["scale"], first=first,
    )


def _pack_entries(tile_ids, ntiles, group, pad_f32, sample_id, ir, ic,
                  scale, uf=None, vf=None, fr=None, fc=None):
    """Place entries into per-tile fixed-size groups (stable order).

    Every tile gets at least one group — empty tiles get an all-inert
    group so the kernel still zero-initialises their output block. The
    placement pass runs in the C++ core when available (a stable
    counting sort over millions of virtual samples; the numpy
    argsort+fancy-index chain dominated plan time) with an equivalent
    numpy fallback.

    Returns (ngroups, group_tile, group_base, first, payload dict).
    """
    n = tile_ids.shape[0]
    counts = np.bincount(tile_ids, minlength=ntiles)
    ngroups_per = np.maximum(-(-counts // group), 1)
    group_base = np.zeros(ntiles, np.int64)
    np.cumsum(ngroups_per[:-1], out=group_base[1:])
    ngroups = int(ngroups_per.sum())
    group_tile = np.repeat(np.arange(ntiles, dtype=np.int64), ngroups_per)
    first = np.zeros(ngroups, np.int32)
    first[group_base] = 1

    table = uf is None
    o_sample = np.zeros((ngroups, group), np.int32)
    o_ir = np.zeros((ngroups, group), np.int32)
    o_ic = np.zeros((ngroups, group), np.int32)
    o_scale = np.zeros((ngroups, group), np.float32)
    o_fr = np.zeros((ngroups, group), np.int32) if table else None
    o_fc = np.zeros((ngroups, group), np.int32) if table else None
    o_uf = None if table else np.full((ngroups, group), pad_f32, np.float32)
    o_vf = None if table else np.full((ngroups, group), pad_f32, np.float32)

    sample_id = np.ascontiguousarray(sample_id, np.int32)
    ir = np.ascontiguousarray(ir, np.int32)
    ic = np.ascontiguousarray(ic, np.int32)
    scale = np.ascontiguousarray(scale, np.float32)

    from africanus_tpu import native

    if native.available():
        native.tile_pack_core(
            np.ascontiguousarray(tile_ids, np.int64), group_base, group,
            ntiles, sample_id, ir, ic,
            None if fr is None else np.ascontiguousarray(fr, np.int32),
            None if fc is None else np.ascontiguousarray(fc, np.int32),
            None if uf is None else np.ascontiguousarray(uf, np.float32),
            None if vf is None else np.ascontiguousarray(vf, np.float32),
            scale,
            o_sample, o_ir, o_ic, o_fr, o_fc, o_uf, o_vf, o_scale,
        )
    else:
        order = np.argsort(tile_ids, kind="stable")
        sids = tile_ids[order]
        tile_start = np.zeros(ntiles, np.int64)
        np.cumsum(counts[:-1], out=tile_start[1:])
        k = np.arange(n) - tile_start[sids]
        gidx = group_base[sids] + k // group
        slot = k % group
        o_sample[gidx, slot] = sample_id[order]
        o_ir[gidx, slot] = ir[order]
        o_ic[gidx, slot] = ic[order]
        o_scale[gidx, slot] = scale[order]
        if table:
            o_fr[gidx, slot] = np.asarray(fr)[order]
            o_fc[gidx, slot] = np.asarray(fc)[order]
        else:
            o_uf[gidx, slot] = np.asarray(uf)[order]
            o_vf[gidx, slot] = np.asarray(vf)[order]

    pads = dict(sample=o_sample, ir=o_ir, ic=o_ic, scale=o_scale,
                fr=o_fr, fc=o_fc, uf=o_uf, vf=o_vf)
    log.debug(
        "tile plan: %d entries -> %d groups x %d over %d tiles "
        "(fill %.0f%%, native=%s)",
        n, ngroups, group, ntiles,
        100.0 * n / max(ngroups * group, 1), native.available(),
    )
    return ngroups, group_tile, group_base, first, pads


from africanus_tpu.ops.es import es_jnp as _es  # noqa: E402 (shared ES kernel)


def _mxu_dot(a, b, dims, precision):
    """In-kernel dot with an optional hand-rolled bf16x3 mode.

    ``lax.Precision.HIGH`` (3 bf16 MXU passes) is unsupported by this
    Mosaic lowering (TOOLCHAIN.md item 1), so ``precision="bf16x3"``
    emulates it: split each f32 operand into a bf16 hi + bf16 lo
    residual and sum the three significant cross products with f32
    accumulation — halving HIGHEST's 6 MXU passes at ~1e-6 relative
    error (well inside the gridder's 1e-4 ES accuracy budget).
    Env-gated experiment: AFRICANUS_TPU_WGRID_DOT=bf16x3."""
    if precision == "bf16x3":
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d = partial(lax.dot_general, dimension_numbers=dims,
                    preferred_element_type=jnp.float32)
        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    return lax.dot_general(a, b, dims, precision=precision,
                           preferred_element_type=jnp.float32)


def _wgrid_dot_mode():
    """Explicit kernel dot-mode override from the environment (read at
    trace time): "bf16x3", a forced lax.Precision, or None (defer to
    the plan's epsilon-gated ``dot_mode``, then HIGHEST)."""
    mode = os.environ.get("AFRICANUS_TPU_WGRID_DOT", "").lower()
    if mode == "bf16x3":
        return "bf16x3"
    if mode in ("highest", "f32"):
        return lax.Precision.HIGHEST
    return None


def _wgrid_ablate():
    """Benchmark-only kernel ablation (WRONG RESULTS by design): "nodot"
    zeroes the sample contraction, "noes" replaces ES tap evaluation
    with constants — each isolates one stage's share of the w-stack MXU
    kernel wall. Never set outside benchmarks."""
    return os.environ.get("AFRICANUS_TPU_WGRID_ABLATE", "")


def _pair_gather(re_flat, im_flat, idx):
    """Gather re+im as ONE (n, 2)-sliced gather instead of two scalar
    gathers. The slot gather runs at the XLA-TPU gather element cap
    (~1.5e8/s — it was HALF the config-4 dirty wall, 12.5 of 26 ms);
    pair-packing halves the per-index cost. Env-gated
    (AFRICANUS_TPU_WGRID_PAIRGATHER=0 restores the two plain gathers
    for A/B)."""
    if os.environ.get("AFRICANUS_TPU_WGRID_PAIRGATHER", "1") != "1":
        return re_flat[idx], im_flat[idx]
    pair = jnp.stack([re_flat, im_flat], axis=-1)   # (nvis, 2)
    g = pair[idx]                                   # (idx…, 2)
    return g[..., 0], g[..., 1]


def _grid_kernel(first_ref, gtile_ref, ir_ref, uf_ref, vfa_ref,
                 vre_ref, vim_ref, out_re_ref, out_im_ref, *,
                 group, support, beta, tpad_r, tpad_c, ncorr, blk):
    g = pl.program_id(0)
    half = support / 2.0

    @pl.when(first_ref[g] == 1)
    def _():
        out_re_ref[...] = jnp.zeros_like(out_re_ref)
        out_im_ref[...] = jnp.zeros_like(out_im_ref)

    lanes_f = lax.broadcasted_iota(jnp.int32, (1, tpad_c), 1).astype(
        jnp.float32
    )
    subl_f = lax.broadcasted_iota(jnp.int32, (blk, 1), 0).astype(
        jnp.float32
    )

    # pallas only supports unroll ∈ {1, full} on fori_loop → unroll by
    # hand to pipeline the load→compute→RMW chain across entries
    unroll = 16 if group % 16 == 0 else 1

    def body(j, _):
        for k in range(unroll):
            e = j * unroll + k
            r0 = ir_ref[0, 0, e]
            uf = uf_ref[0, 0, e]
            vfa = vfa_ref[0, 0, e]

            # The whole W×W window in one (blk, lanes) block: ES taps are
            # evaluated at absolute lane coords (vfa includes the column
            # offset) and block-relative sublanes (uf includes the sub-8
            # row shift); positions outside the support evaluate to zero
            # via _es. Each factor is genuinely 1D — evaluating the
            # transcendentals on (1, lanes) and (blk, 1) and broadcasting
            # the outer product cuts the exp/sqrt count ~blk·lanes/(blk
            # +lanes) ≈ 15-20x. The window is computed ONCE and applied
            # to every correlation's grid.
            base = _es((vfa - lanes_f) / half, beta) * _es(
                (uf - subl_f) / half, beta
            )
            rs = pl.ds(pl.multiple_of(r0, 8), blk)
            for c in range(ncorr):
                vr = vre_ref[0, c, e]
                vi = vim_ref[0, c, e]
                sl = (0, c, rs, slice(None))
                out_re_ref[sl] = out_re_ref[sl] + vr * base
                out_im_ref[sl] = out_im_ref[sl] + vi * base
        return 0

    lax.fori_loop(0, group // unroll, body, 0, unroll=False)


def grid_tiles_pallas(plan, vre_flat, vim_flat, interpret=False,
                      arrays=None):
    """Run the tile plan over flat visibility values.

    ``vre_flat``/``vim_flat`` are (N,) for one correlation or (ncorr, N)
    to grid every correlation in one pass (the ES window is computed once
    per sample and applied to each correlation's grid).

    ``arrays`` optionally overrides the plan's packed entry arrays with
    (possibly traced) replacements of identical shape — this is how
    per-shard plans ride one shard_map trace (parallel/imaging.py).

    Returns padded tiles (re, im): (ntiles, tpad_r, tpad_c) for (N,)
    inputs, else (ntiles, ncorr, tpad_r, tpad_c) — assemble with
    :func:`assemble_tiles`.
    """
    w = plan["support"]
    group, ngroups = plan["group"], plan["ngroups"]
    ntiles = plan["nplanes"] * plan["ntr"] * plan["ntc"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    if arrays is None:
        arrays = plan

    multi = vre_flat.ndim == 2
    ncorr = vre_flat.shape[0] if multi else 1
    if not multi:
        vre_flat = vre_flat[None]
        vim_flat = vim_flat[None]

    sample_pack = jnp.asarray(arrays["sample_pack"])
    scale = jnp.asarray(arrays["scale"])
    # (ngroups, ncorr, group) packed values
    vre = (vre_flat[:, sample_pack] * scale).astype(jnp.float32)
    vim = (vim_flat[:, sample_pack] * scale).astype(jnp.float32)
    vre = jnp.moveaxis(vre, 0, 1)
    vim = jnp.moveaxis(vim, 0, 1)

    kernel = partial(_grid_kernel, group=group, support=w,
                     beta=plan["beta"], tpad_r=tpad_r, tpad_c=tpad_c,
                     ncorr=ncorr, blk=plan.get("blk", 16))

    smem_vec = pl.BlockSpec((1, 1, group), lambda g, f, t: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    smem_val = pl.BlockSpec((1, ncorr, group), lambda g, f, t: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, ncorr, tpad_r, tpad_c),
                            lambda g, f, t: (t[g], 0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # first, group_tile
        grid=(ngroups,),
        in_specs=[smem_vec] * 3 + [smem_val] * 2,
        out_specs=[out_spec, out_spec],
    )

    out_shape = [
        jax.ShapeDtypeStruct((ntiles, ncorr, tpad_r, tpad_c), jnp.float32),
        jax.ShapeDtypeStruct((ntiles, ncorr, tpad_r, tpad_c), jnp.float32),
    ]

    t_re, t_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(arrays["first"]),
        jnp.asarray(arrays["group_tile"]),
        jnp.asarray(arrays["ir_loc"])[:, None, :],
        jnp.asarray(arrays["uf"])[:, None, :],
        jnp.asarray(arrays["vfa"])[:, None, :],
        vre,
        vim,
    )
    if not multi:
        return t_re[:, 0], t_im[:, 0]
    return t_re, t_im


def _fold(x, plan):
    """Overlap-add padded tiles into (nplanes, nu, nv) — or, for
    multi-correlation tiles, (ncorr, nplanes, nu, nv) — with wraparound."""
    if x.ndim == 4:  # (ntiles, ncorr, tpad_r, tpad_c)
        per_corr = [
            _fold(x[:, c], plan) for c in range(x.shape[1])
        ]
        return jnp.stack(per_corr, axis=0)
    tile_r, tile_c, w = plan["tile_r"], plan["tile_c"], plan["support"]
    ntr, ntc = plan["ntr"], plan["ntc"]
    npl = plan["nplanes"]

    p = x[:, : tile_r + 2 * w, : tile_c + 2 * w]
    p = p.reshape(npl, ntr, ntc, tile_r + 2 * w, tile_c + 2 * w)

    # region (da, db) of a padded tile belongs to block (tr+da, tc+db):
    # rolling the tile axes by (da, db) lands it on its owner (mod wrap).
    # Per axis: (src slice in padded coords, dst slice in core coords).
    def axis_regions(tile):
        return {
            -1: (slice(0, w), slice(tile - w, tile)),
            0: (slice(w, w + tile), slice(0, tile)),
            1: (slice(w + tile, 2 * w + tile), slice(0, w)),
        }

    wrap = plan.get("wrap", True)
    tr_idx = np.arange(ntr)
    tc_idx = np.arange(ntc)
    rreg = axis_regions(tile_r)
    creg = axis_regions(tile_c)
    out = jnp.zeros((npl, ntr, ntc, tile_r, tile_c), x.dtype)
    for da, (sra, dra) in rreg.items():
        for db, (srb, drb) in creg.items():
            part = p[:, :, :, sra, srb]
            part = jnp.roll(part, shift=(da, db), axis=(1, 2))
            if not wrap:
                # grid edges clip: discard halo contributions that rolled
                # around the boundary
                okr = (tr_idx - da >= 0) & (tr_idx - da < ntr)
                okc = (tc_idx - db >= 0) & (tc_idx - db < ntc)
                part = part * jnp.asarray(
                    okr[:, None] & okc[None, :], part.dtype
                )[None, :, :, None, None]
            out = out.at[:, :, :, dra, drb].add(part)
    return out.transpose(0, 1, 3, 2, 4).reshape(
        npl, ntr * tile_r, ntc * tile_c
    )


def assemble_tiles(out_re, out_im, plan):
    """Fold padded tiles (core + wrapped halos) into (nplanes, nu, nv)."""
    return _fold(out_re, plan), _fold(out_im, plan)


def _unfold(grid, plan):
    """Inverse of :func:`_fold`: padded tiles (core + wrapped halo copies)
    from a (nplanes, nu, nv) — or (ncorr, nplanes, nu, nv) — grid. Built
    from a wrap-padded grid with static slices + stacks only (strided
    scatter/rolls lower terribly)."""
    if grid.ndim == 4:  # (ncorr, nplanes, nu, nv)
        per_corr = [_unfold(grid[c], plan) for c in range(grid.shape[0])]
        return jnp.stack(per_corr, axis=1)  # (ntiles, ncorr, ...)
    tile_r, tile_c, w = plan["tile_r"], plan["tile_c"], plan["support"]
    ntr, ntc = plan["ntr"], plan["ntc"]
    npl = plan["nplanes"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    r, c = tile_r + 2 * w, tile_c + 2 * w

    mode = "wrap" if plan.get("wrap", True) else "constant"
    gpad = jnp.pad(grid, ((0, 0), (w, w), (w, w)), mode=mode)
    rows = jnp.stack(
        [gpad[:, tr * tile_r : tr * tile_r + r, :] for tr in range(ntr)],
        axis=1,
    )  # (npl, ntr, r, nv + 2w)
    p = jnp.stack(
        [rows[..., tc * tile_c : tc * tile_c + c] for tc in range(ntc)],
        axis=2,
    )  # (npl, ntr, ntc, r, c)
    p = p.reshape(npl * ntr * ntc, r, c)
    return jnp.pad(p, ((0, 0), (0, tpad_r - r), (0, tpad_c - c)))


def extract_tiles(grid_re, grid_im, plan):
    """Padded-tile views of a (nplanes, nu, nv) grid pair, ready for
    :func:`degrid_tiles_pallas`."""
    return _unfold(grid_re, plan), _unfold(grid_im, plan)


def _degrid_kernel(gtile_ref, ir_ref, uf_ref, vfa_ref, scale_ref,
                   tre_ref, tim_ref, out_re_ref, out_im_ref, *,
                   group, support, beta, tpad_r, tpad_c, ncorr, blk):
    half = support / 2.0

    lanes_f = lax.broadcasted_iota(jnp.int32, (1, tpad_c), 1).astype(
        jnp.float32
    )
    subl_f = lax.broadcasted_iota(jnp.int32, (blk, 1), 0).astype(
        jnp.float32
    )

    unroll = 16 if group % 16 == 0 else 1

    def body(j, _):
        for k in range(unroll):
            e = j * unroll + k
            r0 = ir_ref[0, 0, e]
            uf = uf_ref[0, 0, e]
            vfa = vfa_ref[0, 0, e]
            sc = scale_ref[0, 0, e]

            # ES window computed once (1D factors + broadcast outer
            # product — see _grid_kernel), reduced against every corr
            base = _es((vfa - lanes_f) / half, beta) * _es(
                (uf - subl_f) / half, beta
            )
            rs = pl.ds(pl.multiple_of(r0, 8), blk)
            for c in range(ncorr):
                sl = (0, c, rs, slice(None))
                out_re_ref[0, c, e] = sc * jnp.sum(
                    jnp.sum(tre_ref[sl] * base, axis=0)
                )
                out_im_ref[0, c, e] = sc * jnp.sum(
                    jnp.sum(tim_ref[sl] * base, axis=0)
                )
        return 0

    lax.fori_loop(0, group // unroll, body, 0, unroll=False)


def degrid_tiles_pallas(plan, tiles_re, tiles_im, nvis, interpret=False,
                        arrays=None):
    """Gather model visibilities from padded grid tiles.

    Mirror of :func:`grid_tiles_pallas`: per entry, the aligned 16-row
    block is read, weighted by the in-kernel ES window and reduced to a
    scalar (written to an SMEM output); virtual samples (w-planes) are
    then scatter-summed back onto their owning visibility. ``arrays``
    overrides the plan's packed entry arrays (per-shard plans — see
    :func:`pack_shard_plans`). Tiles may carry a correlation axis
    ((ntiles, ncorr, tpad_r, tpad_c) from multi-corr
    :func:`extract_tiles`) — the ES window is then computed once per
    sample for all correlations.

    Returns flat (nvis,) re/im model visibilities, or (ncorr, nvis).
    """
    w = plan["support"]
    group, ngroups = plan["group"], plan["ngroups"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    if arrays is None:
        arrays = plan

    multi = tiles_re.ndim == 4
    ncorr = tiles_re.shape[1] if multi else 1
    if not multi:
        tiles_re = tiles_re[:, None]
        tiles_im = tiles_im[:, None]

    kernel = partial(_degrid_kernel, group=group, support=w,
                     beta=plan["beta"], tpad_r=tpad_r, tpad_c=tpad_c,
                     ncorr=ncorr, blk=plan.get("blk", 16))

    smem_vec = pl.BlockSpec((1, 1, group), lambda g, t: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    smem_val = pl.BlockSpec((1, ncorr, group), lambda g, t: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((1, ncorr, tpad_r, tpad_c),
                             lambda g, t: (t[g], 0, 0, 0),
                             memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # group_tile
        grid=(ngroups,),
        in_specs=[smem_vec] * 4 + [tile_spec, tile_spec],
        out_specs=[smem_val, smem_val],
    )

    out_shape = [
        jax.ShapeDtypeStruct((ngroups, ncorr, group), jnp.float32),
        jax.ShapeDtypeStruct((ngroups, ncorr, group), jnp.float32),
    ]

    vals_re, vals_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(arrays["group_tile"]),
        jnp.asarray(arrays["ir_loc"])[:, None, :],
        jnp.asarray(arrays["uf"])[:, None, :],
        jnp.asarray(arrays["vfa"])[:, None, :],
        jnp.asarray(arrays["scale"])[:, None, :],
        tiles_re.astype(jnp.float32),
        tiles_im.astype(jnp.float32),
    )

    return _degrid_unpack(vals_re, vals_im, plan, arrays, nvis, ncorr,
                          multi)


def _degrid_unpack(vals_re, vals_im, plan, arrays, nvis, ncorr, multi):
    """Map packed (ngroups, ncorr, group) degrid values back onto their
    owning visibilities (virtual samples sum; see degrid_tiles_pallas)."""
    vals_re = jnp.moveaxis(vals_re, 1, 0).reshape(ncorr, -1)
    vals_im = jnp.moveaxis(vals_im, 1, 0).reshape(ncorr, -1)

    if arrays is plan:
        # host-planned inverse: per visibility, its (padded) flat slots —
        # a gather+sum instead of a scatter (see CLAUDE.md scatter cap).
        # Cached on the plan; keyed by nvis for safety.
        cache = plan.setdefault("_vis_gather", {})
        if nvis not in cache:
            from africanus_tpu.averaging.time_and_channel_avg import (
                _bin_gather_table,
            )

            flat_sample = np.asarray(plan["sample_pack"]).reshape(-1)
            # inert padding slots (scale == 0) all carry sample id 0 —
            # build the inverse over REAL slots only, else bin 0's padded
            # width explodes to the inert count
            pos = np.nonzero(np.asarray(plan["scale"]).reshape(-1) != 0.0)[0]
            sel_sub, valid_np = _bin_gather_table(flat_sample[pos], nvis)
            cache[nvis] = (pos[sel_sub].astype(np.int64), valid_np)
        sel_np, valid_np = cache[nvis]
        sel = jnp.asarray(sel_np)
        valid = jnp.asarray(valid_np)
        out_re = jnp.where(valid[None], vals_re[:, sel], 0).sum(axis=2)
        out_im = jnp.where(valid[None], vals_im[:, sel], 0).sum(axis=2)
    else:
        # traced per-shard arrays: no host inverse available
        sample = jnp.asarray(arrays["sample_pack"]).reshape(-1)
        out_re = jnp.zeros((ncorr, nvis), jnp.float32).at[:, sample].add(
            vals_re
        )
        out_im = jnp.zeros((ncorr, nvis), jnp.float32).at[:, sample].add(
            vals_im
        )
    if not multi:
        return out_re[0], out_im[0]
    return out_re, out_im


def pack_shard_plans(plans):
    """Stack per-shard tile plans into one static geometry + stacked arrays.

    All plans must share tile geometry (same grid/support/tiles/group) and
    format (all virtual-sample, all fused w-stack, or all table-mode —
    the latter keyed by the presence of ``oversample``). Each shard's packed
    arrays are padded to the max ngroups with inert groups (first=0,
    scale=0 / all-outside uv windows, repeating the shard's last tile id
    so output-block revisits stay contiguous), then stacked on a leading
    shard axis for use as shard_map inputs (``arrays`` override of
    :func:`grid_tiles_pallas` / :func:`grid_tiles_wstack_pallas`, and of
    the table-mode entry points :func:`grid_tiles_table_pallas` /
    :func:`degrid_tiles_table_pallas`).

    Fused w-stack plans additionally stack ``vis_slot`` (the per-shard
    packed-slot permutation, one slot per local visibility sample) so the
    sharded degridder keeps the pure-gather inverse.

    Returns (plan_static, arrays) where ``arrays`` maps the format's array
    keys to (nshard, ngroups_max, ...) numpy arrays.
    """
    fused = bool(plans[0].get("wstack_fused"))
    table = "oversample" in plans[0]
    if table:
        geo_keys = ("tile_r", "tile_c", "support", "oversample", "ntr",
                    "ntc", "nu", "nv", "nplanes", "wrap", "tpad_r",
                    "tpad_c", "group", "blk")
    else:
        geo_keys = ("tile_r", "tile_c", "support", "beta", "ntr", "ntc",
                    "nu", "nv", "nplanes", "tpad_r", "tpad_c", "group",
                    "blk")
    geo = {k: plans[0][k] for k in geo_keys}
    if fused:
        # register-merge width of the fused spreading kernel (absent on
        # pre-merge plans: default 1)
        geo["merge"] = plans[0].get("merge", 1)
        # static plane-window depth for the MXU kernels: the max over
        # shards; every shard's pbase is re-clamped against it below so
        # windows stay in-stack (window metadata only survives packing
        # when every shard carries it)
        if all("nwin" in p and "pbase" in p for p in plans):
            geo["nwin"] = max(p["nwin"] for p in plans)
        # row-bucketed metadata is an optimization overlay on the same
        # packed format: keep it only when EVERY shard carries it (an
        # unbucketed reading of a bucketed plan is always correct, the
        # reverse is not)
        if all(p.get("row_bucket") for p in plans):
            geo["row_bucket"] = True
        # supergroup packing (pack_supergroups) changes the per-group
        # array granularity (entry blocks (nsg, subs·S); pbase/rbase
        # stay per-sub-group), so every shard must agree on subs
        subs_set = {p.get("subs", 1) for p in plans}
        if len(subs_set) != 1:
            raise ValueError(
                f"shard plans disagree on supergroup subs: {subs_set}")
        subs = subs_set.pop()
        if subs > 1:
            geo["subs"] = subs
        # epsilon-gated dot mode survives packing only when every
        # shard agrees (mixed shards fall back to HIGHEST)
        modes = {p.get("dot_mode") for p in plans}
        if len(modes) == 1 and None not in modes:
            geo["dot_mode"] = modes.pop()
        # plane-blocked format must agree across shards (checked with
        # the other geometry below)
        if "plane_block" in plans[0]:
            geo["plane_block"] = plans[0]["plane_block"]
            geo["nblk"] = plans[0]["nblk"]
        for p in plans[1:]:
            if (p.get("plane_block"), p.get("nblk")) != (
                    geo.get("plane_block"), geo.get("nblk")):
                raise ValueError(
                    "shard plans disagree on plane_block format")
    for p in plans[1:]:
        if bool(p.get("wstack_fused")) != fused:
            raise ValueError("shard plans disagree on wstack_fused format")
        if ("oversample" in p) != table:
            raise ValueError("shard plans disagree on table-mode format")
        for k in geo_keys:
            if p[k] != geo[k]:
                raise ValueError(f"shard plans disagree on {k}")
        if fused and p.get("merge", 1) != geo["merge"]:
            raise ValueError("shard plans disagree on merge")

    if table:
        keys = TABLE_PLAN_ARRAY_KEYS
    elif fused:
        keys = WSTACK_PLAN_ARRAY_KEYS
        if "nwin" not in geo:  # a shard lacks window metadata
            keys = tuple(k for k in keys if k != "pbase")
        if "row_bucket" in geo:  # zero-padded: inert groups carry no taps
            keys = keys + ("rbase",)
    else:
        keys = PLAN_ARRAY_KEYS
    # padding granularity: packed plans store first/group_tile and entry
    # blocks per SUPER-group (ngroups // subs rows) while pbase/rbase
    # stay per-sub-group — pad each at its own granularity
    subs = geo.get("subs", 1)
    ng_max = max(p["ngroups"] for p in plans)
    ng_max = -(-ng_max // subs) * subs
    arrays = {k: [] for k in keys}
    for p in plans:
        pad_all = ng_max - p["ngroups"]
        assert pad_all % subs == 0
        for k in keys:
            pad = pad_all if k in ("pbase", "rbase") else pad_all // subs
            if k == "pbase":
                # a shard planned with a shallower nwin than the packed
                # max could otherwise index past the stack (or block)
                cap = geo.get("plane_block") or geo["nplanes"]
                a = np.minimum(p[k], np.int32(cap - geo["nwin"]))
                a = np.maximum(a, np.int32(0))
                arrays[k].append(np.concatenate(
                    [a, np.zeros(pad, a.dtype)]) if pad else a)
                continue
            a = p[k]
            if pad:
                if k == "first":
                    tail = np.zeros((pad,), a.dtype)
                elif k == "group_tile":
                    tail = np.full((pad,), a[-1], a.dtype)
                elif k in ("uf", "vfa"):
                    tail = np.full((pad,) + a.shape[1:],
                                   -2.0 * geo["support"], a.dtype)
                else:
                    tail = np.zeros((pad,) + a.shape[1:], a.dtype)
                a = np.concatenate([a, tail], axis=0)
            arrays[k].append(a)
    if fused and all("vis_slot" in p for p in plans):
        # plane-blocked plans with boundary duplicates drop vis_slot;
        # the degrid unpack then scatter-adds over sample_pack instead
        nvis = {p["vis_slot"].shape[0] for p in plans}
        if len(nvis) != 1:
            raise ValueError("fused shard plans must cover equal sample "
                             f"counts, got {sorted(nvis)}")
        arrays["vis_slot"] = [p["vis_slot"] for p in plans]
    arrays = {k: np.stack(v, axis=0) for k, v in arrays.items()}

    plan_static = dict(geo)
    plan_static["ngroups"] = ng_max
    if fused:
        plan_static["wstack_fused"] = True
    return plan_static, arrays


def plan_tiles_table(ir0, ic0, fr, fc, support, oversample, nu, nv,
                     tile_r=None, tile_c=None, group=1024, sample_id=None,
                     scale=None, plane=None, nplanes=1):
    """Host tile binning for *table-mode* kernels (quantized taps).

    For gridders whose taps come from a user-supplied oversampled kernel
    table (the Perley-polyhedron AA kernels): tap t of a sample reads
    ``table[(t+1)·oversample + frac]``. Unlike :func:`plan_tiles`, windows
    do NOT wrap — grid edges clip (out-of-grid taps are discarded by the
    non-wrapping fold of :func:`assemble_tiles`), matching the reference's
    bounds checks. Samples with no tap in the grid must be pre-filtered.

    Parameters
    ----------
    ir0, ic0 : (E,) int window start rows/cols (may hang off the grid by
        up to support−1 on either side).
    fr, fc : (E,) int kernel fractional indices per axis.
    support, oversample : tap count W and table oversampling factor.
    Remaining parameters as for :func:`plan_tiles`.
    """
    ir0 = np.asarray(ir0)
    ic0 = np.asarray(ic0)
    fr = np.asarray(fr, np.int32)
    fc = np.asarray(fc, np.int32)
    n = ir0.shape[0]
    w = support

    (tile_r, tile_c, sample_id, scale, plane, ntr, ntc,
     ntiles) = _plan_setup(n, nu, nv, w, tile_r, tile_c, sample_id,
                           scale, plane, nplanes)

    # owner tile clipped to the grid: off-edge window starts still fit the
    # edge tile's halo ([1, tile+2w) local range) and the non-wrapping
    # fold discards whatever falls outside the grid
    tr = np.clip(ir0 // tile_r, 0, ntr - 1)
    tc = np.clip(ic0 // tile_c, 0, ntc - 1)
    tile_ids = ((plane * ntr + tr) * ntc + tc).astype(np.int64)

    ir_all = (ir0 - tr * tile_r + w).astype(np.int32)
    ic_all = (ic0 - tc * tile_c + w).astype(np.int32)

    (ngroups, group_tile, group_base, first, pads) = _pack_entries(
        tile_ids, ntiles, group, pad_f32=0.0,
        sample_id=sample_id, ir=ir_all, ic=ic_all,
        fr=fr, fc=fc, scale=scale,
    )

    blk, tpad_r, tpad_c = tile_pad_geometry(tile_r, tile_c, w)

    ir_loc = pads["ir"]
    ir_al = (ir_loc // 8) * 8
    dsh = (ir_loc - ir_al).astype(np.int32)

    return dict(
        tile_r=tile_r, tile_c=tile_c, support=w, oversample=int(oversample),
        ntr=ntr, ntc=ntc, nu=nu, nv=nv, nplanes=nplanes, wrap=False,
        tpad_r=tpad_r, tpad_c=tpad_c, blk=blk,
        ngroups=ngroups, group=group,
        group_tile=group_tile.astype(np.int32),
        sample_pack=pads["sample"], ir_loc=ir_al, dsh=dsh,
        ic_loc=pads["ic"],
        fr=pads["fr"], fc=pads["fc"], scale=pads["scale"], first=first,
    )


def _grid_kernel_table(first_ref, gtile_ref, tab_ref, ir_ref, dsh_ref,
                       ic_ref, fr_ref, fc_ref, vre_ref, vim_ref,
                       out_re_ref, out_im_ref, *, group, support,
                       oversample, tpad_r, tpad_c, blk):
    g = pl.program_id(0)
    w = support
    os_ = oversample

    @pl.when(first_ref[g] == 1)
    def _():
        out_re_ref[...] = jnp.zeros_like(out_re_ref)
        out_im_ref[...] = jnp.zeros_like(out_im_ref)

    lanes = lax.broadcasted_iota(jnp.int32, (1, tpad_c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (blk, 1), 0)

    unroll = 8 if group % 8 == 0 else 1

    def body(j, _):
        for k in range(unroll):
            e = j * unroll + k
            r0 = ir_ref[0, 0, e]
            d = dsh_ref[0, 0, e]
            c0 = ic_ref[0, 0, e]
            fu = fr_ref[0, 0, e]
            fv = fc_ref[0, 0, e]
            vr = vre_ref[0, 0, e]
            vi = vim_ref[0, 0, e]

            # taps read from the shared SMEM table at the reference's
            # quantized index (t+1)·os + frac, placed by where-chains
            # (no dynamic lane indexing on TPU); the factors are 1D —
            # chains run on (blk, 1)/(1, lanes) and broadcast-multiply
            colvec = jnp.zeros((blk, 1), jnp.float32)
            rowvec = jnp.zeros((1, tpad_c), jnp.float32)
            for t in range(w):
                wu = tab_ref[0, (t + 1) * os_ + fu]
                wv = tab_ref[0, (t + 1) * os_ + fv]
                colvec = jnp.where(subl == d + t, wu, colvec)
                rowvec = jnp.where(lanes == c0 + t, wv, rowvec)
            base = colvec * rowvec
            sl = (0, pl.ds(pl.multiple_of(r0, 8), blk), slice(None))
            out_re_ref[sl] = out_re_ref[sl] + vr * base
            out_im_ref[sl] = out_im_ref[sl] + vi * base
        return 0

    lax.fori_loop(0, group // unroll, body, 0, unroll=False)


def grid_tiles_table_pallas(plan, table, vre_flat, vim_flat,
                            interpret=False, arrays=None):
    """Table-mode tile gridding (see :func:`plan_tiles_table`).

    ``arrays`` optionally overrides the plan's packed entry arrays with
    (possibly traced) per-shard stacks from :func:`pack_shard_plans`.
    """
    w = plan["support"]
    group, ngroups = plan["group"], plan["ngroups"]
    ntiles = plan["nplanes"] * plan["ntr"] * plan["ntc"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    if arrays is None:
        arrays = plan

    sample_pack = jnp.asarray(arrays["sample_pack"])
    scale = jnp.asarray(arrays["scale"])
    g_re, g_im = _pair_gather(vre_flat, vim_flat, sample_pack)
    vre = (g_re * scale).astype(jnp.float32)
    vim = (g_im * scale).astype(jnp.float32)
    table = jnp.asarray(table, jnp.float32)[None, :]

    kernel = partial(_grid_kernel_table, group=group, support=w,
                     oversample=plan["oversample"], tpad_r=tpad_r,
                     tpad_c=tpad_c, blk=plan.get("blk", 16))

    smem_vec = pl.BlockSpec((1, 1, group), lambda g, f, t: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    smem_tab = pl.BlockSpec(table.shape, lambda g, f, t: (0, 0),
                            memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, tpad_r, tpad_c),
                            lambda g, f, t: (t[g], 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ngroups,),
        in_specs=[smem_tab] + [smem_vec] * 7,
        out_specs=[out_spec, out_spec],
    )

    out_shape = [
        jax.ShapeDtypeStruct((ntiles, tpad_r, tpad_c), jnp.float32),
        jax.ShapeDtypeStruct((ntiles, tpad_r, tpad_c), jnp.float32),
    ]

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(arrays["first"]),
        jnp.asarray(arrays["group_tile"]),
        table,
        jnp.asarray(arrays["ir_loc"])[:, None, :],
        jnp.asarray(arrays["dsh"])[:, None, :],
        jnp.asarray(arrays["ic_loc"])[:, None, :],
        jnp.asarray(arrays["fr"])[:, None, :],
        jnp.asarray(arrays["fc"])[:, None, :],
        vre[:, None, :],
        vim[:, None, :],
    )


def _degrid_kernel_table(gtile_ref, tab_ref, ir_ref, dsh_ref, ic_ref,
                         fr_ref, fc_ref, scale_ref, tre_ref, tim_ref,
                         out_re_ref, out_im_ref, *, group, support,
                         oversample, tpad_r, tpad_c, blk):
    w = support
    os_ = oversample

    lanes = lax.broadcasted_iota(jnp.int32, (1, tpad_c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (blk, 1), 0)

    unroll = 8 if group % 8 == 0 else 1

    def body(j, _):
        for k in range(unroll):
            e = j * unroll + k
            r0 = ir_ref[0, 0, e]
            d = dsh_ref[0, 0, e]
            c0 = ic_ref[0, 0, e]
            fu = fr_ref[0, 0, e]
            fv = fc_ref[0, 0, e]
            sc = scale_ref[0, 0, e]

            colvec = jnp.zeros((blk, 1), jnp.float32)
            rowvec = jnp.zeros((1, tpad_c), jnp.float32)
            for t in range(w):
                wu = tab_ref[0, (t + 1) * os_ + fu]
                wv = tab_ref[0, (t + 1) * os_ + fv]
                colvec = jnp.where(subl == d + t, wu, colvec)
                rowvec = jnp.where(lanes == c0 + t, wv, rowvec)
            base = colvec * rowvec
            sl = (0, pl.ds(pl.multiple_of(r0, 8), blk), slice(None))
            out_re_ref[0, 0, e] = sc * jnp.sum(
                jnp.sum(tre_ref[sl] * base, axis=0)
            )
            out_im_ref[0, 0, e] = sc * jnp.sum(
                jnp.sum(tim_ref[sl] * base, axis=0)
            )
        return 0

    lax.fori_loop(0, group // unroll, body, 0, unroll=False)


def degrid_tiles_table_pallas(plan, table, tiles_re, tiles_im, nvis,
                              interpret=False, arrays=None):
    """Table-mode tile degridding (mirror of
    :func:`grid_tiles_table_pallas`). ``arrays`` optionally overrides the
    plan's packed entry arrays with (possibly traced) per-shard stacks —
    the inverse then runs as a scatter-add (no host inverse available)."""
    w = plan["support"]
    group, ngroups = plan["group"], plan["ngroups"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    if arrays is None:
        arrays = plan
    table = jnp.asarray(table, jnp.float32)[None, :]

    kernel = partial(_degrid_kernel_table, group=group, support=w,
                     oversample=plan["oversample"], tpad_r=tpad_r,
                     tpad_c=tpad_c, blk=plan.get("blk", 16))

    smem_vec = pl.BlockSpec((1, 1, group), lambda g, t: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    smem_tab = pl.BlockSpec(table.shape, lambda g, t: (0, 0),
                            memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((1, tpad_r, tpad_c), lambda g, t: (t[g], 0, 0),
                             memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngroups,),
        in_specs=[smem_tab] + [smem_vec] * 6 + [tile_spec, tile_spec],
        out_specs=[smem_vec, smem_vec],
    )

    out_shape = [
        jax.ShapeDtypeStruct((ngroups, 1, group), jnp.float32),
        jax.ShapeDtypeStruct((ngroups, 1, group), jnp.float32),
    ]

    vals_re, vals_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(arrays["group_tile"]),
        table,
        jnp.asarray(arrays["ir_loc"])[:, None, :],
        jnp.asarray(arrays["dsh"])[:, None, :],
        jnp.asarray(arrays["ic_loc"])[:, None, :],
        jnp.asarray(arrays["fr"])[:, None, :],
        jnp.asarray(arrays["fc"])[:, None, :],
        jnp.asarray(arrays["scale"])[:, None, :],
        tiles_re.astype(jnp.float32),
        tiles_im.astype(jnp.float32),
    )

    if arrays is not plan:
        # traced per-shard arrays: no host inverse available — scatter-add
        # (padded entries carry scale 0, so they deposit 0 onto vis 0)
        sample = jnp.asarray(arrays["sample_pack"]).reshape(-1)
        out_re = jnp.zeros((nvis,), jnp.float32).at[sample].add(
            vals_re.reshape(-1)
        )
        out_im = jnp.zeros((nvis,), jnp.float32).at[sample].add(
            vals_im.reshape(-1)
        )
        return out_re, out_im

    # host-planned inverse: per visibility, its (padded) flat slots — a
    # gather+sum instead of a scatter (XLA scatter caps ~1.4e8 elem/s on
    # TPU; same design as degrid_tiles_pallas). Cached on the plan.
    cache = plan.setdefault("_vis_gather", {})
    if nvis not in cache:
        from africanus_tpu.averaging.time_and_channel_avg import (
            _bin_gather_table,
        )

        flat_sample = np.asarray(plan["sample_pack"]).reshape(-1)
        pos = np.nonzero(np.asarray(plan["scale"]).reshape(-1) != 0.0)[0]
        sel_sub, valid_np = _bin_gather_table(flat_sample[pos], nvis)
        cache[nvis] = (pos[sel_sub].astype(np.int64), valid_np)
    sel_np, valid_np = cache[nvis]
    sel = jnp.asarray(sel_np)
    valid = jnp.asarray(valid_np)
    flat_re = vals_re.reshape(-1)
    flat_im = vals_im.reshape(-1)
    out_re = jnp.where(valid, flat_re[sel], 0).sum(axis=1)
    out_im = jnp.where(valid, flat_im[sel], 0).sum(axis=1)
    return out_re, out_im


def plan_tiles_wstack(iu0, iv0, uf, vf, support, beta, nu, nv, p0,
                      wscales, nplanes, tile_r=None, tile_c=None,
                      group=1024, merge=1, sort_planes=True,
                      plane_block=None, row_bucket=False):
    """Host tile binning for the multi-plane w-stack kernel.

    One entry per *visibility sample* (not per touched w-plane): the
    kernel spreads each sample's W×W window into all ``support``
    consecutive w-planes starting at ``p0`` (clipped to the stack), with
    per-plane ES taps ``wscales`` (support, E). Compared to the
    per-plane virtual samples of :func:`plan_tiles` this divides the
    entry count — and the per-entry window build — by the w-support,
    and consecutive RMWs land on different planes' accumulators, so the
    serial read-modify-write chains interleave.

    ``sort_planes`` (default) orders entries by (tile, p0) so every
    packed group spans a narrow w-plane window; the plan then carries a
    per-group window base ``pbase`` (ngroups,) and the static window
    depth ``nwin`` = max over groups of (p0·max − pbase + support),
    which lets the MXU matmul kernels contract ``nwin`` ≈ support
    planes per group instead of the whole stack (the plane loop is the
    route's cost multiplier on deep w-stacks). The numpy composite-key
    argsort replaces the native counting-sort core on this path.

    ``plane_block`` = P partitions the w-axis into depth-P blocks and
    bins entries by (uv-tile, plane-block): the padded output becomes
    (ntr·ntc·nblk, P, tpad_r, tpad_c) so device memory per kernel step
    is independent of the stack depth — the route that keeps deep
    w-stacks (nplanes ≫ 3·support) on large tiles instead of shrinking
    them against the VMEM budget. An entry whose w-window straddles a
    block boundary is DUPLICATED into both blocks with complementary
    zero-masked taps (expected duplication (support−1)/P); plans with
    duplicates drop ``vis_slot`` (a sample then owns two packed slots)
    and the degrid unpack takes the gather+sum path instead. Packed
    ``p0`` is block-relative (may be negative on the upper duplicate —
    its sub-block taps are zero-masked). Plane-blocked plans are served
    by the MXU kernels only (the per-entry scatter kernel would index
    out-of-block planes); requires merge == 1.

    ``merge`` > 1 targets the kernel's remaining wall — the serial VMEM
    read-modify-write chain per (plane, row-block) address: entries are
    bucket-sorted by identical RMW address (tile, p0, 8-aligned row) and
    each bucket padded to a multiple of ``merge`` with inert entries
    (all-zero w-taps), so the kernel can accumulate every ``merge``
    consecutive windows in vector registers and issue ONE block RMW per
    plane per ``merge`` entries. The padding costs
    ``mean((-count) % merge / count)`` extra window builds; dense
    problems (many samples per (tile, plane, row) bucket) pay a few
    percent for a ~merge× shorter RMW chain.

    ``row_bucket`` (MXU route; requires merge == 1) additionally bins
    entries by their 8-aligned window start row. Every entry in a group
    then shares one aligned row base, so the MXU kernels' row-tap
    matrix and per-plane dot shrink from ``tpad_r`` rows to ``blk``
    (16 for W ≤ 9) anchored at the per-group ``rbase`` — a
    ``tpad_r/blk`` (3× at the default tiles) MAC reduction, paid for
    with more groups (a tile's entries fragment over its ~tile_r/8 row
    octaves, so group fill drops on sparse tiles). Groups of one output
    block stay consecutive (buckets are keyed output-block-major), the
    kernel's block RMW lands at ``rbase`` (8-aligned by construction),
    and empty output blocks keep one inert zero-init group.
    """
    iu0 = np.asarray(iu0)
    iv0 = np.asarray(iv0)
    uf = np.asarray(uf, np.float32)
    vf = np.asarray(vf, np.float32)
    p0 = np.asarray(p0)
    wscales = np.asarray(wscales, np.float32)  # (support, E)
    n = iu0.shape[0]
    w = support

    if tile_r is None:
        tile_r = choose_tile(nu)
    if tile_c is None:
        tile_c = choose_tile(nv)
    if nu % tile_r or nv % tile_c:
        raise ValueError(f"tiles ({tile_r},{tile_c}) must divide ({nu},{nv})")
    if w > min(tile_r, tile_c):
        raise ValueError(f"support {w} exceeds tile ({tile_r},{tile_c})")
    # the kernels index plane p0+t directly (no out-of-stack handling):
    # a caller-supplied out-of-range p0 would silently double-deposit on
    # the clipped edge planes, so reject it here. wgridder's _plan pads
    # nplanes by support+2 precisely so every window stays in-stack.
    if n and (p0.min() < 0 or p0.max() + w > nplanes):
        raise ValueError(
            f"w-plane window out of stack: p0 in "
            f"[{p0.min()}, {p0.max()}], support {w}, nplanes {nplanes}"
        )

    ntr = nu // tile_r
    ntc = nv // tile_c
    ntiles = ntr * ntc

    tr_raw = iu0 // tile_r
    tc_raw = iv0 // tile_c
    tile_ids = np.ascontiguousarray(
        ((tr_raw % ntr) * ntc + tc_raw % ntc).astype(np.int64)
    )

    ir_all = (iu0 - tr_raw * tile_r + w).astype(np.int32)
    ic_all = (iv0 - tc_raw * tile_c + w).astype(np.int32)
    ir_al = (ir_all // 8) * 8
    uf_abs = (uf + (ir_all - ir_al)).astype(np.float32)
    vf_abs = (vf + ic_all).astype(np.float32)

    merge = int(merge)
    if merge < 1:
        raise ValueError(f"merge {merge} must be >= 1")
    if merge > 1 and group % merge:
        raise ValueError(f"group {group} must be a multiple of merge {merge}")
    if row_bucket and merge > 1:
        raise ValueError("row_bucket requires merge == 1")

    if plane_block is not None:
        P = int(plane_block)
        if merge > 1:
            raise ValueError("plane_block requires merge == 1")
        if P < w:
            raise ValueError(f"plane_block {P} must be >= support {w}")
        nblk = max(-(-nplanes // P), 1)
        pblk = p0.astype(np.int64) // P
        rel = (p0 - pblk * P).astype(np.int64)
        straddle = np.nonzero(rel + w > P)[0]
        dup = np.concatenate([np.arange(n, dtype=np.int64), straddle])
        e_pblk = np.concatenate([pblk, pblk[straddle] + 1])
        e_p0 = np.concatenate([rel, rel[straddle] - P])
        offs_w = np.arange(w)[:, None]
        e_wsc = wscales[:, dup].copy()  # (w, n2)
        # lower copy keeps in-block taps, upper copy the spill-over
        e_wsc[:, :n] *= (rel[None, :] + offs_w) < P
        if straddle.size:
            e_wsc[:, n:] *= (e_p0[None, n:] + offs_w) >= 0
        okey = tile_ids[dup] * np.int64(nblk) + e_pblk
        nkeys = ntiles * nblk
        # effective tap windows, clipped to the block
        win_lo = np.maximum(e_p0, 0)
        win_hi = np.minimum(e_p0 + w, P)
        cap = P
        has_dups = bool(straddle.size)
        e_ir, e_uf, e_vfa = ir_al[dup], uf_abs[dup], vf_abs[dup]
        e_orig = dup.astype(np.int32)
        n_e = n + straddle.size
    else:
        P = nblk = None
        okey, nkeys, cap = tile_ids, ntiles, nplanes
        e_p0 = p0.astype(np.int64)
        win_lo, win_hi = e_p0, e_p0 + w
        e_wsc = wscales
        has_dups = False
        e_ir, e_uf, e_vfa = ir_al, uf_abs, vf_abs
        e_orig = np.arange(n, dtype=np.int32)
        n_e = n

    if merge > 1 and n:
        # bucket-sort by shared RMW address (tile, p0, aligned row) and
        # pad every bucket to a multiple of merge; the leading entry of
        # each aligned merge block is then always real, so the kernel
        # reads the block address from it
        p64 = p0.astype(np.int64)
        ir64 = ir_al.astype(np.int64)
        order = np.lexsort((ir64, p64, tile_ids))
        ts = tile_ids[order]
        ps, irs = p64[order], ir64[order]
        change = np.ones(n, bool)
        change[1:] = ((ts[1:] != ts[:-1]) | (ps[1:] != ps[:-1])
                      | (irs[1:] != irs[:-1]))
        bstart = np.nonzero(change)[0]
        bucket_of = np.cumsum(change) - 1
        bcount = np.diff(np.append(bstart, n))
        bpad_len = (-(-bcount // merge) * merge).astype(np.int64)
        btile = ts[bstart]
        padded_counts = np.zeros(ntiles, np.int64)
        np.add.at(padded_counts, btile, bpad_len)
        ngroups_per = np.maximum(-(-padded_counts // group), 1)
        group_base = np.zeros(ntiles, np.int64)
        np.cumsum(ngroups_per[:-1], out=group_base[1:])
        ngroups = int(ngroups_per.sum())

        b_end = np.cumsum(bpad_len)
        b_startp = b_end - bpad_len  # padded global offsets, tile-major
        tile_pad_start = np.zeros(ntiles, np.int64)
        np.cumsum(padded_counts[:-1], out=tile_pad_start[1:])
        k = (b_startp[bucket_of] - tile_pad_start[ts]
             + np.arange(n) - bstart[bucket_of])
        slots = np.empty(n, np.int64)
        slots[order] = (
            (group_base[ts] + k // group) * group + k % group
        )
    elif row_bucket:
        merge = 1
        # bucket by (output block, 8-aligned row octave); within a
        # bucket order by p0 so the per-group w-window metadata below
        # stays narrow. Empty OUTPUT blocks (not buckets) get one inert
        # group so the kernel still zero-initialises them.
        max_r0a = ((tile_r + w - 1) // 8) * 8
        n_oct = max_r0a // 8 + 1
        bkey = okey * np.int64(n_oct) + e_ir.astype(np.int64) // 8
        nbk = nkeys * n_oct
        bcounts = np.bincount(bkey, minlength=nbk)
        ngroups_per_b = -(-bcounts // group)            # 0 allowed
        per_key = ngroups_per_b.reshape(nkeys, n_oct)
        per_key[per_key.sum(axis=1) == 0, 0] = 1
        ngroups_per_b = per_key.reshape(-1)
        group_base_b = np.zeros(nbk, np.int64)
        np.cumsum(ngroups_per_b[:-1], out=group_base_b[1:])
        ngroups = int(ngroups_per_b.sum())

        order = np.argsort(bkey * np.int64(cap + w) + (e_p0 + w),
                           kind="stable")
        bstart = np.zeros(nbk, np.int64)
        np.cumsum(bcounts[:-1], out=bstart[1:])
        k = np.arange(n_e) - bstart[bkey[order]]
        slots = np.empty(n_e, np.int64)
        slots[order] = ((group_base_b[bkey[order]] + k // group) * group
                        + k % group)

        g_bucket = np.repeat(np.arange(nbk, dtype=np.int64), ngroups_per_b)
        group_tile = g_bucket // n_oct
        rbase = ((g_bucket % n_oct) * 8).astype(np.int32)
        first = np.zeros(ngroups, np.int32)
        if ngroups:
            first[0] = 1
            first[1:][group_tile[1:] != group_tile[:-1]] = 1
    else:
        merge = 1
        counts = np.bincount(okey, minlength=nkeys)
        ngroups_per = np.maximum(-(-counts // group), 1)
        group_base = np.zeros(nkeys, np.int64)
        np.cumsum(ngroups_per[:-1], out=group_base[1:])
        ngroups = int(ngroups_per.sum())

        if (sort_planes and nplanes > 1) or plane_block is not None:
            # order entries by (out-block, p0) so each packed group
            # covers a narrow w-plane window: the MXU kernels then loop
            # over plan["nwin"] ≈ support planes from a per-group base
            # instead of the whole stack, which keeps the matmul route
            # engaged on deep w-stacks (wstack_use_mxu). e_p0 can be
            # -w+1 on plane-block upper duplicates: bias before keying.
            order = np.argsort(okey * np.int64(cap + w)
                               + (e_p0 + w), kind="stable")
            key_start = np.zeros(nkeys, np.int64)
            np.cumsum(counts[:-1], out=key_start[1:])
            k = np.arange(n_e) - key_start[okey[order]]
            slots = np.empty(n_e, np.int64)
            slots[order] = (
                (group_base[okey[order]] + k // group) * group
                + k % group
            )
        else:
            # per-entry flat slot in the (ngroups, group) packed layout —
            # native counting-sort core when available (the numpy argsort
            # chain dominated plan time at multi-million-sample counts)
            from africanus_tpu import native

            if native.available():
                slots = native.tile_pack_slots(okey, group_base,
                                               group, nkeys)
            else:
                order = np.argsort(okey, kind="stable")
                key_start = np.zeros(nkeys, np.int64)
                np.cumsum(counts[:-1], out=key_start[1:])
                k = np.arange(n_e) - key_start[okey[order]]
                slots = np.empty(n_e, np.int64)
                slots[order] = (
                    (group_base[okey[order]] + k // group) * group
                    + k % group
                )

    if not row_bucket:
        group_tile = np.repeat(np.arange(nkeys, dtype=np.int64),
                               ngroups_per)
        first = np.zeros(ngroups, np.int32)
        first[group_base] = 1

    sample_pack = np.zeros((ngroups, group), np.int32)
    ir_pack = np.zeros((ngroups, group), np.int32)
    uf_pack = np.full((ngroups, group), -2.0 * w, np.float32)
    vfa_pack = np.full((ngroups, group), -2.0 * w, np.float32)
    p0_pack = np.zeros((ngroups, group), np.int32)
    wsc_pack = np.zeros((ngroups, w, group), np.float32)

    sample_pack.reshape(-1)[slots] = e_orig
    ir_pack.reshape(-1)[slots] = e_ir
    uf_pack.reshape(-1)[slots] = e_uf
    vfa_pack.reshape(-1)[slots] = e_vfa
    p0_pack.reshape(-1)[slots] = e_p0.astype(np.int32)
    # (g, t, s) flattens to (g*w + t)*group + s
    g_of, s_of = slots // group, slots % group
    wflat = wsc_pack.reshape(-1)
    for t in range(w):
        wflat[(g_of * w + t) * group + s_of] = e_wsc[t]

    # per-group w-window metadata for the MXU kernels: padded slots must
    # not contribute, so min/max over real entries' (clipped) tap
    # windows only
    pmin_f = np.full(ngroups * group, np.int64(cap), np.int64)
    pmax_f = np.full(ngroups * group, -1, np.int64)
    pmin_f[slots] = win_lo
    pmax_f[slots] = win_hi
    pmin_g = pmin_f.reshape(ngroups, group).min(axis=1)
    pmax_g = pmax_f.reshape(ngroups, group).max(axis=1)
    empty = pmax_g < 0
    span = np.where(empty, min(w, cap),
                    pmax_g - np.minimum(pmin_g, pmax_g))
    nwin = int(min(span.max(), cap)) if n else min(w, cap)
    nwin = max(nwin, 1)
    pbase = np.where(empty, 0, np.minimum(pmin_g, cap - nwin))

    blk, tpad_r, tpad_c = tile_pad_geometry(tile_r, tile_c, w)

    out = dict(
        tile_r=tile_r, tile_c=tile_c, support=w, beta=float(beta),
        ntr=ntr, ntc=ntc, nu=nu, nv=nv, nplanes=nplanes,
        tpad_r=tpad_r, tpad_c=tpad_c, blk=blk,
        ngroups=ngroups, group=group, merge=merge, wstack_fused=True,
        nwin=nwin,
        group_tile=group_tile.astype(np.int32),
        sample_pack=sample_pack, ir_loc=ir_pack,
        uf=uf_pack, vfa=vfa_pack, p0=p0_pack, wsc=wsc_pack,
        pbase=pbase.astype(np.int32),
        first=first,
    )
    if plane_block is not None:
        out["plane_block"] = P
        out["nblk"] = nblk
    if row_bucket:
        out["row_bucket"] = True
        out["rbase"] = rbase
    if not has_dups:
        # a duplicate-free plan keeps the pure-gather degrid inverse
        out["vis_slot"] = slots
    return out


def pack_supergroups(plan, subs):
    """Pack ``subs`` consecutive groups into one MXU kernel step.

    At small groups (the fill-optimal regime for row-bucketed plans —
    group 128 measured 1.5x group 512 on v5e at the config-4 shape) the
    kernel becomes bound by the per-grid-step fixed cost, not by its
    dots. A packed plan keeps the small fill-friendly sub-groups but
    amortises the step cost ``subs``× : each kernel step processes
    ``subs`` sub-groups of the SAME output tile (their blocks
    concatenate on lanes; per-sub-group ``rbase``/``pbase`` scalars are
    read at ``g·subs + j``). Every tile's group count is padded to a
    multiple of ``subs`` with inert sub-groups (all-zero w-taps), and
    ``group_tile``/``first`` become per-SUPER-group. MXU-route only —
    the scatter kernels reject packed plans."""
    subs = int(subs)
    if subs <= 1:
        return plan
    if "rbase" not in plan:
        raise ValueError("pack_supergroups requires a row_bucket plan")
    gt = np.asarray(plan["group_tile"])
    ngroups, S = plan["ngroups"], plan["group"]
    w = plan["support"]

    # run-length encode the (out-block-contiguous) group_tile
    change = np.ones(ngroups, bool)
    change[1:] = gt[1:] != gt[:-1]
    starts = np.nonzero(change)[0]
    counts = np.diff(np.append(starts, ngroups))
    blocks = gt[starts]
    pad = (-counts) % subs
    new_counts = counts + pad
    total = int(new_counts.sum())

    # old-group id for each new slot (-1 = inert pad group)
    idx = np.full(total, -1, np.int64)
    new_starts = np.zeros(blocks.size, np.int64)
    np.cumsum(new_counts[:-1], out=new_starts[1:])
    for b in range(blocks.size):
        idx[new_starts[b]:new_starts[b] + counts[b]] = np.arange(
            starts[b], starts[b] + counts[b])
    real = idx >= 0
    new_of_old = np.empty(ngroups, np.int64)
    new_of_old[idx[real]] = np.nonzero(real)[0]

    def take(a, fill):
        a = np.asarray(a)
        outp = np.full((total,) + a.shape[1:], fill, a.dtype)
        outp[real] = a[idx[real]]
        return outp

    nsg = total // subs
    out = dict(plan)
    out["ngroups"] = total
    out["subs"] = subs
    # entry arrays, pre-reshaped to the packed (nsg, …, subs·S) blocks
    out["sample_pack"] = take(plan["sample_pack"], 0).reshape(nsg, subs * S)
    out["ir_loc"] = take(plan["ir_loc"], 0).reshape(nsg, subs * S)
    out["uf"] = take(plan["uf"], -2.0 * w).reshape(nsg, subs * S)
    out["vfa"] = take(plan["vfa"], -2.0 * w).reshape(nsg, subs * S)
    out["p0"] = take(plan["p0"], 0).reshape(nsg, subs * S)
    out["wsc"] = np.ascontiguousarray(
        take(plan["wsc"], 0.0).reshape(nsg, subs, w, S)
        .transpose(0, 2, 1, 3)
    ).reshape(nsg, w, subs * S)
    out["pbase"] = take(plan["pbase"], 0)
    out["rbase"] = take(plan["rbase"], 0)
    sg_tile = np.repeat(blocks, new_counts)[::subs].astype(np.int32)
    out["group_tile"] = sg_tile
    first = np.zeros(nsg, np.int32)
    if nsg:
        first[0] = 1
        first[1:][sg_tile[1:] != sg_tile[:-1]] = 1
    out["first"] = first
    if "vis_slot" in plan:
        s = np.asarray(plan["vis_slot"])
        out["vis_slot"] = new_of_old[s // S] * S + s % S
    return out


def _grid_wstack_kernel(first_ref, gtile_ref, ir_ref, uf_ref, vfa_ref,
                        p0_ref, wsc_ref, vre_ref, vim_ref, out_re_ref,
                        out_im_ref, *, group, support, beta, tpad_r,
                        tpad_c, nplanes, blk, merge=1):
    g = pl.program_id(0)
    half = support / 2.0

    @pl.when(first_ref[g] == 1)
    def _():
        out_re_ref[...] = jnp.zeros_like(out_re_ref)
        out_im_ref[...] = jnp.zeros_like(out_im_ref)

    lanes_f = lax.broadcasted_iota(jnp.int32, (1, tpad_c), 1).astype(
        jnp.float32
    )
    subl_f = lax.broadcasted_iota(jnp.int32, (blk, 1), 0).astype(
        jnp.float32
    )

    # entries per unrolled body step: ~8 windows regardless of merge
    # (Mosaic compile time scales with the unroll)
    if merge > 1:
        unroll = max(1, 8 // merge)
        if group % (merge * unroll):
            unroll = 1
        step = merge * unroll
    else:
        unroll = 8 if group % 8 == 0 else 1
        step = unroll

    def body(j, _):
        for k in range(unroll):
            if merge == 1:
                e = j * step + k
                r0 = ir_ref[0, 0, e]
                uf = uf_ref[0, 0, e]
                vfa = vfa_ref[0, 0, e]
                p0 = p0_ref[0, 0, e]
                vr = vre_ref[0, 0, e]
                vi = vim_ref[0, 0, e]

                # window computed ONCE per sample, spread to every
                # touched w-plane with its ES tap; plan_tiles_wstack
                # guarantees p0+t in [0, nplanes)
                base = _es((vfa - lanes_f) / half, beta) * _es(
                    (uf - subl_f) / half, beta
                )
                rs = pl.ds(pl.multiple_of(r0, 8), blk)
                for t in range(support):
                    sc = wsc_ref[0, t, e]
                    sl = (0, p0 + t, rs, slice(None))
                    out_re_ref[sl] = out_re_ref[sl] + (sc * vr) * base
                    out_im_ref[sl] = out_im_ref[sl] + (sc * vi) * base
            else:
                # merge consecutive entries share (p0, r0) by plan
                # construction: accumulate their windows in registers
                # and issue ONE block RMW per plane — the serial VMEM
                # read-modify-write chain shrinks by ~merge while the
                # FMA issue count stays the same
                e0 = (j * unroll + k) * merge
                r0 = ir_ref[0, 0, e0]
                p0 = p0_ref[0, 0, e0]
                rs = pl.ds(pl.multiple_of(r0, 8), blk)
                bases = []
                for gi in range(merge):
                    e = e0 + gi
                    base = _es(
                        (vfa_ref[0, 0, e] - lanes_f) / half, beta
                    ) * _es((uf_ref[0, 0, e] - subl_f) / half, beta)
                    bases.append((e, base))
                for t in range(support):
                    accr = acci = None
                    for e, base in bases:
                        sc = wsc_ref[0, t, e]
                        tr = (sc * vre_ref[0, 0, e]) * base
                        ti = (sc * vim_ref[0, 0, e]) * base
                        accr = tr if accr is None else accr + tr
                        acci = ti if acci is None else acci + ti
                    sl = (0, p0 + t, rs, slice(None))
                    out_re_ref[sl] = out_re_ref[sl] + accr
                    out_im_ref[sl] = out_im_ref[sl] + acci
        return 0

    lax.fori_loop(0, group // step, body, 0, unroll=False)


def grid_tiles_wstack_pallas(plan, vre_flat, vim_flat, interpret=False,
                             arrays=None):
    """Run a :func:`plan_tiles_wstack` plan over flat (N,) visibilities.

    ``arrays`` optionally overrides the plan's packed entry arrays with
    (possibly traced) replacements of identical shape — the per-shard
    plan mechanism (see :func:`pack_shard_plans`).

    Returns padded tiles (re, im): (ntr·ntc, nplanes, tpad_r, tpad_c);
    assemble with :func:`assemble_wstack_tiles`.
    """
    if plan.get("subs", 1) > 1:
        raise ValueError(
            "supergroup-packed plans (pack_supergroups) are MXU-route "
            "only; use grid_tiles_wstack_mxu")
    if "plane_block" in plan:
        raise ValueError(
            "plane-blocked plans are MXU-route only (block-relative p0 "
            "would index out-of-block planes in the scatter kernel); "
            "use grid_tiles_wstack_mxu"
        )
    w = plan["support"]
    group, ngroups = plan["group"], plan["ngroups"]
    ntiles = plan["ntr"] * plan["ntc"]
    nplanes = plan["nplanes"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    if arrays is None:
        arrays = plan

    sample_pack = jnp.asarray(arrays["sample_pack"])
    vre, vim = _pair_gather(vre_flat.astype(jnp.float32),
                            vim_flat.astype(jnp.float32), sample_pack)

    kernel = partial(_grid_wstack_kernel, group=group, support=w,
                     beta=plan["beta"], tpad_r=tpad_r, tpad_c=tpad_c,
                     nplanes=nplanes, blk=plan["blk"],
                     merge=plan.get("merge", 1))

    smem_vec = pl.BlockSpec((1, 1, group), lambda g, f, t: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    smem_wsc = pl.BlockSpec((1, w, group), lambda g, f, t: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, nplanes, tpad_r, tpad_c),
                            lambda g, f, t: (t[g], 0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # first, group_tile
        grid=(ngroups,),
        in_specs=[smem_vec] * 4 + [smem_wsc] + [smem_vec] * 2,
        out_specs=[out_spec, out_spec],
    )

    out_shape = [
        jax.ShapeDtypeStruct((ntiles, nplanes, tpad_r, tpad_c),
                             jnp.float32),
        jax.ShapeDtypeStruct((ntiles, nplanes, tpad_r, tpad_c),
                             jnp.float32),
    ]

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(arrays["first"]),
        jnp.asarray(arrays["group_tile"]),
        jnp.asarray(arrays["ir_loc"])[:, None, :],
        jnp.asarray(arrays["uf"])[:, None, :],
        jnp.asarray(arrays["vfa"])[:, None, :],
        jnp.asarray(arrays["p0"])[:, None, :],
        jnp.asarray(arrays["wsc"]),
        vre[:, None, :],
        vim[:, None, :],
    )


def assemble_wstack_tiles(out_re, out_im, plan):
    """Fold (ntr·ntc, nplanes, tpad_r, tpad_c) tiles — or the
    plane-blocked (ntr·ntc·nblk, plane_block, …) layout — to
    (nplanes, nu, nv) via the plane-major :func:`assemble_tiles`
    machinery."""
    ntsp = plan["ntr"] * plan["ntc"]
    npl = plan["nplanes"]
    P = plan.get("plane_block")

    def rearrange(x):
        if P:
            # (ntsp·nblk, P, r, c) -> (ntsp, nblk·P, r, c) -> clip the
            # plane padding (every group's window stays in its block,
            # so the blocked planes simply concatenate)
            x = x.reshape(ntsp, plan["nblk"] * P,
                          plan["tpad_r"], plan["tpad_c"])[:, :npl]
        return jnp.moveaxis(x, 1, 0).reshape(
            npl * ntsp, plan["tpad_r"], plan["tpad_c"]
        )

    return _fold(rearrange(out_re), plan), _fold(rearrange(out_im), plan)


def extract_wstack_tiles(grid_re, grid_im, plan):
    """Padded-tile views of a (nplanes, nu, nv) grid pair in the fused
    w-stack layout (ntr·ntc, nplanes, tpad_r, tpad_c) — or, for
    plane-blocked plans, (ntr·ntc·nblk, plane_block, …) with the plane
    axis zero-padded to nblk·plane_block — ready for the w-stack
    degridders."""
    ntsp = plan["ntr"] * plan["ntc"]
    npl = plan["nplanes"]
    P = plan.get("plane_block")

    def rearrange(x):  # (npl·ntsp, r, c) plane-major -> tile-major
        x = jnp.moveaxis(
            x.reshape(npl, ntsp, plan["tpad_r"], plan["tpad_c"]), 0, 1
        )
        if P:
            pad = plan["nblk"] * P - npl
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
            x = x.reshape(ntsp * plan["nblk"], P,
                          plan["tpad_r"], plan["tpad_c"])
        return x

    return rearrange(_unfold(grid_re, plan)), rearrange(_unfold(grid_im, plan))


def _degrid_wstack_kernel(gtile_ref, ir_ref, uf_ref, vfa_ref, p0_ref,
                          wsc_ref, tre_ref, tim_ref, out_re_ref,
                          out_im_ref, *, group, support, beta, tpad_r,
                          tpad_c, nplanes, blk, unroll=8):
    half = support / 2.0

    lanes_f = lax.broadcasted_iota(jnp.int32, (1, tpad_c), 1).astype(
        jnp.float32
    )
    subl_f = lax.broadcasted_iota(jnp.int32, (blk, 1), 0).astype(
        jnp.float32
    )

    if group % unroll:
        unroll = 1

    def body(j, _):
        for k in range(unroll):
            e = j * unroll + k
            r0 = ir_ref[0, 0, e]
            uf = uf_ref[0, 0, e]
            vfa = vfa_ref[0, 0, e]
            p0 = p0_ref[0, 0, e]

            # gather-side mirror of _grid_wstack_kernel: the window is
            # computed once per sample; the touched planes' blocks are
            # first combined with their w-taps (block adds), then ONE
            # multiply-reduce against the window yields the visibility —
            # support−1 fewer multiply-reduces than reducing each plane
            # separately. plan_tiles_wstack guarantees p0+t ∈ [0, nplanes).
            base = _es((vfa - lanes_f) / half, beta) * _es(
                (uf - subl_f) / half, beta
            )
            rs = pl.ds(pl.multiple_of(r0, 8), blk)
            sc0 = wsc_ref[0, 0, e]
            acc_re = sc0 * tre_ref[0, p0, rs, :]
            acc_im = sc0 * tim_ref[0, p0, rs, :]
            for t in range(1, support):
                sc = wsc_ref[0, t, e]
                sl = (0, p0 + t, rs, slice(None))
                acc_re = acc_re + sc * tre_ref[sl]
                acc_im = acc_im + sc * tim_ref[sl]
            out_re_ref[0, 0, e] = jnp.sum(jnp.sum(acc_re * base, axis=0))
            out_im_ref[0, 0, e] = jnp.sum(jnp.sum(acc_im * base, axis=0))
        return 0

    lax.fori_loop(0, group // unroll, body, 0, unroll=False)


def degrid_tiles_wstack_pallas(plan, tiles_re, tiles_im, nvis,
                               interpret=False, arrays=None, unroll=8):
    """Gather model visibilities from fused w-stack grid tiles.

    Mirror of :func:`grid_tiles_wstack_pallas`: per entry (= one
    visibility sample), the aligned row block of every touched w-plane is
    read from the (nplanes, tpad_r, tpad_c) VMEM-resident tile, combined
    with the per-plane ES taps and reduced against the uv window. The
    fused plan carries exactly one entry per sample, so the packed
    outputs map back to visibilities by the plan's slot permutation
    (``vis_slot``) — a pure gather, no scatter.

    ``arrays`` overrides the plan's packed entry arrays (per-shard plans,
    :func:`pack_shard_plans`); sharded callers fall back to a one-hit
    scatter-add since no host permutation is available for traced arrays.

    Returns flat (nvis,) re/im model visibilities.
    """
    if plan.get("subs", 1) > 1:
        raise ValueError(
            "supergroup-packed plans (pack_supergroups) are MXU-route "
            "only; use degrid_tiles_wstack_mxu")
    if "plane_block" in plan:
        raise ValueError(
            "plane-blocked plans are MXU-route only (block-relative p0 "
            "would index out-of-block planes in the gather kernel); "
            "use degrid_tiles_wstack_mxu"
        )
    w = plan["support"]
    group, ngroups = plan["group"], plan["ngroups"]
    nplanes = plan["nplanes"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    if arrays is None:
        arrays = plan

    kernel = partial(_degrid_wstack_kernel, group=group, support=w,
                     beta=plan["beta"], tpad_r=tpad_r, tpad_c=tpad_c,
                     nplanes=nplanes, blk=plan["blk"], unroll=unroll)

    smem_vec = pl.BlockSpec((1, 1, group), lambda g, t: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    smem_wsc = pl.BlockSpec((1, w, group), lambda g, t: (g, 0, 0),
                            memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((1, nplanes, tpad_r, tpad_c),
                             lambda g, t: (t[g], 0, 0, 0),
                             memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # group_tile
        grid=(ngroups,),
        in_specs=[smem_vec] * 4 + [smem_wsc] + [tile_spec, tile_spec],
        out_specs=[smem_vec, smem_vec],
    )

    out_shape = [
        jax.ShapeDtypeStruct((ngroups, 1, group), jnp.float32),
        jax.ShapeDtypeStruct((ngroups, 1, group), jnp.float32),
    ]

    vals_re, vals_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(arrays["group_tile"]),
        jnp.asarray(arrays["ir_loc"])[:, None, :],
        jnp.asarray(arrays["uf"])[:, None, :],
        jnp.asarray(arrays["vfa"])[:, None, :],
        jnp.asarray(arrays["p0"])[:, None, :],
        jnp.asarray(arrays["wsc"]),
        tiles_re.astype(jnp.float32),
        tiles_im.astype(jnp.float32),
    )

    vals_re = vals_re.reshape(-1)
    vals_im = vals_im.reshape(-1)

    if "vis_slot" in arrays:
        # one entry per sample: the packed slots are a permutation — the
        # inverse is a pure gather (pack_shard_plans stacks per-shard
        # vis_slot so the sharded path keeps it too)
        sel = jnp.asarray(arrays["vis_slot"])
        return _pair_gather(vals_re, vals_im, sel)
    # no slot table (traced per-shard arrays, or a plane-blocked plan
    # whose boundary duplicates give a sample two slots): padding and
    # duplicate slots carry zero/partial values, so a scatter-add over
    # owning samples reconstructs them
    sample = jnp.asarray(arrays["sample_pack"]).reshape(-1)
    out_re = jnp.zeros(nvis, jnp.float32).at[sample].add(vals_re)
    out_im = jnp.zeros(nvis, jnp.float32).at[sample].add(vals_im)
    return out_re, out_im


# ---------------------------------------------------------------------------
# MXU matmul formulation of the fused w-stack kernels
#
# The scatter kernels above are RMW-latency bound (gridding) or
# lane-throughput bound (degridding): each sample serially read-modify-
# writes / reduces a (blk, lanes) window. The matmul formulation instead
# treats a group's spreading as dense linear algebra. With row taps
# R[r, s] = es((urow_s - r)/half), column taps C[s, c] = es((vfa_s -
# c)/half) and per-plane w-taps W[p, s] (dense over planes, zero off the
# sample's w-window), the deposit of a whole group is, per plane p,
#
#     tile_p += (R * (W[p] · v)) @ C            (tpad_r, S) @ (S, tpad_c)
#
# an outer-product sum that runs on the MXU — no RMW chain, no dynamic
# slices, fully static control flow. Zero taps make padded entries and
# off-window pixels exact no-ops, so results match the scatter kernels.
# The degrid mirror contracts the other way and keeps samples on lanes
# throughout (no transposes):
#
#     vis_s = sum_p W[p, s] * sum_r R[r, s] * (tile_p @ C^T)[r, s]
#
# Dots run at HIGHEST precision (6-pass bf16 ≈ f32-faithful) to hold the
# wgridder epsilon contract; taps/scales are exact f32 VPU work.
# ---------------------------------------------------------------------------


def _wstack_window(plan, arrays, ngroups):
    """(nwin, pbase) plane-window metadata for the MXU w-stack kernels.

    Plans built with ``sort_planes`` carry a per-group window base and a
    static window depth; plans without the metadata (sort_planes=False
    or legacy caches) fall back to the full stack (pbase 0, nwin =
    nplanes), which is the pre-window behaviour."""
    nwin = plan.get("nwin")
    pbase = arrays.get("pbase")
    if nwin is None or pbase is None:
        return plan["nplanes"], jnp.zeros(ngroups, jnp.int32)
    return int(nwin), jnp.asarray(pbase).astype(jnp.int32)


def _wstack_rows(plan, arrays, ngroups, tpad_r):
    """(nrows, rbase) row-window metadata for the MXU w-stack kernels.

    Row-bucketed plans (``plan_tiles_wstack(row_bucket=True)``) carry a
    per-group 8-aligned window base and shrink the kernels' row extent
    from ``tpad_r`` to ``blk``; plain plans span the whole padded tile
    (rbase 0, nrows = tpad_r)."""
    if not plan.get("row_bucket"):
        return tpad_r, jnp.zeros(ngroups, jnp.int32)
    rbase = arrays["rbase"] if "rbase" in arrays else plan["rbase"]
    return int(plan["blk"]), jnp.asarray(rbase).astype(jnp.int32)


def _grid_wstack_mxu_kernel(first_ref, gtile_ref, pbase_ref, rbase_ref,
                            urow_ref, vfa_ref, p0_ref, wsc_ref, vre_ref,
                            vim_ref, out_re_ref, out_im_ref, *, group,
                            support, beta, tpad_r, tpad_c, nwin, nrows,
                            subs=1,
                            precision=lax.Precision.HIGHEST):
    g = pl.program_id(0)
    half = support / 2.0

    @pl.when(first_ref[g] == 1)
    def _():
        out_re_ref[...] = jnp.zeros_like(out_re_ref)
        out_im_ref[...] = jnp.zeros_like(out_im_ref)

    # ``subs`` packed sub-groups per step (pack_supergroups): the small
    # fill-friendly sub-groups share one kernel step's fixed cost. Each
    # sub-group rides its OWN SUBLANE of the (1, subs, S) input blocks —
    # static sublane slicing keeps clean vector layouts, where a static
    # LANE slice of a (1, subs·S) vector broadcast to (tpad_c, S) hits
    # an unsupported Mosaic relayout (probed 2026-08-21).
    for j in range(subs):
        # row-bucketed plans anchor the dot at the sub-group's shared
        # 8-aligned window start (nrows = blk); unbucketed plans span
        # the whole padded tile (nrows = tpad_r, rbase 0) — same math,
        # 3x the row MACs
        ablate = _wgrid_ablate()
        rb = rbase_ref[g * subs + j]
        urow = urow_ref[0, j:j + 1, :]        # (1, S) absolute frac row
        vfa = vfa_ref[0, j:j + 1, :]          # (1, S) absolute frac col
        r_iota = lax.broadcasted_iota(
            jnp.int32, (nrows, group), 0).astype(jnp.float32)
        if ablate == "noes":
            tapr_t = (urow - rb.astype(jnp.float32) - r_iota) * 1e-6
        else:
            tapr_t = _es((urow - rb.astype(jnp.float32) - r_iota) / half,
                         beta)                # (nrows, S)
        # column taps are computed transposed — (tpad_c, S), samples on
        # lanes like every other per-sample array — and the dot
        # contracts both operands over their LANE axis (A·Bᵀ). Measured
        # on this Mosaic toolchain the lane-lane contraction beats the
        # canonical ((1,), (0,)) form with a host-transposed (S, 1) vfa
        # column by ~30% (20.8 vs 27.1 ms at the config-4 shape).
        tc_iota = lax.broadcasted_iota(
            jnp.int32, (tpad_c, group), 0).astype(jnp.float32)
        if ablate == "noes":
            tapc_t = (vfa - tc_iota) * 1e-6
        else:
            tapc_t = _es((vfa - tc_iota) / half, beta)  # (tpad_c, S)

        # plane loop runs over the sub-group's nwin-deep w-window
        # starting at pbase (plan_tiles_wstack sort_planes): taps are
        # placed at window-relative positions, padded entries carry
        # all-zero wsc
        pb = pbase_ref[g * subs + j]
        p0 = p0_ref[0, j:j + 1, :] - pb       # (1, S) window-relative
        p_iota = lax.broadcasted_iota(jnp.int32, (nwin, group), 0)
        wt = jnp.zeros((nwin, group), jnp.float32)
        for t in range(support):
            wt = wt + jnp.where(p0 + t == p_iota,
                                wsc_ref[0, t, j:j + 1, :], 0.0)
        wv_re = wt * vre_ref[0, j:j + 1, :]   # (nwin, S)
        wv_im = wt * vim_ref[0, j:j + 1, :]

        # ONE stacked dot for the whole w-window: per-plane (nrows, S)
        # lhs rows run the MXU at nrows/128 utilization (tpad_r is 48
        # at the default tile, blk 16 row-bucketed), so stack the
        # planes into (nwin·nrows, S)
        dims = (((1,), (1,)), ((), ()))       # contract over samples
        rm_re = (tapr_t[None] * wv_re[:, None, :]).reshape(
            nwin * nrows, group)
        rm_im = (tapr_t[None] * wv_im[:, None, :]).reshape(
            nwin * nrows, group)
        if ablate == "nodot":
            # keep rm/tapc live (cheap row/col sums) but skip the MXU
            # contraction — wrong results, benchmark-only
            acc_re = (rm_re.sum(axis=1, keepdims=True)
                      + tapc_t.sum(axis=1).reshape(1, tpad_c))
            acc_im = (rm_im.sum(axis=1, keepdims=True)
                      + tapc_t.sum(axis=1).reshape(1, tpad_c))
        else:
            acc_re = _mxu_dot(rm_re, tapc_t, dims, precision)
            # (nwin·nrows, tpad_c)
            acc_im = _mxu_dot(rm_im, tapc_t, dims, precision)
        if ablate == "normw":
            # one combined RMW instead of nwin — wrong results,
            # benchmark-only (isolates the slab-RMW chain share)
            comb_re = sum(acc_re[p * nrows:(p + 1) * nrows]
                          for p in range(nwin))
            comb_im = sum(acc_im[p * nrows:(p + 1) * nrows]
                          for p in range(nwin))
            if nrows == tpad_r:
                sl = (0, pb)
            else:
                sl = (0, pb, pl.ds(pl.multiple_of(rb, 8), nrows))
            out_re_ref[sl] += comb_re
            out_im_ref[sl] += comb_im
            continue
        for p in range(nwin):
            slab_re = acc_re[p * nrows : (p + 1) * nrows]
            slab_im = acc_im[p * nrows : (p + 1) * nrows]
            if nrows == tpad_r:
                sl = (0, pb + p)
            else:
                # row-bucketed: blk-row slab at the sub-group's shared
                # 8-aligned base (tile_pad_geometry guarantees
                # rbase + blk <= tpad_r)
                sl = (0, pb + p, pl.ds(pl.multiple_of(rb, 8), nrows))
            out_re_ref[sl] += slab_re
            out_im_ref[sl] += slab_im


def grid_tiles_wstack_mxu(plan, vre_flat, vim_flat, interpret=False,
                          arrays=None, precision=None):
    """MXU matmul route for :func:`plan_tiles_wstack` plans.

    Same plan, inputs and padded-tile output format as
    :func:`grid_tiles_wstack_pallas`; the spreading runs as per-plane
    (tpad_r, S) @ (S, tpad_c) outer-product dots instead of per-sample
    scatter RMW. Plane-blocked plans come out as
    (ntr·ntc·nblk, plane_block, tpad_r, tpad_c). Assemble with
    :func:`assemble_wstack_tiles` either way.
    """
    w = plan["support"]
    group, ngroups = plan["group"], plan["ngroups"]
    subs = plan.get("subs", 1)
    nsg = ngroups // subs
    lanes = group * subs
    ntiles = plan["ntr"] * plan["ntc"] * plan.get("nblk", 1)
    nplanes = plan.get("plane_block") or plan["nplanes"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    if arrays is None:
        arrays = plan

    sample_pack = jnp.asarray(arrays["sample_pack"])
    vre, vim = _pair_gather(vre_flat.astype(jnp.float32),
                            vim_flat.astype(jnp.float32), sample_pack)
    urow = (jnp.asarray(arrays["ir_loc"]).astype(jnp.float32)
            + jnp.asarray(arrays["uf"]))
    nwin, pbase = _wstack_window(plan, arrays, ngroups)
    nrows, rbase = _wstack_rows(plan, arrays, ngroups, tpad_r)

    kernel = partial(_grid_wstack_mxu_kernel, group=group, support=w,
                     beta=plan["beta"], tpad_r=tpad_r, tpad_c=tpad_c,
                     nwin=nwin, nrows=nrows, subs=subs,
                     precision=precision or _wgrid_dot_mode()
                     or plan.get("dot_mode")
                     or lax.Precision.HIGHEST)

    vec = pl.BlockSpec((1, subs, group),
                       lambda g, f, t, pb, rb: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    wsc_spec = pl.BlockSpec((1, w, subs, group),
                            lambda g, f, t, pb, rb: (g, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nplanes, tpad_r, tpad_c),
                            lambda g, f, t, pb, rb: (t[g], 0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # first, group_tile, pbase, rbase
        grid=(nsg,),
        in_specs=[vec, vec, vec, wsc_spec, vec, vec],
        out_specs=[out_spec, out_spec],
    )

    out_shape = [
        jax.ShapeDtypeStruct((ntiles, nplanes, tpad_r, tpad_c),
                             jnp.float32),
        jax.ShapeDtypeStruct((ntiles, nplanes, tpad_r, tpad_c),
                             jnp.float32),
    ]

    # sub-groups ride separate sublanes: (nsg, subs, S) vec blocks and
    # (nsg, w, subs, S) wsc blocks (plain plans: subs == 1)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(arrays["first"]),
        jnp.asarray(arrays["group_tile"]),
        pbase,
        rbase,
        urow.reshape(nsg, subs, group),
        jnp.asarray(arrays["vfa"]).reshape(nsg, subs, group),
        jnp.asarray(arrays["p0"]).astype(jnp.int32).reshape(
            nsg, subs, group),
        jnp.asarray(arrays["wsc"]).reshape(nsg, w, subs, group),
        vre.reshape(nsg, subs, group),
        vim.reshape(nsg, subs, group),
    )


def _degrid_wstack_mxu_kernel(gtile_ref, pbase_ref, rbase_ref, urow_ref,
                              vfa_ref, p0_ref, wsc_ref, tre_ref, tim_ref,
                              out_re_ref, out_im_ref, *, group, support,
                              beta, tpad_r, tpad_c, nwin, nrows, subs=1,
                              precision=lax.Precision.HIGHEST):
    g = pl.program_id(0)
    half = support / 2.0

    # ``subs`` packed sub-groups per step, one per sublane of the
    # (1, subs, S) input blocks (see the grid kernel)
    for j in range(subs):
        # row-bucketed plans gather only the sub-group's blk-row slab
        # at its shared 8-aligned base (see the grid kernel); plain
        # plans read the whole padded tile (nrows = tpad_r, rbase 0)
        rb = rbase_ref[g * subs + j]
        urow = urow_ref[0, j:j + 1, :]        # (1, S)
        vfa = vfa_ref[0, j:j + 1, :]          # (1, S)
        r_iota = lax.broadcasted_iota(
            jnp.int32, (nrows, group), 0).astype(jnp.float32)
        tapr_t = _es((urow - rb.astype(jnp.float32) - r_iota) / half,
                     beta)                    # (nrows, S)
        tc_iota = lax.broadcasted_iota(
            jnp.int32, (tpad_c, group), 0).astype(jnp.float32)
        tapc_t = _es((vfa - tc_iota) / half, beta)      # (tpad_c, S)

        # gather only the sub-group's nwin-deep w-window
        pb = pbase_ref[g * subs + j]
        p0 = p0_ref[0, j:j + 1, :] - pb       # (1, S) window-relative
        p_iota = lax.broadcasted_iota(jnp.int32, (nwin, group), 0)
        wt = jnp.zeros((nwin, group), jnp.float32)
        for t in range(support):
            wt = wt + jnp.where(p0 + t == p_iota,
                                wsc_ref[0, t, j:j + 1, :], 0.0)

        # ONE stacked dot for the whole w-window (see the grid kernel):
        # the nwin tile planes concatenate along rows, (nwin·nrows,
        # tpad_c) @ (tpad_c, S), and the per-plane row-tap reduction
        # becomes a single weighted column-sum against wt[p]·tapr[r]
        # stacked the same way
        dims = (((1,), (0,)), ((), ()))       # (…, tpad_c) @ (tpad_c, S)
        if nrows == tpad_r:
            tsl = (0, pl.ds(pb, nwin))
        else:
            tsl = (0, pl.ds(pb, nwin),
                   pl.ds(pl.multiple_of(rb, 8), nrows))
        t_re = tre_ref[tsl].reshape(nwin * nrows, tpad_c)
        t_im = tim_ref[tsl].reshape(nwin * nrows, tpad_c)
        m_re = _mxu_dot(t_re, tapc_t, dims, precision)
        # (nwin·nrows, S)
        m_im = _mxu_dot(t_im, tapc_t, dims, precision)
        a_st = (wt[:, None, :] * tapr_t[None]).reshape(
            nwin * nrows, group)
        acc_re = jnp.sum(a_st * m_re, axis=0, keepdims=True)  # (1, S)
        acc_im = jnp.sum(a_st * m_im, axis=0, keepdims=True)
        out_re_ref[0, j:j + 1, :] = acc_re
        out_im_ref[0, j:j + 1, :] = acc_im


def degrid_tiles_wstack_mxu(plan, tiles_re, tiles_im, nvis,
                            interpret=False, arrays=None, precision=None):
    """MXU matmul route mirroring :func:`degrid_tiles_wstack_pallas`.

    Per plane the whole group's windows are gathered as (tpad_r, tpad_c)
    @ (tpad_c, S) dots with samples kept on lanes, then reduced against
    the row taps — same inputs/outputs/slot permutation as the scatter
    formulation. Plane-blocked plans read
    (ntr·ntc·nblk, plane_block, …) tiles (:func:`extract_wstack_tiles`)
    and return per-sample sums via the sample scatter-add (duplicated
    boundary entries each carry their partial taps).
    """
    w = plan["support"]
    group, ngroups = plan["group"], plan["ngroups"]
    subs = plan.get("subs", 1)
    nsg = ngroups // subs
    lanes = group * subs
    nplanes = plan.get("plane_block") or plan["nplanes"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    if arrays is None:
        arrays = plan

    urow = (jnp.asarray(arrays["ir_loc"]).astype(jnp.float32)
            + jnp.asarray(arrays["uf"]))
    nwin, pbase = _wstack_window(plan, arrays, ngroups)
    nrows, rbase = _wstack_rows(plan, arrays, ngroups, tpad_r)

    kernel = partial(_degrid_wstack_mxu_kernel, group=group, support=w,
                     beta=plan["beta"], tpad_r=tpad_r, tpad_c=tpad_c,
                     nwin=nwin, nrows=nrows, subs=subs,
                     precision=precision or _wgrid_dot_mode()
                     or plan.get("dot_mode")
                     or lax.Precision.HIGHEST)

    vec = pl.BlockSpec((1, subs, group),
                       lambda g, t, pb, rb: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    wsc_spec = pl.BlockSpec((1, w, subs, group),
                            lambda g, t, pb, rb: (g, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, nplanes, tpad_r, tpad_c),
                             lambda g, t, pb, rb: (t[g], 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, subs, group),
                            lambda g, t, pb, rb: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # group_tile, pbase, rbase
        grid=(nsg,),
        in_specs=[vec, vec, vec, wsc_spec, tile_spec, tile_spec],
        out_specs=[out_spec, out_spec],
    )

    out_shape = [
        jax.ShapeDtypeStruct((nsg, subs, group), jnp.float32),
        jax.ShapeDtypeStruct((nsg, subs, group), jnp.float32),
    ]

    vals_re, vals_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(arrays["group_tile"]),
        pbase,
        rbase,
        urow.reshape(nsg, subs, group),
        jnp.asarray(arrays["vfa"]).reshape(nsg, subs, group),
        jnp.asarray(arrays["p0"]).astype(jnp.int32).reshape(
            nsg, subs, group),
        jnp.asarray(arrays["wsc"]).reshape(nsg, w, subs, group),
        tiles_re.astype(jnp.float32),
        tiles_im.astype(jnp.float32),
    )

    vals_re = vals_re.reshape(-1)
    vals_im = vals_im.reshape(-1)

    if "vis_slot" in arrays:
        sel = jnp.asarray(arrays["vis_slot"])
        return _pair_gather(vals_re, vals_im, sel)
    sample = jnp.asarray(arrays["sample_pack"]).reshape(-1)
    out_re = jnp.zeros(nvis, jnp.float32).at[sample].add(vals_re)
    out_im = jnp.zeros(nvis, jnp.float32).at[sample].add(vals_im)
    return out_re, out_im


def _grid_mxu_kernel(first_ref, gtile_ref, urow_ref, vfa_ref, vre_ref,
                     vim_ref, out_re_ref, out_im_ref, *, group, support,
                     beta, tpad_r, tpad_c, ncorr,
                     precision=lax.Precision.HIGHEST):
    g = pl.program_id(0)
    half = support / 2.0

    @pl.when(first_ref[g] == 1)
    def _():
        out_re_ref[...] = jnp.zeros_like(out_re_ref)
        out_im_ref[...] = jnp.zeros_like(out_im_ref)

    urow = urow_ref[0]                        # (1, S)
    vfa = vfa_ref[0]                          # (1, S)
    r_iota = lax.broadcasted_iota(jnp.int32, (tpad_r, group), 0).astype(
        jnp.float32
    )
    tapr_t = _es((urow - r_iota) / half, beta)          # (tpad_r, S)
    tc_iota = lax.broadcasted_iota(jnp.int32, (tpad_c, group), 0).astype(
        jnp.float32
    )
    tapc_t = _es((vfa - tc_iota) / half, beta)          # (tpad_c, S)

    dims = (((1,), (1,)), ((), ()))           # contract over samples
    for c in range(ncorr):
        rm_re = tapr_t * vre_ref[0, c:c + 1, :]
        rm_im = tapr_t * vim_ref[0, c:c + 1, :]
        acc_re = _mxu_dot(rm_re, tapc_t, dims, precision)
        acc_im = _mxu_dot(rm_im, tapc_t, dims, precision)
        out_re_ref[0, c] += acc_re
        out_im_ref[0, c] += acc_im


def grid_tiles_mxu(plan, vre_flat, vim_flat, interpret=False,
                   arrays=None, precision=None):
    """MXU matmul route for :func:`plan_tiles` plans.

    Same plan/inputs/padded-tile outputs as :func:`grid_tiles_pallas`
    (multi-correlation supported); each correlation's deposit is one
    (tpad_r, S) @ (S, tpad_c) outer-product dot per group instead of a
    per-sample scatter RMW. Virtual w-samples ride unchanged — the
    per-entry ``scale`` is folded into the packed values exactly as in
    the scatter wrapper. Assemble with :func:`assemble_tiles`.
    """
    w = plan["support"]
    group, ngroups = plan["group"], plan["ngroups"]
    ntiles = plan["nplanes"] * plan["ntr"] * plan["ntc"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    if arrays is None:
        arrays = plan

    multi = vre_flat.ndim == 2
    ncorr = vre_flat.shape[0] if multi else 1
    if not multi:
        vre_flat = vre_flat[None]
        vim_flat = vim_flat[None]

    sample_pack = jnp.asarray(arrays["sample_pack"])
    scale = jnp.asarray(arrays["scale"])
    vre = (vre_flat[:, sample_pack] * scale).astype(jnp.float32)
    vim = (vim_flat[:, sample_pack] * scale).astype(jnp.float32)
    vre = jnp.moveaxis(vre, 0, 1)             # (ngroups, ncorr, group)
    vim = jnp.moveaxis(vim, 0, 1)
    urow = (jnp.asarray(arrays["ir_loc"]).astype(jnp.float32)
            + jnp.asarray(arrays["uf"]))

    kernel = partial(_grid_mxu_kernel, group=group, support=w,
                     beta=plan["beta"], tpad_r=tpad_r, tpad_c=tpad_c,
                     ncorr=ncorr,
                     precision=precision or _wgrid_dot_mode()
                     or plan.get("dot_mode")
                     or lax.Precision.HIGHEST)

    vec = pl.BlockSpec((1, 1, group), lambda g, f, t: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    val = pl.BlockSpec((1, ncorr, group), lambda g, f, t: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ncorr, tpad_r, tpad_c),
                            lambda g, f, t: (t[g], 0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # first, group_tile
        grid=(ngroups,),
        in_specs=[vec, vec, val, val],
        out_specs=[out_spec, out_spec],
    )

    out_shape = [
        jax.ShapeDtypeStruct((ntiles, ncorr, tpad_r, tpad_c), jnp.float32),
        jax.ShapeDtypeStruct((ntiles, ncorr, tpad_r, tpad_c), jnp.float32),
    ]

    t_re, t_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(arrays["first"]),
        jnp.asarray(arrays["group_tile"]),
        urow[:, None, :],
        jnp.asarray(arrays["vfa"])[:, None, :],
        vre,
        vim,
    )
    if not multi:
        return t_re[:, 0], t_im[:, 0]
    return t_re, t_im


def _degrid_mxu_kernel(gtile_ref, urow_ref, vfa_ref, scale_ref, tre_ref,
                       tim_ref, out_re_ref, out_im_ref, *, group,
                       support, beta, tpad_r, tpad_c, ncorr,
                       precision=lax.Precision.HIGHEST):
    half = support / 2.0

    urow = urow_ref[0]                        # (1, S)
    vfa = vfa_ref[0]                          # (1, S)
    sc = scale_ref[0]                         # (1, S)
    r_iota = lax.broadcasted_iota(jnp.int32, (tpad_r, group), 0).astype(
        jnp.float32
    )
    tapr_t = _es((urow - r_iota) / half, beta)          # (tpad_r, S)
    tc_iota = lax.broadcasted_iota(jnp.int32, (tpad_c, group), 0).astype(
        jnp.float32
    )
    tapc_t = _es((vfa - tc_iota) / half, beta)          # (tpad_c, S)

    dims = (((1,), (0,)), ((), ()))           # (tpad_r, tpad_c) @ (tpad_c, S)
    for c in range(ncorr):
        m_re = _mxu_dot(tre_ref[0, c], tapc_t, dims, precision)
        # (tpad_r, S)
        m_im = _mxu_dot(tim_ref[0, c], tapc_t, dims, precision)
        e_re = jnp.sum(tapr_t * m_re, axis=0, keepdims=True)   # (1, S)
        e_im = jnp.sum(tapr_t * m_im, axis=0, keepdims=True)
        out_re_ref[0, c:c + 1, :] = sc * e_re
        out_im_ref[0, c:c + 1, :] = sc * e_im


def degrid_tiles_mxu(plan, tiles_re, tiles_im, nvis, interpret=False,
                     arrays=None, precision=None):
    """MXU matmul route mirroring :func:`degrid_tiles_pallas`.

    Per correlation the whole group gathers as (tpad_r, tpad_c) @
    (tpad_c, S) dots reduced against the row taps; virtual w-samples are
    summed back onto their visibilities by the shared unpack."""
    w = plan["support"]
    group, ngroups = plan["group"], plan["ngroups"]
    tpad_r, tpad_c = plan["tpad_r"], plan["tpad_c"]
    if arrays is None:
        arrays = plan

    multi = tiles_re.ndim == 4
    ncorr = tiles_re.shape[1] if multi else 1
    if not multi:
        tiles_re = tiles_re[:, None]
        tiles_im = tiles_im[:, None]

    urow = (jnp.asarray(arrays["ir_loc"]).astype(jnp.float32)
            + jnp.asarray(arrays["uf"]))

    kernel = partial(_degrid_mxu_kernel, group=group, support=w,
                     beta=plan["beta"], tpad_r=tpad_r, tpad_c=tpad_c,
                     ncorr=ncorr,
                     precision=precision or _wgrid_dot_mode()
                     or plan.get("dot_mode")
                     or lax.Precision.HIGHEST)

    vec = pl.BlockSpec((1, 1, group), lambda g, t: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    val = pl.BlockSpec((1, ncorr, group), lambda g, t: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, ncorr, tpad_r, tpad_c),
                             lambda g, t: (t[g], 0, 0, 0),
                             memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # group_tile
        grid=(ngroups,),
        in_specs=[vec, vec, vec, tile_spec, tile_spec],
        out_specs=[val, val],
    )

    out_shape = [
        jax.ShapeDtypeStruct((ngroups, ncorr, group), jnp.float32),
        jax.ShapeDtypeStruct((ngroups, ncorr, group), jnp.float32),
    ]

    vals_re, vals_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(arrays["group_tile"]),
        urow[:, None, :],
        jnp.asarray(arrays["vfa"])[:, None, :],
        jnp.asarray(arrays["scale"])[:, None, :],
        tiles_re.astype(jnp.float32),
        tiles_im.astype(jnp.float32),
    )

    return _degrid_unpack(vals_re, vals_im, plan, arrays, nvis, ncorr,
                          multi)
