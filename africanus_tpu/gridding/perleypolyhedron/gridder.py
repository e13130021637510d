"""Perley-polyhedron faceting gridder / degridder.

TPU-native equivalents of reference
``africanus/gridding/perleypolyhedron/gridder.py:13`` and
``degridder.py:78``: policy-driven 2D convolutional gridding onto per-band
grids with facet baseline/phase transforms. The per-row/chan/tap loops
become one broadcasted scatter (gridder) / gather (degridder) over the
W×W kernel offsets, with out-of-grid taps masked to zero weight —
the functional equivalent of the reference's bounds checks.

Convolution policies supported: "conv_1d_axisymmetric_unpacked_scatter",
"conv_1d_axisymmetric_packed_scatter", "conv_nn_scatter" and the gather
duals; packed kernels are unpacked on the host (pack/unpack are exact
inverses) so both layouts produce identical numerics.

On TPU (concrete uvw) the axisymmetric policies run in the table-mode
Pallas tile kernels (ops/pallas_grid.py) — identical quantized-tap
numerics, grid edges clip — instead of XLA scatter/gather.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from africanus_tpu.ops.cplx import Cplx, cplx
from africanus_tpu.gridding.perleypolyhedron import policies as pol
from africanus_tpu.gridding.perleypolyhedron.kernels import unpack_kernel

__all__ = ["gridder", "degridder", "pp_tile_plan"]


def _scaled_coords(uvw, wavelengths, npix, cell):
    """(row, chan) fractional grid coordinates (similarity theorem)."""
    scale_factor = npix * cell / 3600.0 * np.pi / 180.0
    u = uvw[:, 0, None] * scale_factor / wavelengths
    v = uvw[:, 1, None] * scale_factor / wavelengths
    return u, v


def _tap_geometry(scaled, npix, W, oversample):
    """Per-sample tap indices + kernel lookup indices.

    Mirrors the reference's discretisation (convolution_policies.py:40-47):
    disc = round(offset); frac = int((disc − offset)·oversample), truncated
    toward zero; tap index = disc + t − W//2; kernel index = (t+1)·os + frac.
    """
    offset = scaled + npix // 2
    disc = jnp.round(offset).astype(jnp.int32)
    frac = jnp.trunc((disc - offset) * oversample).astype(jnp.int32)
    taps = jnp.arange(W, dtype=jnp.int32)
    grid_idx = disc[..., None] + taps - W // 2  # (..., W)
    kern_idx = (taps + 1) * oversample + frac[..., None]
    return grid_idx, kern_idx


def pp_tile_plan(uvw, wavelengths, chanmap, npix, cell, image_centre,
                 phase_centre, convolution_kernel_width,
                 convolution_kernel_oversampling,
                 baseline_transform_policy, direction="grid", force=False):
    """Precompute the Pallas tile plan for :func:`gridder` /
    :func:`degridder` from *concrete* inputs (host metadata). Required to
    use the tile path under ``jax.jit`` — traced coordinates fall back to
    scatter/gather. ``direction`` is "grid" or "degrid" (the degridder
    applies the baseline transform with swapped centres). ``force`` plans
    even off-TPU (the kernels then run in Pallas interpret mode)."""
    uvw = np.asarray(uvw)
    wavelengths = np.asarray(wavelengths).ravel()
    chanmap = np.asarray(chanmap).ravel().astype(np.int32)
    nband = int(chanmap.max()) + 1
    ra0, dec0 = float(phase_centre[0]), float(phase_centre[1])
    ra, dec = float(image_centre[0]), float(image_centre[1])

    # host f64 throughout: the tap quantization (round/trunc) is then
    # deterministic and at the ideal positions, independent of device f32
    if direction == "grid":
        uvw_t = pol.baseline_transform(uvw, ra0, dec0, ra, dec,
                                       baseline_transform_policy)
    else:
        uvw_t = pol.baseline_transform(uvw, ra, dec, ra0, dec0,
                                       baseline_transform_policy)
    su, sv = _scaled_coords(np.asarray(uvw_t), wavelengths, npix, cell)
    bands = chanmap[None, :].repeat(uvw.shape[0], axis=0)
    return _pp_tile_plan(np.asarray(su), np.asarray(sv), bands, npix,
                         convolution_kernel_width,
                         convolution_kernel_oversampling, nband,
                         force=force)


def _pp_tile_plan(su, sv, bands_np, npix, W, os, nband, force=False):
    """Host tile plan from concrete scaled coordinates (None if traced)."""
    import jax

    if not force and jax.default_backend() != "tpu":
        return None
    try:
        su = np.asarray(su)
        sv = np.asarray(sv)
    except Exception:
        return None  # traced coordinates: scatter/gather fallback

    from africanus_tpu.ops import pallas_grid as pg

    # mirror the tiles plan_tiles_table actually picks (awkward npix
    # factorisations must fall back to scatter, not raise deep in the
    # plan build — same guard as gridding/wgridder/core._tile_plan)
    if W > min(pg.default_tiles(npix, npix, W)):
        return None

    def tapgeom(scaled):
        offset = scaled.ravel() + npix // 2
        disc = np.round(offset).astype(np.int64)
        frac = np.trunc((disc - offset) * os).astype(np.int64)
        return disc, frac

    du, fu = tapgeom(su)
    dv, fv = tapgeom(sv)
    ir0 = dv - W // 2  # rows = v
    ic0 = du - W // 2  # cols = u
    keep = (
        (ir0 + W - 1 >= 0) & (ir0 < npix)
        & (ic0 + W - 1 >= 0) & (ic0 < npix)
    )
    sel = np.nonzero(keep)[0]
    plan = pg.plan_tiles_table(
        ir0[sel], ic0[sel], fv[sel], fu[sel], W, os, npix, npix,
        sample_id=sel, plane=bands_np.ravel()[sel], nplanes=nband,
    )
    return plan


def _prepare_kernel(convolution_kernel, W, oversample, policy):
    if "_packed_" in policy:
        return jnp.asarray(
            unpack_kernel(np.asarray(convolution_kernel), W, oversample)
        )
    return jnp.asarray(convolution_kernel)


def gridder(
    uvw,
    vis,
    wavelengths,
    chanmap,
    npix,
    cell,
    image_centre,
    phase_centre,
    convolution_kernel,
    convolution_kernel_width,
    convolution_kernel_oversampling,
    baseline_transform_policy,
    phase_transform_policy,
    stokes_conversion_policy,
    convolution_policy,
    grid_dtype=None,
    do_normalize=False,
    tile_plan=None,
    tile_arrays=None,
):
    """Grid (row, chan, corr) visibilities onto (nband, npix, npix) grids.

    Returns a Cplx pair (assemble with lax.complex on complex backends).
    ``cell`` is in arcseconds; ``image_centre``/``phase_centre`` in radians.
    ``tile_plan`` (from :func:`pp_tile_plan`) enables the Pallas tile path
    under jit; otherwise it activates automatically for concrete inputs
    on TPU. ``tile_arrays`` overrides the plan's packed entry arrays with
    (possibly traced) per-shard stacks from
    :func:`africanus_tpu.ops.pallas_grid.pack_shard_plans`.
    """
    uvw = jnp.asarray(uvw)
    v = cplx(vis)
    wavelengths = jnp.asarray(np.asarray(wavelengths).ravel())
    chanmap = np.asarray(chanmap).ravel().astype(np.int32)

    if chanmap.size != wavelengths.shape[0]:
        raise ValueError(
            "chanmap and wavelength arrays disagree in shape"
        )
    nband = int(chanmap.max()) + 1
    nrow, nvischan, ncorr = v.shape
    if uvw.shape[1] != 3:
        raise ValueError("uvw must have shape (nrow, 3)")
    if uvw.shape[0] != nrow:
        raise ValueError("uvw and vis disagree on the row count")
    if nvischan != wavelengths.shape[0]:
        raise ValueError("chanmap length must equal the vis channel count")

    W = convolution_kernel_width
    os = convolution_kernel_oversampling
    kern = _prepare_kernel(convolution_kernel, W, os, convolution_policy)

    ra0, dec0 = float(phase_centre[0]), float(phase_centre[1])
    ra, dec = float(image_centre[0]), float(image_centre[1])

    # facet transforms (gridder order: phase then baseline, gridder.py:80-93)
    v = pol.phase_transform(
        v, uvw, wavelengths, ra0, dec0, ra, dec, phase_transform_policy,
        phasesign=1.0,
    )
    uvw = pol.baseline_transform(uvw, ra0, dec0, ra, dec,
                                 baseline_transform_policy)

    su, sv = _scaled_coords(uvw, wavelengths, npix, cell)  # (row, chan)
    stokes = pol.corr2stokes(v, stokes_conversion_policy)  # (row, chan)

    bands = jnp.asarray(chanmap)[None, :].repeat(nrow, axis=0)  # (row, chan)

    if convolution_policy == "conv_nn_scatter":
        iu = jnp.round(su + npix // 2).astype(jnp.int32)
        iv = jnp.round(sv + npix // 2).astype(jnp.int32)
        inb = (iu >= 0) & (iu < npix) & (iv >= 0) & (iv < npix)
        wmask = inb.astype(stokes.re.dtype)
        idx = (bands, jnp.clip(iv, 0, npix - 1), jnp.clip(iu, 0, npix - 1))
        gre = jnp.zeros((nband, npix, npix), stokes.re.dtype).at[idx].add(
            stokes.re * wmask
        )
        gim = jnp.zeros((nband, npix, npix), stokes.re.dtype).at[idx].add(
            stokes.im * wmask
        )
        wt_ch = jnp.zeros(nband, stokes.re.dtype).at[bands].add(
            jnp.ones_like(stokes.re)
        )
    elif convolution_policy in (
        "conv_1d_axisymmetric_unpacked_scatter",
        "conv_1d_axisymmetric_packed_scatter",
    ):
        gu_idx, ku_idx = _tap_geometry(su, npix, W, os)  # (row, chan, W)
        gv_idx, kv_idx = _tap_geometry(sv, npix, W, os)
        conv_u = kern[ku_idx]
        conv_v = kern[kv_idx]

        # (row, chan, Wv, Wu) weights and validity
        wj = conv_v[..., :, None] * conv_u[..., None, :]

        if tile_plan is None and tile_arrays is None:
            tile_plan = _pp_tile_plan(su, sv, chanmap[None, :].repeat(
                nrow, axis=0), npix, W, os, nband)
        if tile_plan is not None:
            import jax

            from africanus_tpu.ops.pallas_grid import (
                assemble_tiles, grid_tiles_table_pallas,
            )

            interpret = jax.default_backend() != "tpu"
            t_re, t_im = grid_tiles_table_pallas(
                tile_plan, kern, stokes.re.reshape(-1),
                stokes.im.reshape(-1), interpret=interpret,
                arrays=tile_arrays,
            )
            gre, gim = assemble_tiles(t_re, t_im, tile_plan)
        else:
            inb = (
                (gv_idx[..., :, None] >= 0)
                & (gv_idx[..., :, None] < npix)
                & (gu_idx[..., None, :] >= 0)
                & (gu_idx[..., None, :] < npix)
            )
            wjm = wj * inb.astype(wj.dtype)

            idx = (
                bands[..., None, None],
                jnp.clip(gv_idx[..., :, None], 0, npix - 1),
                jnp.clip(gu_idx[..., None, :], 0, npix - 1),
            )
            gre = jnp.zeros((nband, npix, npix), wj.dtype).at[idx].add(
                stokes.re[..., None, None] * wjm
            )
            gim = jnp.zeros((nband, npix, npix), wj.dtype).at[idx].add(
                stokes.im[..., None, None] * wjm
            )
        # conv-weight sums accumulate regardless of bounds (reference :66)
        wt_ch = jnp.zeros(nband, wj.dtype).at[bands].add(wj.sum(axis=(-2, -1)))
    else:
        raise ValueError("unknown convolution policy")

    if do_normalize:
        gre = gre / (wt_ch[:, None, None] + 1.0e-8)
        gim = gim / (wt_ch[:, None, None] + 1.0e-8)

    return Cplx(gre, gim)


def degridder(
    uvw,
    gridstack,
    wavelengths,
    chanmap,
    cell,
    image_centre,
    phase_centre,
    convolution_kernel,
    convolution_kernel_width,
    convolution_kernel_oversampling,
    baseline_transform_policy,
    phase_transform_policy,
    stokes_conversion_policy,
    convolution_policy,
    vis_dtype=None,
    tile_plan=None,
    tile_arrays=None,
):
    """Degrid (nband, npix, npix) grids to (row, chan, corr) visibilities.

    Returns a Cplx pair. Mirrors reference degridder.py:78 (baseline
    transform with swapped centres before degridding, conjugate phase
    transform after).
    """
    uvw = jnp.asarray(uvw)
    g = cplx(gridstack)
    wavelengths = jnp.asarray(np.asarray(wavelengths).ravel())
    chanmap = np.asarray(chanmap).ravel().astype(np.int32)
    nband, npix, _ = g.shape
    nrow = uvw.shape[0]
    nvischan = wavelengths.shape[0]

    W = convolution_kernel_width
    os = convolution_kernel_oversampling
    kern = _prepare_kernel(convolution_kernel, W, os, convolution_policy)

    ra0, dec0 = float(phase_centre[0]), float(phase_centre[1])
    ra, dec = float(image_centre[0]), float(image_centre[1])

    uvw_t = pol.baseline_transform(uvw, ra, dec, ra0, dec0,
                                   baseline_transform_policy)
    su, sv = _scaled_coords(uvw_t, wavelengths, npix, cell)
    bands = jnp.asarray(chanmap)[None, :].repeat(nrow, axis=0)

    # accumulated convolution weight: the reference gather policies
    # divide each visibility by the (boundary-clipped) sum of the taps
    # actually applied (convolution_policies.py:269 `vis /= cw + 1e-8`).
    # The 2D weight is separable, so cw = (masked u-tap sum)(masked
    # v-tap sum) without touching the grid.
    gu_idx, ku_idx = _tap_geometry(su, npix, W, os)
    gv_idx, kv_idx = _tap_geometry(sv, npix, W, os)
    cw_u = (kern[ku_idx]
            * ((gu_idx >= 0) & (gu_idx < npix)).astype(kern.dtype)).sum(-1)
    cw_v = (kern[kv_idx]
            * ((gv_idx >= 0) & (gv_idx < npix)).astype(kern.dtype)).sum(-1)
    cw = cw_v * cw_u + 1e-8

    if convolution_policy in (
        "conv_1d_axisymmetric_unpacked_gather",
        "conv_1d_axisymmetric_packed_gather",
    ):
        if tile_plan is None and tile_arrays is None:
            tile_plan = _pp_tile_plan(su, sv, chanmap[None, :].repeat(
                nrow, axis=0), npix, W, os, nband)
        if tile_plan is not None:
            import jax

            from africanus_tpu.ops.pallas_grid import (
                degrid_tiles_table_pallas, extract_tiles,
            )

            interpret = jax.default_backend() != "tpu"
            tre, tim = extract_tiles(g.re, g.im, tile_plan)
            o_re, o_im = degrid_tiles_table_pallas(
                tile_plan, kern, tre, tim, nrow * nvischan,
                interpret=interpret, arrays=tile_arrays,
            )
            acc = Cplx(o_re.reshape(nrow, nvischan),
                       o_im.reshape(nrow, nvischan))
        else:
            conv_u = kern[ku_idx]
            conv_v = kern[kv_idx]
            wj = conv_v[..., :, None] * conv_u[..., None, :]
            inb = (
                (gv_idx[..., :, None] >= 0)
                & (gv_idx[..., :, None] < npix)
                & (gu_idx[..., None, :] >= 0)
                & (gu_idx[..., None, :] < npix)
            )
            wjm = wj * inb.astype(wj.dtype)
            idx = (
                bands[..., None, None],
                jnp.clip(gv_idx[..., :, None], 0, npix - 1),
                jnp.clip(gu_idx[..., None, :], 0, npix - 1),
            )
            acc = Cplx(
                (g.re[idx] * wjm).sum(axis=(-2, -1)),
                (g.im[idx] * wjm).sum(axis=(-2, -1)),
            )
    else:
        raise ValueError("unknown convolution policy")

    acc = Cplx(acc.re / cw, acc.im / cw)
    vis = pol.stokes2corr(acc, stokes_conversion_policy)  # (row, chan, corr)
    # the reference's conjugate phase transform reads the baseline-
    # TRANSFORMED uvw (degridder_row_kernel mutates uvw in place before
    # ptp.policy, ref degridder.py:43-66)
    vis = pol.phase_transform(
        vis, uvw_t, wavelengths, ra0, dec0, ra, dec, phase_transform_policy,
        phasesign=-1.0,
    )
    return vis


def degridder_serial(*args, **kwargs):
    """Reference parity alias (degridder.py:178): the vectorised degridder
    has no separate serial path."""
    return degridder(*args, **kwargs)
