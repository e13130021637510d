"""Sharded imaging: multi-device gridding via partial-grid psum.

The reference bounds dask-worker memory with serialized per-stream grid
accumulation chains (nifty GridStreamReduction, gridding/nifty/dask.py:118);
on a TPU mesh the natural design is one partial grid per device over its
row shard and a single ``psum`` over ICI — the scatter is fused on-device
and the collective rides the interconnect.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from africanus_tpu.ops.cplx import Cplx, cplx

__all__ = ["sharded_dirty", "sharded_psf", "sharded_residual",
           "sharded_pp_gridder", "sharded_pp_degridder"]



def _shard_tile_plans(uvw, freq, plan, nx, ny, cell, nshard, use_tiles):
    """Per-shard Pallas tile plans packed to one SPMD-friendly set.

    Returns (plan, use_tiles, tile_arrays): on success ``plan`` is a
    COPY of the (shared, read-only) cached plan carrying the packed
    plan_static, and ``tile_arrays`` the row-shardable entry arrays;
    when any shard declines (awkward geometry) tiles are disabled.
    """
    from africanus_tpu.gridding.wgridder.core import (
        _tile_plan, _use_tiles_default,
    )
    from africanus_tpu.ops.pallas_grid import pack_shard_plans

    if use_tiles is None:
        use_tiles = _use_tiles_default()
    if not use_tiles:
        return plan, False, None

    nrow = uvw.shape[0]
    rows_per = nrow // nshard
    shard_plans = [
        # per-shard plans in the default (fused w-stack when
        # multi-plane) format; pack_shard_plans stacks either format
        _tile_plan(uvw[s * rows_per:(s + 1) * rows_per], freq, plan,
                   nx, ny, cell, cell)
        for s in range(nshard)
    ]
    if not all(p is not None for p in shard_plans):
        return plan, False, None
    # make_plan returns shared LRU-cached dicts (read-only by contract,
    # gridding/wgridder/core.py) — copy before attaching
    plan = dict(plan)
    plan["tile_plan"], tile_arrays = pack_shard_plans(shard_plans)
    return plan, True, tile_arrays

def sharded_dirty(mesh, uvw, freq, vis, nx, ny, cell, epsilon=1e-4,
                  do_wstacking=False, wgt=None, use_tiles=None):
    """Dirty image with rows sharded over the mesh "row" axis.

    Each device grids its row shard and FFTs locally; partial dirty images
    are psum-reduced — the TPU analogue of the reference's dask
    row-chunked ``dirty`` blockwise + sum (gridding/wgridder/dask.py:159).

    The gridding plan (w-planes, tapers) is built from the *full* uvw on
    the host so every shard shares one grid geometry. With ``use_tiles``
    (auto-on for TPU) each shard additionally gets its own Pallas
    tile-binning plan; the per-shard packed entry arrays are padded to a
    common group count and fed through shard_map as row-sharded inputs,
    so one SPMD trace serves every shard (ops.pallas_grid.pack_shard_plans).
    """
    from africanus_tpu.gridding.wgridder.core import grid_adjoint, make_plan

    uvw = np.asarray(uvw)
    freq = np.asarray(freq)
    nrow = uvw.shape[0]
    nshard = mesh.shape["row"]
    if nrow % nshard:
        raise ValueError(f"rows {nrow} must divide over {nshard} shards "
                         f"(pad with zero-weight rows)")

    v = cplx(vis)

    # one shared grid geometry from the full uvw (host metadata)
    plan = make_plan(uvw, freq, nx, ny, cell, cell, epsilon, do_wstacking,
                     use_tiles=False)
    plan, use_tiles, tile_arrays = _shard_tile_plans(
        uvw, freq, plan, nx, ny, cell, nshard, use_tiles
    )

    def local(uvw_s, v_s, wgt_s, arrs_s):
        if arrs_s is not None:
            arrs_s = {k: a[0] for k, a in arrs_s.items()}
        d = grid_adjoint(uvw_s, freq, v_s, wgt_s, nx, ny, cell, cell,
                         epsilon, do_wstacking, plan=plan,
                         use_tiles=use_tiles, tile_arrays=arrs_s)
        return jax.lax.psum(d, "row")

    wgt_arr = jnp.ones(v.re.shape, v.re.dtype) if wgt is None else jnp.asarray(wgt)

    if tile_arrays is None:
        arr_spec = None
        tile_in = None
    else:
        arr_spec = {k: P("row") for k in tile_arrays}
        tile_in = {k: jnp.asarray(a) for k, a in tile_arrays.items()}

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("row"), Cplx(P("row"), P("row")), P("row"), arr_spec),
        out_specs=P(),
        # pallas_call outputs carry no varying-mesh-axes annotation
        check_vma=False,
    )
    return fn(jnp.asarray(uvw), v, wgt_arr, tile_in)


def sharded_psf(mesh, uvw, freq, nx, ny, cell, epsilon=1e-4,
                do_wstacking=False):
    """Point-spread function (dirty image of unit visibilities), sharded."""
    nrow, nchan = np.asarray(uvw).shape[0], np.asarray(freq).shape[0]
    ones = Cplx(jnp.ones((nrow, nchan), jnp.float32),
                jnp.zeros((nrow, nchan), jnp.float32))
    return sharded_dirty(mesh, uvw, freq, ones, nx, ny, cell, epsilon,
                         do_wstacking)


def sharded_degrid(mesh, uvw, freq, image, *, cell, epsilon=1e-4,
                   do_wstacking=False, wgt=None, use_tiles=None):
    """Model visibilities from an image with rows sharded over "row".

    The image is replicated; each device interpolates its own row shard
    (no collective needed — outputs are row-sharded like the inputs).
    ``cell`` is the pixel size in radians (required — the image shape
    supplies nx/ny). With ``use_tiles`` (auto-on for TPU) each shard runs
    the Pallas tile degridder on its own per-shard plan (see
    :func:`sharded_dirty`).
    """
    from africanus_tpu.gridding.wgridder.core import degrid_ri, make_plan

    if cell is None:
        raise TypeError("sharded_degrid: cell (pixel size, radians) is "
                        "required")
    if not np.isscalar(cell) or not 0.0 < float(cell) < 1.0:
        raise ValueError(f"sharded_degrid: cell must be a pixel size in "
                         f"radians (0 < cell < 1), got {cell!r}")
    uvw = np.asarray(uvw)
    freq = np.asarray(freq)
    image = jnp.asarray(image)
    nx, ny = image.shape
    nrow = uvw.shape[0]
    nshard = mesh.shape["row"]
    if nrow % nshard:
        raise ValueError(f"rows {nrow} must divide over {nshard} shards "
                         f"(pad with zero-weight rows)")

    plan = make_plan(uvw, freq, nx, ny, cell, cell, epsilon, do_wstacking,
                     use_tiles=False)
    plan, use_tiles, tile_arrays = _shard_tile_plans(
        uvw, freq, plan, nx, ny, cell, nshard, use_tiles
    )

    def local(uvw_s, img, wgt_s, arrs_s):
        if arrs_s is not None:
            arrs_s = {k: a[0] for k, a in arrs_s.items()}
        return degrid_ri(uvw_s, freq, img, wgt_s, cell, cell, epsilon,
                         do_wstacking, plan=plan, use_tiles=use_tiles,
                         tile_arrays=arrs_s)

    nchan = freq.shape[0]
    wgt_arr = (jnp.ones((nrow, nchan), image.dtype) if wgt is None
               else jnp.asarray(wgt))

    if tile_arrays is None:
        arr_spec = None
        tile_in = None
    else:
        arr_spec = {k: P("row") for k in tile_arrays}
        tile_in = {k: jnp.asarray(a) for k, a in tile_arrays.items()}

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("row"), P(), P("row"), arr_spec),
        out_specs=Cplx(P("row"), P("row")),
        check_vma=False,
    )
    return fn(jnp.asarray(uvw), image, wgt_arr, tile_in)


def sharded_residual(mesh, uvw, freq, vis, image, cell, epsilon=1e-4,
                     do_wstacking=False, wgt=None, use_tiles=None):
    """Residual dirty image with rows sharded over "row".

    dirty(vis − degrid(image)) — the sharded composition of
    :func:`sharded_degrid` (replicated image, local interpolation) and
    :func:`sharded_dirty` (partial grids psum-reduced), mirroring the
    reference's ``residual`` (gridding/wgridder/im2residim.py:87).
    """
    image = jnp.asarray(image)
    nx, ny = image.shape
    v = cplx(vis)
    model = sharded_degrid(mesh, uvw, freq, image, cell=cell, epsilon=epsilon,
                           do_wstacking=do_wstacking, use_tiles=use_tiles)
    resid = Cplx(v.re - model.re, v.im - model.im)
    return sharded_dirty(mesh, uvw, freq, resid, nx, ny, cell,
                         epsilon=epsilon, do_wstacking=do_wstacking,
                         wgt=wgt, use_tiles=use_tiles)


_PP_TILE_POLICIES = (
    "conv_1d_axisymmetric_unpacked_scatter",
    "conv_1d_axisymmetric_packed_scatter",
    "conv_1d_axisymmetric_unpacked_gather",
    "conv_1d_axisymmetric_packed_gather",
)


def _pp_shard_plans(uvw, wavelengths, chanmap, npix, cell, image_centre,
                    phase_centre, W, OS, baseline_transform_policy,
                    convolution_policy, nshard, direction, use_tiles):
    """Per-shard table-mode tile plans packed to one SPMD-friendly set
    (None, None when tiles are off or any shard declines)."""
    from africanus_tpu.gridding.perleypolyhedron.gridder import pp_tile_plan
    from africanus_tpu.ops.pallas_grid import pack_shard_plans

    if use_tiles is None:
        use_tiles = jax.default_backend() == "tpu"
    if not use_tiles or convolution_policy not in _PP_TILE_POLICIES:
        return None, None

    # callers check divisibility before shard_map; keep the invariant
    # local so a future caller can't silently drop tail rows
    if uvw.shape[0] % nshard:
        raise ValueError(
            f"rows {uvw.shape[0]} must divide over {nshard} shards")
    rows_per = uvw.shape[0] // nshard
    plans = [
        pp_tile_plan(uvw[s * rows_per:(s + 1) * rows_per], wavelengths,
                     chanmap, npix, cell, image_centre, phase_centre,
                     W, OS, baseline_transform_policy,
                     direction=direction, force=True)
        for s in range(nshard)
    ]
    if not all(p is not None for p in plans):
        return None, None
    return pack_shard_plans(plans)


def _pp_tile_shard_args(tile_arrays):
    """(in_spec, device dict) for packed per-shard tile arrays, plus the
    per-shard leading-axis unwrap used inside shard_map bodies. Shared by
    :func:`sharded_pp_gridder` / :func:`sharded_pp_degridder`."""
    if tile_arrays is None:
        return None, None
    arr_spec = {k: P("row") for k in tile_arrays}
    tile_in = {k: jnp.asarray(a) for k, a in tile_arrays.items()}
    return arr_spec, tile_in


def _pp_unwrap_shard(arrs_s):
    """Strip the size-1 shard axis pack_shard_plans stacked on."""
    if arrs_s is None:
        return None
    return {k: a[0] for k, a in arrs_s.items()}


def sharded_pp_gridder(mesh, uvw, vis, wavelengths, chanmap, npix, cell,
                       image_centre, phase_centre, kernel, W, OS,
                       baseline_transform_policy, phase_transform_policy,
                       stokes_conversion_policy, convolution_policy,
                       use_tiles=None):
    """Perley-polyhedron faceting gridder with rows sharded over "row".

    Each device grids its row shard and partial grids are psum-reduced —
    the TPU analogue of the reference's dask blockwise grid + sum
    (gridding/perleypolyhedron/dask.py:43-90). With ``use_tiles``
    (auto-on for TPU) each shard gets its own table-mode Pallas tile
    plan; the packed per-shard entry arrays travel through shard_map as
    row-sharded inputs so one SPMD trace serves every shard
    (ops.pallas_grid.pack_shard_plans, table-mode format).
    """
    from africanus_tpu.gridding.perleypolyhedron import gridder

    uvw = np.asarray(uvw)
    nrow = uvw.shape[0]
    nshard = mesh.shape["row"]
    if nrow % nshard:
        raise ValueError(f"rows {nrow} must divide over {nshard} shards "
                         f"(pad with zero visibilities)")
    v = cplx(vis)

    plan_static, tile_arrays = _pp_shard_plans(
        uvw, wavelengths, chanmap, npix, cell, image_centre, phase_centre,
        W, OS, baseline_transform_policy, convolution_policy, nshard,
        "grid", use_tiles,
    )

    def local(uvw_s, v_s, arrs_s):
        g = gridder(uvw_s, v_s, wavelengths, chanmap, npix, cell,
                    image_centre, phase_centre, kernel, W, OS,
                    baseline_transform_policy, phase_transform_policy,
                    stokes_conversion_policy, convolution_policy,
                    tile_plan=plan_static,
                    tile_arrays=_pp_unwrap_shard(arrs_s))
        return Cplx(jax.lax.psum(g.re, "row"), jax.lax.psum(g.im, "row"))

    arr_spec, tile_in = _pp_tile_shard_args(tile_arrays)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("row"), Cplx(P("row"), P("row")), arr_spec),
        out_specs=Cplx(P(), P()),
        # the dict-of-tile-arrays inputs break VMA inference; keep the
        # validation on for the scatter fallback path (advisor r03)
        check_vma=tile_arrays is None,
    )
    return fn(jnp.asarray(uvw), v, tile_in)


def sharded_pp_degridder(mesh, uvw, grid, wavelengths, chanmap, cell,
                         image_centre, phase_centre, kernel, W, OS,
                         baseline_transform_policy, phase_transform_policy,
                         stokes_conversion_policy, convolution_policy,
                         use_tiles=None):
    """Perley-polyhedron faceting degridder with rows sharded over "row"
    (grid replicated; outputs row-sharded like the inputs — reference
    dask layer's degridder blockwise, perleypolyhedron/dask.py:93-141).
    With ``use_tiles`` (auto-on for TPU) each shard gathers through its
    own packed table-mode Pallas tile plan (pack_shard_plans)."""
    from africanus_tpu.gridding.perleypolyhedron import degridder

    uvw = np.asarray(uvw)
    nrow = uvw.shape[0]
    nshard = mesh.shape["row"]
    if nrow % nshard:
        raise ValueError(f"rows {nrow} must divide over {nshard} shards")
    g = cplx(grid)
    npix = g.shape[-1]

    plan_static, tile_arrays = _pp_shard_plans(
        uvw, wavelengths, chanmap, npix, cell, image_centre, phase_centre,
        W, OS, baseline_transform_policy, convolution_policy, nshard,
        "degrid", use_tiles,
    )

    def local(uvw_s, g_rep, arrs_s):
        return degridder(uvw_s, g_rep, wavelengths, chanmap, cell,
                         image_centre, phase_centre, kernel, W, OS,
                         baseline_transform_policy, phase_transform_policy,
                         stokes_conversion_policy, convolution_policy,
                         tile_plan=plan_static,
                         tile_arrays=_pp_unwrap_shard(arrs_s))

    arr_spec, tile_in = _pp_tile_shard_args(tile_arrays)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("row"), Cplx(P(), P()), arr_spec),
        out_specs=Cplx(P("row"), P("row")),
        # see sharded_pp_gridder: validate VMA on the fallback path
        check_vma=tile_arrays is None,
    )
    return fn(jnp.asarray(uvw), g, tile_in)
