"""nifty-gridder API compatibility layer.

The reference wraps the external C++ ``nifty_gridder`` in a dask-only
module (``africanus/gridding/nifty/dask.py``: grid_config:65, grid:270,
dirty:411, model:454, degrid:495) with custom serialized GridStreamReduction
graph layers. The same capability class is provided here on top of the
TPU-native w-stacking core (gridding/wgridder/core.py) — the stream/serial
grid accumulation that bounds dask worker memory is unnecessary under XLA
(one fused scatter); multi-device scaling is a `shard_map` + psum of
partial grids instead (see africanus_tpu.parallel).

Per-correlation visibilities are gridded onto per-correlation uv grids of
shape (nu, nv, ncorr); ``dirty``/``model`` convert between grids and images
with the kernel-taper corrections handled internally.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from africanus_tpu.constants import ARCSEC2RAD
from africanus_tpu.ops.cplx import Cplx, cplx

__all__ = ["GridderConfigWrapper", "grid_config", "grid", "degrid", "dirty",
           "model"]


class GridderConfigWrapper:
    """Gridding configuration holder for the nifty-style API
    (reference ``gridding/nifty/dask.py:35``): image size (nx, ny),
    requested accuracy ``eps`` and cell sizes in arcseconds. Plain
    picklable data — safe to embed in serialised task graphs."""

    def __init__(self, nx=1024, ny=1024, eps=2e-13, cell_size_x=2.0,
                 cell_size_y=2.0):
        self.nx = nx
        self.ny = ny
        self.csx = cell_size_x
        self.csy = cell_size_y
        self.eps = eps

    @property
    def object(self):
        return self

    def __reduce__(self):
        return (
            GridderConfigWrapper,
            (self.nx, self.ny, self.eps, self.csx, self.csy),
        )


def grid_config(nx=1024, ny=1024, eps=2e-13, cell_size_x=2.0, cell_size_y=2.0):
    """Create a :class:`GridderConfigWrapper` (reference
    ``gridding/nifty/dask.py:65``).

    Parameters
    ----------
    nx, ny : int image pixels
    eps : float requested gridding accuracy (clamped to >= 1e-9, the
        ES-kernel floor of this implementation)
    cell_size_x, cell_size_y : float cell size in ARCSECONDS
    """
    return GridderConfigWrapper(nx, ny, eps, cell_size_x, cell_size_y)


def _epsilon(gc):
    # our ES kernels bottom out around 1e-9 accuracy; clamp tighter requests
    return max(float(gc.eps), 1e-9)



def _w_window(uvw, wmin, wmax):
    """Row mask for the reference's getIndices w-range selection
    (nifty/dask.py wmin/wmax): rows whose |w| falls outside
    [wmin, wmax) contribute nothing. Defaults (±1e30) select all."""
    if wmin <= -1e30 and wmax >= 1e30:
        return jnp.ones(jnp.asarray(uvw).shape[0], bool)
    w = jnp.abs(jnp.asarray(uvw)[:, 2])
    return (w >= wmin) & (w < wmax)


def grid(vis, uvw, flags, weights, frequencies, grid_config, wmin=-1e30,
         wmax=1e30, streams=None):
    """Grid (row, chan, corr) visibilities → (nu, nv, ncorr) grids.

    ``streams`` (the reference's memory-bounding serial chains) is accepted
    and ignored: a single fused scatter has no per-stream intermediates.
    """
    gc = grid_config
    v = cplx(vis)
    nrow, nchan, ncorr = v.shape
    flags = jnp.asarray(flags)
    weights = None if weights is None else jnp.asarray(weights)

    from africanus_tpu.gridding.wgridder.core import _plan

    cellx = gc.csx * ARCSEC2RAD
    celly = gc.csy * ARCSEC2RAD
    plan = _plan(np.asarray(uvw), np.asarray(frequencies), gc.nx, gc.ny,
                 cellx, celly, _epsilon(gc), False)
    nu, nv = plan["nu"], plan["nv"]

    # unflagged & weighted per (row, chan, corr), flattened to samples
    keep = (~(flags != 0)).astype(v.re.dtype)
    wgt = keep if weights is None else keep * weights
    wgt = wgt * _w_window(uvw, wmin, wmax).astype(wgt.dtype)[:, None, None]

    tile_plan = _nifty_tile_plan(uvw, frequencies, plan, gc, cellx, celly)

    if tile_plan is not None:
        from africanus_tpu.ops.pallas_grid import (
            assemble_tiles, grid_tiles_mxu, grid_tiles_pallas,
            tiles_use_mxu,
        )
        import jax

        # all correlations in one kernel pass (shared ES windows)
        val_re = jnp.stack(
            [(v.re[..., c] * wgt[..., c]).reshape(-1) for c in range(ncorr)]
        )
        val_im = jnp.stack(
            [(v.im[..., c] * wgt[..., c]).reshape(-1) for c in range(ncorr)]
        )
        g_fn = (grid_tiles_mxu if tiles_use_mxu(tile_plan)
                else grid_tiles_pallas)
        t_re, t_im = g_fn(
            tile_plan, val_re, val_im,
            interpret=jax.default_backend() != "tpu",
        )
        gre, gim = assemble_tiles(t_re, t_im, tile_plan)
        # (ncorr, 1, nu, nv) → (nu, nv, ncorr)
        return Cplx(jnp.moveaxis(gre[:, 0], 0, -1),
                    jnp.moveaxis(gim[:, 0], 0, -1))

    grids_re, grids_im = [], []
    idx, wj = _flat_spread(uvw, frequencies, plan, gc, cellx, celly)
    for c in range(ncorr):
        val_re = (v.re[..., c] * wgt[..., c]).reshape(-1)
        val_im = (v.im[..., c] * wgt[..., c]).reshape(-1)
        acc_t = jnp.result_type(v.re.dtype, wj.dtype)
        gre = jnp.zeros(nu * nv, acc_t).at[idx.reshape(-1)].add(
            (val_re[None, :] * wj).reshape(-1)
        ).reshape(nu, nv).astype(v.re.dtype)
        gim = jnp.zeros(nu * nv, acc_t).at[idx.reshape(-1)].add(
            (val_im[None, :] * wj).reshape(-1)
        ).reshape(nu, nv).astype(v.re.dtype)
        grids_re.append(gre)
        grids_im.append(gim)

    return Cplx(jnp.stack(grids_re, axis=-1), jnp.stack(grids_im, axis=-1))


def _nifty_tile_plan(uvw, frequencies, plan, gc, cellx, celly):
    """Pallas tile plan for the 2D (no w-stacking) nifty paths; None when
    tiles are off (non-TPU) or unsupported geometry."""
    from africanus_tpu.gridding.wgridder.core import (
        _tile_plan, _use_tiles_default,
    )

    if not _use_tiles_default():
        return None
    return _tile_plan(np.asarray(uvw), np.asarray(frequencies), plan,
                      gc.nx, gc.ny, cellx, celly)


def _flat_spread(uvw, frequencies, plan, gc, cellx, celly):
    """(W·W, N) flat scatter/gather indices + weights (trailing small dims
    would be lane-padded 30x on TPU)."""
    from africanus_tpu.gridding.wgridder.core import (
        _spread_indices_weights, _wavelength_coords,
    )

    nu, nv, support = plan["nu"], plan["nv"], plan["support"]
    u_np, v_np, w_np = _wavelength_coords(np.asarray(uvw),
                                          np.asarray(frequencies))
    iu0, iv0, _, ku, kv, _ = _spread_indices_weights(
        jnp.asarray(u_np), jnp.asarray(v_np), jnp.asarray(w_np), plan,
        gc.nx, gc.ny, cellx, celly, plan["beta"],
    )
    offs = jnp.arange(support)
    iu_all = jnp.mod(iu0[None, :] + offs[:, None], nu)  # (W, N)
    iv_all = jnp.mod(iv0[None, :] + offs[:, None], nv)
    idx = (
        iu_all[:, None, :] * nv + iv_all[None, :, :]
    ).reshape(support * support, -1)
    wj = (ku.T[:, None, :] * kv.T[None, :, :]).reshape(support * support, -1)
    return idx, wj


def dirty(grid, grid_config):
    """Gridded visibilities (nu, nv, ncorr) → dirty image (nx, ny, ncorr)."""
    gc = grid_config
    g = cplx(grid)
    from africanus_tpu.ops.fft import cifft2
    from africanus_tpu.gridding.wgridder.core import _kernel_params, kernel_taper

    support, beta = _kernel_params(_epsilon(gc))
    nu, nv, ncorr = g.shape
    nx, ny = gc.nx, gc.ny

    re, im = cifft2(
        jnp.moveaxis(g.re, -1, 0), jnp.moveaxis(g.im, -1, 0), axes=(1, 2)
    )
    re = jnp.fft.fftshift(re, axes=(1, 2)) * (nu * nv)
    cu, cv = (nu - nx) // 2, (nv - ny) // 2
    re = re[:, cu : cu + nx, cv : cv + ny]

    cx = kernel_taper((np.arange(nx) - nx / 2) / nu, support, beta)
    cy = kernel_taper((np.arange(ny) - ny / 2) / nv, support, beta)
    taper = jnp.asarray(np.outer(cx, cy))
    return jnp.moveaxis(re / taper, 0, -1)


def model(image, grid_config):
    """Image (nx, ny, ncorr) → uv grids (nu, nv, ncorr) (adjoint of dirty)."""
    gc = grid_config
    image = jnp.asarray(image)
    from africanus_tpu.ops.fft import cfft2
    from africanus_tpu.gridding.wgridder.core import _kernel_params, kernel_taper

    support, beta = _kernel_params(_epsilon(gc))
    nx, ny, ncorr = image.shape
    nu, nv = 2 * nx, 2 * ny

    cx = kernel_taper((np.arange(nx) - nx / 2) / nu, support, beta)
    cy = kernel_taper((np.arange(ny) - ny / 2) / nv, support, beta)
    taper = jnp.asarray(np.outer(cx, cy))

    img = jnp.moveaxis(image, -1, 0) / taper
    cu, cv = (nu - nx) // 2, (nv - ny) // 2
    img = jnp.pad(img, ((0, 0), (cu, nu - nx - cu), (cv, nv - ny - cv)))
    img = jnp.fft.ifftshift(img, axes=(1, 2))
    re, im = cfft2(img, jnp.zeros_like(img), axes=(1, 2))
    return Cplx(jnp.moveaxis(re, 0, -1), jnp.moveaxis(im, 0, -1))


def degrid(grid, uvw, flags, weights, frequencies, grid_config, wmin=-1e30,
           wmax=1e30):
    """Degrid visibilities from oversampled uv grids (reference
    ``gridding/nifty/dask.py:495``).

    Parameters
    ----------
    grid : (nu, nv, ncorr) complex uv grids (from :func:`grid`)
    uvw : (row, 3) float metres
    flags : (row, chan, corr) bool (True excluded)
    weights : (row, chan, corr) float or None
    frequencies : (chan,) float Hz
    grid_config : :class:`GridderConfigWrapper`
    wmin, wmax : float w-range row selection (|w| outside drops rows)

    Returns
    -------
    (row, chan, corr) complex visibilities.
    """
    gc = grid_config
    g = cplx(grid)
    flags = jnp.asarray(flags)

    from africanus_tpu.gridding.wgridder.core import _plan

    cellx = gc.csx * ARCSEC2RAD
    celly = gc.csy * ARCSEC2RAD
    plan = _plan(np.asarray(uvw), np.asarray(frequencies), gc.nx, gc.ny,
                 cellx, celly, _epsilon(gc), False)
    nu, nv = plan["nu"], plan["nv"]

    nrow = np.asarray(uvw).shape[0]
    nchan = np.asarray(frequencies).shape[0]
    nsamp = nrow * nchan
    tile_plan = _nifty_tile_plan(uvw, frequencies, plan, gc, cellx, celly)

    ncorr = g.shape[-1]
    outs_re, outs_im = [], []
    if tile_plan is not None:
        from africanus_tpu.ops.pallas_grid import (
            degrid_tiles_mxu, degrid_tiles_pallas, extract_tiles,
            tiles_use_mxu,
        )
        import jax

        interpret = jax.default_backend() != "tpu"
        # (ncorr, 1, nu, nv) grids: one multi-corr kernel pass
        gre = jnp.moveaxis(g.re, -1, 0)[:, None]
        gim = jnp.moveaxis(g.im, -1, 0)[:, None]
        tre, tim = extract_tiles(gre, gim, tile_plan)
        d_fn = (degrid_tiles_mxu if tiles_use_mxu(tile_plan)
                else degrid_tiles_pallas)
        o_re, o_im = d_fn(tile_plan, tre, tim, nsamp,
                          interpret=interpret)
        outs_re = list(o_re)
        outs_im = list(o_im)
    else:
        idx, wj = _flat_spread(uvw, frequencies, plan, gc, cellx, celly)
        for c in range(ncorr):
            outs_re.append((g.re[..., c].reshape(-1)[idx] * wj).sum(axis=0))
            outs_im.append((g.im[..., c].reshape(-1)[idx] * wj).sum(axis=0))
    re = jnp.stack(outs_re, axis=-1).reshape(nrow, nchan, ncorr)
    im = jnp.stack(outs_im, axis=-1).reshape(nrow, nchan, ncorr)

    # reference parity: degrid weights are "Currently unsupported and
    # ignored" (nifty/dask.py:509) — only flags (and the w window) mask
    keep = (~(flags != 0)).astype(re.dtype)
    keep = keep * _w_window(uvw, wmin, wmax).astype(re.dtype)[:, None, None]
    return Cplx(re * keep, im * keep)
