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
from jax.experimental.shard_map import shard_map

from africanus_tpu.ops.cplx import Cplx

__all__ = ["sharded_dirty", "sharded_psf"]


def sharded_dirty(mesh, uvw, freq, vis, nx, ny, cell, epsilon=1e-4,
                  do_wstacking=False, wgt=None):
    """Dirty image with rows sharded over the mesh "row" axis.

    Each device grids its row shard and FFTs locally; partial dirty images
    are psum-reduced — the TPU analogue of the reference's dask
    row-chunked ``dirty`` blockwise + sum (gridding/wgridder/dask.py:159).

    Note: the gridding plan (w-planes, tapers) is built from the *full*
    uvw on the host so every shard shares one grid geometry.
    """
    from africanus_tpu.gridding.wgridder.core import grid_adjoint, make_plan

    uvw = np.asarray(uvw)
    freq = np.asarray(freq)
    nrow = uvw.shape[0]
    nshard = mesh.shape["row"]
    if nrow % nshard:
        raise ValueError(f"rows {nrow} must divide over {nshard} shards "
                         f"(pad with zero-weight rows)")

    v = vis if isinstance(vis, Cplx) else Cplx(jnp.real(jnp.asarray(vis)),
                                               jnp.imag(jnp.asarray(vis)))

    # one shared grid geometry from the full uvw (host metadata).
    # use_tiles=False: the Pallas tile plan is built against the FULL flat
    # visibility vector, while shard_map hands each device only its row
    # shard — a sharded tile path needs per-shard plans (future work), so
    # the multi-device path stays on the fused-scatter spreading step.
    plan = make_plan(uvw, freq, nx, ny, cell, cell, epsilon, do_wstacking,
                     use_tiles=False)

    def local(uvw_s, v_s, wgt_s):
        d = grid_adjoint(uvw_s, freq, v_s, wgt_s, nx, ny, cell, cell,
                         epsilon, do_wstacking, plan=plan, use_tiles=False)
        return jax.lax.psum(d, "row")

    wgt_arr = jnp.ones(v.re.shape, v.re.dtype) if wgt is None else jnp.asarray(wgt)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("row"), Cplx(P("row"), P("row")), P("row")),
        out_specs=P(),
    )
    return fn(jnp.asarray(uvw), v, wgt_arr)


def sharded_psf(mesh, uvw, freq, nx, ny, cell, epsilon=1e-4,
                do_wstacking=False):
    """Point-spread function (dirty image of unit visibilities), sharded."""
    nrow, nchan = np.asarray(uvw).shape[0], np.asarray(freq).shape[0]
    ones = Cplx(jnp.ones((nrow, nchan), jnp.float32),
                jnp.zeros((nrow, nchan), jnp.float32))
    return sharded_dirty(mesh, uvw, freq, ones, nx, ny, cell, epsilon,
                         do_wstacking)
