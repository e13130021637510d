#!/usr/bin/env python
"""Make a dirty image + PSF with the w-stacking gridder.

TPU-native analogue of the reference's ``africanus/dft/examples/`` dirty
script and the ``gridding/wgridder`` dask ``dirty`` pipeline: synthetic
point sources are DFT-predicted, then imaged through the NUFFT gridder —
on TPU the spreading step runs in the Pallas tile gridder
(ops/pallas_grid.py). Reports the recovered source peaks.

Usage: python examples/make_dirty.py [nx] [nrow]
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from africanus_tpu.constants import c as C  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.gridding.wgridder.core import (
        grid_adjoint, make_plan,
    )
    from africanus_tpu.ops.cplx import Cplx

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nrow = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    ny = nx
    fov_deg = 1.0
    cell = fov_deg * np.pi / 180.0 / nx
    nchan = 4
    freq = 1e9 + np.arange(nchan) * (2e8 / nchan)

    rng = np.random.default_rng(0)
    uvw = (rng.uniform(size=(nrow, 3)) - 0.5) / (cell * freq[-1] / C)
    uvw[:, 2] *= 0.2

    # three point sources (pixel offsets from centre)
    srcs = [(0, 0, 2.0), (nx // 5, -nx // 7, 1.0), (-nx // 3, nx // 4, 0.5)]
    x = np.array([s[0] * cell for s in srcs])
    y = np.array([s[1] * cell for s in srcs])
    amp = np.array([s[2] for s in srcs])

    scale = freq / C
    u = np.multiply.outer(uvw[:, 0], scale)
    v = np.multiply.outer(uvw[:, 1], scale)
    w = np.multiply.outer(uvw[:, 2], scale)
    n = np.sqrt(1.0 - x**2 - y**2)
    # dirty(x,y) = Sum Re[V e^{+2pi i (ux+vy-w(n-1))}], so a source at +x
    # needs vis = e^{-i phi}
    ph = -2.0 * np.pi * (
        u[..., None] * x + v[..., None] * y - w[..., None] * (n - 1.0)
    )
    vis_re = (amp * np.cos(ph)).sum(-1).astype(np.float32)
    vis_im = (amp * np.sin(ph)).sum(-1).astype(np.float32)
    vis = Cplx(jnp.asarray(vis_re), jnp.asarray(vis_im))

    use_tiles = jax.default_backend() == "tpu"
    plan = make_plan(uvw, freq, nx, ny, cell, cell, 1e-5, True,
                     use_tiles=use_tiles)
    fn = jax.jit(
        lambda vv: grid_adjoint(uvw, freq, vv, None, nx, ny, cell, cell,
                                1e-5, True, plan=plan, use_tiles=use_tiles)
    )
    t0 = time.perf_counter()
    dirty = np.asarray(fn(vis))
    dt = time.perf_counter() - t0

    nvis = nrow * nchan
    print(f"device: {jax.devices()[0]} (pallas tiles: {use_tiles})")
    print(f"dirty {dirty.shape} from {nvis} vis in {dt:.2f}s (incl. compile)")
    for (px, py, a) in srcs:
        val = dirty[nx // 2 + px, ny // 2 + py] / nvis
        print(f"  source at ({px:+4d},{py:+4d}): true {a:.2f}, "
              f"recovered {val:.3f}")
    peak = np.unravel_index(np.argmax(dirty), dirty.shape)
    print(f"peak at {peak} (expect ({nx // 2}, {ny // 2}))")


if __name__ == "__main__":
    main()
