"""Device mesh construction and sharding helpers.

This layer replaces the reference's dask chunking orchestration (every
``<pkg>/dask.py``; see SURVEY.md §2.11): instead of `da.blockwise` chunk
contracts, arrays carry `NamedSharding`s over a `jax.sharding.Mesh` and the
kernels are sharding-transparent jnp code — XLA inserts the collectives.

Axis conventions for radio-interferometry workloads:
- ``"row"``  — baselines×time rows: the data-parallel axis. Embarrassingly
  parallel for predict (the source dim is contracted locally).
- ``"chan"`` — frequency channels: also embarrassingly parallel for
  predict/averaging; the natural second axis for 2D meshes.
- Antenna-indexed arrays (gains, DDE Jones) are *replicated* — the TPU
  analogue of the reference's "antenna dimension must not be chunked"
  contract (rime/dask_predict.py:478-489).
- Source-dimension reductions under row sharding stay local; image-space
  reductions (vis_to_im, gridding) need a ``psum`` over "row".
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "make_mesh",
    "row_sharding",
    "replicated",
    "shard_rows",
    "pad_rows",
]


def make_mesh(mesh_shape=None, axis_names=("row", "chan"), devices=None,
              strict=True):
    """Build a Mesh over the available devices.

    Parameters
    ----------
    mesh_shape : optional tuple — defaults to all devices on the first axis.
    axis_names : mesh axis names (default ("row", "chan")).
    devices : optional explicit device list.
    strict : if True (the default), raise when ``mesh_shape`` needs more
        devices than are available — sharded pipelines should not
        silently run under-parallelised. ``strict=False`` (for smoke
        tests / dryruns) degrades to the largest factorisation that
        fits, preserving the requested per-axis proportions as closely
        as possible, with a warning.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    mesh_shape = tuple(int(s) for s in mesh_shape)
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        if strict:
            raise ValueError(
                f"mesh {mesh_shape} needs {n} devices, have {len(devices)}"
            )
        mesh_shape = _best_fitting_shape(mesh_shape, len(devices))
        n = int(np.prod(mesh_shape))
        warnings.warn(
            f"requested mesh needs more devices than the {len(devices)} "
            f"available; degraded to {mesh_shape}",
            stacklevel=2,
        )
    dev_array = np.array(devices[:n]).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def _best_fitting_shape(requested, ndev):
    """Largest-product mesh shape fitting ``ndev`` devices, closest in
    log-space to the requested per-axis proportions (e.g. (2, 4) on 4
    devices becomes (2, 2), not (2, 1))."""
    naxes = len(requested)

    best = None

    def rec(axis, shape, remaining):
        nonlocal best
        if axis == naxes:
            cand = tuple(shape)
            size = int(np.prod(cand))
            skew = sum(
                (np.log(c) - np.log(r)) ** 2
                for c, r in zip(cand, requested)
            )
            # ties in size/skew prefer larger leading axes (row-major)
            key = (size, -skew, cand)
            if best is None or key > best[0]:
                best = (key, cand)
            return
        d = 1
        while d <= remaining and d <= requested[axis]:
            shape.append(d)
            rec(axis + 1, shape, remaining // d)
            shape.pop()
            d += 1
        return

    rec(0, [], ndev)
    return best[1]


def row_sharding(mesh, ndim, row_axis=0, chan_axis=None):
    """NamedSharding placing ``row_axis`` on the mesh "row" axis (and
    optionally ``chan_axis`` on "chan"), all other dims replicated."""
    spec = [None] * ndim
    spec[row_axis] = "row"
    if chan_axis is not None and "chan" in mesh.axis_names:
        spec[chan_axis] = "chan"
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated(mesh):
    """Fully-replicated NamedSharding over ``mesh``.

    The reference requires antenna-indexed arrays to be unchunked
    (``rime/dask_predict.py:478-489``); the mesh analogue is full
    replication, so gather-by-antenna stays local to every device.
    """
    return NamedSharding(mesh, PartitionSpec())


def pad_rows(n_rows, n_shards):
    """Number of zero rows to append so ``n_rows`` divides evenly over
    ``n_shards`` (shard_map needs equal shards; padded rows carry zero
    visibilities/weights so reductions are unaffected).

    Returns
    -------
    int in [0, n_shards).
    """
    return (-n_rows) % n_shards


def shard_rows(mesh, *arrays, row_axis=0):
    """device_put each array with its row axis sharded over the mesh."""
    return tuple(
        jax.device_put(a, row_sharding(mesh, np.ndim(a), row_axis))
        for a in arrays
    )
