"""Host-streamed chunked execution over the row dimension.

The reference scales past memory limits with dask: ``da.blockwise`` over
row chunks plus reduction layers (rime/dask_predict.py LinearReduction,
nifty GridStreamReduction). On TPU the equivalent out-of-core pattern is
host-side streaming: slice row chunks on the host, run ONE jitted
function per chunk (every chunk padded to the same shape so there is a
single compile), and either concatenate per-chunk outputs on the host or
accumulate a reduction on the device. In-memory multi-device scaling is
``shard_map`` (see parallel/mesh.py); this module is for datasets larger
than device memory.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["stream_rows"]


def stream_rows(fn, arrays, chunk=65536, combine="concat", row_axes=None):
    """Apply ``fn`` over row chunks of ``arrays``.

    Parameters
    ----------
    fn : callable(chunk_tree, valid) -> pytree
        Jitted once and reused for every chunk. ``valid`` is a (chunk,)
        bool mask marking real rows (False on the zero-padded tail of the
        last chunk); reductions must zero masked rows' contributions.
    arrays : pytree of arrays sharing a leading row dimension.
    chunk : rows per chunk (every chunk is padded to exactly this).
    combine : "concat" — stitch per-chunk outputs (leading dim = chunk)
        back to full rows on the host; "sum" — accumulate ``fn`` outputs
        on the device.
    row_axes : for "concat", optional pytree (matching fn's output) of
        leading-axis flags; True (default) trims the padded tail.

    Returns
    -------
    Combined pytree: host numpy for "concat", device arrays for "sum".
    """
    leaves = jax.tree_util.tree_leaves(arrays)
    if not leaves:
        raise ValueError("arrays must contain at least one array")
    nrow = np.asarray(leaves[0]).shape[0]
    for leaf in leaves[1:]:
        if np.asarray(leaf).shape[0] != nrow:
            raise ValueError("all arrays must share the leading row dim")
    if combine not in ("concat", "sum"):
        raise ValueError(f"unknown combine {combine!r}")

    jfn = jax.jit(fn)
    out = None
    pieces = []

    # one host conversion up front: converting inside the per-chunk
    # closure re-fetched the FULL array once per chunk per leaf (a whole
    # HTTP round trip each on the axon backend)
    arrays = jax.tree_util.tree_map(np.asarray, arrays)

    for start in range(0, max(nrow, 1), chunk):
        stop = min(start + chunk, nrow)
        n = stop - start

        def slice_pad(x):
            part = x[start:stop]
            if n < chunk:
                pad = [(0, chunk - n)] + [(0, 0)] * (x.ndim - 1)
                part = np.pad(part, pad)
            return jnp.asarray(part)

        chunk_tree = jax.tree_util.tree_map(slice_pad, arrays)
        valid = jnp.arange(chunk) < n
        result = jfn(chunk_tree, valid)

        if combine == "sum":
            out = result if out is None else jax.tree_util.tree_map(
                jnp.add, out, result
            )
        else:
            pieces.append(
                (n, jax.tree_util.tree_map(np.asarray, result))
            )

    if combine == "sum":
        return out

    first = pieces[0][1]
    if row_axes is None:
        row_axes = jax.tree_util.tree_map(lambda _: True, first)

    def stitch(is_row, *parts):
        if is_row:
            return np.concatenate(
                [p[:n] for (n, _), p in zip(pieces, parts)], axis=0
            )
        return parts[0]

    return jax.tree_util.tree_map(
        stitch, row_axes, *[p for _, p in pieces]
    )
