"""Feed rotation (L Jones) matrices.

TPU-native equivalent of reference ``africanus/rime/feeds.py:14-76`` and the
CUDA kernel ``rime/cuda/feeds.cu.j2``: 2x2 rotation matrices from
parallactic angles, fully vectorised over any leading shape.

linear:  [[cos pa, sin pa], [-sin pa, cos pa]]
circular: diag(e^{-i pa}, e^{+i pa})
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from africanus_tpu.ops.cplx import Cplx

__all__ = ["feed_rotation", "feed_rotation_ri"]


def feed_rotation_ri(parallactic_angles, feed_type: str = "linear") -> Cplx:
    """Feed rotation matrices from parallactic angles (pair-native).

    Linear feeds give the real rotation [[cos pa, sin pa],
    [-sin pa, cos pa]]; circular feeds the complex phase diag
    (e^{-i pa}, e^{i pa}) — reference ``rime/feeds.py:14``.

    Parameters
    ----------
    parallactic_angles : (...,) float radians (any leading shape,
        typically (time, ant))
    feed_type : {"linear", "circular"}

    Returns
    -------
    Cplx of shape (..., 2, 2) — split re/im feed rotation Jones.
    """
    pa = jnp.asarray(parallactic_angles)
    if not jnp.issubdtype(pa.dtype, jnp.floating):
        raise ValueError(
            f"parallactic_angles has non-floating point type {pa.dtype}"
        )

    c = jnp.cos(pa)
    s = jnp.sin(pa)
    zero = jnp.zeros_like(pa)

    if feed_type == "linear":
        re = jnp.stack(
            [
                jnp.stack([c, s], axis=-1),
                jnp.stack([-s, c], axis=-1),
            ],
            axis=-2,
        )
        im = jnp.zeros(pa.shape + (2, 2), pa.dtype)
    elif feed_type == "circular":
        re = jnp.stack(
            [
                jnp.stack([c, zero], axis=-1),
                jnp.stack([zero, c], axis=-1),
            ],
            axis=-2,
        )
        im = jnp.stack(
            [
                jnp.stack([-s, zero], axis=-1),
                jnp.stack([zero, s], axis=-1),
            ],
            axis=-2,
        )
    else:
        raise ValueError(f"Invalid feed_type '{feed_type}'")

    return Cplx(re, im)


def feed_rotation(parallactic_angles, feed_type: str = "linear"):
    """Complex-dtype feed rotation of shape (..., 2, 2) (reference parity)."""
    out = feed_rotation_ri(parallactic_angles, feed_type)
    return lax.complex(out.re, out.im)
