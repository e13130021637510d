"""Gaussian-process utilities (reference ``africanus/gps/utils.py:7``)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["abs_diff"]


def abs_diff(x, xp):
    """Pairwise distance matrix |x_i − xp_j| between D-dimensional inputs.

    Parameters
    ----------
    x : (N, D) or (N,) array
    xp : (Np, D) or (Np,) array

    Returns
    -------
    (N, Np) array of Euclidean distances.
    """
    x = jnp.asarray(x)
    xp = jnp.asarray(xp)
    if x.ndim == 1:
        x = x[:, None]
    if xp.ndim == 1:
        xp = xp[:, None]
    diff = x[:, None, :] - xp[None, :, :]
    return jnp.linalg.norm(diff, axis=-1)
