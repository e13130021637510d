"""The exponential-of-semicircle (ES) gridding kernel — single source.

ψ(z) = exp(β·(√(1−z²) − 1)) for |z| < 1, 0 outside (the strict-interior
cutoff is the window boundary; the in-kernel taps, the host w-plane
taps and the Fourier taper must all share it or the gridder/degridder
adjoint pair silently drifts). One jnp implementation (used inside the
Pallas kernels and any traced host math) and one numpy implementation
(host planning) — previously four inline copies across
ops/pallas_grid.py and gridding/wgridder/core.py.

Reference: the ES kernel family of ducc0's wgridder
(/root/reference/africanus/gridding/wgridder/vis2im.py:4 wraps it).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["es_jnp", "es_np"]


def es_jnp(z, beta):
    """ES kernel on z ∈ (−1, 1), traced/jnp."""
    inside = jnp.abs(z) < 1.0
    zc = jnp.where(inside, z, 0.0)
    return jnp.where(
        inside, jnp.exp(beta * (jnp.sqrt(1.0 - zc * zc) - 1.0)), 0.0
    )


def es_np(z, beta):
    """ES kernel on z ∈ (−1, 1), host numpy."""
    z = np.asarray(z)
    inside = np.abs(z) < 1.0
    zc = np.where(inside, z, 0.0)
    return np.where(
        inside, np.exp(beta * (np.sqrt(1.0 - zc * zc) - 1.0)), 0.0
    )
