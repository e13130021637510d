"""Spherical coordinate transforms between (ra, dec) and direction cosines.

TPU-native, fully-vectorised equivalents of the reference numba kernels in
``africanus/coordinates/coordinates.py`` (radec_to_lmn:29, radec_to_lm:76,
lmn_to_radec, lm_to_radec). Instead of per-source loops we compute the whole
batch as fused elementwise jnp ops, which XLA maps onto the VPU; every
function is jit- and vmap-compatible and sharding-transparent.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["radec_to_lmn", "radec_to_lm", "lmn_to_radec", "lm_to_radec",
           "n_minus_one"]


def n_minus_one(l, m):  # noqa: E741
    """n − 1 = sqrt(1−l²−m²) − 1 without catastrophic cancellation.

    The naive form rounds the sqrt at ~1 (absolute error ~eps), and a
    long w baseline amplifies that to ~1e-2 rad of f32 phase; the
    equivalent quotient −(l²+m²)/(1+sqrt(1−l²−m²)) keeps the *relative*
    error of n−1 at ~eps. Directions beyond the horizon (l²+m² > 1)
    clamp to n = 0 (n−1 = −1), matching the clamped sqrt form.
    """
    s = l * l + m * m
    stable = -s / (1.0 + jnp.sqrt(jnp.maximum(1.0 - s, 0.0)))
    return jnp.where(s > 1.0, -1.0, stable)


def _phase_centre_trig(phase_centre, dtype):
    if phase_centre is None:
        pc_ra = jnp.zeros((), dtype)
        pc_dec = jnp.zeros((), dtype)
    else:
        phase_centre = jnp.asarray(phase_centre)
        pc_ra = phase_centre[..., 0]
        pc_dec = phase_centre[..., 1]
    return pc_ra, jnp.sin(pc_dec), jnp.cos(pc_dec)


def radec_to_lmn(radec, phase_centre=None):
    """Convert (ra, dec) [rad] to direction cosines (l, m, n) relative to
    ``phase_centre``.

    Parameters
    ----------
    radec : (..., source, 2) array, radians
    phase_centre : (2,) array or None (defaults to (0, 0))

    Returns
    -------
    (..., source, 3) array of (l, m, n); n = sqrt(1 - l^2 - m^2).
    """
    radec = jnp.asarray(radec)
    pc_ra, sin_pc_dec, cos_pc_dec = _phase_centre_trig(phase_centre, radec.dtype)

    ra_delta = radec[..., 0] - pc_ra
    sin_dec = jnp.sin(radec[..., 1])
    cos_dec = jnp.cos(radec[..., 1])

    l = cos_dec * jnp.sin(ra_delta)  # noqa: E741
    m = sin_dec * cos_pc_dec - cos_dec * sin_pc_dec * jnp.cos(ra_delta)
    n = jnp.sqrt(jnp.maximum(1.0 - l * l - m * m, 0.0))

    return jnp.stack([l, m, n], axis=-1)


def radec_to_lm(radec, phase_centre=None):
    """Project (ra, dec) to direction cosines (l, m) relative to a
    phase centre (SIN projection; reference ``coordinates.py:76``).

    Parameters
    ----------
    radec : (..., 2) float radians
    phase_centre : (2,) float radians or None (defaults to (0, 0))

    Returns
    -------
    (..., 2) float (l, m).
    """
    return radec_to_lmn(radec, phase_centre)[..., :2]


def lmn_to_radec(lmn, phase_centre=None):
    """Convert direction cosines (l, m, n) back to (ra, dec) [rad]."""
    lmn = jnp.asarray(lmn)
    pc_ra, sin_pc_dec, cos_pc_dec = _phase_centre_trig(phase_centre, lmn.dtype)

    l, m, n = lmn[..., 0], lmn[..., 1], lmn[..., 2]  # noqa: E741
    dec = jnp.arcsin(m * cos_pc_dec + n * sin_pc_dec)
    ra = pc_ra + jnp.arctan(l / (n * cos_pc_dec - m * sin_pc_dec))

    return jnp.stack([ra, dec], axis=-1)


def lm_to_radec(lm, phase_centre=None):
    """Convert (l, m) back to (ra, dec) [rad]; n derived as sqrt(1-l²-m²)."""
    lm = jnp.asarray(lm)
    l, m = lm[..., 0], lm[..., 1]  # noqa: E741
    n = jnp.sqrt(jnp.maximum(1.0 - l * l - m * m, 0.0))
    return lmn_to_radec(jnp.stack([l, m, n], axis=-1), phase_centre)
