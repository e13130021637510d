"""Gaussian source uv-plane envelope.

TPU-native equivalent of reference
``africanus/model/shape/gaussian_shape.py:12-66``: per-(source, row, chan)
Gaussian visibility taper from (emajor, eminor, position-angle) shape
parameters, computed as one fused broadcast expression on the VPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from africanus_tpu.constants import c as lightspeed

__all__ = ["gaussian"]

# FWHM of a unit-σ gaussian; envelope scale = sqrt(2)·π / (fwhm·c)
_FWHM = 2.0 * np.sqrt(2.0 * np.log(2.0))
_GAUSS_SCALE = np.sqrt(2.0) * np.pi / (_FWHM * lightspeed)


def gaussian(uvw, frequency, shape_params):
    """Evaluate the Gaussian shape function.

    Parameters
    ----------
    uvw : (row, 3) array
    frequency : (chan,) array
    shape_params : (source, 3) array of (emajor, eminor, angle)

    Returns
    -------
    (source, row, chan) real array.
    """
    uvw = jnp.asarray(uvw)
    frequency = jnp.asarray(frequency)
    shape_params = jnp.asarray(shape_params)

    dtype = np.result_type(uvw.dtype, frequency.dtype, shape_params.dtype)

    emaj = shape_params[:, 0]
    emin = shape_params[:, 1]
    angle = shape_params[:, 2]

    # Major-axis l/m projections and axis ratio
    el = emaj * jnp.sin(angle)
    em = emaj * jnp.cos(angle)
    er = emin / jnp.where(emaj == 0.0, 1.0, emaj)

    u = uvw[:, 0]
    v = uvw[:, 1]

    # (source, row) rotated/scaled uv
    u1 = (u[None, :] * em[:, None] - v[None, :] * el[:, None]) * er[:, None]
    v1 = u[None, :] * el[:, None] + v[None, :] * em[:, None]

    scaled_freq = (frequency * _GAUSS_SCALE).astype(dtype)

    fu1 = u1[:, :, None] * scaled_freq
    fv1 = v1[:, :, None] * scaled_freq

    return jnp.exp(-(fu1 * fu1 + fv1 * fv1)).astype(dtype)
