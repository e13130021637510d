"""Transform source lm coordinates into beam-cube sampling coordinates.

TPU-native equivalent of reference ``africanus/rime/transform.py:47``
(_nb_transform_sources:14): rotate lm by parallactic angle, add pointing
errors, scale per antenna/channel, and attach frequency as the cube's third
coordinate. One broadcast expression replacing the t/a/s/c quadruple loop.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["transform_sources"]


def transform_sources(
    lm, parallactic_angles, pointing_errors, antenna_scaling, frequency, dtype=None
):
    """Create beam sampling coordinates for :func:`beam_cube_dde`.

    Parameters
    ----------
    lm : (src, 2) array, radians
    parallactic_angles : (time, ant) array, radians
    pointing_errors : (time, ant, 2) array, radians
    antenna_scaling : (ant, chan) array
    frequency : (chan,) array
    dtype : optional output dtype (defaults to float64 semantics of the
        reference — under x64-disabled JAX this degrades to float32)

    Returns
    -------
    (3, src, time, ant, chan) array of (l, m, frequency) coordinates.

    Notes
    -----
    Bit-for-bit parity with the reference numba kernel, *including* its
    sequential update quirk (transform.py:31-33): the rotated ``m`` uses the
    already-rotated ``l``, i.e. ``l' = l·cos − m·sin; m' = l'·sin + m·cos``.
    """
    lm = jnp.asarray(lm)
    pa = jnp.asarray(parallactic_angles)
    pe = jnp.asarray(pointing_errors)
    scale = jnp.asarray(antenna_scaling)
    frequency = jnp.asarray(frequency)

    ntime, na = pa.shape
    nsrc = lm.shape[0]
    if pe.shape != (ntime, na, 2):
        raise ValueError(f"pointing_errors shape {pe.shape} != {(ntime, na, 2)}")
    nchan = scale.shape[1]
    if frequency.shape[0] != nchan:
        raise ValueError("antenna_scaling and frequency channel counts differ")

    dtype = jnp.dtype(np.float64 if dtype is None else dtype)

    l = lm[:, 0][:, None, None].astype(dtype)  # noqa: E741  (src,1,1)
    m = lm[:, 1][:, None, None].astype(dtype)
    cos_pa = jnp.cos(pa)[None, :, :].astype(dtype)  # (1,time,ant)
    sin_pa = jnp.sin(pa)[None, :, :].astype(dtype)

    # Reference parity: m' uses the already-rotated l'
    l_rot = l * cos_pa - m * sin_pa  # (src, time, ant)
    m_rot = l_rot * sin_pa + m * cos_pa

    l_pt = l_rot + pe[None, :, :, 0].astype(dtype)
    m_pt = m_rot + pe[None, :, :, 1].astype(dtype)

    sc = scale[None, None, :, :].astype(dtype)  # (1,1,ant,chan)
    l_out = l_pt[..., None] * sc
    m_out = m_pt[..., None] * sc
    f_out = jnp.broadcast_to(
        frequency.astype(dtype), (nsrc, ntime, na, nchan)
    )

    return jnp.stack([l_out, m_out, f_out], axis=0)
