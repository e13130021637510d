"""Dtype inference helpers.

TPU-native replacement for the reference's numba typing shims
(``africanus/util/type_inference.py`` infer_complex_dtype).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["complex_dtype_for", "real_dtype_for"]


def complex_dtype_for(*arrays):
    """Smallest complex dtype covering every input's precision.

    float32 inputs -> complex64; any float64 input -> complex128
    (when x64 is enabled).
    """
    dtypes = [jnp.asarray(a).dtype for a in arrays]
    result = np.result_type(np.complex64, *dtypes)
    return jnp.dtype(result)


def real_dtype_for(*arrays):
    """Smallest real floating dtype covering every input's precision
    (complex inputs count as their component float). At least float32;
    float64 only when an input is 64-bit — the TPU path feeds float32
    throughout, the CPU oracle float64."""
    dtypes = []
    for a in arrays:
        dt = jnp.asarray(a).dtype
        if jnp.issubdtype(dt, jnp.complexfloating):
            dt = jnp.finfo(dt).dtype
        dtypes.append(dt)
    result = np.result_type(np.float32, *dtypes)
    return jnp.dtype(result)
