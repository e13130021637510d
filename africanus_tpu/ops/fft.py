"""Complex 2D FFTs on split re/im pairs.

Backends with complex support (CPU/GPU) use the native FFT. The axon TPU
backend has no complex element type at all, so the fallback computes the
2D DFT as real matmuls against precomputed cos/sin twiddle matrices —
8 (n×n)·(n×m) MXU matmuls per transform. That is O(n³) vs the FFT's
O(n² log n), but it runs on the systolic array; for production grid sizes
the Pallas split-radix kernel is the planned upgrade.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["backend_has_complex", "cifft2", "cfft2"]


def backend_has_complex() -> bool:
    """True when the default backend supports complex element types."""
    return jax.default_backend() in ("cpu", "gpu", "cuda", "rocm")


@lru_cache(maxsize=32)
def _twiddles(n, sign, dtype_name):
    """cos/sin DFT matrices: T[k, j] = exp(sign·2πi·k·j/n)."""
    k = np.arange(n)
    ang = sign * 2.0 * np.pi * np.outer(k, k) / n
    dt = np.dtype(dtype_name)
    return np.cos(ang).astype(dt), np.sin(ang).astype(dt)


def _matmul_dft_1d(re, im, axis, sign):
    """DFT along ``axis`` via real matmuls (split complex)."""
    n = re.shape[axis]
    cos_t, sin_t = _twiddles(n, sign, str(re.dtype))
    cos_t = jnp.asarray(cos_t)
    sin_t = jnp.asarray(sin_t)

    re_m = jnp.moveaxis(re, axis, -1)
    im_m = jnp.moveaxis(im, axis, -1)

    def dot(x, t):
        return lax.dot_general(
            x, t,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            precision=lax.Precision.HIGHEST,
        )

    out_re = dot(re_m, cos_t) - dot(im_m, sin_t)
    out_im = dot(re_m, sin_t) + dot(im_m, cos_t)
    return jnp.moveaxis(out_re, -1, axis), jnp.moveaxis(out_im, -1, axis)


def cfft2(re, im, axes=(-2, -1)):
    """Forward complex 2D FFT (e^{-2πi}) on a split pair."""
    if backend_has_complex():
        out = jnp.fft.fft2(lax.complex(re, im), axes=axes)
        return out.real, out.imag
    for ax in axes:
        re, im = _matmul_dft_1d(re, im, ax % re.ndim, -1.0)
    return re, im


def cifft2(re, im, axes=(-2, -1)):
    """Inverse complex 2D FFT (e^{+2πi}, 1/N normalised) on a split pair."""
    if backend_has_complex():
        out = jnp.fft.ifft2(lax.complex(re, im), axes=axes)
        return out.real, out.imag
    norm = 1.0
    for ax in axes:
        re, im = _matmul_dft_1d(re, im, ax % re.ndim, 1.0)
        norm *= re.shape[ax % re.ndim]
    return re / norm, im / norm
