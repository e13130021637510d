"""Split real/imaginary complex algebra for TPU.

TPU compute units (MXU/VPU) operate on real arrays; the axon TPU backend
rejects complex element types outright, and even where XLA lowers complex,
split re/im is the MXU-friendly layout (the reference faces the same issue
in its CUDA predict kernel, which keeps 2x2 complex Jones products in real
register pairs — rime/cuda/predict.cu.j2).

:class:`Cplx` is a pytree pair (re, im) that flows through jit/vmap/
shard_map/pallas unchanged. Every hot kernel in africanus_tpu has a
pair-native implementation built on this module; the complex-dtype public
API is a thin boundary wrapper used on backends with complex support.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["Cplx", "cplx", "expi", "cmul", "cconj", "cabs2", "cmatmul", "to_numpy"]


class Cplx(NamedTuple):
    """A complex array as a (re, im) pair of real arrays (a pytree)."""

    re: jax.Array
    im: jax.Array

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    # -- arithmetic -------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re + other.re, self.im + other.im)
        return Cplx(self.re + other, self.im)

    def __sub__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re - other.re, self.im - other.im)
        return Cplx(self.re - other, self.im)

    def __mul__(self, other):
        if isinstance(other, Cplx):
            return Cplx(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        return Cplx(self.re * other, self.im * other)

    __radd__ = __add__
    __rmul__ = __mul__

    def __neg__(self):
        return Cplx(-self.re, -self.im)

    def conj(self):
        return Cplx(self.re, -self.im)

    def astype(self, dtype):
        return Cplx(self.re.astype(dtype), self.im.astype(dtype))

    def reshape(self, *shape):
        return Cplx(self.re.reshape(*shape), self.im.reshape(*shape))

    def transpose(self, *axes):
        return Cplx(self.re.transpose(*axes), self.im.transpose(*axes))

    def __getitem__(self, idx):
        return Cplx(self.re[idx], self.im[idx])


def cplx(x) -> Cplx:
    """Coerce any array to a :class:`Cplx` split re/im pair.

    Complex inputs split into (real, imag); real inputs pair with a
    zero imaginary part; Cplx inputs coerce numpy leaves to jax arrays
    (traced indexing of numpy leaves fails otherwise). This is the
    device-side complex representation everywhere — the target TPU
    exposes no complex dtypes (CLAUDE.md).
    """
    if isinstance(x, Cplx):
        # coerce numpy leaves: indexing them with traced indices fails
        return Cplx(jnp.asarray(x.re), jnp.asarray(x.im))
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return Cplx(jnp.real(x), jnp.imag(x))
    return Cplx(x, jnp.zeros_like(x))


def expi(p) -> Cplx:
    """Unit phasor e^{i p} of a real phase array (radians), as a
    :class:`Cplx` pair (cos p, sin p) — the pair-native analogue of
    ``jnp.exp(1j * p)``."""
    return Cplx(jnp.cos(p), jnp.sin(p))


def cmul(a: Cplx, b: Cplx) -> Cplx:
    return a * b


def cconj(a: Cplx) -> Cplx:
    return a.conj()


def cabs2(a: Cplx):
    return a.re * a.re + a.im * a.im


def cmatmul(a: Cplx, b: Cplx, einsum_spec: str | None = None,
            precision=None) -> Cplx:
    """Complex contraction via real MXU matmuls.

    With an ``einsum_spec``, contracts with jnp.einsum; otherwise uses @.
    Uses the 4-multiply form: XLA shares the operand loads between the
    paired matmuls, and 4 real matmuls of each half keep full MXU precision
    (the 3-mult Karatsuba form costs accuracy and an extra add chain).

    ``precision`` defaults to HIGHEST: TPU matmuls otherwise run with
    bf16 operands, which destroys phase/geometry contractions (CLAUDE.md
    precision rule). Pass an explicit lower precision only for
    amplitude-like data that tolerates ~2^-8 operand rounding.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST

    def dot(x, y):
        if einsum_spec is not None:
            return jnp.einsum(einsum_spec, x, y, optimize=True,
                              precision=precision)
        return jnp.matmul(x, y, precision=precision)

    rr = dot(a.re, b.re)
    ii = dot(a.im, b.im)
    ri = dot(a.re, b.im)
    ir = dot(a.im, b.re)
    return Cplx(rr - ii, ri + ir)


def to_numpy(a):
    """Fetch to host: a :class:`Cplx` pair becomes a numpy complex
    array (re + 1j*im); anything else passes through ``np.asarray``.
    The standard way to materialise TPU pair results for comparison
    against complex oracles."""
    import numpy as np

    if isinstance(a, Cplx):
        return np.asarray(a.re) + 1j * np.asarray(a.im)
    return np.asarray(a)
