"""2x2 complex Jones-matrix algebra on split re/im pairs.

The innermost math of the RIME: products of per-antenna 2x2 complex Jones
matrices with source coherencies. Reference semantics:
``africanus/rime/predict.py:56-190`` (jones_mul_factory's scalar/diag/2x2
cases) and the register-resident 2x2 multiplies of
``rime/cuda/predict.cu.j2``. Here each of the 4 correlations is a separate
(batched) Cplx array lane, so the 2x2 products are fused VPU elementwise
chains — no tiny-matmul MXU abuse, no complex dtype.

Correlation layouts follow the reference:
- "diag": trailing dim (1,), (2,) or scalar — Jones are (anti)diagonal,
  products are elementwise.
- "2x2": trailing dims (2, 2) — full matrices.
"""

from __future__ import annotations

import jax.numpy as jnp

from africanus_tpu.ops.cplx import Cplx

__all__ = ["mul2x2", "mul2x2_hl", "mul2x2_hr", "hermitian"]


def _c(a: Cplx, i: int, j: int) -> Cplx:
    return Cplx(a.re[..., i, j], a.im[..., i, j])


def _assemble(c00: Cplx, c01: Cplx, c10: Cplx, c11: Cplx) -> Cplx:
    re = jnp.stack(
        [
            jnp.stack([c00.re, c01.re], axis=-1),
            jnp.stack([c10.re, c11.re], axis=-1),
        ],
        axis=-2,
    )
    im = jnp.stack(
        [
            jnp.stack([c00.im, c01.im], axis=-1),
            jnp.stack([c10.im, c11.im], axis=-1),
        ],
        axis=-2,
    )
    return Cplx(re, im)


def hermitian(a: Cplx) -> Cplx:
    """Conjugate transpose over the trailing (2, 2) dims."""
    re = jnp.swapaxes(a.re, -1, -2)
    im = -jnp.swapaxes(a.im, -1, -2)
    return Cplx(re, im)


def mul2x2(a: Cplx, b: Cplx) -> Cplx:
    """a @ b over trailing (2, 2) dims, batched over leading dims."""
    a00, a01, a10, a11 = _c(a, 0, 0), _c(a, 0, 1), _c(a, 1, 0), _c(a, 1, 1)
    b00, b01, b10, b11 = _c(b, 0, 0), _c(b, 0, 1), _c(b, 1, 0), _c(b, 1, 1)
    return _assemble(
        a00 * b00 + a01 * b10,
        a00 * b01 + a01 * b11,
        a10 * b00 + a11 * b10,
        a10 * b01 + a11 * b11,
    )


def mul2x2_hr(a: Cplx, b: Cplx) -> Cplx:
    """a @ bᴴ over trailing (2, 2) dims (right operand conjugate-transposed)."""
    a00, a01, a10, a11 = _c(a, 0, 0), _c(a, 0, 1), _c(a, 1, 0), _c(a, 1, 1)
    # bᴴ[j,k] = conj(b[k,j])
    b00, b01 = _c(b, 0, 0).conj(), _c(b, 1, 0).conj()
    b10, b11 = _c(b, 0, 1).conj(), _c(b, 1, 1).conj()
    return _assemble(
        a00 * b00 + a01 * b10,
        a00 * b01 + a01 * b11,
        a10 * b00 + a11 * b10,
        a10 * b01 + a11 * b11,
    )


def mul2x2_hl(a: Cplx, b: Cplx) -> Cplx:
    """aᴴ @ b over trailing (2, 2) dims (left operand conjugate-transposed)."""
    a00, a01 = _c(a, 0, 0).conj(), _c(a, 1, 0).conj()
    a10, a11 = _c(a, 0, 1).conj(), _c(a, 1, 1).conj()
    b00, b01, b10, b11 = _c(b, 0, 0), _c(b, 0, 1), _c(b, 1, 0), _c(b, 1, 1)
    return _assemble(
        a00 * b00 + a01 * b10,
        a00 * b01 + a01 * b11,
        a10 * b00 + a11 * b10,
        a10 * b01 + a11 * b11,
    )
