"""Kronecker-structured linear algebra.

Equivalents of reference ``africanus/linalg/kronecker_tools.py``
(kron_matvec:29, kron_tensorvec, kron_matmat, kron_cholesky:157): operate
with A = K₀ ⊗ K₁ ⊗ … without materialising the Kronecker product. Inputs
are sequences of factor matrices; computation is jnp (jit-compatible when
factor shapes are static).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["kron_N", "kron_matvec", "kron_tensorvec", "kron_matmat",
           "kron_tensormat", "kron_cholesky"]

# covariance factors carry geometry-scale dynamic range: TPU matmuls
# default to bf16 operands (~2^-8), which corrupts GP solves — pin full
# operand precision (CLAUDE.md precision rule)
_HP = lax.Precision.HIGHEST


def kron_N(x):
    """Total number of rows of the Kronecker product of the factors."""
    return int(np.prod([np.asarray(xi).shape[0] for xi in x]))


def kron_matvec(A, b):
    """A @ b for square Kronecker factors A = [K0, K1, …], in linear time."""
    x = jnp.asarray(b)
    N = x.size
    for Ad in A:
        Ad = jnp.asarray(Ad)
        Gd = Ad.shape[0]
        X = x.reshape(Gd, N // Gd)
        x = jnp.matmul(Ad, X, precision=_HP).T.ravel()
    return x


def kron_tensorvec(A, b):
    """A @ b for arbitrary (possibly rectangular) Kronecker factors."""
    D = len(A)
    G = [np.asarray(Ad).shape[1] for Ad in A]
    M = [np.asarray(Ad).shape[0] for Ad in A]
    x = jnp.asarray(b)
    for d in range(D):
        Gd = G[d]
        rem = int(np.prod([G[i] if i > d else M[i] for i in range(D) if i != d]))
        X = x.reshape(Gd, rem)
        x = jnp.matmul(jnp.asarray(A[d]), X, precision=_HP).T.ravel()
        G[d] = M[d]
    return x


def kron_matmat(A, B):
    """Matrix product of a Kronecker-factored square matrix with a
    dense matrix: (kron(*A)) @ B, applied column-by-column via
    :func:`kron_matvec` without materialising the Kronecker product
    (reference ``linalg/kronecker_tools.py``).

    Parameters
    ----------
    A : sequence of (ni, ni) square factors
    B : (prod ni, k) dense right-hand sides

    Returns
    -------
    (prod ni, k) product.
    """
    B = jnp.asarray(B)
    cols = [kron_matvec(A, B[:, i]) for i in range(B.shape[1])]
    return jnp.stack(cols, axis=1)


def kron_tensormat(A, B):
    """As :func:`kron_matmat` but for rectangular Kronecker factors
    (ni, mi): maps (prod mi, k) -> (prod ni, k) column-by-column via
    :func:`kron_tensorvec`."""
    B = jnp.asarray(B)
    cols = [kron_tensorvec(A, B[:, i]) for i in range(B.shape[1])]
    return jnp.stack(cols, axis=1)


def kron_cholesky(A, jitter=None):
    """Cholesky factors of each Kronecker factor: chol(⊗Kᵢ) = ⊗chol(Kᵢ).

    The reference adds a fixed 1e-13 diagonal jitter and retries on a
    numpy LinAlgError; 1e-13 is a no-op at float32 and
    ``jnp.linalg.cholesky`` returns NaNs instead of raising, so here the
    jitter is dtype-aware (10·eps of the mean diagonal) and a NaN result
    triggers one retry at 1e6x jitter — the traceable equivalent of the
    reference's except-with-jitter recovery."""
    out = []
    for Ad in A:
        Ad = jnp.asarray(Ad)
        eye = jnp.eye(Ad.shape[0], dtype=Ad.dtype)
        scale = jnp.mean(jnp.abs(jnp.diag(Ad)))
        base = (10.0 * jnp.finfo(Ad.dtype).eps) * scale \
            if jitter is None else jitter
        L = jnp.linalg.cholesky(Ad + base * eye)
        L_retry = jnp.linalg.cholesky(Ad + (base * 1e6) * eye)
        out.append(jnp.where(jnp.any(jnp.isnan(L)), L_retry, L))
    return out
