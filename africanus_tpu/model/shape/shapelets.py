"""Shapelet basis evaluation in uv space.

TPU-native equivalent of reference ``africanus/model/shape/shapelets.py``
(shapelet:57, shapelet_with_w_term:103, hermite:10). The per-(row, chan,
src, n1, n2) scalar recursion becomes: Hermite polynomials evaluated over
the whole (src, row, chan) grid with a static-order host loop (orders come
from the coefficient array shape), and the (n1, n2) coefficient contraction
a vectorised sum. The i^{n1+n2} basis phase is applied as a 4-cycle on the
split re/im pair.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from math import factorial as _math_factorial

from africanus_tpu.constants import c as lightspeed, minus_two_pi_over_c
from africanus_tpu.ops.cplx import Cplx

__all__ = ["shapelet", "shapelet_ri", "shapelet_with_w_term",
           "shapelet_with_w_term_ri", "hermite"]


def hermite(n, x):
    """Physicists' Hermite polynomial H_n(x), static order n (vectorised)."""
    if n == 0:
        return jnp.ones_like(x)
    h_prev = jnp.ones_like(x)
    h = 2.0 * x
    for k in range(1, n):
        h, h_prev = 2.0 * x * h - 2.0 * k * h_prev, h
    return h


def _basis_1d(n, xx, beta, delta_x):
    """|complex_basis_function| of the reference (shapelets.py:37-46) minus
    the i^n phase (applied separately): real-valued factor."""
    x = 2.0 * np.pi * xx
    scale = 1.0 / beta
    norm = 1.0 / jnp.sqrt(
        2.0**n * np.sqrt(np.pi) * float(_math_factorial(n)) * scale
    )
    return (
        norm
        * hermite(n, x / scale)
        * jnp.exp(-(x * x) / (2.0 * scale * scale))
        * np.sqrt(2.0 * np.pi)
        / delta_x
    )


def _apply_i_power(re, im, n):
    """(re + i·im) * i^n for static integer n."""
    k = n % 4
    if k == 0:
        return re, im
    if k == 1:
        return -im, re
    if k == 2:
        return -re, -im
    return im, -re


def _shapelet_core(coords, frequency, coeffs, beta, delta_lm):
    coords = jnp.asarray(coords)
    frequency = jnp.asarray(frequency)
    coeffs = jnp.asarray(coeffs)
    beta = jnp.asarray(beta)

    nsrc, nmax1, nmax2 = coeffs.shape
    delta_l, delta_m = delta_lm[0], delta_lm[1]

    u = coords[:, 0]
    v = coords[:, 1]
    two_pi_over_c_f = 2.0 * np.pi * frequency / lightspeed
    fu = u[:, None] * two_pi_over_c_f[None, :]  # (row, chan)
    fv = v[:, None] * two_pi_over_c_f[None, :]

    beta_u = beta[:, 0]
    beta_v = beta[:, 1]
    degenerate = (beta_u == 0.0) | (beta_v == 0.0)
    # avoid div-by-zero inside the masked-off branch
    bu = jnp.where(degenerate, 1.0, beta_u)
    bv = jnp.where(degenerate, 1.0, beta_v)

    # basis tables: (n, src, row, chan)
    fub = fu[None, :, :]  # broadcast over src
    b1 = jnp.stack(
        [_basis_1d(n1, fub, bu[:, None, None], delta_l) for n1 in range(nmax1)]
    )
    b2 = jnp.stack(
        [_basis_1d(n2, fv[None, :, :], bv[:, None, None], delta_m) for n2 in range(nmax2)]
    )

    re = 0.0
    im = 0.0
    for n1 in range(nmax1):
        for n2 in range(nmax2):
            term = coeffs[:, n1, n2][:, None, None] * b1[n1] * b2[n2]
            tre, tim = _apply_i_power(term, jnp.zeros_like(term), n1 + n2)
            re = re + tre
            im = im + tim

    one = jnp.ones_like(re)
    zero = jnp.zeros_like(re)
    mask = degenerate[:, None, None]
    out = Cplx(jnp.where(mask, one, re), jnp.where(mask, zero, im))
    # reference layout: (row, chan, src)
    return Cplx(out.re.transpose(1, 2, 0), out.im.transpose(1, 2, 0))


def shapelet_1d(u, coeffs, fourier, delta_x=1, beta=1.0):
    """One-dimensional shapelet evaluation (reference shapelets.py:155-191).

    ``fourier=False`` evaluates the signal-space basis
    Σₙ cₙ·(2ⁿ√π n! β)^{-1/2}·Hₙ(u/β)·e^{-u²/2β²}; ``fourier=True`` the
    uv-space transform with the iⁿ phase and 1/Δx scaling. Vectorised
    over ``u`` (the reference loops per row)."""
    u = jnp.asarray(u)
    coeffs = np.asarray(coeffs)
    if fourier:
        if delta_x is None:
            raise ValueError("delta_x is required in Fourier mode")
        re = jnp.zeros(u.shape)
        im = jnp.zeros(u.shape)
        for n, c in enumerate(coeffs):
            b = c * _basis_1d(n, u, beta, delta_x)
            tre, tim = _apply_i_power(b, jnp.zeros_like(b), n)
            re = re + tre
            im = im + tim
        return lax.complex(re, im)
    out = jnp.zeros(u.shape)
    for n, c in enumerate(coeffs):
        norm = 1.0 / np.sqrt(
            2.0**n * np.sqrt(np.pi) * float(_math_factorial(n)) * beta
        )
        out = out + (
            c * norm * hermite(n, u / beta)
            * jnp.exp(-(u * u) / (2.0 * beta * beta))
        )
    return out


def shapelet_ri(coords, frequency, coeffs, beta, delta_lm):
    """Pair-native shapelet visibilities (row, chan, src) — the TPU
    entry point (no complex dtypes on device; see CLAUDE.md)."""
    return _shapelet_core(coords, frequency, coeffs, beta, delta_lm)


def shapelet(coords, frequency, coeffs, beta, delta_lm, dtype=jnp.complex128):
    """Shapelet visibilities of shape (row, chan, src) (reference parity)."""
    out = _shapelet_core(coords, frequency, coeffs, beta, delta_lm)
    real = jnp.finfo(jnp.dtype(dtype)).dtype
    return lax.complex(out.re.astype(real), out.im.astype(real))


def shapelet_with_w_term_ri(coords, frequency, coeffs, beta, delta_lm, lm):
    """Pair-native shapelet + w-term phase steer
    (reference shapelets.py:103-148)."""
    coords = jnp.asarray(coords)
    frequency = jnp.asarray(frequency)
    lm = jnp.asarray(lm)
    beta = jnp.asarray(beta)

    base = _shapelet_core(coords, frequency, coeffs, beta, delta_lm)

    l = lm[:, 0]  # noqa: E741
    m = lm[:, 1]
    n = jnp.sqrt(jnp.maximum(1.0 - l * l - m * m, 0.0))
    u, v, w = coords[:, 0], coords[:, 1], coords[:, 2]
    # (row, src) phase dot then scaled by freq -> (row, chan, src)
    dot = (
        u[:, None] * l[None, :]
        + v[:, None] * m[None, :]
        + w[:, None] * (n - 1.0)[None, :]
    )
    p = minus_two_pi_over_c * dot[:, None, :] * frequency[None, :, None]
    wre, wim = jnp.cos(p), jnp.sin(p)

    # reference skips the w-term for degenerate (beta == 0) sources,
    # which the core already returned as exactly 1 (shapelets.py:134-136)
    degenerate = (beta[:, 0] == 0.0) | (beta[:, 1] == 0.0)
    wre = jnp.where(degenerate[None, None, :], 1.0, wre)
    wim = jnp.where(degenerate[None, None, :], 0.0, wim)

    return Cplx(base.re * wre - base.im * wim,
                base.re * wim + base.im * wre)


def shapelet_with_w_term(
    coords, frequency, coeffs, beta, delta_lm, lm, dtype=jnp.complex128
):
    """Shapelet basis evaluation including the w-term phase (complex
    output; reference ``model/shape/shapelets.py:103``).

    Parameters
    ----------
    coords : (row, 3) float uvw metres
    frequency : (chan,) float Hz
    coeffs : (src, nmax1, nmax2) float shapelet coefficients
    beta : (src, 2) float scale parameters
    delta_lm : (2,) float (delta_l, delta_m) pixel offsets
    lm : (src, 2) float source positions
    dtype : complex output dtype (default complex128)

    Returns
    -------
    (row, chan, src) complex shapelet envelope with w-phase applied.
    """
    out = shapelet_with_w_term_ri(coords, frequency, coeffs, beta,
                                  delta_lm, lm)
    real = jnp.finfo(jnp.dtype(dtype)).dtype
    return lax.complex(out.re.astype(real), out.im.astype(real))
