"""Spectral index fitting via per-component Gauss-Newton.

TPU-native equivalent of reference ``africanus/model/spi/component_spi.py``
(fit_spi_components:55, _fit_spi_components_impl:12): fits (α, I₀) of
I(ν) = A(ν)·I₀·(ν/ν₀)^α to noisy per-component spectra with weighted 2x2
Gauss-Newton, returning (alpha, alpha_var, I0, I0_var).

The reference's per-component while-loop becomes a fixed-trip
``lax.fori_loop`` with convergence masking, vectorised over all components
at once (the 2x2 normal equations are closed-form, so each iteration is a
handful of channel reductions on the VPU).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["fit_spi_components"]


def fit_spi_components(
    data,
    weights,
    freqs,
    freq0,
    alphai=None,
    I0i=None,
    beam=None,
    tol=1e-4,
    maxiter=100,
):
    """Fit spectral indices and reference-frequency intensities.

    Parameters
    ----------
    data : (comps, chan) array
    weights : (chan,) array — inverse variance
    freqs : (chan,) array
    freq0 : scalar reference frequency
    alphai, I0i : optional (comps,) starting guesses
        (defaults: α = −0.7, I₀ = data at the channel nearest ν₀ / beam)
    beam : optional (comps, chan) beam amplitude (default 1)
    tol : convergence tolerance on max(|Δα|, |ΔI₀|)
    maxiter : maximum Gauss-Newton iterations (static trip count)

    Returns
    -------
    (4, comps) array: [alpha, alpha_var, I0, I0_var].
    """
    data = jnp.asarray(data)
    weights = jnp.asarray(weights)
    freqs = jnp.asarray(freqs)

    ncomps, nfreqs = data.shape
    if beam is None:
        beam = jnp.ones_like(data)
    else:
        beam = jnp.asarray(beam)

    if data.dtype == jnp.float64:
        mindet = 1e-12
    elif data.dtype == jnp.float32:
        mindet = 1e-5
    else:
        raise ValueError("dtype must be float32 or float64")

    if alphai is not None:
        alpha0 = jnp.asarray(alphai)
    else:
        alpha0 = jnp.full((ncomps,), -0.7, data.dtype)

    if I0i is not None:
        i00 = jnp.asarray(I0i)
    else:
        ref_idx = jnp.argmin(jnp.abs(freqs - freq0))
        i00 = data[:, ref_idx] / beam[:, ref_idx]

    w = freqs / freq0  # (chan,)
    logw = jnp.log(w)
    dof = max(nfreqs - 2, 1)

    def step(_, state):
        alpha, i0, _, _, _, _, eps = state
        active = (eps > tol)[:, None]  # (comps, 1)

        jac1 = beam * w[None, :] ** alpha[:, None]  # (comps, chan)
        model = i0[:, None] * jac1
        jac0 = model * logw[None, :]
        residual = data - model

        wr = weights[None, :] * residual
        lik = jnp.sum(residual * wr, axis=1)
        jr0 = jnp.sum(jac0 * wr, axis=1)
        jr1 = jnp.sum(jac1 * wr, axis=1)
        h00 = jnp.sum(jac0 * weights[None, :] * jac0, axis=1)
        h01 = jnp.sum(jac0 * weights[None, :] * jac1, axis=1)
        h11 = jnp.sum(jac1 * weights[None, :] * jac1, axis=1)
        det = jnp.maximum(h00 * h11 - h01 * h01, mindet)

        dalpha = (h11 * jr0 - h01 * jr1) / det
        di0 = (-h01 * jr0 + h00 * jr1) / det

        new_alpha = jnp.where(active[:, 0], alpha + dalpha, alpha)
        new_i0 = jnp.where(active[:, 0], i0 + di0, i0)
        new_eps = jnp.where(
            active[:, 0],
            jnp.maximum(jnp.abs(dalpha), jnp.abs(di0)),
            eps,
        )

        # variance bookkeeping tracks the stats of the *last active* step
        upd = active[:, 0]
        return (
            new_alpha,
            new_i0,
            jnp.where(upd, h00, state[2]),
            jnp.where(upd, h11, state[3]),
            jnp.where(upd, det, state[4]),
            jnp.where(upd, lik, state[5]),
            new_eps,
        )

    ones = jnp.ones((ncomps,), data.dtype)
    init = (alpha0, i00, ones, ones, ones, ones, jnp.full((ncomps,), jnp.inf, data.dtype))
    alpha, i0, h00, h11, det, lik, _ = lax.fori_loop(0, maxiter, step, init)

    alpha_var = h11 / det * lik / dof
    i0_var = h00 / det * lik / dof
    return jnp.stack([alpha, alpha_var, i0, i0_var], axis=0)
