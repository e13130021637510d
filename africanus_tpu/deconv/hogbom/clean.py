"""Hogbom CLEAN deconvolution.

TPU-native equivalent of reference ``africanus/deconv/hogbom/clean.py``
(hogbom_clean:122, find_peak:74, update_residual:113, fit_2d_gaussian:40,
restore:202). The reference's Python peak-find/subtract loop becomes a
``lax.while_loop`` whose body is an argmax + a dynamic-slice PSF
subtraction — fully on-device with a static iteration bound.

``fit_2d_gaussian``/``restore`` keep the reference's scipy host path (the
beam fit is a 7-parameter curve_fit on a tiny image) with the convolution
done via FFT.
"""

from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["hogbom_clean", "find_peak", "fit_2d_gaussian", "restore"]

log = logging.getLogger(__name__)


def find_peak(residuals):
    """(maxx, maxy, minx, miny, peak_intensity) of a 2D image
    (reference clean.py:74-105)."""
    r = jnp.asarray(residuals)
    nx, ny = r.shape
    amax = jnp.argmax(r)
    amin = jnp.argmin(r)
    maxx, maxy = amax // ny, amax % ny
    minx, miny = amin // ny, amin % ny
    return maxx, maxy, minx, miny, r.reshape(-1)[amax]


def hogbom_clean(dirty, psf, gamma=0.1, threshold="default", niter="default"):
    """CLEAN the ``dirty`` image with the ``psf``.

    Parameters
    ----------
    dirty : (ny, nx) array (square)
    psf : (2*ny, 2*nx) array, peak at (ny−1, nx−1) — the reference
        convention (clean.py:113-119); an FFT-gridded psf of an even
        image peaks at (ny, nx) and must be rolled by −1 first, or every
        subtraction is shifted one pixel and the loop diverges
    gamma : loop gain < 1
    threshold : float (fraction of initial peak) or "default" (0.2)
    niter : max iterations or "default" (3 * npix)

    Returns
    -------
    (clean image, residual image)
    """
    dirty = jnp.asarray(dirty)
    psf = jnp.asarray(psf)

    if psf.shape[0] != 2 * dirty.shape[0] or psf.shape[1] != 2 * dirty.shape[1]:
        raise ValueError("psf not right size: expected (2*nx, 2*ny)")
    if dirty.shape[0] != dirty.shape[1]:
        raise ValueError("dirty image must be square")

    npix = dirty.shape[0]
    if niter == "default":
        niter = 3 * npix

    _, _, _, _, intensity0 = find_peak(dirty)
    frac = 0.2 if threshold == "default" else float(threshold)
    thresh = frac * jnp.abs(intensity0)

    # carry (flat_idx, intensity) so the full-image argmax runs once
    # per iteration instead of once in cond and again in body
    def peak_of(residual):
        flat_idx = jnp.argmax(residual)
        return flat_idx, residual.reshape(-1)[flat_idx]

    def cond(state):
        _, _, i, _, intensity = state
        return (jnp.abs(intensity) > thresh) & (i <= niter)

    def body(state):
        residual, clean, i, flat_idx, intensity = state
        p, q = flat_idx // npix, flat_idx % npix

        clean = clean.at[p, q].add(intensity * gamma)
        # psf window [npix-1-p : 2npix-1-p, npix-1-q : 2npix-1-q]
        window = lax.dynamic_slice(
            psf, (npix - 1 - p, npix - 1 - q), (npix, npix)
        )
        residual = residual - gamma * intensity * window
        return (residual, clean, i + 1) + peak_of(residual)

    state = (dirty, jnp.zeros_like(dirty), jnp.asarray(0)) + peak_of(dirty)
    residual, clean, i, _, _ = lax.while_loop(cond, body, state)
    return clean, residual


def _gauss2d(coords, amplitude, xo, yo, sigma_x, sigma_y, theta, offset):
    x, y = coords
    a = np.cos(theta) ** 2 / (2 * sigma_x**2) + np.sin(theta) ** 2 / (2 * sigma_y**2)
    b = -np.sin(2 * theta) / (4 * sigma_x**2) + np.sin(2 * theta) / (4 * sigma_y**2)
    c = np.sin(theta) ** 2 / (2 * sigma_x**2) + np.cos(theta) ** 2 / (2 * sigma_y**2)
    g = offset + amplitude * np.exp(
        -(a * (x - xo) ** 2 + 2 * b * (x - xo) * (y - yo) + c * (y - yo) ** 2)
    )
    return g.ravel()


def fit_2d_gaussian(psf):
    """Fit an elliptical Gaussian to the primary lobe of the PSF (host-side
    scipy curve_fit, reference clean.py:40-71). Returns the normalised
    fitted beam with the PSF's shape."""
    from scipy import optimize as opt

    psf = np.asarray(psf)
    lk, mk = psf.shape
    mask = psf >= 0.5 * psf.max()
    psf_fit = np.where(mask, psf, 0.0)

    x = np.linspace(0, lk - 1, lk)
    y = np.linspace(0, mk - 1, mk)
    x, y = np.meshgrid(x, y)
    initial_guess = (0.5, lk / 2, mk / 2, 1.75, 1.4, -4.0, 0)
    popt, _ = opt.curve_fit(_gauss2d, (x, y), psf_fit.ravel(), p0=initial_guess)
    fitted = _gauss2d((x, y), *popt)
    fitted = fitted / fitted.max()
    return fitted.reshape(lk, mk)


def restore(clean, psf, residuals):
    """Restore: convolve the clean model with the fitted beam and add
    residuals (reference clean.py:202-236). Returns (restored, conv_model).
    """
    from scipy import signal

    log.info("fitting a 2D gaussian to the PSF peak")
    clean_beam = fit_2d_gaussian(np.asarray(psf))
    conv_model = signal.fftconvolve(np.asarray(clean), clean_beam, mode="same")
    return conv_model + np.asarray(residuals), conv_model
