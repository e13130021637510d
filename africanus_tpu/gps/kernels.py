"""Gaussian-process covariance kernels (reference ``africanus/gps/kernels.py:8``)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from africanus_tpu.gps.utils import abs_diff

__all__ = ["exponential_squared"]


def exponential_squared(x, xp, sigmaf, l, pspec=False):  # noqa: E741
    """Squared-exponential covariance k(x, xp) = σ_f² exp(−(x−xp)²/(2l²)),
    or its 1D power spectrum when ``pspec`` (requires x == xp on a regular
    grid)."""
    if pspec:
        x = np.asarray(x)
        xp = np.asarray(xp)
        N, D = x.shape
        if D != 1:
            raise NotImplementedError("power spectra are only defined for 1D inputs")
        if (x != xp).any():
            raise ValueError("power-spectrum mode requires x == xp")
        xf = x.squeeze()
        delx = xf[1] - xf[0]
        if not np.allclose(xf[1:] - xf[:-1], delx):
            raise ValueError("power-spectrum mode requires a uniform grid")
        s = np.fft.fftshift(np.fft.fftfreq(N, d=delx))
        return jnp.asarray(
            np.sqrt(2 * np.pi * l) * sigmaf**2.0 * np.exp(-(l**2) * s**2 / 2.0)
        )
    xxp = abs_diff(x, xp)
    return sigmaf**2 * jnp.exp(-(xxp**2) / (2.0 * l**2))
