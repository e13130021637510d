"""WSClean polynomial spectra.

TPU-native equivalent of reference ``africanus/model/wsclean/spec_model.py``
(spectra:71, ordinary_spectral_model:9, log_spectral_model:19):

ordinary: S(ν) = I + Σ_c coeffs_c · ((ν/ν₀) − 1)^{c+1}
log:      S(ν) = I · exp( Σ_c coeffs_c · ln(ν/ν₀)^{c+1} )

``log_poly`` may be a scalar bool or a per-source bool array; both
branches are computed vectorised and blended with ``where`` (the two
branches share the coefficient contraction structure, so XLA fuses them).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["spectra"]


def spectra(I, coeffs, log_poly, ref_freq, frequency):  # noqa: E741
    """Evaluate WSClean source spectra.

    Parameters
    ----------
    I : (source,) array — reference flux
    coeffs : (source, ncoeff) array
    log_poly : bool or (source,) bool array
    ref_freq : (source,) array
    frequency : (chan,) array

    Returns
    -------
    (source, chan) array.
    """
    I = jnp.asarray(I)  # noqa: E741
    coeffs = jnp.asarray(coeffs)
    ref_freq = jnp.asarray(ref_freq)
    frequency = jnp.asarray(frequency)

    if not (I.shape[0] == coeffs.shape[0] == ref_freq.shape[0]):
        raise ValueError("I, coeffs and ref_freq disagree on the leading dimension")

    ncoeff = coeffs.shape[1]
    exps = jnp.arange(1, ncoeff + 1)

    ratio = frequency[None, :] / ref_freq[:, None]  # (source, chan)

    # ordinary polynomial in (ratio - 1)
    ord_term = (ratio - 1.0)[:, :, None] ** exps
    ordinary = I[:, None] + jnp.einsum("sc,sfc->sf", coeffs, ord_term,
                          precision=lax.Precision.HIGHEST)

    # logarithmic polynomial in ln(ratio)
    log_term = jnp.log(ratio)[:, :, None] ** exps
    logarithmic = I[:, None] * jnp.exp(jnp.einsum("sc,sfc->sf", coeffs, log_term,
                          precision=lax.Precision.HIGHEST))

    if isinstance(log_poly, bool):
        return logarithmic if log_poly else ordinary

    log_poly = jnp.asarray(log_poly)
    if log_poly.ndim == 0:
        return jnp.where(log_poly, logarithmic, ordinary)
    if coeffs.shape[0] != log_poly.shape[0]:
        raise ValueError("coeffs and log_poly disagree on the leading dimension")
    return jnp.where(log_poly[:, None], logarithmic, ordinary)
