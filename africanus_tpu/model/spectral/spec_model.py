"""Polynomial spectral models.

TPU-native equivalent of reference ``africanus/model/spectral/spec_model.py``
(spectral_model:102, impl:110-210). The per-(source, chan, spi) loops become
vectorised power/exp expressions; the per-polarisation polynomial base is a
*static* Python configuration resolved at trace time (the reference resolves
it with numba literal typing), so each base variant compiles to its own fused
XLA expression with no runtime branching.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["spectral_model"]

_STD, _LOG, _LOG10 = 0, 1, 2
_BASE_MAP = {"std": _STD, "log": _LOG, "log10": _LOG10, 0: _STD, 1: _LOG, 2: _LOG10}


def _canon_base(base, npol):
    if isinstance(base, (list, tuple)):
        bases = list(base) + [base[-1]] * (npol - len(base))
    else:
        bases = [base] * npol
    try:
        return [_BASE_MAP[b] for b in bases[:npol]]
    except KeyError as e:
        raise ValueError(f"Invalid base {base}") from e


def spectral_model(stokes, spi, ref_freq, frequency, base=0):
    """Evaluate a per-polarisation polynomial spectral model.

    std:   I(ν) = I₀ · Π_i (ν/ν₀)^{α_i}
    log:   I(ν) = I₀ · exp( Σ_i α_i ln(ν/ν₀)^{i+1} )
    log10: I(ν) = I₀ · 10^( Σ_i α_i log₁₀(ν/ν₀)^{i+1} )

    Parameters
    ----------
    stokes : (source,) or (source, pol) array
    spi : (source, spi-comps) or (source, spi-comps, pol) array
    ref_freq : (source,) array
    frequency : (chan,) array
    base : {"std","log","log10"} | {0,1,2} | list thereof (per pol); static.

    Returns
    -------
    (source, chan) or (source, chan, pol) array.
    """
    stokes = jnp.asarray(stokes)
    spi = jnp.asarray(spi)
    ref_freq = jnp.asarray(ref_freq)
    frequency = jnp.asarray(frequency)

    out_shape = (stokes.shape[0], frequency.shape[0]) + stokes.shape[1:]

    if stokes.ndim - 1 != spi.ndim - 2:
        raise ValueError("stokes and spi disagree on the component count")

    estokes = stokes if stokes.ndim == 2 else stokes[:, None]
    espi = spi if spi.ndim == 3 else spi[:, :, None]
    npol = estokes.shape[1]

    if espi.shape[2] != npol:
        raise ValueError("stokes and spi disagree on the correlation count")

    bases = _canon_base(base, npol)
    nspi = espi.shape[1]

    # (source, chan) frequency ratio
    ratio = frequency[None, :] / ref_freq[:, None]
    exps = jnp.arange(1, nspi + 1)

    pols = []
    for p, b in enumerate(bases):
        if b == _STD:
            # Π_i ratio^α_i == ratio^(Σ_i α_i)
            total_alpha = jnp.sum(espi[:, :, p], axis=1)
            pols.append(estokes[:, p, None] * ratio ** total_alpha[:, None])
        elif b == _LOG:
            lr = jnp.log(ratio)  # (source, chan)
            poly = jnp.einsum("si,sfi->sf", espi[:, :, p],
                              lr[:, :, None] ** exps,
                              precision=lax.Precision.HIGHEST)
            pols.append(estokes[:, p, None] * jnp.exp(poly))
        else:  # _LOG10
            lr = jnp.log10(ratio)
            poly = jnp.einsum("si,sfi->sf", espi[:, :, p],
                              lr[:, :, None] ** exps,
                              precision=lax.Precision.HIGHEST)
            pols.append(estokes[:, p, None] * 10.0**poly)

    out = jnp.stack(pols, axis=-1)  # (source, chan, pol)
    return out.reshape(out_shape)
