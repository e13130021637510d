"""Zernike polynomial DDEs.

TPU-native equivalent of reference ``africanus/rime/zernike.py``
(zernike_dde:110, nb_zernike_dde:61, zernike:37). Noll indices select which
polynomial each coefficient multiplies; they are host metadata (a beam model
is fixed at trace time), so the n/m decomposition, factorial prefactors and
radial polynomial coefficient tables are all computed on the host, and the
device evaluates each *unique* Zernike basis function once over the whole
(src, time, ant, chan) coordinate grid, then contracts with the (possibly
complex) coefficients via one gather + sum.

Reference quirks replicated exactly for parity (zernike.py:89-92): the
parallactic rotation computes ``vl = l·cos − l·sin`` (both terms use l) and
``vm = m_coords·sin + m·cos`` (second term uses the *unscaled* m).
"""

from __future__ import annotations

from math import factorial

import numpy as np
import jax.numpy as jnp
from jax import lax

from africanus_tpu.ops.cplx import Cplx, cplx

__all__ = ["zernike_dde", "zernike_dde_ri", "noll_to_zernike", "zernike_basis"]


def noll_to_zernike(j):
    """Noll index (reference convention, zernike.py:37-47) -> (n, m)."""
    j = int(j) + 1
    n = 0
    j1 = j - 1
    while j1 > n:
        n += 1
        j1 -= n
    m = (-1) ** j * ((n % 2) + 2 * int((j1 + ((n + 1) % 2)) / 2.0))
    return n, m


def _radial_coeffs(n, m):
    """Coefficients of R_{n,|m|}(ρ) as {power: coeff}."""
    out = {}
    for k in range((n - m) // 2 + 1):
        c = ((-1.0) ** k * factorial(n - k)) / (
            factorial(k)
            * factorial((n + m) // 2 - k)
            * factorial((n - m) // 2 - k)
        )
        out[n - 2 * k] = out.get(n - 2 * k, 0.0) + c
    return out


def zernike_basis(j, rho, phi):
    """Evaluate Z_j on arrays (ρ, φ); zero where ρ > 1 (reference clamp)."""
    n, m = noll_to_zernike(j)
    am = abs(m)
    radial = jnp.zeros_like(rho)
    for power, coeff in _radial_coeffs(n, am).items():
        radial = radial + coeff * rho**power
    if m > 0:
        ang = jnp.cos(am * phi)
    elif m < 0:
        ang = jnp.sin(am * phi)
    else:
        ang = jnp.ones_like(phi)
    return jnp.where(rho > 1.0, 0.0, radial * ang)


def zernike_dde_ri(
    coords,
    coeffs,
    noll_index,
    parallactic_angles,
    frequency_scaling,
    antenna_scaling,
    pointing_errors,
) -> Cplx:
    """Pair-native Zernike DDE.

    Parameters
    ----------
    coords : (3, src, time, ant, chan) array of (l, m, freq)
    coeffs : (ant, chan, corr…, poly) array (may be complex / Cplx)
    noll_index : (ant, chan, corr…, poly) integer array — host metadata
    parallactic_angles : (time, ant); frequency_scaling : (chan,)
    antenna_scaling : (ant, chan, 2); pointing_errors : (time, ant, chan, 2)

    Returns
    -------
    Cplx with (src, time, ant, chan, corr…) components.
    """
    coords = jnp.asarray(coords)
    c = cplx(coeffs)
    noll = np.asarray(noll_index)  # must be host-concrete
    pa = jnp.asarray(parallactic_angles)
    fscale = jnp.asarray(frequency_scaling)
    ascale = jnp.asarray(antenna_scaling)
    pe = jnp.asarray(pointing_errors)

    _, nsrc, ntime, nant, nchan = coords.shape
    corr_shape = c.shape[2:-1]
    npoly = c.shape[-1]
    ncorr = int(np.prod(corr_shape))
    cre = c.re.reshape(nant, nchan, ncorr, npoly)
    cim = c.im.reshape(nant, nchan, ncorr, npoly)
    noll = noll.reshape(nant, nchan, ncorr, npoly).astype(np.int64)

    l = coords[0]  # noqa: E741  (src,time,ant,chan)
    m = coords[1]

    lc = l * fscale + pe[None, :, :, :, 0]
    mc = m * fscale + pe[None, :, :, :, 1]

    sin_pa = jnp.sin(pa)[None, :, :, None]
    cos_pa = jnp.cos(pa)[None, :, :, None]
    # Reference parity quirks: see module docstring
    vl = (lc * cos_pa - lc * sin_pa) * ascale[None, None, :, :, 0]
    vm = (mc * sin_pa + m * cos_pa) * ascale[None, None, :, :, 1]

    rho = jnp.sqrt(vl * vl + vm * vm)
    phi = jnp.arctan2(vl, vm)  # reference argument order (zernike.py:57)

    # Evaluate each unique basis function once over the grid
    unique_j = np.unique(noll)
    inv = {int(j): i for i, j in enumerate(unique_j)}
    basis = jnp.stack(
        [zernike_basis(int(j), rho, phi) for j in unique_j], axis=-1
    )  # (src,time,ant,chan,nj)

    idx = np.vectorize(inv.get)(noll)  # (ant,chan,corr,poly)
    # gather: basis values per (poly,corr) slot, aligned on ant/chan
    gather_idx = jnp.asarray(idx.reshape(nant, nchan, ncorr * npoly))
    picked = jnp.take_along_axis(
        basis, gather_idx[None, None], axis=-1
    )  # (src,time,ant,chan,corr*poly)
    picked = picked.reshape(nsrc, ntime, nant, nchan, ncorr, npoly)

    # geometry contraction: TPU matmuls default to bf16 operands
    out_re = jnp.einsum("acop,stacop->staco", cre, picked,
                        precision=lax.Precision.HIGHEST)
    out_im = jnp.einsum("acop,stacop->staco", cim, picked,
                        precision=lax.Precision.HIGHEST)
    out = Cplx(out_re, out_im)
    return out.reshape((nsrc, ntime, nant, nchan) + corr_shape)


def zernike_dde(
    coords,
    coeffs,
    noll_index,
    parallactic_angles,
    frequency_scaling,
    antenna_scaling,
    pointing_errors,
):
    """Complex-dtype Zernike DDE (reference API parity; rime/zernike.py:110)."""
    out = zernike_dde_ri(
        coords,
        coeffs,
        noll_index,
        parallactic_angles,
        frequency_scaling,
        antenna_scaling,
        pointing_errors,
    )
    if jnp.issubdtype(jnp.asarray(coeffs).dtype, jnp.complexfloating):
        return lax.complex(out.re, out.im)
    return out.re
