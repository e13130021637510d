"""Phase delay (K Jones) term.

Computes e^{-2πi(ul + vm + w(n-1))ν/c} for every (source, row, chan).
Capability parity with reference ``africanus/rime/phase.py:11-63`` (numba)
and ``africanus/rime/cuda/phase.cu.j2`` (CUDA); here the per-source/row/chan
triple loop becomes a rank-1 structured broadcast: the (source, row) phase
dot-product is an MXU matmul of lmn against uvwᵀ, and the channel scaling a
fused outer product, all inside one XLA fusion.

``phase_delay_ri`` is the TPU-native core returning a split re/im
:class:`~africanus_tpu.ops.cplx.Cplx` pair (TPUs have no complex element
type); ``phase_delay`` assembles a complex array at the API boundary for
backends that support it.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from africanus_tpu.constants import minus_two_pi_over_c
from africanus_tpu.coordinates.transforms import n_minus_one
from africanus_tpu.ops.cplx import Cplx, expi
from africanus_tpu.utils.types import complex_dtype_for

__all__ = ["phase_delay", "phase_delay_ri", "phase_dot_cycles",
           "reduced_phase"]


def _sign_for(convention):
    if convention == "fourier":
        return -1.0
    if convention == "casa":
        return 1.0
    raise ValueError("convention must be 'fourier' or 'casa', not in standard set")


def _real_phase(lm, uvw, frequency, convention, real_dtype):
    # minus_two_pi_over_c is -2π/c; fourier keeps it, casa negates
    constant = -_sign_for(convention) * minus_two_pi_over_c

    l = lm[:, 0].astype(real_dtype)  # noqa: E741
    m = lm[:, 1].astype(real_dtype)
    n = n_minus_one(l, m)

    # (source, row) geometric delay, computed elementwise: the MXU would
    # run this 3-term contraction at bf16 input precision (DEFAULT matmul
    # precision on TPU), which is catastrophic for phases that reach 1e4
    # rad; three exact f32 VPU multiplies keep full f32 accuracy.
    uvw = uvw.astype(real_dtype)
    phase_dot = (
        l[:, None] * uvw[None, :, 0]
        + m[:, None] * uvw[None, :, 1]
        + n[:, None] * uvw[None, :, 2]
    )

    # (source, row, chan) real phase; XLA fuses scale + sin/cos
    return (constant * phase_dot)[:, :, None] * frequency.astype(real_dtype)


def phase_dot_cycles(lm, uvw, convention: str = "fourier"):
    """Signed geometric delay ±(u·l+v·m+w·(n−1))/c as a two-f32 pair.

    Units are seconds, so ``delay · ν`` is the phase in *cycles*; the
    sign already carries the convention (fourier −, casa +). This is the
    (src, row) prologue of the compensated phase path, shared by the XLA
    formulation (:func:`phase_delay_ri`) and the fused Pallas predict
    kernel (ops/pallas_predict.py), which both finish with a per-channel
    two-float product and a mod-1-cycle reduction.
    """
    from africanus_tpu.ops.dfloat import (
        df_add, df_const, df_mul, n_minus_one_df, two_prod,
    )

    sign = _sign_for(convention)
    f32 = jnp.float32
    lm = jnp.asarray(lm)
    uvw = jnp.asarray(uvw)
    l = lm[:, 0].astype(f32)  # noqa: E741
    m = lm[:, 1].astype(f32)
    n1h, n1l = n_minus_one_df(l, m)

    uvw = uvw.astype(f32)
    w = uvw[None, :, 2]
    metres = df_add(
        df_add(two_prod(l[:, None], uvw[None, :, 0]),
               two_prod(m[:, None], uvw[None, :, 1])),
        df_mul((n1h[:, None], n1l[:, None]), (w, jnp.zeros_like(w))),
    )  # (src, row) metres, two-float
    return df_mul(metres, df_const(sign / 299792458.0))


def _reduced_phase_f32(lm, uvw, frequency, convention):
    """Compensated f32 phase: the (src,row,chan) phase reduced mod 2π.

    The cycle count ±(u·l+v·m+w·(n−1))·ν/c is carried as a two-f32 pair
    (~48 bits) and reduced modulo one cycle before the 2π scale, so
    cos/sin see a small exact residual instead of an O(1e4)-rad f32
    value (see ops/dfloat.py). Costs ~12 extra VPU flops per element
    against the two transcendentals.
    """
    from africanus_tpu.ops.dfloat import _r, reduce_cycles, split

    dot = phase_dot_cycles(lm, uvw, convention)  # (src, row) seconds
    freq = jnp.asarray(frequency).astype(jnp.float32)

    # (src,row,chan) df product with hoisted Dekker splits: the O(S·R·C)
    # inner body is ~11 flops + round, fused with cos/sin by XLA
    # (_r barriers force exact f32 rounding — see ops/dfloat.py)
    dh, dl = dot[0][:, :, None], dot[1][:, :, None]
    dhh, dhl = split(dh)
    fhh, fhl = split(freq)
    p = _r(dh * freq)
    e = _r(_r(_r(_r(dhh * fhh) - p) + _r(dhh * fhl) + _r(dhl * fhh))
           + _r(dhl * fhl))
    e = _r(e + _r(dl * freq))
    frac = reduce_cycles(p, e)
    return (2.0 * jnp.pi) * frac


def reduced_phase(lm, uvw, frequency, convention: str = "fourier",
                  real_dtype=None, compensated: bool | None = None):
    """(src, row, chan) real phase ±2π·(u·l+v·m+w·(n−1))·ν/c.

    With ``compensated`` (default: exactly when the working dtype is
    float32) the phase is reduced mod 2π through the two-float pipeline;
    otherwise it is the plain product at ``real_dtype``. Shared by the K
    term and the DFT kernels.
    """
    lm = jnp.asarray(lm)
    uvw = jnp.asarray(uvw)
    frequency = jnp.asarray(frequency)
    if real_dtype is None:
        real_dtype = jnp.result_type(lm.dtype, uvw.dtype, frequency.dtype)
    if compensated is None:
        compensated = jnp.dtype(real_dtype) == jnp.float32
    if compensated:
        return _reduced_phase_f32(lm, uvw, frequency, convention)
    return _real_phase(lm, uvw, frequency, convention, real_dtype)


def phase_delay_ri(lm, uvw, frequency, convention: str = "fourier",
                   compensated: bool | None = None) -> Cplx:
    """TPU-native K term as a split (re, im) pair.

    Parameters
    ----------
    lm : (source, 2) array
    uvw : (row, 3) array
    frequency : (chan,) array
    convention : {"fourier", "casa"}
    compensated : use the two-float mod-2π phase (default: on exactly
        when the working dtype is float32 — f64 math doesn't need it).

    Returns
    -------
    Cplx with (source, row, chan) components.
    """
    return expi(reduced_phase(lm, uvw, frequency, convention,
                              compensated=compensated))


def phase_delay(lm, uvw, frequency, convention: str = "fourier"):
    """Complex-dtype K term: (source, row, chan) complex array.

    Sign convention: e^{-2πi…} for "fourier", e^{+2πi…} for "casa".
    """
    out_dtype = complex_dtype_for(lm, uvw, frequency)
    k = phase_delay_ri(lm, uvw, frequency, convention)
    real_dtype = jnp.finfo(out_dtype).dtype
    return lax.complex(k.re.astype(real_dtype), k.im.astype(real_dtype))
