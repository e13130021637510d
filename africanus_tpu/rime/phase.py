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
from africanus_tpu.ops.cplx import Cplx, expi
from africanus_tpu.utils.types import complex_dtype_for

__all__ = ["phase_delay", "phase_delay_ri"]


def _real_phase(lm, uvw, frequency, convention, real_dtype):
    if convention == "fourier":
        constant = minus_two_pi_over_c
    elif convention == "casa":
        constant = -minus_two_pi_over_c
    else:
        raise ValueError("convention not in ('fourier', 'casa')")

    l = lm[:, 0].astype(real_dtype)  # noqa: E741
    m = lm[:, 1].astype(real_dtype)
    n = jnp.sqrt(jnp.maximum(1.0 - l * l - m * m, 0.0)) - 1.0

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


def phase_delay_ri(lm, uvw, frequency, convention: str = "fourier") -> Cplx:
    """TPU-native K term as a split (re, im) pair.

    Parameters
    ----------
    lm : (source, 2) array
    uvw : (row, 3) array
    frequency : (chan,) array
    convention : {"fourier", "casa"}

    Returns
    -------
    Cplx with (source, row, chan) components.
    """
    lm = jnp.asarray(lm)
    uvw = jnp.asarray(uvw)
    frequency = jnp.asarray(frequency)
    real_dtype = jnp.result_type(lm.dtype, uvw.dtype, frequency.dtype)
    p = _real_phase(lm, uvw, frequency, convention, real_dtype)
    return expi(p)


def phase_delay(lm, uvw, frequency, convention: str = "fourier"):
    """Complex-dtype K term: (source, row, chan) complex array.

    Sign convention: e^{-2πi…} for "fourier", e^{+2πi…} for "casa".
    """
    out_dtype = complex_dtype_for(lm, uvw, frequency)
    k = phase_delay_ri(lm, uvw, frequency, convention)
    real_dtype = jnp.finfo(out_dtype).dtype
    return lax.complex(k.re.astype(real_dtype), k.im.astype(real_dtype))
