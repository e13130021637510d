"""Direct Fourier transforms between source/pixel space and visibilities.

TPU-native equivalents of reference ``africanus/dft/kernels.py`` (im_to_vis:15,
vis_to_im:73). The reference's row/source/chan triple loops become matrix
products over the source dimension — exactly MXU-shaped: a (row × source)
phase matrix contracted against (source × corr) flux per channel. Complex
arithmetic is carried as split re/im real matmuls (TPUs have no complex
element type); the ``*_ri`` cores are pair-native and the complex-dtype
wrappers assemble at the API boundary.

For large problems run the cores under ``shard_map`` with rows sharded
across the mesh (see ``africanus_tpu.parallel``); im_to_vis contracts the
source dimension locally (no collective), while vis_to_im needs a ``psum``
over the row-sharded axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from africanus_tpu.ops.cplx import Cplx, cplx
from africanus_tpu.utils.types import complex_dtype_for, real_dtype_for

__all__ = ["im_to_vis", "vis_to_im", "im_to_vis_ri", "vis_to_im_ri"]

# The fused Pallas kernel keeps its whole contraction axis (sources for
# the forward DFT, rows for the swapped adjoint) resident in VMEM:
# roughly (2 + 2·ncorr)·N·128·4 bytes double-buffered against the
# ~16 MB budget. 2048 keeps 4-corr problems comfortably inside.
_PALLAS_MAX_CONTRACT = 2048


def _dft_phase(uvw, lm, frequency, convention, real_dtype):
    """(source, row, chan) phase via the shared compensated pipeline.

    Delegates to :func:`africanus_tpu.rime.phase.reduced_phase`: at f32
    the 1e4-rad phases are carried as two-floats and reduced mod 2π
    (plain products and bf16 matmuls are both catastrophic there).
    """
    from africanus_tpu.rime.phase import reduced_phase

    return reduced_phase(lm, uvw, frequency, convention,
                         real_dtype=real_dtype)




def _pallas_dft_disabled():
    """Operational escape hatch: AFRICANUS_TPU_DISABLE_PALLAS_DFT=1
    reverts the default routing to the einsum formulation (explicit
    ``use_pallas=True`` still wins)."""
    import os

    return os.environ.get("AFRICANUS_TPU_DISABLE_PALLAS_DFT", "") not in (
        "", "0"
    )


def _measured_delay_max(dot_hi):
    """max |geometric delay| measured from a concrete delay array, or
    None when traced (the kernel then uses its documented default bound
    for the residual-mode engagement; see ops/pallas_dft.py)."""
    import jax

    if isinstance(dot_hi, jax.core.Tracer):
        return None
    if dot_hi.size == 0:
        return 1e-12
    # reduce on device, fetch one scalar (a full-array fetch through the
    # TPU tunnel would dwarf the planning cost on the eager path)
    return max(float(jnp.max(jnp.abs(dot_hi))), 1e-12)


def im_to_vis_ri(
    image, uvw, lm, frequency, convention: str = "fourier",
    real_dtype=None, use_pallas: bool | None = None,
    interpret: bool = False, delay_max=None,
) -> Cplx:
    """Pair-native DFT predict: V[r,ν,c] = Σ_s e^{iφ(s,r,ν)} · I[s,ν,c].

    Parameters
    ----------
    image : (source, chan, corr) real array or Cplx pair
    uvw : (row, 3); lm : (source, 2); frequency : (chan,)
    use_pallas : route through the fused Pallas predict kernel (default:
        exactly on TPU at f32) — the DFT is the envelope-free K×B chain,
        and the kernel avoids materialising the (src, row, chan) cos/sin
        grids in HBM. Inputs are zero-padded to the kernel tiles.
    delay_max : bound on |geometric delay| (s) governing the fused
        kernel's nearly-uniform-grid fast path. Measured from the
        inputs when they are concrete; under jit it defaults to 1e-4 s
        (≈300 km baselines at |l| = 0.1) — VLBI-scale callers should
        pass their true bound (see ops/pallas_dft.py).

    Returns
    -------
    Cplx with (row, chan, corr) components.
    """
    uvw = jnp.asarray(uvw)
    lm = jnp.asarray(lm)
    # keep the caller's frequency object: jnp.asarray under jit turns a
    # closed-over numpy grid into a (constant) tracer, which would lock
    # the fused kernels out of their trace-time recurrence modes
    freq_raw = frequency
    frequency = jnp.asarray(frequency)

    if convention not in ("fourier", "casa"):
        raise ValueError("convention must be 'fourier' or 'casa', not in standard set")

    img = cplx(image)
    if real_dtype is None:
        real_dtype = jnp.result_type(
            img.re.dtype, uvw.dtype, lm.dtype, frequency.dtype
        )

    if use_pallas is None:
        # on-TPU f32 always has a fused route: the channel-lane predict
        # kernel when channels fill the 128-lane axis and the source
        # axis fits VMEM, the row-lane forward-DFT kernel (rotation
        # recurrence over channel groups, streamed source axis)
        # otherwise. CPU keeps the einsum (pallas interpret is slow).
        use_pallas = (
            jax.default_backend() == "tpu"
            and jnp.dtype(real_dtype) == jnp.float32
            and not _pallas_dft_disabled()
        )
    if use_pallas:
        from africanus_tpu.rime.phase import phase_dot_cycles

        nsrc = lm.shape[0]
        nrow = uvw.shape[0]
        nchan = frequency.shape[0]
        dot_hi, dot_lo = phase_dot_cycles(lm, uvw, convention)
        b = Cplx(img.re.astype(jnp.float32), img.im.astype(jnp.float32))

        if nchan >= 128 and nsrc <= _PALLAS_MAX_CONTRACT:
            from africanus_tpu.ops.pallas_predict import predict_kb_pallas

            spad = (-nsrc) % 8
            rpad = (-nrow) % 128
            cpad = (-nchan) % 128
            if spad or rpad:
                dot_hi = jnp.pad(dot_hi, ((0, spad), (0, rpad)))
                dot_lo = jnp.pad(dot_lo, ((0, spad), (0, rpad)))
            if spad or cpad:
                b = Cplx(jnp.pad(b.re, ((0, spad), (0, cpad), (0, 0))),
                         jnp.pad(b.im, ((0, spad), (0, cpad), (0, 0))))
            freq_p = jnp.pad(frequency.astype(jnp.float32), (0, cpad))
            out = predict_kb_pallas((dot_hi, dot_lo), None, None, freq_p,
                                    freq_p * 0, b, interpret=interpret)
            return Cplx(out.re[:nrow, :nchan], out.im[:nrow, :nchan])

        from africanus_tpu.ops.pallas_dft import dft_forward_pallas

        # real-sky detection must precede the cplx() coercion: under
        # jit the coerced zero imaginary part is a tracer
        real_sky = not isinstance(image, Cplx) and not jnp.issubdtype(
            jnp.asarray(image).dtype, jnp.complexfloating
        )
        dmax = (delay_max if delay_max is not None
                else _measured_delay_max(dot_hi))
        kw = {} if dmax is None else dict(delay_max=dmax)
        return dft_forward_pallas((dot_hi, dot_lo), freq_raw, b,
                                  interpret=interpret,
                                  imag_zero=real_sky or None, **kw)

    p = _dft_phase(uvw, lm, frequency, convention, real_dtype)
    cos_p = jnp.cos(p)
    sin_p = jnp.sin(p)

    ire = img.re.astype(real_dtype)
    iim = img.im.astype(real_dtype)

    # (e^{ip} · I): four real source-contractions on the MXU
    def dot(k, x):
        return jnp.einsum("srf,sfc->rfc", k, x, precision=lax.Precision.HIGHEST)

    re = dot(cos_p, ire) - dot(sin_p, iim)
    im = dot(sin_p, ire) + dot(cos_p, iim)
    return Cplx(re, im)


def im_to_vis(image, uvw, lm, frequency, convention: str = "fourier", dtype=None):
    """Direct-Fourier predict, complex output (reference
    ``dft/kernels.py:15``): V[r,f,c] = sum_s e^{i phi(s,r,f)} I[s,f,c].

    Complex-capable backends only (CPU); on TPU use :func:`im_to_vis_ri`.

    Parameters
    ----------
    image : (src, chan, corr) float flux
    uvw : (row, 3) float metres
    lm : (src, 2) float direction cosines
    frequency : (chan,) float Hz
    convention : {"fourier", "casa"} — sign of the exponent
    dtype : optional complex output dtype (default inferred)

    Returns
    -------
    (row, chan, corr) complex visibilities.
    """
    out_dtype = (
        jnp.dtype(dtype)
        if dtype is not None
        else complex_dtype_for(image, uvw, lm, frequency)
    )
    real_dtype = jnp.finfo(out_dtype).dtype
    v = im_to_vis_ri(image, uvw, lm, frequency, convention, real_dtype=real_dtype)
    return lax.complex(v.re.astype(real_dtype), v.im.astype(real_dtype))


def vis_to_im_ri(
    vis, uvw, lm, frequency, flags, convention: str = "fourier",
    real_dtype=None, use_pallas: bool | None = None,
    interpret: bool = False, delay_max=None,
):
    """Pair-native adjoint DFT.

    I[s,ν,c] = Σ_r Re( e^{iφ(s,r,ν)} · V[r,ν,c] ); any (row, chan) cell in
    which *any* correlation is flagged is excluded entirely (reference
    ``dft/kernels.py:124-139`` drops the whole row-chan to avoid mixing
    Stokes terms).

    ``use_pallas`` selects the fused pixel-lane adjoint kernel
    (``ops/pallas_dft.dft_adjoint_pallas``): pixels on lanes, the row
    contraction in registers, per-channel-group phase recurrence for
    ~uniform frequency grids. Default (None): on for TPU backends at
    f32 with ≤ 64 channels — the regime where the einsum path is
    bandwidth-bound on its materialised per-channel cos/sin
    (pixel, row) matrices; the einsum elsewhere. ``delay_max`` as in
    :func:`im_to_vis_ri`.

    Returns
    -------
    (source, chan, corr) real array.
    """
    uvw = jnp.asarray(uvw)
    lm = jnp.asarray(lm)
    freq_raw = frequency  # pre-coercion (see im_to_vis_ri)
    frequency = jnp.asarray(frequency)
    flags = jnp.asarray(flags)

    if convention not in ("fourier", "casa"):
        raise ValueError("convention must be 'fourier' or 'casa', not in standard set")

    v = cplx(vis)
    if real_dtype is None:
        real_dtype = jnp.result_type(v.re.dtype, uvw.dtype, lm.dtype, frequency.dtype)

    # Zero out (row, chan) cells where any correlation is flagged
    unflagged = ~jnp.any(flags != 0, axis=-1)  # (row, chan)
    mask = unflagged[:, :, None].astype(real_dtype)
    vr = v.re.astype(real_dtype) * mask
    vi = v.im.astype(real_dtype) * mask

    # the adjoint conjugates the kernel: flip the phase convention
    flipped = "casa" if convention == "fourier" else "fourier"

    nchan = frequency.shape[0]
    if use_pallas is None:
        # the pixel-lane fused kernel (ops/pallas_dft.py) wins whenever
        # the einsum would be bandwidth-bound on materialised cos/sin
        # (pixel, row) matrices — i.e. real TPU backends at few-channel
        # imaging shapes (the channel loop is fully unrolled, so gate
        # the count). CPU keeps the einsum (pallas interpret is slow).
        use_pallas = (
            jax.default_backend() == "tpu"
            and nchan <= 64
            and jnp.dtype(real_dtype) == jnp.float32
            and not _pallas_dft_disabled()
        )
    if use_pallas:
        from africanus_tpu.ops.pallas_dft import dft_adjoint_pallas
        from africanus_tpu.rime.phase import phase_dot_cycles

        dot_hi, dot_lo = phase_dot_cycles(lm, uvw, flipped)
        dmax = (delay_max if delay_max is not None
                else _measured_delay_max(dot_hi))
        kw = {} if dmax is None else dict(delay_max=dmax)
        out = dft_adjoint_pallas(
            (dot_hi.T, dot_lo.T), freq_raw,
            Cplx(vr.astype(jnp.float32), vi.astype(jnp.float32)),
            interpret=interpret, **kw,
        )
        return out.astype(real_dtype)

    p = _dft_phase(uvw, lm, frequency, flipped, real_dtype)

    # Re(e^{ip} V) = cos(p)·Re(V) − sin(p)·Im(V); contract rows on the MXU
    def dot(k, x):
        return jnp.einsum("srf,rfc->sfc", k, x, precision=lax.Precision.HIGHEST)

    return dot(jnp.cos(p), vr) - dot(jnp.sin(p), vi)


def vis_to_im(vis, uvw, lm, frequency, flags, convention: str = "fourier", dtype=None):
    """Adjoint DFT with reference dtype semantics ((source, chan, corr) real)."""
    if dtype is not None:
        out_dtype = jnp.dtype(dtype)
        if jnp.issubdtype(out_dtype, jnp.complexfloating):
            raise TypeError("dtype must be real")
    else:
        out_dtype = real_dtype_for(vis, uvw, lm, frequency)

    out = vis_to_im_ri(vis, uvw, lm, frequency, flags, convention, real_dtype=out_dtype)
    return out.astype(out_dtype)
