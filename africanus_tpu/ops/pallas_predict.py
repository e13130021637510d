"""Fused Pallas RIME predict kernel.

The hot loop of BASELINE config 2 (phase delay × gaussian envelope ×
brightness, summed over sources — reference predict.py:199-252 /
predict.cu.j2). The XLA einsum formulation materialises the
(source, row, chan) K and envelope intermediates in HBM (~GBs of traffic
at MeerKAT scale); this kernel tiles (row, chan), loops over source blocks
in VMEM, and fuses phase → sin/cos → envelope → per-correlation complex
accumulation, so HBM sees only the small inputs and the output tile.

Layout notes (see pallas guide): tiles are (ROW_TILE, CHAN_TILE) =
(128, 128) f32; the source-block contraction is a (TF-batched) dot_general
on the MXU; correlations live in an outer static loop (≤4).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from africanus_tpu.ops.cplx import Cplx

__all__ = ["predict_kb_pallas", "predict_kb_pallas_srclane"]


def _predict_kernel(*refs, src_block, have_env, compensated,
                    blocked=False):
    """One (row_tile, chan_tile) output tile; loop over source blocks.

    With ``blocked`` the grid carries a third (innermost, sequential)
    dimension over outer source tiles and this invocation accumulates
    its partial sum into the revisited output block (the canonical
    Pallas contraction-blocking pattern) — the source axis then no
    longer needs to fit in VMEM whole.
    """
    it = iter(refs)
    dot_ref = next(it)
    dlo_ref = next(it) if compensated else None
    u1_ref = next(it) if have_env else None
    v1_ref = next(it) if have_env else None
    freq_ref, sfreq_ref, bre_ref, bim_ref = (next(it) for _ in range(4))
    out_re_ref, out_im_ref = next(it), next(it)

    nsrc = dot_ref.shape[0]
    nblocks = nsrc // src_block

    freq = freq_ref[0, :]  # (TF,)
    sfreq = sfreq_ref[0, :]
    if compensated:
        from africanus_tpu.ops.dfloat import _r, split as df_split

        fhh, fhl = df_split(freq)

    def body(blk, acc):
        acc_re, acc_im = acc
        s0 = blk * src_block

        dot = dot_ref[pl.ds(s0, src_block), :]  # (SB, TR)
        if compensated:
            # two-float cycles: p + e carries ~48 bits; reduce mod 1
            # cycle so sin/cos see a small residual (see ops/dfloat.py)
            dlo = dlo_ref[pl.ds(s0, src_block), :]
            dhh, dhl = df_split(dot)
            p = _r(dot[:, :, None] * freq[None, None, :])  # (SB, TR, TF)
            e = _r(_r(
                _r(_r(dhh[:, :, None] * fhh) - p)
                + _r(dhh[:, :, None] * fhl)
                + _r(dhl[:, :, None] * fhh)
            ) + _r(dhl[:, :, None] * fhl))
            e = _r(e + _r(dlo[:, :, None] * freq[None, None, :]))
            p = (2.0 * jnp.pi) * _r(_r(p - jnp.round(p)) + e)
        else:
            p = dot[:, :, None] * freq[None, None, :]  # (SB, TR, TF)
        kre = jnp.cos(p)
        kim = jnp.sin(p)

        if have_env:
            u1 = u1_ref[pl.ds(s0, src_block), :]
            v1 = v1_ref[pl.ds(s0, src_block), :]
            fu = u1[:, :, None] * sfreq[None, None, :]
            fv = v1[:, :, None] * sfreq[None, None, :]
            env = jnp.exp(-(fu * fu + fv * fv))
            kre = kre * env
            kim = kim * env

        # contract the source block per correlation on the VPU
        # (Mosaic lacks mismatched-batch dot_general; SB and C are small)
        new_re = []
        new_im = []
        for c in range(len(acc_re)):
            brc = bre_ref[c, pl.ds(s0, src_block), :][:, None, :]  # (SB,1,TF)
            bic = bim_ref[c, pl.ds(s0, src_block), :][:, None, :]
            new_re.append(acc_re[c] + (kre * brc - kim * bic).sum(axis=0))
            new_im.append(acc_im[c] + (kre * bic + kim * brc).sum(axis=0))
        return tuple(new_re), tuple(new_im)

    tf, tr = freq.shape[0], dot_ref.shape[1]
    ncorr = bre_ref.shape[0]
    zeros = tuple(jnp.zeros((tr, tf), jnp.float32) for _ in range(ncorr))
    acc_re, acc_im = lax.fori_loop(0, nblocks, body, (zeros, zeros))

    if blocked:
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            for c in range(ncorr):
                out_re_ref[c] = acc_re[c]
                out_im_ref[c] = acc_im[c]

        @pl.when(k != 0)
        def _accum():
            for c in range(ncorr):
                out_re_ref[c] += acc_re[c]
                out_im_ref[c] += acc_im[c]
    else:
        for c in range(ncorr):
            out_re_ref[c] = acc_re[c]  # (C, TR, TF) corr-major layout
            out_im_ref[c] = acc_im[c]


def predict_kb_pallas(phase_dot, u1, v1, freq, scaled_freq, b: Cplx,
                      row_tile=128, chan_tile=128, src_block=8,
                      src_tile=None, interpret=False):
    """Fused K[×env]×B predict.

    Parameters
    ----------
    phase_dot : either a (src, row) f32 array — the 2π/c-scaled geometric
        delay, phase = dot·ν (legacy fast path) — or a two-float
        ``(hi, lo)`` pair of (src, row) f32 arrays in signed *seconds*
        (from :func:`africanus_tpu.rime.phase.phase_dot_cycles`): the
        phase is then 2π·frac(dot·ν), reduced in-kernel at ~48-bit
        precision (the compensated path; ~4 orders more accurate).
    u1, v1 : (src, row) f32 or None — gaussian-envelope coordinates
        (envelope = exp(−((u1·sf)² + (v1·sf)²))); pass None for points
    freq : (chan,) f32; scaled_freq : (chan,) f32 (gauss-scaled)
    b : Cplx (src, chan, corr) brightness
    src_tile : outer contraction tile. Default (None) keeps the whole
        source axis resident in VMEM per output tile (fastest, but caps
        nsrc at a few thousand); an explicit tile adds a sequential
        grid dimension over source tiles with output-block accumulation,
        so the contraction axis can be arbitrarily deep (the adjoint
        DFT contracts *rows* through this axis — see dft/kernels.py).

    Returns
    -------
    Cplx (row, chan, corr) visibilities.

    Shapes must tile exactly: row % row_tile == chan % chan_tile ==
    src % src_block == 0 (pad inputs with zero-flux sources / dummy rows).
    """
    compensated = isinstance(phase_dot, (tuple, list))
    if compensated:
        phase_dot, phase_dot_lo = phase_dot
    else:
        phase_dot_lo = None
    nsrc, nrow = phase_dot.shape
    nchan = freq.shape[0]
    ncorr = b.re.shape[2]
    have_env = u1 is not None

    if nrow % row_tile or nchan % chan_tile or nsrc % src_block:
        raise ValueError(
            f"shapes (src={nsrc}, row={nrow}, chan={nchan}) must be "
            f"divisible by (src_block={src_block}, row_tile={row_tile}, "
            f"chan_tile={chan_tile})"
        )
    blocked = src_tile is not None and src_tile < nsrc
    if blocked and (nsrc % src_tile or src_tile % src_block):
        raise ValueError(
            f"src_tile={src_tile} must divide nsrc={nsrc} and be a "
            f"multiple of src_block={src_block}"
        )
    stile = src_tile if blocked else nsrc

    grid = (nrow // row_tile, nchan // chan_tile)
    if blocked:
        grid = grid + (nsrc // stile,)

    kernel = partial(_predict_kernel, src_block=src_block,
                     have_env=have_env, compensated=compensated,
                     blocked=blocked)

    # corr-major device layouts: a trailing corr dim of 4 would be padded
    # to the 128-lane tile, inflating VMEM 32x
    out_shape = [
        jax.ShapeDtypeStruct((ncorr, nrow, nchan), jnp.float32),
        jax.ShapeDtypeStruct((ncorr, nrow, nchan), jnp.float32),
    ]

    if blocked:
        src_row = lambda i, j, k: (k, i)      # noqa: E731
        chan_vec = lambda i, j, k: (0, j)     # noqa: E731
        bidx = lambda i, j, k: (0, k, j)      # noqa: E731
        oidx = lambda i, j, k: (0, i, j)      # noqa: E731
    else:
        src_row = lambda i, j: (0, i)         # noqa: E731
        chan_vec = lambda i, j: (0, j)        # noqa: E731
        bidx = lambda i, j: (0, 0, j)         # noqa: E731
        oidx = lambda i, j: (0, i, j)         # noqa: E731

    # declare only the (src, row) planes the kernel's static flags will
    # read: zero-filled dlo/u1/v1 stand-ins were DMA'd per grid step (4x
    # the (src, row) HBM traffic and VMEM footprint on the legacy
    # point-source path)
    sr_spec = pl.BlockSpec((stile, row_tile), src_row,
                           memory_space=pltpu.VMEM)
    in_specs = [sr_spec]  # phase_dot (hi)
    if compensated:
        in_specs.append(sr_spec)  # phase_dot (lo)
    if have_env:
        in_specs += [sr_spec, sr_spec]  # u1, v1
    in_specs += [
        pl.BlockSpec((1, chan_tile), chan_vec,
                     memory_space=pltpu.VMEM),  # freq
        pl.BlockSpec((1, chan_tile), chan_vec,
                     memory_space=pltpu.VMEM),  # scaled_freq
        pl.BlockSpec((ncorr, stile, chan_tile), bidx,
                     memory_space=pltpu.VMEM),  # b.re (corr-major)
        pl.BlockSpec((ncorr, stile, chan_tile), bidx,
                     memory_space=pltpu.VMEM),  # b.im
    ]
    out_specs = [
        pl.BlockSpec((ncorr, row_tile, chan_tile), oidx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ncorr, row_tile, chan_tile), oidx,
                     memory_space=pltpu.VMEM),
    ]

    flops = 2 * nsrc * nrow * nchan * (4 * ncorr + 8)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (3 * nsrc * nrow + 2 * nchan
                                + 2 * nsrc * nchan * ncorr
                                + 2 * nrow * nchan * ncorr),
            transcendentals=3 * nsrc * nrow * nchan,
        ),
    )(
        phase_dot.astype(jnp.float32),
        *((phase_dot_lo.astype(jnp.float32),) if compensated else ()),
        *((u1.astype(jnp.float32), v1.astype(jnp.float32))
          if have_env else ()),
        freq.astype(jnp.float32).reshape(1, -1),
        scaled_freq.astype(jnp.float32).reshape(1, -1),
        b.re.astype(jnp.float32).transpose(2, 0, 1),
        b.im.astype(jnp.float32).transpose(2, 0, 1),
    )
    return Cplx(out_re.transpose(1, 2, 0), out_im.transpose(1, 2, 0))


def _predict_srclane_kernel(freq_ref, sfreq_ref, dot_ref, dlo_ref,
                            u1_ref, v1_ref, b8_ref, out_ref, *,
                            chan_tile, ncorr, have_env, compensated,
                            precision):
    """One (row_tile, chan_tile·2C) output block; sources on lanes.

    The dual of :func:`_predict_kernel`'s layout: phases/envelopes are
    computed on (row, src) tiles per channel and the source contraction
    is a REAL MXU dot (row, src) @ (src, 2C) — replacing the VPU
    per-correlation multiply-sum that dominates the row/chan-tile
    kernel's issue budget. The channel loop is unrolled (dynamic lane
    slicing of the output is unsupported on Mosaic).
    """
    from africanus_tpu.ops.dfloat import _r, split as df_split

    j0 = pl.program_id(1) * chan_tile
    dot = dot_ref[...]                        # (TR, S)
    if compensated:
        dlo = dlo_ref[...]
        dhh, dhl = df_split(dot)
    if have_env:
        u1 = u1_ref[...]
        v1 = v1_ref[...]
    twoc = 2 * ncorr
    dims = (((1,), (0,)), ((), ()))           # (TR,S) @ (S,2C)

    for j in range(chan_tile):
        f = freq_ref[0, j0 + j]
        if compensated:
            fhh, fhl = df_split(f)
            p = _r(dot * f)                   # (TR, S) cycles (rounded)
            e = _r(_r(
                _r(_r(dhh * fhh) - p)
                + _r(dhh * fhl)
                + _r(dhl * fhh)
            ) + _r(dhl * fhl))
            e = _r(e + _r(dlo * f))
            p = (2.0 * jnp.pi) * _r(_r(p - jnp.round(p)) + e)
        else:
            p = dot * f
        kre = jnp.cos(p)
        kim = jnp.sin(p)
        if have_env:
            sf = sfreq_ref[0, j0 + j]
            fu = u1 * sf
            fv = v1 * sf
            env = jnp.exp(-(fu * fu + fv * fv))
            kre = kre * env
            kim = kim * env
        b8 = b8_ref[j]                        # (S, 2C) = [re·C | im·C]
        d1 = lax.dot_general(kre, b8, dims, precision=precision,
                             preferred_element_type=jnp.float32)
        d2 = lax.dot_general(kim, b8, dims, precision=precision,
                             preferred_element_type=jnp.float32)
        out_re = d1[:, :ncorr] - d2[:, ncorr:]          # (TR, C)
        out_im = d1[:, ncorr:] + d2[:, :ncorr]
        out_ref[:, j * twoc : (j + 1) * twoc] = jnp.concatenate(
            [out_re, out_im], axis=1
        )


def predict_kb_pallas_srclane(phase_dot, u1, v1, freq, scaled_freq,
                              b: Cplx, row_tile=128, chan_tile=16,
                              precision=None, interpret=False):
    """Fused K[×env]×B predict with sources on lanes (MXU contraction).

    Same contract as :func:`predict_kb_pallas` (reference
    rime/predict.py:199-252 hot loop); the (src,) axis is padded to a
    lane multiple and contracted on the MXU per channel, so the
    per-correlation accumulation leaves the VPU issue budget entirely.
    Measured intent: the row/chan-tile kernel spends ~36% of its
    roofline slots on the VPU multiply-sum this dot replaces.

    Returns Cplx (row, chan, corr) visibilities. nrow % row_tile and
    nchan % chan_tile must be 0 (pad rows/chans); sources are padded
    internally with zero flux.
    """
    compensated = isinstance(phase_dot, (tuple, list))
    if compensated:
        phase_dot, phase_dot_lo = phase_dot
    else:
        phase_dot_lo = None
    nsrc, nrow = phase_dot.shape
    nchan = freq.shape[0]
    ncorr = b.re.shape[2]
    have_env = u1 is not None
    twoc = 2 * ncorr

    if nrow % row_tile or nchan % chan_tile:
        raise ValueError(
            f"shapes (row={nrow}, chan={nchan}) must be divisible by "
            f"(row_tile={row_tile}, chan_tile={chan_tile})"
        )
    s_pad = (-nsrc) % 128

    def padT(a):  # (src, row) -> (row, src_padded)
        a = a.astype(jnp.float32).T
        return jnp.pad(a, ((0, 0), (0, s_pad))) if s_pad else a

    dotT = padT(phase_dot)
    dloT = padT(phase_dot_lo) if compensated else dotT  # inert stand-in
    u1T = padT(u1) if have_env else dotT                # inert stand-in
    v1T = padT(v1) if have_env else dotT
    S = nsrc + s_pad

    # (chan, S, 2C) channel-major brightness, [re·C | im·C] lanes
    b8 = jnp.concatenate(
        [b.re.astype(jnp.float32), b.im.astype(jnp.float32)], axis=2
    ).transpose(1, 0, 2)
    if s_pad:
        b8 = jnp.pad(b8, ((0, 0), (0, s_pad), (0, 0)))

    kernel = partial(
        _predict_srclane_kernel, chan_tile=chan_tile, ncorr=ncorr,
        have_env=have_env, compensated=compensated,
        precision=precision or lax.Precision.HIGHEST,
    )

    grid = (nrow // row_tile, nchan // chan_tile)
    sr = pl.BlockSpec((row_tile, S), lambda i, j: (i, 0),
                      memory_space=pltpu.VMEM)
    chan_smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    b_spec = pl.BlockSpec((chan_tile, S, twoc), lambda i, j: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((row_tile, chan_tile * twoc),
                            lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[chan_smem, chan_smem, sr, sr, sr, sr, b_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nrow, nchan * twoc), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nsrc * nrow * nchan * (4 * ncorr + 8),
            bytes_accessed=4 * (4 * nsrc * nrow + 2 * nchan
                                + 2 * nsrc * nchan * ncorr
                                + nrow * nchan * twoc),
            transcendentals=3 * nsrc * nrow * nchan,
        ),
    )(
        freq.astype(jnp.float32).reshape(1, -1),
        scaled_freq.astype(jnp.float32).reshape(1, -1),
        dotT, dloT, u1T, v1T, b8,
    )
    out = out.reshape(nrow, nchan, twoc)
    return Cplx(out[:, :, :ncorr], out[:, :, ncorr:])
