"""Pallas beam-cube interpolation kernel (TPU gather replacement).

The beam DDE samples a (lw, mh, nud, corr) complex cube at millions of
(src, time, ant, chan) coordinates. The XLA formulation is 8 trilinear
gathers, and TPU gathers cap around ~5e8 elements/s — the measured chain
ran at ~8 Msamples/s (benchmarks/RESULTS.md, round 1). The reference
dedicates two CUDA kernels to this (rime/cuda/beam.cu.j2:1-280,
beam_freq_interp.cu.j2; launcher cuda/beam.py:171).

TPU-native design — the idiomatic TPU gather is a one-hot matmul:

1. Frequency interpolation happens per *channel* (coordinates of one
   channel all read the same two frequency slabs): the kernel grid is
   (chan, sample-tiles), the two slabs arrive via scalar-prefetched
   block indices, and their blend is one VPU axpy.
2. The l axis is gathered on the MXU: a (TILE, lw) two-tap one-hot
   weight matrix (rows built in-register from floor/frac of the l
   coordinate) multiplies the (lw, mh·3C) slab, interpolating *rows* of
   the cube for every sample in one dot.
3. The m axis is then a two-tap weighted mask over lanes (lane→(m, k)
   decoded from an iota) followed by 3C masked reductions.

Per (l, m) cell the slab carries 3C lanes: C real, C imag, and C
|value| lanes, so the amplitude-preserving normalisation of the
reference (fast_beam_cubes.py:224-233) — interpolated mean amplitude
re-scaling the complex interpolant — falls out of the same matmul.

Coordinate transforms (freq scaling, pointing error, parallactic
rotation, antenna scaling, edge clamping) stay in XLA: they are cheap
fused elementwise work producing the (chan, nsamp) vl/vm arrays this
kernel consumes (see rime/fast_beam_cubes.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["beam_interp_pallas", "beam_blend_fr_pallas",
           "beam_blend_cell_fr_pallas", "prepare_beam_slabs"]


def _round_up(x, m):
    return -(-x // m) * m


def prepare_beam_slabs(beam_re, beam_im):
    """Pack a (lw, mh, nud, C) cube pair into kernel slabs.

    Returns (slabs, lw, mh, C): slabs is (nud, lwp, mh·3C padded)
    float32 with per-cell lane layout [re·C | im·C | amp·C].
    """
    lw, mh, nud, ncorr = beam_re.shape
    amp = jnp.sqrt(beam_re * beam_re + beam_im * beam_im)
    # (nud, lw, mh, 3C)
    cube = jnp.concatenate(
        [
            jnp.moveaxis(beam_re, 2, 0),
            jnp.moveaxis(beam_im, 2, 0),
            jnp.moveaxis(amp, 2, 0),
        ],
        axis=-1,
    ).astype(jnp.float32)
    mhc = mh * 3 * ncorr
    mhc_p = _round_up(mhc, 128)
    lwp = _round_up(lw, 8)
    cube = cube.reshape(nud, lw, mhc)
    cube = jnp.pad(cube, ((0, 0), (0, lwp - lw), (0, mhc_p - mhc)))
    return cube, lw, mh, ncorr


def _beam_kernel(gc0_ref, gc1_ref, wlo_ref, mi_ref, ki_ref, vl_ref,
                 vm_ref, slab0_ref, slab1_ref, out_ref, *, lw, mh, ncorr,
                 tile, mhc_p, normalize, dot_precision="highest"):
    c = pl.program_id(0)
    k3 = 3 * ncorr
    prec = (lax.Precision.HIGHEST if dot_precision == "highest"
            else lax.Precision.HIGH)

    def dot3(a, b):
        """Near-f32 matmul. HIGHEST = 6 bf16 passes (exact f32);
        HIGH = 3 passes (~2x the MXU rate, error measured ~1e-6 on the
        two-hot gather — within the beam parity budget). A hand-rolled
        bf16x2 split (4 passes) caps at ~2^-17 relative — outside the
        1e-5 budget; DEFAULT (1 pass) is ~4e-3."""
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )

    w0 = wlo_ref[c]
    slab = w0 * slab0_ref[0] + (1.0 - w0) * slab1_ref[0]  # (lwp, mhc_p)

    vl = vl_ref[0, 0, 0, :]  # (TILE,)
    vm = vm_ref[0, 0, 0, :]

    l0 = jnp.floor(vl)
    ld = vl - l0
    l0i = l0.astype(jnp.int32)
    l1i = jnp.minimum(l0i + 1, lw - 1)

    lwp = slab.shape[0]
    li = lax.broadcasted_iota(jnp.int32, (tile, lwp), 1)
    wl = jnp.where(li == l0i[:, None], (1.0 - ld)[:, None], 0.0) + jnp.where(
        li == l1i[:, None], ld[:, None], 0.0
    )
    # MXU row-gather+blend: every sample's two l-rows in one dot
    t = dot3(wl, slab)  # (TILE, mhc_p)

    m0 = jnp.floor(vm)
    md = vm - m0
    m0i = m0.astype(jnp.int32)
    m1i = jnp.minimum(m0i + 1, mh - 1)

    # lane → m map precomputed on the host (integer div-by-3C in-kernel
    # is a VPU serial chain); padding lanes carry m = -1 → weight 0
    mi = mi_ref[0, :][None, :]  # (1, mhc_p)
    wm = jnp.where(mi == m0i[:, None], (1.0 - md)[:, None], 0.0) + jnp.where(
        mi == m1i[:, None], md[:, None], 0.0
    )
    p = t * wm  # (TILE, mhc_p)

    # 3C masked lane-reductions against the constant lane→k map (cheap
    # VPU passes; an MXU one-hot selector dot measured no faster)
    ki = ki_ref[0, :][None, :]
    sums = [
        jnp.sum(jnp.where(ki == k, p, 0.0), axis=1) for k in range(k3)
    ]

    if normalize:
        for corr in range(ncorr):
            sre = sums[corr]
            sim = sums[ncorr + corr]
            amp = sums[2 * ncorr + corr]
            div = jnp.sqrt(sre * sre + sim * sim)
            norm = jnp.where(
                div == 0.0, amp, amp / jnp.where(div == 0.0, 1.0, div)
            )
            out_ref[0, corr, 0, :] = sre * norm
            out_ref[0, corr + ncorr, 0, :] = sim * norm
    else:
        for k in range(k3):
            out_ref[0, k, 0, :] = sums[k]


def beam_interp_pallas(slabs, lw, mh, ncorr, vl, vm, gc0, gc1, wlo,
                       tile=256, interpret=False, normalize=True,
                       dot_precision="highest"):
    """Interpolate freq-blended beam slabs at (chan, nsamp) coordinates.

    Parameters
    ----------
    slabs : (nud, lwp, mhc_p) f32 from :func:`prepare_beam_slabs`.
    lw, mh, ncorr : true cube extents / correlation count.
    vl, vm : (nchan, nsamp) f32 cube coordinates, already clamped to
        [0, lw−1] / [0, mh−1].
    gc0, gc1 : (nchan,) int32 lower/upper frequency slab indices.
    wlo : (nchan,) f32 weight of the lower slab.
    tile : samples per kernel invocation (lane tile).
    normalize : apply the amplitude-preserving normalisation in-kernel.
        Pass False to get the raw (re, im, amp) interpolants — the
        chan-invariant fast path blends those over frequency in XLA and
        normalises afterwards.

    Returns
    -------
    (2C, nchan, nsamp) f32 — normalised re then im lanes — or, with
    ``normalize=False``, (3C, nchan, nsamp) raw re/im/amp sums.
    """
    nchan, nsamp = vl.shape
    nsamp_p = _round_up(nsamp, tile)
    if nsamp_p != nsamp:
        pad = ((0, 0), (0, nsamp_p - nsamp))
        vl = jnp.pad(vl, pad)
        vm = jnp.pad(vm, pad)
    ntiles = nsamp_p // tile
    mhc_p = slabs.shape[2]

    kernel = partial(_beam_kernel, lw=lw, mh=mh, ncorr=ncorr, tile=tile,
                     mhc_p=mhc_p, normalize=normalize,
                     dot_precision=dot_precision)
    nlanes = (2 if normalize else 3) * ncorr

    # (nchan, ntiles, 1, tile): trailing block dims (1, tile) satisfy
    # Mosaic's (equal-or-8, 128-multiple) block constraint
    vl = vl.reshape(nchan, ntiles, 1, tile)
    vm = vm.reshape(nchan, ntiles, 1, tile)
    coord = pl.BlockSpec((1, 1, 1, tile), lambda c, t, g0, g1: (c, t, 0, 0),
                         memory_space=pltpu.VMEM)

    # constant lane→(m, k) maps (VMEM-resident across the whole grid —
    # their block indices never change; in-kernel div-by-3C is serial)
    k3 = 3 * ncorr
    lanes = np.arange(mhc_p)
    valid = lanes < mh * k3
    mi_host = np.where(valid, lanes // k3, -1).astype(np.int32)
    ki_host = np.where(valid, lanes % k3, -1).astype(np.int32)
    mi_spec = pl.BlockSpec((1, mhc_p), lambda c, t, g0, g1: (0, 0),
                           memory_space=pltpu.VMEM)
    slab0 = pl.BlockSpec((1,) + slabs.shape[1:],
                         lambda c, t, g0, g1: (g0[c], 0, 0),
                         memory_space=pltpu.VMEM)
    slab1 = pl.BlockSpec((1,) + slabs.shape[1:],
                         lambda c, t, g0, g1: (g1[c], 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, nlanes, 1, tile),
                       lambda c, t, g0, g1: (c, 0, 0, t),
                       memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # gc0, gc1
        grid=(nchan, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # wlo
            mi_spec, mi_spec,
            coord, coord, slab0, slab1,
        ],
        out_specs=out,
    )

    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nchan, nlanes, 1, nsamp_p), jnp.float32
        ),
        interpret=interpret,
    )(
        jnp.asarray(gc0, jnp.int32),
        jnp.asarray(gc1, jnp.int32),
        jnp.asarray(wlo, jnp.float32),
        jnp.asarray(mi_host)[None, :],
        jnp.asarray(ki_host)[None, :],
        vl.astype(jnp.float32),
        vm.astype(jnp.float32),
        slabs,
        slabs,
    )
    # (nchan, nlanes, 1, nsamp_p) -> (nlanes, nchan, nsamp)
    return jnp.moveaxis(res[:, :, 0, :nsamp], 0, 1)


def _blend_fr_kernel(gc0_ref, wlo_ref, raw_ref, fre_ref, fim_ref,
                     out_re_ref, out_im_ref, *, ncorr, nud, s_tile,
                     c_tile, have_feed):
    """One (sample_tile, chan_tile) output block of the fused epilogue.

    blend(raw, freq weights) → amplitude-preserving norm → optional
    E·F 2x2 feed rotation, all VMEM-resident: HBM sees only the tiny
    inputs and the final (2C, s_tile, c_tile) output blocks.
    """
    k3 = 3 * ncorr

    # two-hot frequency-blend weights (nud, c_tile) from the per-chan
    # lower-slab index/weight vectors (freq_grid_interp layout)
    gc0 = gc0_ref[0, :]                      # (c_tile,) int32
    wlo = wlo_ref[0, :]                      # (c_tile,) f32
    ni = lax.broadcasted_iota(jnp.int32, (nud, c_tile), 0)
    wc = jnp.where(ni == gc0[None, :], wlo[None, :], 0.0) + jnp.where(
        ni == gc0[None, :] + 1, (1.0 - wlo)[None, :], 0.0
    )

    # blend: (3C·S, nud) @ (nud, c_tile) on the MXU — one dot for all
    # re/im/amp planes of the sample tile
    lhs = raw_ref[...].reshape(k3 * s_tile, nud)
    blend = lax.dot_general(
        lhs, wc, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(k3, s_tile, c_tile)

    # reference normalisation: phase from the complex interpolant,
    # amplitude from the interpolated |value| (fast_beam_cubes.py:224)
    e_re, e_im = [], []
    for c in range(ncorr):
        sre = blend[c]
        sim = blend[ncorr + c]
        amp = blend[2 * ncorr + c]
        div = jnp.sqrt(sre * sre + sim * sim)
        norm = jnp.where(div == 0.0, amp,
                         amp / jnp.where(div == 0.0, 1.0, div))
        e_re.append(sre * norm)
        e_im.append(sim * norm)

    if not have_feed:
        for c in range(ncorr):
            out_re_ref[c] = e_re[c]
            out_im_ref[c] = e_im[c]
        return

    # E·F per sample: F entries are per-sample (sublane) columns
    # broadcast along the chan lanes. corr index c = 2i+j row-major.
    for i in range(2):
        for k in range(2):
            acc_re = jnp.zeros((s_tile, c_tile), jnp.float32)
            acc_im = jnp.zeros((s_tile, c_tile), jnp.float32)
            for j in range(2):
                er, ei = e_re[2 * i + j], e_im[2 * i + j]
                fr = fre_ref[2 * j + k]      # (s_tile, 1)
                fi = fim_ref[2 * j + k]
                acc_re += er * fr - ei * fi
                acc_im += er * fi + ei * fr
            out_re_ref[2 * i + k] = acc_re
            out_im_ref[2 * i + k] = acc_im


def _blend_cell_fr_kernel(gc0_ref, wlo_ref, bt_ref, lda_ref, mda_ref,
                          fre_ref, fim_ref, out_re_ref, out_im_ref, *,
                          ncorr, nud, s_tile, c_tile, have_feed):
    """One (sample_tile, chan_tile) block of the cell-residual epilogue.

    Like :func:`_blend_fr_kernel` but the per-slab interpolants are the
    FOUR bilinear cell coefficients [c00 | c10−c00 | c01−c00 |
    c11−c10−c01+c00] per re/im/amp plane: after the frequency blend the
    per-channel value is reconstructed exactly from the channel's
    in-cell fractional coordinates (lda, mda) —
    ``b0 + lda·b1 + mda·b2 + lda·mda·b3`` — before normalisation and
    the optional feed rotation. This is what lets per-channel pointing
    errors ride the chan-invariant interpolation cost (4·nud rows
    instead of nchan rows) whenever each sample's channels stay inside
    one (l, m) cube cell.
    """
    k3 = 3 * ncorr

    gc0 = gc0_ref[0, :]                      # (c_tile,) int32
    wlo = wlo_ref[0, :]                      # (c_tile,) f32
    ni = lax.broadcasted_iota(jnp.int32, (nud, c_tile), 0)
    wc = jnp.where(ni == gc0[None, :], wlo[None, :], 0.0) + jnp.where(
        ni == gc0[None, :] + 1, (1.0 - wlo)[None, :], 0.0
    )

    # blend all four term planes at once: (4·3C·S, nud) @ (nud, c_tile)
    lhs = bt_ref[...].reshape(4 * k3 * s_tile, nud)
    blend = lax.dot_general(
        lhs, wc, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(4, k3, s_tile, c_tile)

    lda = lda_ref[...]                       # (s_tile, c_tile)
    mda = mda_ref[...]
    lm = lda * mda
    e_re, e_im = [], []
    for c in range(ncorr):
        val = []
        for k in (c, ncorr + c, 2 * ncorr + c):   # re, im, amp planes
            val.append(blend[0, k] + lda * blend[1, k]
                       + mda * blend[2, k] + lm * blend[3, k])
        sre, sim, amp = val
        div = jnp.sqrt(sre * sre + sim * sim)
        norm = jnp.where(div == 0.0, amp,
                         amp / jnp.where(div == 0.0, 1.0, div))
        e_re.append(sre * norm)
        e_im.append(sim * norm)

    if not have_feed:
        for c in range(ncorr):
            out_re_ref[c] = e_re[c]
            out_im_ref[c] = e_im[c]
        return

    for i in range(2):
        for k in range(2):
            acc_re = jnp.zeros((s_tile, c_tile), jnp.float32)
            acc_im = jnp.zeros((s_tile, c_tile), jnp.float32)
            for j in range(2):
                er, ei = e_re[2 * i + j], e_im[2 * i + j]
                fr = fre_ref[2 * j + k]      # (s_tile, 1)
                fi = fim_ref[2 * j + k]
                acc_re += er * fr - ei * fi
                acc_im += er * fi + ei * fr
            out_re_ref[2 * i + k] = acc_re
            out_im_ref[2 * i + k] = acc_im


def beam_blend_cell_fr_pallas(bterms, lda, mda, gc0, wlo, feed=None,
                              s_tile=8, c_tile=512, interpret=False):
    """Fused frequency blend + per-channel cell reconstruction +
    normalisation [+ feed rotation].

    Parameters
    ----------
    bterms : (4·3C, nsamp, nud) f32 — per-slab bilinear cell
        coefficients, term-major: [c00 | c10−c00 | c01−c00 |
        c11−c10−c01+c00] × [re·C | im·C | amp·C].
    lda, mda : (nsamp, chan) f32 per-channel fractional coordinates
        inside the sample's cube cell (exact while 0 ≤ lda, mda ≤ 1).
    gc0 : (chan,) int32 lower slab index; wlo : (chan,) f32 its weight.
    feed : None or Cplx with (nsamp, 2, 2) components.

    Returns
    -------
    (out_re, out_im): each (C, nsamp, chan) f32.
    """
    k12, nsamp, nud = bterms.shape
    ncorr = k12 // 12
    nchan = gc0.shape[0]
    have_feed = feed is not None
    if have_feed and ncorr != 4:
        raise ValueError("feed rotation requires 2x2 (ncorr=4) beams")
    if lda.shape != (nsamp, nchan) or mda.shape != (nsamp, nchan):
        raise ValueError(
            f"lda/mda must be (nsamp, nchan) = ({nsamp}, {nchan})")

    ns_p = _round_up(nsamp, s_tile)
    nc_p = _round_up(nchan, c_tile)
    if ns_p != nsamp:
        bterms = jnp.pad(bterms, ((0, 0), (0, ns_p - nsamp), (0, 0)))
    if ns_p != nsamp or nc_p != nchan:
        pads = ((0, ns_p - nsamp), (0, nc_p - nchan))
        lda = jnp.pad(lda, pads)
        mda = jnp.pad(mda, pads)
    if nc_p != nchan:
        gc0 = jnp.pad(gc0, (0, nc_p - nchan))
        wlo = jnp.pad(wlo, (0, nc_p - nchan))

    if have_feed:
        fre = feed.re.reshape(nsamp, 4).T.reshape(4, nsamp, 1)
        fim = feed.im.reshape(nsamp, 4).T.reshape(4, nsamp, 1)
        if ns_p != nsamp:
            fre = jnp.pad(fre, ((0, 0), (0, ns_p - nsamp), (0, 0)))
            fim = jnp.pad(fim, ((0, 0), (0, ns_p - nsamp), (0, 0)))
    else:
        fre = jnp.zeros((4, s_tile, 1), jnp.float32)
        fim = fre

    kernel = partial(_blend_cell_fr_kernel, ncorr=ncorr, nud=nud,
                     s_tile=s_tile, c_tile=c_tile, have_feed=have_feed)

    chan_vec = pl.BlockSpec((1, c_tile), lambda s, c: (0, c),
                            memory_space=pltpu.VMEM)
    bt_spec = pl.BlockSpec((k12, s_tile, nud), lambda s, c: (0, s, 0),
                           memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((s_tile, c_tile), lambda s, c: (s, c),
                          memory_space=pltpu.VMEM)
    fidx = (lambda s, c: (0, s, 0)) if have_feed else (
        lambda s, c: (0, 0, 0))
    f_spec = pl.BlockSpec((4, s_tile, 1), fidx, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ncorr, s_tile, c_tile),
                            lambda s, c: (0, s, c),
                            memory_space=pltpu.VMEM)

    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(ns_p // s_tile, nc_p // c_tile),
        in_specs=[chan_vec, chan_vec, bt_spec, d_spec, d_spec,
                  f_spec, f_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((ncorr, ns_p, nc_p), jnp.float32),
            jax.ShapeDtypeStruct((ncorr, ns_p, nc_p), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(gc0, jnp.int32).reshape(1, -1),
        jnp.asarray(wlo, jnp.float32).reshape(1, -1),
        bterms.astype(jnp.float32),
        lda.astype(jnp.float32),
        mda.astype(jnp.float32),
        fre.astype(jnp.float32),
        fim.astype(jnp.float32),
    )
    return out_re[:, :nsamp, :nchan], out_im[:, :nsamp, :nchan]


def beam_blend_fr_pallas(raw, gc0, wlo, feed=None, s_tile=8,
                         c_tile=512, interpret=False):
    """Fused frequency blend + normalisation [+ feed rotation].

    The chan-invariant beam fast path interpolates each cube slab once
    (``beam_interp_pallas(..., normalize=False)`` → (3C, nud, nsamp))
    and then expands to (…, chan) — in XLA that expansion is ~10+
    HBM passes over (C·nsamp·chan)-sized arrays (blend einsum, norm,
    concat, layout moves, feed-rotation einsums). This kernel fuses
    them: HBM traffic is one write of the (2C, nsamp, chan) output.

    Parameters
    ----------
    raw : (3C, nsamp, nud) f32 — per-slab re/im/amp interpolants
        (``beam_interp_pallas`` output transposed; nud on lanes).
    gc0 : (chan,) int32 lower slab index; wlo : (chan,) f32 its weight.
    feed : None or Cplx with (nsamp, 2, 2) components — a per-sample
        feed-rotation Jones (time/ant-indexed F expanded to samples);
        when given the output is E·F (2x2 complex matmul per sample).
    ncorr is fixed at 4 (2x2 Jones) when feed is given.

    Returns
    -------
    (out_re, out_im): each (C, nsamp, chan) f32.
    """
    k3, nsamp, nud = raw.shape
    ncorr = k3 // 3
    nchan = gc0.shape[0]
    have_feed = feed is not None
    if have_feed and ncorr != 4:
        raise ValueError("feed rotation requires 2x2 (ncorr=4) beams")

    ns_p = _round_up(nsamp, s_tile)
    nc_p = _round_up(nchan, c_tile)
    if ns_p != nsamp:
        raw = jnp.pad(raw, ((0, 0), (0, ns_p - nsamp), (0, 0)))
    if nc_p != nchan:
        gc0 = jnp.pad(gc0, (0, nc_p - nchan))
        wlo = jnp.pad(wlo, (0, nc_p - nchan))

    if have_feed:
        fre = feed.re.reshape(nsamp, 4).T.reshape(4, nsamp, 1)
        fim = feed.im.reshape(nsamp, 4).T.reshape(4, nsamp, 1)
        if ns_p != nsamp:
            fre = jnp.pad(fre, ((0, 0), (0, ns_p - nsamp), (0, 0)))
            fim = jnp.pad(fim, ((0, 0), (0, ns_p - nsamp), (0, 0)))
    else:
        # inert stand-ins (static flag skips the reads; 1-lane blocks)
        fre = jnp.zeros((4, s_tile, 1), jnp.float32)
        fim = fre

    kernel = partial(_blend_fr_kernel, ncorr=ncorr, nud=nud,
                     s_tile=s_tile, c_tile=c_tile, have_feed=have_feed)

    chan_vec = pl.BlockSpec((1, c_tile), lambda s, c: (0, c),
                            memory_space=pltpu.VMEM)
    raw_spec = pl.BlockSpec((k3, s_tile, nud), lambda s, c: (0, s, 0),
                            memory_space=pltpu.VMEM)
    fidx = (lambda s, c: (0, s, 0)) if have_feed else (
        lambda s, c: (0, 0, 0))
    f_spec = pl.BlockSpec((4, s_tile, 1), fidx, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ncorr, s_tile, c_tile),
                            lambda s, c: (0, s, c),
                            memory_space=pltpu.VMEM)

    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(ns_p // s_tile, nc_p // c_tile),
        in_specs=[chan_vec, chan_vec, raw_spec, f_spec, f_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((ncorr, ns_p, nc_p), jnp.float32),
            jax.ShapeDtypeStruct((ncorr, ns_p, nc_p), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(gc0, jnp.int32).reshape(1, -1),
        jnp.asarray(wlo, jnp.float32).reshape(1, -1),
        raw.astype(jnp.float32),
        fre.astype(jnp.float32),
        fim.astype(jnp.float32),
    )
    return out_re[:, :nsamp, :nchan], out_im[:, :nsamp, :nchan]
