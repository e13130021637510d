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

__all__ = ["beam_interp_pallas", "prepare_beam_slabs"]


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
