"""Fused Pallas DFT kernels for imaging-shaped problems.

The adjoint DFT I[s,f,c] = Σ_r Re(e^{iφ(s,r,f)}·V[r,f,c]) (reference
``africanus/dft/kernels.py:73`` vis_to_im) is the residual-imaging step
of every DFT-based selfcal loop. The XLA einsum formulation materialises
the per-channel cos/sin (pixel, row) matrices in HBM (~80 GB of traffic
at SKA-mid row counts: the matmul's N dimension is tiny, so the
contraction is bandwidth-bound on kernel-matrix traffic); the existing
fused predict kernel (ops/pallas_predict.py) puts *channels* on the
128-lane axis, so few-channel residual images pay an 8x lane pad.

This kernel is laid out for that regime instead:

- pixels on the 128-lane axis, visibility rows on sublanes — both
  naturally large for imaging problems;
- channels in a static unrolled loop (no lane padding, any count);
- the row contraction is an in-register multiply + sublane reduction
  accumulated into a revisited output block across the row grid
  dimension, so HBM sees the (row, pixel) delay pairs exactly once and
  the visibilities once per pixel tile.

Per-channel phase economics — three statically-selected modes, chosen
on the host from the concrete frequency grid (``_chan_group_tables``):

``direct``
    one compensated two-float mod-1-cycle phase evaluation (2
    transcendentals) per (row, pixel, chan). Always correct; the only
    choice when frequencies are traced (unknown at compile time) or
    genuinely non-uniform.
``exact``
    the channel grid is an exact arithmetic progression base + f·step
    (f64 grids from ``np.linspace``; nchan == 1): evaluate the phasor
    at ``base`` and at ``step`` once per (row, pixel) chunk per channel
    group and advance by unit-phasor multiplication — 2 evaluations
    amortised over the group instead of one per channel. base/step are
    carried as two-float (hi, lo) pairs so the recurrence is faithful
    to the *original f64* grid, not its f32 cast.
``residual``
    the grid deviates from the fitted progression by δ_f per channel
    (the common case: a uniform-intent grid stored in f32, where
    per-channel casts wobble by an ulp, ~1e2 Hz at GHz): run the
    ``exact`` recurrence for the progression and apply the remaining
    rotation e^{2πi·delay·δ_f} by a 6th-order small-angle polynomial
    (~12 VPU flops, no transcendental). Engaged only while
    |2π·delay_max·max δ| ≤ 0.35 rad, where ``delay_max`` bounds the
    geometric delays: the default 1e-4 s covers a 300 km baseline at
    |l| = 0.1 (an order of magnitude beyond SKA-mid geometry); pass the
    true bound for VLBI-scale uvw, or the mode falls back to direct.
    The wrappers in dft/kernels.py measure it from concrete inputs
    when they can.

Accuracy: the rotation recurrence drifts ~1 ulp per channel within a
group (groups are ≤ 8 channels), the same order as the compensated
pipeline itself.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from africanus_tpu.ops.cplx import Cplx
from africanus_tpu.ops.dfloat import _r, split as df_split

__all__ = ["dft_adjoint_pallas", "dft_forward_pallas"]

# residual-mode engagement: the small-angle polynomial is valid while
# |2π·delay·δ_f| ≤ _X_MAX rad; engagement checks the grid's deviation
# dmax against _X_MAX / (2π·delay_max), where delay_max is the caller's
# bound on |geometric delay| (default _DELAY_MAX = 1e-4 s ≈ a 300 km
# baseline at |l| = 0.1 — an order of magnitude beyond SKA-mid; VLBI
# callers must pass their own). At the bound the truncation is ≤ 5e-9.
_X_MAX = 0.35
_DELAY_MAX = 1e-4
_TWO_PI = 2.0 * np.pi


def _phase_cs(dot, dlo, dhh, dhl, f, fhh, fhl, flo, use_flo):
    """cos/sin of 2π·(dot·f) with the product carried in two-float
    cycles and reduced mod 1 (see ops/dfloat.py and the identical
    product in ops/pallas_predict._predict_kernel). ``flo`` extends the
    frequency to a two-float (f + flo) pair — ``use_flo`` is static so
    the extra product costs nothing when the grid is plain f32."""
    p = _r(dot * f)
    e = _r(_r(
        _r(_r(dhh * fhh) - p) + _r(dhh * fhl) + _r(dhl * fhh)
    ) + _r(dhl * fhl))
    e = _r(e + _r(dlo * f))
    if use_flo:
        e = _r(e + _r(dot * flo))
    ph = _TWO_PI * _r(_r(p - jnp.round(p)) + e)
    return jnp.cos(ph), jnp.sin(ph)


def _residual_rot(kre, kim, dot, d2p):
    """Rotate the phasor (kre, kim) by x = d2p·dot radians via 6th-order
    small-angle polynomials (d2p = 2π·δ_f is an SMEM scalar; |x| must
    stay ≤ _X_MAX rad — guaranteed by the engagement bound in
    _chan_group_tables)."""
    x = d2p * dot
    x2 = x * x
    c = 1.0 - x2 * (0.5 - x2 * ((1.0 / 24.0) - x2 * (1.0 / 720.0)))
    s = x * (1.0 - x2 * ((1.0 / 6.0) - x2 * (1.0 / 120.0)))
    return kre * c - kim * s, kim * c + kre * s


def _chunk_phasors(usm_ref, g, dot, dlo, dhh, dhl, use_flo):
    """Base and step phasors for the recurrence modes (usm rows are
    [value, dekker_hh, dekker_hl, lo]; columns [base, step]; ``g``
    selects the channel group within the block)."""
    kre, kim = _phase_cs(dot, dlo, dhh, dhl, usm_ref[g, 0, 0],
                         usm_ref[g, 1, 0], usm_ref[g, 2, 0],
                         usm_ref[g, 3, 0], use_flo)
    sre, sim = _phase_cs(dot, dlo, dhh, dhl, usm_ref[g, 0, 1],
                         usm_ref[g, 1, 1], usm_ref[g, 2, 1],
                         usm_ref[g, 3, 1], use_flo)
    return kre, kim, sre, sim


def _dft_adj_kernel(fsm_ref, usm_ref, dhi_ref, dlo_ref, vre_ref, vim_ref,
                    out_ref, *, nchan, ncorr, mode, use_flo, row_tile,
                    gb, lane_tile):
    """One (pixel_tile, chan_group_block, row_tile) step; out block
    revisited over the row grid dimension.

    Rows are consumed in 8-sublane register chunks: the chunk's kernel
    matrix, its per-channel rotation, and the (ncorr·nchan_group)
    partial accumulators all live in vector registers — a whole-block
    formulation bounced every (row_tile, 128) temporary through VMEM,
    and carrying all channels' accumulators spilled the loop carry; the
    channel-group grid dimension keeps the carry register-resident.

    ``gb`` channel groups run per grid step (an unrolled outer loop,
    each group with its own register-resident fori_loop over the row
    chunks) and ``lane_tile`` pixels sit on the lane axis — both
    amortise the fixed per-grid-step cost, which dominates when the
    problem is small (KAT-7-scale predicts are otherwise ~20x slower
    than their flop count; see bench.py config 1)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    from jax import lax

    for g in range(gb):
        def chunk(j, acc, g=g):
            # fori_loop index: assert the 8-alignment Mosaic needs for
            # dynamic sublane slicing (CLAUDE.md / pallas_grid.py)
            r0 = pl.multiple_of(j * 8, 8)
            dot = dhi_ref[pl.ds(r0, 8), :]  # (8, lane_tile) delay, hi
            dlo = dlo_ref[pl.ds(r0, 8), :]
            dhh, dhl = df_split(dot)

            if mode != "direct":
                bre, bim, sre, sim = _chunk_phasors(
                    usm_ref, g, dot, dlo, dhh, dhl, use_flo
                )

            new = list(acc)
            for f in range(nchan):
                if mode == "direct":
                    kre, kim = _phase_cs(dot, dlo, dhh, dhl,
                                         fsm_ref[g, 0, f], fsm_ref[g, 1, f],
                                         fsm_ref[g, 2, f], fsm_ref[g, 3, f],
                                         use_flo)
                elif mode == "residual":
                    kre, kim = _residual_rot(bre, bim, dot, fsm_ref[g, 0, f])
                else:
                    kre, kim = bre, bim
                for c in range(ncorr):
                    vr = vre_ref[g, c, pl.ds(r0, 8), f][:, None]  # (8, 1)
                    vi = vim_ref[g, c, pl.ds(r0, 8), f][:, None]
                    i = f * ncorr + c
                    new[i] = new[i] + (kre * vr - kim * vi)
                if mode != "direct" and f + 1 < nchan:
                    bre, bim = (
                        _r(bre * sre - bim * sim),
                        _r(bre * sim + bim * sre),
                    )
            return tuple(new)

        zeros = tuple(
            jnp.zeros((8, lane_tile), jnp.float32)
            for _ in range(nchan * ncorr)
        )
        acc = lax.fori_loop(0, row_tile // 8, chunk, zeros)
        for f in range(nchan):
            for c in range(ncorr):
                out_ref[g, c, f, :] += acc[f * ncorr + c].sum(axis=0)


def _f32_dekker_split_np(f):
    """Host Dekker split of f32 values (12-bit halves)."""
    f = np.asarray(f, np.float32)
    c = np.float32(4097.0) * f
    hi = (c - (c - f)).astype(np.float32)
    return hi, (f - hi).astype(np.float32)


def _freq_rows_np(f64):
    """(4, n) host table rows [f32, dekker_hh, dekker_hl, lo] carrying
    the f64 values as two-float pairs."""
    f32 = np.asarray(f64, np.float32)
    hh, hl = _f32_dekker_split_np(f32)
    lo = (np.asarray(f64, np.float64) - f32.astype(np.float64)).astype(
        np.float32
    )
    return np.stack([f32, hh, hl, lo])


def _chan_group_tables(freq, nchan, ncorr, cap, delay_max=_DELAY_MAX):
    """Channel-group split + per-group scalar tables.

    The kernels carry one (8, 128) register accumulator per
    (group-channel, corr[, re/im]) — ``cap`` bounds that carry so Mosaic
    never spills (8 for the adjoint's single real output, 4 for the
    forward's pair). Returns (cg, ngroups, mode, use_flo, fsm, usm):
    mode selects the per-channel phase strategy (module docstring), fsm
    is the (ngroups, 4, cg) per-channel table ([ν, ν_hh, ν_hl, ν_lo]
    rows for ``direct``; [2π·δ_f, 0, 0, 0] for ``residual``), usm the
    (ngroups, 4, 2) per-group [base, step] two-float table driving the
    recurrence.
    """
    cg = 1
    for d in range(1, nchan + 1):
        if nchan % d == 0 and d * ncorr <= cap:
            cg = d
    ngroups = nchan // cg

    if isinstance(freq, jax.core.Tracer):
        # frequencies unknown at trace time: per-channel direct path,
        # in-graph tables (flo only meaningful for f64 inputs, which
        # only occur on CPU)
        f32 = jnp.asarray(freq, jnp.float32)
        fhh, fhl = df_split(f32)
        flo = (
            (freq - f32.astype(freq.dtype)).astype(jnp.float32)
            if jnp.issubdtype(jnp.asarray(freq).dtype, jnp.float64)
            else jnp.zeros_like(f32)
        )
        use_flo = jnp.issubdtype(jnp.asarray(freq).dtype, jnp.float64)
        fsm = jnp.stack([f32, fhh, fhl, flo]).reshape(
            4, ngroups, cg).transpose(1, 0, 2)
        usm = jnp.zeros((ngroups, 4, 2), jnp.float32)
        return cg, ngroups, "direct", bool(use_flo), fsm, usm

    f64 = np.asarray(freq, np.float64)
    if nchan >= 2:
        step = (f64[-1] - f64[0]) / (nchan - 1)
        delta = f64 - (f64[0] + np.arange(nchan) * step)
    else:
        step = 0.0
        delta = np.zeros(1)
    dmax = np.abs(delta).max()
    # treat the grid as exactly uniform only when the dropped fit
    # residual costs < 1e-6 rad of phase at the CALLER'S delay bound
    # (f64 linspace rounding lands well inside this at the 1e-4 s
    # default; a VLBI-scale delay_max correctly demotes to residual)
    if _TWO_PI * dmax * float(delay_max) <= 1e-6:
        mode = "exact"
    elif _TWO_PI * dmax * float(delay_max) <= _X_MAX:
        mode = "residual"
    else:
        mode = "direct"
    if cg < 2:
        # the recurrence amortises within a group: a single-channel
        # group pays 2 phasor evaluations (base + step) for 1 channel —
        # direct (1 evaluation) wins
        mode = "direct"

    if mode == "direct":
        fsm = _freq_rows_np(f64)  # (4, nchan): [f32, hh, hl, lo]
        use_flo = bool(np.any(fsm[3]))
    else:
        fsm = np.zeros((4, nchan), np.float32)
        if mode == "residual":
            fsm[0] = (_TWO_PI * delta).astype(np.float32)
    fsm = jnp.asarray(np.ascontiguousarray(
        fsm.reshape(4, ngroups, cg).transpose(1, 0, 2)
    ))  # (ngroups, 4, cg)

    if mode == "direct":
        usm = jnp.zeros((ngroups, 4, 2), jnp.float32)
    else:
        bases = f64[0] + (np.arange(ngroups) * cg) * step
        u = np.stack([bases, np.full(ngroups, step)], axis=1)  # (ng, 2)
        rows = _freq_rows_np(u.reshape(-1)).reshape(4, ngroups, 2)
        usm = jnp.asarray(np.ascontiguousarray(rows.transpose(1, 0, 2)))
        use_flo = bool(np.any(rows[3]))
    return cg, ngroups, mode, use_flo, fsm, usm


def _pick_blocks(nlane, ngroups, cg, ncorr, contract_tile, n_in_planes,
                 n_acc, lane_tile, group_block):
    """Lane width and channel-group block for a fused DFT kernel call.

    The kernels' fixed per-grid-step cost (~5-10 us of DMA setup and
    scalar prologue) dwarfs the compute of a (contract_tile, 128)
    single-group step on small problems, so blocks widen until a step
    carries enough work:

    - ``lane_tile`` (pixels/rows on the 128-lane axis) grows to a
      toolchain-safe cap while the register accumulators (``n_acc`` per
      lane register) stay within a conservative 32-vreg budget. The cap
      default returned to 512 on 2026-08-21: the Mosaic compile wall
      that killed the round-3 driver bench (512-wide tiles wedged the
      remote compile) has lifted — the KAT-7 config-1 shape now
      compiles in 19 s and measures ~+7%% over 256 (TOOLCHAIN.md item
      2). AFRICANUS_TPU_DFT_MAX_LANE_TILE overrides either way.
    - ``group_block`` channel groups run per step (unrolled), bounded
      by a 32-slot unroll budget (gb*cg, Mosaic compile time) and a
      ~2 MB VMEM budget across the step's blocks.
    """
    if lane_tile is None:
        import os

        cap_lanes = int(os.environ.get(
            "AFRICANUS_TPU_DFT_MAX_LANE_TILE", "512"))
        lane_tile = 128
        while (lane_tile < cap_lanes and lane_tile < nlane
               and n_acc * (2 * lane_tile // 128) <= 32):
            lane_tile *= 2
    else:
        lane_tile = max(128, -(-int(lane_tile) // 128) * 128)

    if group_block is None:
        group_block = 1
        for d in range(1, ngroups + 1):
            if ngroups % d or d * cg > 32:
                continue
            vmem = 4 * (
                2 * contract_tile * lane_tile
                + n_in_planes * d * ncorr * contract_tile * cg
                + (n_acc // max(cg * ncorr, 1)) * d * ncorr * cg * lane_tile
            )
            if vmem <= 2 * 1024 * 1024:
                group_block = d
    else:
        group_block = int(group_block)
        if ngroups % group_block:
            raise ValueError(
                f"group_block {group_block} must divide ngroups {ngroups}"
            )
    return lane_tile, group_block


def dft_adjoint_pallas(dot_pair, freq, vis, row_tile=1024,
                       interpret=False, delay_max=_DELAY_MAX,
                       lane_tile=None, group_block=None):
    """Adjoint DFT via the fused pixel-lane kernel.

    Parameters
    ----------
    dot_pair : (hi, lo) two-float pair of (row, pixel) f32 delays in
        signed seconds (from ``rime.phase.phase_dot_cycles`` with the
        adjoint's flipped convention, transposed to row-major).
    freq : (chan,) frequencies. When concrete, uniform (or nearly
        uniform) grids engage the rotation-recurrence modes — 2
        transcendental evaluations per (row, pixel) per channel group
        instead of one pair per channel; phases are faithful to the
        values *as given* (f64 grids are carried as two-float pairs).
    vis : Cplx (row, chan, corr), already flag-masked.

    Returns
    -------
    (pixel, chan, corr) f32 real image contributions.
    """
    dhi, dlo = dot_pair
    dhi = jnp.asarray(dhi, jnp.float32)
    dlo = jnp.asarray(dlo, jnp.float32)
    nrow, npix = dhi.shape
    nchan = vis.re.shape[1]
    ncorr = vis.re.shape[2]

    if nrow == 0 or npix == 0:
        # the einsum path's semantics for empty selections
        return jnp.zeros((npix, nchan, ncorr), jnp.float32)

    cg, ngroups, mode, use_flo, fsm, usm = _chan_group_tables(
        freq, nchan, ncorr, cap=8, delay_max=delay_max
    )
    lane_tile, gb = _pick_blocks(
        npix, ngroups, cg, ncorr, contract_tile=min(row_tile, nrow),
        n_in_planes=2, n_acc=cg * ncorr,
        lane_tile=lane_tile, group_block=group_block,
    )

    # the kernel consumes rows in 8-sublane chunks: round the tile up
    row_tile = max(8, -(-int(row_tile) // 8) * 8)
    row_tile = min(row_tile, max(8, -(-nrow // 8) * 8))
    rpad = (-nrow) % row_tile
    ppad = (-npix) % lane_tile
    if rpad or ppad:
        dhi = jnp.pad(dhi, ((0, rpad), (0, ppad)))
        dlo = jnp.pad(dlo, ((0, rpad), (0, ppad)))
    vre = vis.re.astype(jnp.float32).transpose(2, 0, 1)  # (corr, row, chan)
    vim = vis.im.astype(jnp.float32).transpose(2, 0, 1)
    if rpad:
        vre = jnp.pad(vre, ((0, 0), (0, rpad), (0, 0)))
        vim = jnp.pad(vim, ((0, 0), (0, rpad), (0, 0)))
    nrow_p, npix_p = dhi.shape

    # (ngroups, ncorr, row, cg) so per-group blocks keep full minors
    vre = jnp.moveaxis(
        vre.reshape(ncorr, nrow_p, ngroups, cg), 2, 0
    )
    vim = jnp.moveaxis(
        vim.reshape(ncorr, nrow_p, ngroups, cg), 2, 0
    )

    grid = (npix_p // lane_tile, ngroups // gb, nrow_p // row_tile)
    kernel = partial(_dft_adj_kernel, nchan=cg, ncorr=ncorr,
                     mode=mode, use_flo=use_flo, row_tile=row_tile,
                     gb=gb, lane_tile=lane_tile)

    in_specs = [
        pl.BlockSpec((gb, 4, cg), lambda i, g, k: (g, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((gb, 4, 2), lambda i, g, k: (g, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((row_tile, lane_tile), lambda i, g, k: (k, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((row_tile, lane_tile), lambda i, g, k: (k, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, ncorr, row_tile, cg), lambda i, g, k: (g, 0, k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, ncorr, row_tile, cg), lambda i, g, k: (g, 0, k, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec(
        (gb, ncorr, cg, lane_tile), lambda i, g, k: (g, 0, 0, i),
        memory_space=pltpu.VMEM,
    )

    ntransc = 2 * nrow_p * npix_p * (
        2 * ngroups if mode != "direct" else nchan
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((ngroups, ncorr, cg, npix_p),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=nrow_p * npix_p * (30 * ngroups
                                     + nchan * (6 + 4 * ncorr)),
            bytes_accessed=4 * (2 * nrow_p * npix_p * ngroups
                                + 2 * ncorr * nrow_p * nchan
                                * (npix_p // 128)
                                + ncorr * nchan * npix_p),
            transcendentals=ntransc,
        ),
    )(fsm, usm, dhi, dlo, vre, vim)
    # (ngroups, ncorr, cg, pix) → (pix, ngroups·cg = chan, corr)
    out = out[..., :npix].transpose(3, 0, 2, 1).reshape(
        npix, nchan, ncorr
    )
    return out


def _dft_fwd_kernel(fsm_ref, usm_ref, dhi_ref, dlo_ref, ire_ref, *refs,
                    nchan, ncorr, mode, use_flo, src_tile, imag_zero,
                    gb, lane_tile):
    """Forward direction of the same layout: sources on sublanes
    (contracted), visibility rows on the 128-lane axis, channels in
    register groups. Two output blocks (re, im) revisited over the
    source grid dimension; ``imag_zero`` drops the imaginary-image
    half of the complex product AND its input block entirely (the
    common real-sky case would otherwise DMA all-zero planes every
    grid step — same economics as pallas_predict's optional planes).
    ``gb``/``lane_tile`` widen the per-grid-step work as in
    :func:`_dft_adj_kernel`."""
    if imag_zero:
        iim_ref = None
        ore_ref, oim_ref = refs
    else:
        iim_ref, ore_ref, oim_ref = refs
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        ore_ref[...] = jnp.zeros_like(ore_ref)
        oim_ref[...] = jnp.zeros_like(oim_ref)

    from jax import lax

    for g in range(gb):
        def chunk(j, acc, g=g):
            s0 = pl.multiple_of(j * 8, 8)  # Mosaic sublane-alignment hint
            dot = dhi_ref[pl.ds(s0, 8), :]  # (8, lane_tile) delay, hi
            dlo = dlo_ref[pl.ds(s0, 8), :]
            dhh, dhl = df_split(dot)

            if mode != "direct":
                bre, bim, sre, sim = _chunk_phasors(
                    usm_ref, g, dot, dlo, dhh, dhl, use_flo
                )

            new = list(acc)
            for f in range(nchan):
                if mode == "direct":
                    kre, kim = _phase_cs(dot, dlo, dhh, dhl,
                                         fsm_ref[g, 0, f], fsm_ref[g, 1, f],
                                         fsm_ref[g, 2, f], fsm_ref[g, 3, f],
                                         use_flo)
                elif mode == "residual":
                    kre, kim = _residual_rot(bre, bim, dot, fsm_ref[g, 0, f])
                else:
                    kre, kim = bre, bim
                for c in range(ncorr):
                    ir = ire_ref[g, c, pl.ds(s0, 8), f][:, None]  # (8, 1)
                    i = 2 * (f * ncorr + c)
                    if imag_zero:
                        new[i] = new[i] + kre * ir
                        new[i + 1] = new[i + 1] + kim * ir
                    else:
                        ii = iim_ref[g, c, pl.ds(s0, 8), f][:, None]
                        new[i] = new[i] + (kre * ir - kim * ii)
                        new[i + 1] = new[i + 1] + (kim * ir + kre * ii)
                if mode != "direct" and f + 1 < nchan:
                    bre, bim = (
                        _r(bre * sre - bim * sim),
                        _r(bre * sim + bim * sre),
                    )
            return tuple(new)

        zeros = tuple(
            jnp.zeros((8, lane_tile), jnp.float32)
            for _ in range(2 * nchan * ncorr)
        )
        acc = lax.fori_loop(0, src_tile // 8, chunk, zeros)
        for f in range(nchan):
            for c in range(ncorr):
                i = 2 * (f * ncorr + c)
                ore_ref[g, c, f, :] += acc[i].sum(axis=0)
                oim_ref[g, c, f, :] += acc[i + 1].sum(axis=0)


def dft_forward_pallas(dot_pair, freq, image, src_tile=1024,
                       interpret=False, imag_zero=None,
                       delay_max=_DELAY_MAX,
                       lane_tile=None, group_block=None):
    """Forward DFT predict via the fused row-lane kernel.

    V[r,f,c] = Σ_s e^{iφ(s,r,f)} · I[s,f,c] with the same fused
    transcendental economics as :func:`dft_adjoint_pallas` (uniform or
    nearly-uniform frequency grids pay two cos/sin evaluations per
    (source, row) per channel group instead of one pair per channel).

    Parameters
    ----------
    dot_pair : (hi, lo) two-float pair of (source, row) f32 delays in
        signed seconds (``rime.phase.phase_dot_cycles(lm, uvw, conv)``).
    freq : (chan,) frequencies (concrete ~uniform grids engage the
        recurrence; see :func:`dft_adjoint_pallas`).
    image : Cplx (source, chan, corr). A zero imaginary part (detected
        when it is a concrete all-zero array) skips half the products.

    Returns
    -------
    Cplx of (row, chan, corr) visibilities, f32.
    """
    dhi, dlo = dot_pair
    dhi = jnp.asarray(dhi, jnp.float32)
    dlo = jnp.asarray(dlo, jnp.float32)
    nsrc, nrow = dhi.shape
    nchan = image.re.shape[1]
    ncorr = image.re.shape[2]

    if nsrc == 0 or nrow == 0:
        z = jnp.zeros((nrow, nchan, ncorr), jnp.float32)
        return Cplx(z, z)

    if imag_zero is None:
        # only decidable cheaply for host-resident arrays (a device
        # array would force a full fetch through the TPU tunnel); under
        # jit the caller asserts real-sky statically (im_to_vis_ri
        # does, from the pre-coercion input type)
        imag_zero = (
            isinstance(image.im, np.ndarray) and not np.any(image.im)
        )

    # the pair accumulators halve the per-group register budget
    cg, ngroups, mode, use_flo, fsm, usm = _chan_group_tables(
        freq, nchan, ncorr, cap=4, delay_max=delay_max
    )
    lane_tile, gb = _pick_blocks(
        nrow, ngroups, cg, ncorr, contract_tile=min(src_tile, nsrc),
        n_in_planes=1 if imag_zero else 2,
        n_acc=2 * cg * ncorr,
        lane_tile=lane_tile, group_block=group_block,
    )

    # the kernel consumes sources in 8-sublane chunks: round up
    src_tile = max(8, -(-int(src_tile) // 8) * 8)
    src_tile = min(src_tile, max(8, -(-nsrc // 8) * 8))
    spad = (-nsrc) % src_tile
    rpad = (-nrow) % lane_tile
    if spad or rpad:
        dhi = jnp.pad(dhi, ((0, spad), (0, rpad)))
        dlo = jnp.pad(dlo, ((0, spad), (0, rpad)))
    ire = image.re.astype(jnp.float32).transpose(2, 0, 1)  # (corr, src, chan)
    if spad:
        ire = jnp.pad(ire, ((0, 0), (0, spad), (0, 0)))
    nsrc_p, nrow_p = dhi.shape

    # (ngroups, ncorr, src, cg) so per-group blocks keep full minors
    ire = jnp.moveaxis(ire.reshape(ncorr, nsrc_p, ngroups, cg), 2, 0)
    if imag_zero:
        # real sky: the kernel never reads the imaginary image — drop
        # the operand so its all-zero blocks are never DMA'd
        iim_ops = ()
    else:
        iim = image.im.astype(jnp.float32).transpose(2, 0, 1)
        if spad:
            iim = jnp.pad(iim, ((0, 0), (0, spad), (0, 0)))
        iim = jnp.moveaxis(iim.reshape(ncorr, nsrc_p, ngroups, cg), 2, 0)
        iim_ops = (iim,)

    grid = (nrow_p // lane_tile, ngroups // gb, nsrc_p // src_tile)
    kernel = partial(_dft_fwd_kernel, nchan=cg, ncorr=ncorr,
                     mode=mode, use_flo=use_flo, src_tile=src_tile,
                     imag_zero=imag_zero, gb=gb, lane_tile=lane_tile)

    in_specs = [
        pl.BlockSpec((gb, 4, cg), lambda i, g, k: (g, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((gb, 4, 2), lambda i, g, k: (g, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((src_tile, lane_tile), lambda i, g, k: (k, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((src_tile, lane_tile), lambda i, g, k: (k, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, ncorr, src_tile, cg), lambda i, g, k: (g, 0, k, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not imag_zero:
        in_specs.append(
            pl.BlockSpec((gb, ncorr, src_tile, cg),
                         lambda i, g, k: (g, 0, k, 0),
                         memory_space=pltpu.VMEM)
        )
    out_spec = pl.BlockSpec(
        (gb, ncorr, cg, lane_tile), lambda i, g, k: (g, 0, 0, i),
        memory_space=pltpu.VMEM,
    )

    prods = 2 if imag_zero else 4
    ntransc = 2 * nsrc_p * nrow_p * (
        2 * ngroups if mode != "direct" else nchan
    )
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((ngroups, ncorr, cg, nrow_p), jnp.float32),
            jax.ShapeDtypeStruct((ngroups, ncorr, cg, nrow_p), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=nsrc_p * nrow_p * (30 * ngroups
                                     + nchan * (6 + 2 * prods * ncorr)),
            bytes_accessed=4 * (2 * nsrc_p * nrow_p * ngroups
                                + (1 if imag_zero else 2)
                                * ncorr * nsrc_p * nchan
                                * (nrow_p // 128)
                                + 2 * ncorr * nchan * nrow_p),
            transcendentals=ntransc,
        ),
    )(fsm, usm, dhi, dlo, ire, *iim_ops)

    def unpack(o):
        # (ngroups, ncorr, cg, row) → (row, chan, corr)
        return o[..., :nrow].transpose(3, 0, 2, 1).reshape(
            nrow, nchan, ncorr
        )

    return Cplx(unpack(out_re), unpack(out_im))
