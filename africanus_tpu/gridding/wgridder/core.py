"""w-stacking convolutional gridder/degridder (ducc0.wgridder equivalent).

TPU-native replacement for the external C++ ``ducc0.wgridder`` the reference
wraps (``africanus/gridding/wgridder/vis2im.py:4`` ms2dirty,
``im2vis.py`` dirty2ms). Implements the improved w-stacking algorithm as a
3D type-1/2 NUFFT with an exponential-of-semicircle (ES) kernel:

- uv: visibilities are spread onto a σ=2 oversampled grid with a support-W
  separable ES kernel; the grid is transformed with an FFT and corrected by
  the kernel's transform (taper).
- w: the same 1D kernel grids each visibility onto ~W adjacent w-planes;
  each plane's image is phased by e^{±2πi·w_p·(n−1)} and summed — the plane
  sum is the NUFFT evaluation at the nonuniform image coordinate (n−1),
  corrected by the w-kernel taper.

Sign conventions match ducc0/ms2dirty (see the reference's oracle,
gridding/wgridder/tests/test_wgridder.py:18-46):

  dirty(x, y) = Σ_vis Re[ V·w·e^{2πi·(ν/c)·(u·x + v·y − w·(n−1))} ] / n

The scatter accumulation is a static W³ loop of flat ``.at[].add`` updates
(XLA sort-based scatter); a Pallas tiled-accumulation kernel is the
optimisation path for production grids.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from africanus_tpu.constants import c as lightspeed
from africanus_tpu.ops.cplx import Cplx, cplx
from africanus_tpu.ops.fft import cfft2, cifft2

__all__ = ["grid_adjoint", "degrid", "degrid_ri", "es_kernel", "kernel_taper", "make_plan"]

_SIGMA = 2  # oversampling factor


def _wgrid_row_bucket():
    """Row-bucketed fused w-stack plans (MXU route row-slab shrink);
    env-tunable for A/B measurement on other toolchains."""
    return os.environ.get("AFRICANUS_TPU_WGRID_ROWBUCKET", "1") == "1"


def _wgrid_pack():
    """Sub-groups packed per MXU kernel step (pack_supergroups).

    Small groups maximise row-bucket fill (uv density is non-uniform,
    so sparse buckets dominate group padding: g512→g128 measured
    20.1→30.7 Mvis/s dirty at the config-4 shape) but leave the kernel
    bound on per-grid-step fixed cost; packing ``pack`` sub-groups of
    one tile into each step amortises it. 0/1 disables."""
    return int(os.environ.get("AFRICANUS_TPU_WGRID_PACK", "8"))


def _kernel_params(epsilon):
    """ES-kernel support and shape parameter for σ=2 oversampling.

    Even supports only — the spreading window [floor(u)−W/2+1, …] is
    symmetric about the fractional coordinate for even W. Measured l2
    error vs an explicit DFT at β = 2.3·W: W=4 → ~4e-4, W=6 → ~1.5e-5,
    W=8 → ~1e-7, W=10 → ~3e-9 (margin ≥ 2x built in below).
    """
    if epsilon >= 1e-2:
        w = 4
    elif epsilon >= 3e-5:
        w = 6
    elif epsilon >= 3e-7:
        w = 8
    else:
        w = 10
    return w, 2.3 * w


def es_kernel(z, beta):
    """Exponential-of-semicircle kernel on z ∈ (−1, 1) (shared
    implementation: ops/es.py — the in-kernel taps, host w-taps and
    taper must agree)."""
    from africanus_tpu.ops.es import es_jnp

    return es_jnp(z, beta)


def kernel_taper(xi, support, beta, quad_points=64):
    """Fourier transform of the gridding kernel, evaluated at normalised
    frequencies ``xi`` (cycles per grid cell): ∫ψ(t)·cos(2π·t·xi)dt with
    ψ(t) = es((2/W)·t) on t ∈ [−W/2, W/2]. Gauss-Legendre quadrature."""
    nodes, weights = np.polynomial.legendre.leggauss(quad_points)
    half = support / 2.0
    t = nodes * half  # quad nodes on [-W/2, W/2]
    wq = weights * half
    psi = np.exp(beta * (np.sqrt(np.maximum(1.0 - (t / half) ** 2, 0.0)) - 1.0))
    xi = np.asarray(xi)
    return (psi * wq) @ np.cos(2.0 * np.pi * np.outer(t, xi))


def _wavelength_coords(uvw, freq):
    """(row·chan,) u, v, w in wavelengths (host numpy inputs)."""
    scale = np.asarray(freq) / lightspeed
    u = np.multiply.outer(np.asarray(uvw)[:, 0], scale).ravel()
    v = np.multiply.outer(np.asarray(uvw)[:, 1], scale).ravel()
    w = np.multiply.outer(np.asarray(uvw)[:, 2], scale).ravel()
    return u, v, w


def _wavelength_coords_jnp(uvw, freq):
    """Traced variant of :func:`_wavelength_coords`."""
    scale = jnp.asarray(freq) / lightspeed
    u = (uvw[:, 0:1] * scale[None, :]).ravel()
    v = (uvw[:, 1:2] * scale[None, :]).ravel()
    w = (uvw[:, 2:3] * scale[None, :]).ravel()
    return u, v, w


def _tile_plan(uvw, freq, plan, nx, ny, cellx, celly, fused_wstack=True):
    """Pallas tile-binning sub-plan (host metadata; see ops/pallas_grid).

    Mirrors :func:`_spread_indices_weights` in f64 host numpy: uv window
    starts + fractional offsets per (row·chan) sample. With
    ``fused_wstack`` (default) a multi-plane problem keeps one entry per
    sample and the kernel spreads to every touched w-plane; with it off
    (the per-shard packed-plan path, whose array protocol predates the
    fused kernel) each sample expands to one virtual sample per plane
    with the w-axis ES tap as scale.
    """
    from africanus_tpu.ops import pallas_grid as pg

    support, beta = plan["support"], plan["beta"]
    nu, nv, nplanes = plan["nu"], plan["nv"], plan["nplanes"]
    if support > min(pg.default_tiles(nu, nv, support)):
        # the tiles plan_tiles would actually pick cannot hold the
        # window (awkward grid factorisation) — scatter fallback rather
        # than a ValueError deep in the plan build
        return None

    u_l, v_l, w_l = _wavelength_coords(uvw, freq)
    u_pix = np.mod(u_l * (nu * cellx), nu)
    v_pix = np.mod(v_l * (nv * celly), nv)
    iu0 = np.floor(u_pix).astype(np.int64) - (support // 2 - 1)
    iv0 = np.floor(v_pix).astype(np.int64) - (support // 2 - 1)
    uf = u_pix - iu0
    vf = v_pix - iv0

    if nplanes > 1:
        half = support / 2.0
        offs = np.arange(support)
        w_pix = (w_l - plan["w0"]) / plan["dw"]
        iw0 = np.floor(w_pix).astype(np.int64) - (support // 2 - 1)
        from africanus_tpu.ops.es import es_np

        kw = es_np((w_pix[:, None] - (iw0[:, None] + offs)) / half, beta)
        n = iu0.shape[0]
        if fused_wstack:
            # one entry per sample: the kernel spreads each window into
            # all `support` touched planes — measured 2.6x the
            # virtual-sample kernel and ~17x faster planning. Tile
            # columns target ONE 128-lane block (tile_c ≤ 128−2W): every
            # per-entry block op runs over tpad_c lanes while only ~W
            # carry taps, and halving the lanes measured 3.3x on the
            # degridder (lane-throughput bound; the gridder's RMW chains
            # measured no slower narrow). The output block holds EVERY
            # plane of one tile in VMEM: shrink the tile until the
            # budget fits, else fall back to the virtual-sample plan.
            tc = pg.choose_tile(nv, 128 - 2 * support)
            pack = (_wgrid_pack()
                    if pg.WSTACK_USE_MXU and _wgrid_row_bucket() else 1)
            if pg.WSTACK_USE_MXU and pack > 1:
                # packed row-bucket regime (round-5): small sub-groups
                # maximise bucket fill, supergroup packing amortises the
                # per-step cost, and row-bucketing already made the dot
                # cost independent of tile_r — so LARGE tiles (fewer,
                # fuller buckets) + small groups win: tr128/g128/pack8
                # measured 48.4 Mvis/s dirty (50.6 with bf16x3 dots)
                # vs tr32/g512/unpacked's
                # 20.1 at the config-4 shape (benchmarks/RESULTS.md).
                tr_targets, group = (128, 64, 32), 128
            elif pg.WSTACK_USE_MXU:
                # unpacked MXU route: per-entry cost is
                # nwin·tpad_r·tpad_c so SMALL row tiles win —
                # tr32/group512 measured 17.2 Mvis/s @13 s compile vs
                # tr128/group1024's 16.4 @217 s (1024² grid, 200k
                # samples, 14 planes); tr16 loses to group-count
                # overhead (8.3). Small tiles also shrink the
                # VMEM-per-plane footprint ~3x, so deep stacks fit
                # unblocked.
                tr_targets, group = (32, 64, 16), 512
            else:
                # VPU scatter route, tile_r 128 measured best for the
                # degridder (256-row tiles double-buffer 2x the VMEM and
                # lost ~30%); the gridder is insensitive to tile_r
                tr_targets, group = (128, 256, 64), 1024
            # sweep overrides (benchmarks/sweep_wgrid.py)
            if os.environ.get("AFRICANUS_TPU_WGRID_TR"):
                tr_targets = tuple(
                    int(x) for x in
                    os.environ["AFRICANUS_TPU_WGRID_TR"].split(","))
            if os.environ.get("AFRICANUS_TPU_WGRID_GROUP"):
                group = int(os.environ["AFRICANUS_TPU_WGRID_GROUP"])
            for target_r in tr_targets:
                tr = pg.choose_tile(nu, target_r)
                if support > min(tr, tc):
                    continue
                _, tpad_r, tpad_c = pg.tile_pad_geometry(tr, tc, support)
                # re+im f32 blocks. The gridder's revisited OUTPUT blocks
                # are not double-buffered, but the degridder reads the
                # same plan and its tile blocks are INPUTS — the pipeline
                # double-buffers those, so the binding budget is 4 copies
                # (re+im × 2).
                vmem = nplanes * tpad_r * tpad_c * 4 * 4
                if vmem <= 13 * 2**20:
                    # register-merge width for the VPU scatter kernel
                    # (plan_tiles_wstack merge): batches same-address
                    # windows into one RMW per plane. MEASURED NO WIN
                    # on v5e (11.6 -> 10.8 Mvis/s at merge 8: the fused
                    # multi-plane kernel's RMW chains already interleave
                    # across planes and the kernel is VPU-issue bound,
                    # so merge only adds bucket padding) — default 1,
                    # kept env-tunable for other toolchains/shapes.
                    merge = int(os.environ.get(
                        "AFRICANUS_TPU_WGRID_MERGE", "1"))
                    # row-bucketed groups shrink the MXU kernels' row
                    # extent from tpad_r to blk (~3x fewer MACs at the
                    # default tiles); the scatter kernels read bucketed
                    # plans unchanged (ordering-only overlay), so the
                    # flag keys off the route target
                    row_bucket = (pg.WSTACK_USE_MXU and merge == 1
                                  and _wgrid_row_bucket())
                    tplan = pg.plan_tiles_wstack(
                        iu0, iv0, uf, vf, support, beta, nu, nv,
                        p0=iw0, wscales=kw.T, nplanes=nplanes,
                        tile_r=tr, tile_c=tc, group=group, merge=merge,
                        row_bucket=row_bucket,
                    )
                    if pack > 1 and tplan.get("row_bucket"):
                        tplan = pg.pack_supergroups(tplan, pack)
                    return tplan
            # the whole stack fits no tile size: plane-blocked MXU
            # plan — VMEM holds one depth-P w-block per tile instead of
            # all nplanes, so deep stacks keep full-size tiles. The
            # largest 8-multiple P that fits minimises the
            # boundary-duplication fraction ((support-1)/P of entries).
            if pg.WSTACK_USE_MXU:
                for target_r in tr_targets:
                    tr = pg.choose_tile(nu, target_r)
                    if support > min(tr, tc):
                        continue
                    _, tpad_r, tpad_c = pg.tile_pad_geometry(
                        tr, tc, support)
                    pmax = (13 * 2**20) // (tpad_r * tpad_c * 16)
                    P = min((pmax // 8) * 8, -(-nplanes // 8) * 8)
                    if P >= support:
                        tplan = pg.plan_tiles_wstack(
                            iu0, iv0, uf, vf, support, beta, nu, nv,
                            p0=iw0, wscales=kw.T, nplanes=nplanes,
                            tile_r=tr, tile_c=tc, group=group,
                            plane_block=P,
                            row_bucket=_wgrid_row_bucket(),
                        )
                        if pack > 1 and tplan.get("row_bucket"):
                            tplan = pg.pack_supergroups(tplan, pack)
                        return tplan
        plane_v = np.clip((iw0[:, None] + offs), 0, nplanes - 1).ravel()
        return pg.plan_tiles(
            np.repeat(iu0, support), np.repeat(iv0, support),
            np.repeat(uf, support), np.repeat(vf, support),
            support, beta, nu, nv,
            sample_id=np.repeat(np.arange(n), support),
            scale=kw.ravel(), plane=plane_v, nplanes=nplanes,
        )

    return pg.plan_tiles(iu0, iv0, uf, vf, support, beta, nu, nv)


def _use_tiles_default():
    """Pallas tile gridding: on for real TPU backends, off elsewhere
    (tests exercise it explicitly in interpret mode)."""
    return jax.default_backend() == "tpu"


def _plan(uvw, freq, nx, ny, cellx, celly, epsilon, do_wstacking):
    """Host-side gridding plan: grid sizes, w-plane layout, tapers."""
    support, beta = _kernel_params(epsilon)
    nu, nv = _SIGMA * nx, _SIGMA * ny

    # image-plane coordinates and n-1
    x = (np.arange(nx) - nx / 2) * cellx
    y = (np.arange(ny) - ny / 2) * celly
    xx, yy = np.meshgrid(x, y, indexing="ij")
    eps2 = xx**2 + yy**2
    nm1 = -eps2 / (np.sqrt(np.maximum(1.0 - eps2, 0.0)) + 1.0)
    n = nm1 + 1.0

    # uv taper correction over the *central* nx/ny pixels
    xi_x = (np.arange(nx) - nx / 2) / nu
    xi_y = (np.arange(ny) - ny / 2) / nv
    cx = kernel_taper(xi_x, support, beta)
    cy = kernel_taper(xi_y, support, beta)
    uv_taper = np.outer(cx, cy)

    _, _, w_l = _wavelength_coords(uvw, freq)
    if do_wstacking:
        wmin, wmax = float(w_l.min()), float(w_l.max())
        nm1_absmax = float(np.abs(nm1).max())
        if nm1_absmax == 0.0 or wmax == wmin:
            dw = 1.0
        else:
            dw = 1.0 / (2.0 * _SIGMA * nm1_absmax)
        nplanes = int(np.ceil((wmax - wmin) / dw)) + support + 2
        w0 = wmin - dw * (support // 2 + 1)
        # w taper at the image's nonuniform coordinate nm1. The taper is
        # an even, smooth 1D function of xi = nm1·dw, so evaluate the
        # quadrature on an 8192-point table and linearly interpolate:
        # interp error ≲ (Δxi)²·max|f''|/8 ≈ 1e-7·f(0) — far below the
        # kernel epsilon — while direct evaluation at every image pixel
        # dominated the whole plan build (nx·ny × quad_points cosines).
        xi_abs = np.abs(nm1.ravel()) * dw
        xi_max = float(xi_abs.max())
        if xi_max == 0.0:
            w_taper = np.full_like(nm1, kernel_taper(
                np.zeros(1), support, beta)[0])
        else:
            tab_xi = np.linspace(0.0, xi_max, 8192)
            tab = kernel_taper(tab_xi, support, beta)
            w_taper = np.interp(xi_abs, tab_xi, tab).reshape(nm1.shape)
    else:
        nplanes, w0, dw = 1, 0.0, 1.0
        w_taper = np.ones_like(nm1)

    return dict(
        support=support,
        beta=beta,
        nu=nu,
        nv=nv,
        nplanes=nplanes,
        w0=w0,
        dw=dw,
        nm1=nm1,
        n=n,
        uv_taper=uv_taper,
        w_taper=w_taper,
    )


def _spread_indices_weights(u_l, v_l, w_l, plan, nx, ny, cellx, celly, beta):
    """Grid-space coordinates and 1D kernel offset weights per sample."""
    support = plan["support"]
    nu, nv = plan["nu"], plan["nv"]

    if max(nu, nv) >= 8192 and u_l.dtype != jnp.float64:
        # the tile path computes these coordinates in host f64 exactly
        # to avoid this: at u_pix ~ 1e4 the f32 ulp is ~1e-3 cells, so
        # the ES tap arguments (and the delivered epsilon) degrade
        import logging

        logging.getLogger(__name__).warning(
            "wgridder scatter path computing %dx%d grid coordinates in "
            "%s: the f32 pixel-coordinate rounding (~1e-3 cells at this "
            "size) caps the delivered accuracy regardless of epsilon; "
            "use the tile path (use_tiles=True with concrete uvw) or a "
            "float64 backend for large grids", nu, nv, u_l.dtype,
        )

    u_pix = u_l * (nu * cellx)  # cycles -> grid cells (Δu = 1/(nu·Δl))
    v_pix = v_l * (nv * celly)
    u_pix = jnp.mod(u_pix, nu)
    v_pix = jnp.mod(v_pix, nv)

    iu0 = jnp.floor(u_pix).astype(jnp.int32) - (support // 2 - 1)
    iv0 = jnp.floor(v_pix).astype(jnp.int32) - (support // 2 - 1)

    half = support / 2.0
    offs = jnp.arange(support)
    ku = es_kernel((u_pix[:, None] - (iu0[:, None] + offs)) / half, beta)
    kv = es_kernel((v_pix[:, None] - (iv0[:, None] + offs)) / half, beta)

    if plan["nplanes"] > 1:
        w_pix = (w_l - plan["w0"]) / plan["dw"]
        iw0 = jnp.floor(w_pix).astype(jnp.int32) - (support // 2 - 1)
        kw = es_kernel((w_pix[:, None] - (iw0[:, None] + offs)) / half, beta)
    else:
        iw0 = jnp.zeros(u_l.shape, jnp.int32)
        kw = jnp.ones((u_l.shape[0], 1))

    return iu0, iv0, iw0, ku, kv, kw


from africanus_tpu.utils.plancache import LRUCache, content_key

_MAKE_PLAN_CACHE = LRUCache(4)


def make_plan(uvw, freq, nx, ny, cellx, celly, epsilon, do_wstacking=True,
              use_tiles=None):
    """Public wrapper building the host-side gridding plan from concrete
    uvw/freq, for use with traced gridding calls (shard_map etc.).

    ``use_tiles`` additionally builds the Pallas tile-binning sub-plan
    (default: auto — on for TPU backends).

    Plans are cached by input content (4-entry LRU): selfcal major
    cycles grid/degrid the same uvw/freq every iteration, and the plan
    build is pure host work. Treat the returned dict as read-only."""
    uvw = np.asarray(uvw)
    freq = np.asarray(freq)
    if use_tiles is None:
        use_tiles = _use_tiles_default()
    from africanus_tpu.ops import pallas_grid as pg

    key = content_key(
        (uvw, freq),
        (nx, ny, cellx, celly, epsilon, do_wstacking, bool(use_tiles),
         pg.WSTACK_USE_MXU, _wgrid_row_bucket(),
         os.environ.get("AFRICANUS_TPU_WGRID_MERGE", "1"),
         os.environ.get("AFRICANUS_TPU_WGRID_TR", ""),
         os.environ.get("AFRICANUS_TPU_WGRID_GROUP", ""),
         _wgrid_pack()),
    )
    hit = _MAKE_PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    plan = _plan(uvw, freq, nx, ny, cellx, celly, epsilon, do_wstacking)
    if use_tiles:
        plan["tile_plan"] = _tile_plan(uvw, freq, plan, nx, ny, cellx,
                                       celly)
        # epsilon-gated bf16x3 dots for the fused MXU route: the
        # hand-rolled 3-pass scheme is ~7e-6 relative vs HIGHEST —
        # negligible against a 1e-4 ES budget (dirty 48.4 -> 50.6
        # Mvis/s at the config-4 shape), but it would dominate the
        # support-10 (eps ~1e-7) accuracy floor, so tighter epsilons
        # keep HIGHEST. AFRICANUS_TPU_WGRID_DOT overrides either way.
        tp = plan.get("tile_plan")
        if (tp is not None and epsilon >= 1e-4
                and tp.get("wstack_fused")):
            tp.setdefault("dot_mode", "bf16x3")
    return _MAKE_PLAN_CACHE.put(key, plan)


def grid_adjoint(uvw, freq, vis, wgt, nx, ny, cellx, celly, epsilon,
                 do_wstacking=True, mask=None, plan=None, use_tiles=None,
                 tile_arrays=None, double_accum=False):
    """ms2dirty equivalent: visibilities → dirty image (nx, ny).

    ``plan`` may be precomputed with :func:`make_plan` from *concrete*
    uvw — required when uvw is traced (e.g. inside shard_map), since the
    w-plane layout is data-dependent host metadata.

    On TPU the spreading step runs in the Pallas tile gridder
    (ops/pallas_grid.py) instead of an XLA scatter (~5-7x faster);
    ``use_tiles`` forces it on/off (on non-TPU backends "on" means
    pallas interpret mode — for tests). ``tile_arrays`` optionally
    substitutes traced packed entry arrays for the tile plan's — the
    per-shard plan mechanism (see ops.pallas_grid.pack_shard_plans).

    ``double_accum`` accumulates the grid (and everything downstream)
    in float64 regardless of the visibility dtype — the ducc0 contract
    behind the reference's ``double_precision_accumulation``
    (vis2im.py:78). It requires a backend with float64 (the f32-only
    Pallas tile path is bypassed); on float64-less backends (this TPU)
    it raises rather than silently returning f32-accumulated results.
    """
    if double_accum:
        if jax.config.jax_enable_x64 is False or (
            jax.default_backend() == "tpu"
        ):
            raise ValueError(
                "double_accum=True needs float64 (enable jax x64 on a "
                "CPU/GPU backend); this backend would silently "
                "accumulate in float32"
            )
        use_tiles = False  # the Pallas tile path is float32-only
    if use_tiles is None:
        use_tiles = _use_tiles_default()
    if plan is None:
        # the LRU-cached builder: selfcal major cycles regrid the same
        # uvw/freq every iteration
        plan = make_plan(np.asarray(uvw), np.asarray(freq), nx, ny,
                         cellx, celly, epsilon, do_wstacking,
                         use_tiles=use_tiles)
    if use_tiles and "tile_plan" not in plan:
        # caller-supplied plan without a tile plan: attach to a copy
        # (cached plans are shared, read-only objects)
        plan = dict(plan)
        plan["tile_plan"] = _tile_plan(
            np.asarray(uvw), np.asarray(freq), plan, nx, ny, cellx, celly
        )
    tile_plan = plan.get("tile_plan") if use_tiles else None
    support = plan["support"]
    beta = plan["beta"]
    nu, nv, nplanes = plan["nu"], plan["nv"], plan["nplanes"]

    u_l, v_l, w_l = _wavelength_coords_jnp(jnp.asarray(uvw),
                                           jnp.asarray(freq))

    v = cplx(vis)
    vre = v.re.reshape(-1)
    vim = v.im.reshape(-1)
    if double_accum:
        vre = vre.astype(jnp.float64)
        vim = vim.astype(jnp.float64)
    if wgt is not None:
        wgt_f = jnp.asarray(wgt).reshape(-1)
        vre = vre * wgt_f
        vim = vim * wgt_f
    if mask is not None:
        m = jnp.asarray(mask).reshape(-1).astype(vre.dtype)
        vre = vre * m
        vim = vim * m

    if tile_plan is not None:
        from africanus_tpu.ops.pallas_grid import (
            assemble_tiles,
            assemble_wstack_tiles,
            grid_tiles_pallas,
            grid_tiles_wstack_mxu,
            grid_tiles_wstack_pallas,
            wstack_use_mxu,
        )

        interpret = jax.default_backend() != "tpu"
        if tile_plan.get("wstack_fused"):
            grid_fn = (grid_tiles_wstack_mxu if wstack_use_mxu(tile_plan)
                       else grid_tiles_wstack_pallas)
            t_re, t_im = grid_fn(tile_plan, vre, vim,
                                 interpret=interpret,
                                 arrays=tile_arrays)
            grid_re, grid_im = assemble_wstack_tiles(t_re, t_im, tile_plan)
        else:
            from africanus_tpu.ops.pallas_grid import (
                grid_tiles_mxu, tiles_use_mxu,
            )

            g2_fn = (grid_tiles_mxu if tiles_use_mxu(tile_plan)
                     else grid_tiles_pallas)
            t_re, t_im = g2_fn(tile_plan, vre, vim,
                               interpret=interpret,
                               arrays=tile_arrays)
            grid_re, grid_im = assemble_tiles(t_re, t_im, tile_plan)
    else:
        iu0, iv0, iw0, ku, kv, kw = _spread_indices_weights(
            u_l, v_l, w_l, plan, nx, ny, cellx, celly, beta
        )

        # One flat scatter over all W (xWxW) kernel offsets. Index/weight
        # arrays are shaped (offsets, N): a trailing small dim (e.g.
        # (N,6,6,6)) would be padded to the (8,128) tile — 30x memory at
        # production sizes.
        offs = jnp.arange(support)
        iu_all = jnp.mod(iu0[None, :] + offs[:, None], nu)  # (W, N)
        iv_all = jnp.mod(iv0[None, :] + offs[:, None], nv)
        if nplanes > 1:
            iw_all = jnp.clip(iw0[None, :] + offs[:, None], 0, nplanes - 1)
            kw_all = kw.T  # (W, N)
            wsup = support
        else:
            iw_all = jnp.zeros((1, iu0.shape[0]), jnp.int32)
            kw_all = jnp.ones((1, iu0.shape[0]), vre.dtype)
            wsup = 1

        # ((Ww·Wu·Wv), N) flat grid indices and weights
        flat_idx = (
            (iw_all[:, None, None, :] * nu + iu_all[None, :, None, :]) * nv
            + iv_all[None, None, :, :]
        ).reshape(wsup * support * support, -1)
        wj = (
            kw_all[:, None, None, :]
            * ku.T[None, :, None, :]
            * kv.T[None, None, :, :]
        ).reshape(wsup * support * support, -1)

        # accumulate at the promoted dtype (the kernel weights may be f64
        # under x64 while vis are f32 — scatter requires matching dtypes)
        acc_t = jnp.result_type(vre.dtype, wj.dtype)
        flat_re = jnp.zeros(nplanes * nu * nv, acc_t).at[
            flat_idx.reshape(-1)
        ].add((vre[None, :] * wj).reshape(-1))
        flat_im = jnp.zeros(nplanes * nu * nv, acc_t).at[
            flat_idx.reshape(-1)
        ].add((vim[None, :] * wj).reshape(-1))
        grid_re = flat_re.reshape(nplanes, nu, nv)
        grid_im = flat_im.reshape(nplanes, nu, nv)

    # FFT with the e^{+2πi} convention: split-pair ifft2 * (nu*nv), centred
    ire, iim = cifft2(grid_re, grid_im, axes=(1, 2))
    ire = jnp.fft.fftshift(ire, axes=(1, 2)) * (nu * nv)
    iim = jnp.fft.fftshift(iim, axes=(1, 2)) * (nu * nv)

    # central crop
    cu, cv = (nu - nx) // 2, (nv - ny) // 2
    ire = ire[:, cu : cu + nx, cv : cv + ny]
    iim = iim[:, cu : cu + nx, cv : cv + ny]

    nm1 = jnp.asarray(plan["nm1"])
    if nplanes > 1:
        w_p = plan["w0"] + plan["dw"] * jnp.arange(nplanes)
        # e^{-2πi·w_p·nm1} per plane, summed
        phase = -2.0 * jnp.pi * w_p[:, None, None] * nm1[None, :, :]
        re = (ire * jnp.cos(phase) - iim * jnp.sin(phase)).sum(axis=0)
        dirty = re / jnp.asarray(plan["w_taper"])
        dirty = dirty / jnp.asarray(plan["n"])
    else:
        dirty = ire[0]

    dirty = dirty / jnp.asarray(plan["uv_taper"])
    return dirty


def degrid_ri(uvw, freq, image, wgt, cellx, celly, epsilon,
              do_wstacking=True, mask=None, plan=None,
              use_tiles=None, tile_arrays=None) -> Cplx:
    """dirty2ms equivalent: image (nx, ny) → model visibilities (row, chan)
    as a split re/im pair.

    Forward model: V(u,v,w) = Σ_xy I(x,y)/n · e^{−2πi·(u·x + v·y − w·(n−1))}
    (the adjoint of :func:`grid_adjoint`).

    On TPU the interpolation step runs in the Pallas tile degridder
    (ops/pallas_grid.py) instead of an XLA gather (~10x faster); see
    :func:`grid_adjoint` for ``use_tiles`` semantics.
    """
    image = jnp.asarray(image)
    nx, ny = image.shape
    if use_tiles is None:
        use_tiles = _use_tiles_default()
    if plan is None:
        plan = make_plan(np.asarray(uvw), np.asarray(freq), nx, ny,
                         cellx, celly, epsilon, do_wstacking,
                         use_tiles=use_tiles)
    # fused w-stack plans (one entry per sample, all-planes VMEM block)
    # serve the degridder directly; only when the caller's plan lacks
    # the key is one built here (membership, not None: a stored-None
    # tile plan means the scatter fallback was already chosen)
    if use_tiles:
        if "tile_plan" not in plan:
            plan = dict(plan)  # cached plans are shared, read-only
            plan["tile_plan"] = _tile_plan(
                np.asarray(uvw), np.asarray(freq), plan, nx, ny,
                cellx, celly,
            )
        tile_plan = plan.get("tile_plan")
    else:
        tile_plan = None
    support, beta = plan["support"], plan["beta"]
    nu, nv, nplanes = plan["nu"], plan["nv"], plan["nplanes"]

    u_l, v_l, w_l = _wavelength_coords_jnp(jnp.asarray(uvw),
                                           jnp.asarray(freq))
    nsamp = u_l.shape[0]

    img = image / jnp.asarray(plan["uv_taper"])
    nm1 = jnp.asarray(plan["nm1"])

    if nplanes > 1:
        img = img / (jnp.asarray(plan["w_taper"]) * jnp.asarray(plan["n"]))
        w_p = plan["w0"] + plan["dw"] * jnp.arange(nplanes)
        # plane k: img · e^{+2πi·w_p·nm1} (conjugate-transpose of adjoint)
        phase = 2.0 * jnp.pi * w_p[:, None, None] * nm1[None, :, :]
        planes_re = img[None] * jnp.cos(phase)
        planes_im = img[None] * jnp.sin(phase)
    else:
        planes_re = img[None]
        planes_im = jnp.zeros_like(planes_re)

    # pad to the oversampled grid (image centred)
    cu, cv = (nu - nx) // 2, (nv - ny) // 2
    pad = ((0, 0), (cu, nu - nx - cu), (cv, nv - ny - cv))
    planes_re = jnp.pad(planes_re, pad)
    planes_im = jnp.pad(planes_im, pad)

    # forward FFT with e^{-2πi}: split-pair fft2 of the ifftshift'ed image
    planes_re = jnp.fft.ifftshift(planes_re, axes=(1, 2))
    planes_im = jnp.fft.ifftshift(planes_im, axes=(1, 2))
    gre, gim = cfft2(planes_re, planes_im, axes=(1, 2))

    if tile_plan is not None:
        from africanus_tpu.ops.pallas_grid import (
            degrid_tiles_pallas,
            degrid_tiles_wstack_mxu,
            degrid_tiles_wstack_pallas,
            extract_tiles,
            extract_wstack_tiles,
            wstack_use_mxu,
        )

        interpret = jax.default_backend() != "tpu"
        if tile_plan.get("wstack_fused"):
            tre, tim = extract_wstack_tiles(gre, gim, tile_plan)
            degrid_fn = (degrid_tiles_wstack_mxu
                         if wstack_use_mxu(tile_plan)
                         else degrid_tiles_wstack_pallas)
            out_re, out_im = degrid_fn(
                tile_plan, tre, tim, nsamp, interpret=interpret,
                arrays=tile_arrays,
            )
        else:
            from africanus_tpu.ops.pallas_grid import (
                degrid_tiles_mxu, tiles_use_mxu,
            )

            tre, tim = extract_tiles(gre, gim, tile_plan)
            d2_fn = (degrid_tiles_mxu if tiles_use_mxu(tile_plan)
                     else degrid_tiles_pallas)
            out_re, out_im = d2_fn(tile_plan, tre, tim, nsamp,
                                   interpret=interpret,
                                   arrays=tile_arrays)
    else:
        iu0, iv0, iw0, ku, kv, kw = _spread_indices_weights(
            u_l, v_l, w_l, plan, nx, ny, cellx, celly, beta
        )

        offs = jnp.arange(support)
        iu_all = jnp.mod(iu0[None, :] + offs[:, None], nu)  # (W, N)
        iv_all = jnp.mod(iv0[None, :] + offs[:, None], nv)
        if nplanes > 1:
            iw_all = jnp.clip(iw0[None, :] + offs[:, None], 0, nplanes - 1)
            kw_all = kw.T
            wsup = support
        else:
            iw_all = jnp.zeros((1, iu0.shape[0]), jnp.int32)
            kw_all = jnp.ones((1, iu0.shape[0]), image.dtype)
            wsup = 1

        flat_idx = (
            (iw_all[:, None, None, :] * nu + iu_all[None, :, None, :]) * nv
            + iv_all[None, None, :, :]
        ).reshape(wsup * support * support, -1)
        wj = (
            kw_all[:, None, None, :]
            * ku.T[None, :, None, :]
            * kv.T[None, None, :, :]
        ).reshape(wsup * support * support, -1)

        gre_flat = gre.reshape(-1)
        gim_flat = gim.reshape(-1)
        out_re = (gre_flat[flat_idx] * wj).sum(axis=0)
        out_im = (gim_flat[flat_idx] * wj).sum(axis=0)

    if wgt is not None:
        wgt_f = jnp.asarray(wgt).reshape(-1)
        out_re = out_re * wgt_f
        out_im = out_im * wgt_f
    if mask is not None:
        m = jnp.asarray(mask).reshape(-1).astype(out_re.dtype)
        out_re = out_re * m
        out_im = out_im * m

    nrow = jnp.shape(uvw)[0]
    nchan = jnp.shape(freq)[0]
    return Cplx(out_re.reshape(nrow, nchan), out_im.reshape(nrow, nchan))


def degrid(uvw, freq, image, wgt, cellx, celly, epsilon, do_wstacking=True,
           mask=None, plan=None, use_tiles=None):
    """Image -> visibilities through the w-stacking degridder, complex
    output (reference ``gridding/wgridder/im2vis.py:65`` dirty2ms).
    Complex-capable backends only; on TPU use :func:`degrid_ri`.

    Parameters
    ----------
    uvw : (row, 3) float metres
    freq : (chan,) float Hz
    image : (nx, ny) float sky image
    wgt : (row, chan) float weights or None
    cellx, celly : float pixel size, radians
    epsilon : float requested accuracy (1e-3 .. 1e-9)
    do_wstacking : bool — w-term correction via w-planes
    mask : optional (row, chan) bool selection
    plan : optional precomputed plan (``make_plan``) for reuse
    use_tiles : force/forbid the Pallas tile kernels (None = auto)

    Returns
    -------
    (row, chan) complex visibilities.
    """
    out = degrid_ri(uvw, freq, image, wgt, cellx, celly, epsilon,
                    do_wstacking, mask, plan=plan, use_tiles=use_tiles)
    return jax.lax.complex(out.re, out.im)
