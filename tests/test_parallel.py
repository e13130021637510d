"""shard_map orchestration invariance tests (virtual 8-device CPU mesh) —
the TPU analogue of the reference's dask chunking-invariance tests."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

import jax

from africanus_tpu.parallel import (
    make_mesh,
    sharded_im_to_vis,
    sharded_vis_to_im,
    sharded_rime_predict,
    sharded_dirty,
    sharded_psf,
)
from africanus_tpu.ops.cplx import Cplx, to_numpy
from africanus_tpu.dft import im_to_vis, vis_to_im
from africanus_tpu.gridding.wgridder.core import grid_adjoint

C = 2.99792458e8


@pytest.fixture
def problem(rng):
    S, R, F, Cc = 10, 64, 16, 2
    lm = rng.uniform(-0.01, 0.01, (S, 2))
    uvw = rng.uniform(-1000, 1000, (R, 3))
    freq = np.linspace(1e9, 2e9, F)
    img = rng.normal(size=(S, F, Cc))
    vis = rng.normal(size=(R, F, Cc)) + 1j * rng.normal(size=(R, F, Cc))
    return lm, uvw, freq, img, vis


def test_sharded_im_to_vis(problem):
    lm, uvw, freq, img, _ = problem
    mesh = make_mesh((8,), ("row",))
    out = to_numpy(sharded_im_to_vis(mesh, img, uvw, lm, freq))
    ref = np.asarray(im_to_vis(img, uvw, lm, freq))
    assert_allclose(out, ref, rtol=1e-9, atol=1e-10)


def test_sharded_vis_to_im(problem):
    lm, uvw, freq, _, vis = problem
    flags = np.zeros(vis.shape, bool)
    mesh = make_mesh((8,), ("row",))
    out = np.asarray(sharded_vis_to_im(mesh, vis, uvw, lm, freq, flags))
    ref = np.asarray(vis_to_im(vis, uvw, lm, freq, flags))
    assert_allclose(out, ref, rtol=1e-9, atol=1e-9)


def test_sharded_rime_predict_2d_mesh(problem, rng):
    lm, uvw, freq, img, _ = problem
    mesh = make_mesh((4, 2), ("row", "chan"))
    gs = np.abs(rng.normal(size=(lm.shape[0], 3))) * 1e-4
    out = to_numpy(sharded_rime_predict(mesh, lm, uvw, freq, img + 0j, gs))

    from africanus_tpu.rime import phase_delay
    from africanus_tpu.model.shape import gaussian

    K = np.asarray(phase_delay(lm, uvw, freq))
    env = np.asarray(gaussian(uvw, freq, gs))
    ref = np.einsum("srf,sfc->rfc", K * env, img)
    assert_allclose(out, ref, rtol=1e-8, atol=1e-9)


def test_sharded_dirty_and_psf(rng):
    nx = 16
    cell = 5.0 * np.pi / 180 / nx
    freq = 1e9 + np.arange(2) * 1e8
    uvw = (rng.uniform(size=(240, 3)) - 0.5) / (cell * freq[-1] / C)
    vis = rng.normal(size=(240, 2)) + 1j * rng.normal(size=(240, 2))
    mesh = make_mesh((8,), ("row",))

    d = np.asarray(sharded_dirty(mesh, uvw, freq, vis, nx, nx, cell,
                                 epsilon=1e-5, do_wstacking=True))
    ref = np.asarray(grid_adjoint(uvw, freq, vis, None, nx, nx, cell, cell,
                                  1e-5, True))
    assert_allclose(d, ref, rtol=1e-10, atol=1e-12)

    psf = np.asarray(sharded_psf(mesh, uvw, freq, nx, nx, cell))
    peak = np.unravel_index(np.argmax(psf), psf.shape)
    assert peak == (nx // 2, nx // 2)

    with pytest.raises(ValueError, match="shards"):
        sharded_dirty(mesh, uvw[:239], freq, vis[:239], nx, nx, cell)


@pytest.mark.parametrize("do_wstacking", [False, True])
def test_sharded_dirty_pallas_tiles(rng, do_wstacking):
    """Sharded dirty with per-shard Pallas tile plans (interpret mode on
    the virtual CPU mesh) must match the scatter-path result."""
    nx = 16
    cell = 5.0 * np.pi / 180 / nx
    freq = 1e9 + np.arange(2) * 1e8
    uvw = (rng.uniform(size=(240, 3)) - 0.5) / (cell * freq[-1] / C)
    vis = rng.normal(size=(240, 2)) + 1j * rng.normal(size=(240, 2))
    mesh = make_mesh((8,), ("row",))

    ref = np.asarray(sharded_dirty(mesh, uvw, freq, vis, nx, nx, cell,
                                   epsilon=1e-5, do_wstacking=do_wstacking,
                                   use_tiles=False))
    got = np.asarray(sharded_dirty(mesh, uvw, freq, vis, nx, nx, cell,
                                   epsilon=1e-5, do_wstacking=do_wstacking,
                                   use_tiles=True))
    # tile path accumulates in f32
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 5e-6


def test_stream_rows_concat_matches_full(rng):
    """Chunked streaming predict == single-shot predict (one compile)."""
    from africanus_tpu.parallel import stream_rows
    from africanus_tpu.rime.phase import phase_delay_ri

    nrow, nsrc, nchan = 100, 3, 4
    uvw = rng.normal(size=(nrow, 3)) * 100
    lm = rng.normal(size=(nsrc, 2)) * 1e-3
    freq = np.linspace(1e9, 2e9, nchan)

    import jax
    import jax.numpy as jnp

    def fn(tree, valid):
        k = phase_delay_ri(lm, tree["uvw"], freq)
        # (src, chunk, chan) -> row-leading for stitching
        return jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 1, 0), k)

    out = stream_rows(fn, {"uvw": uvw}, chunk=32, combine="concat")
    full = phase_delay_ri(lm, uvw, freq)
    assert_allclose(out.re, np.moveaxis(np.asarray(full.re), 1, 0),
                    rtol=1e-12)
    assert out.re.shape == (nrow, nsrc, nchan)


def test_stream_rows_sum_matches_full(rng):
    """Chunked adjoint-DFT reduction == single-shot (masked pad rows)."""
    from africanus_tpu.dft import vis_to_im_ri
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.parallel import stream_rows

    nrow, nsrc, nchan = 70, 4, 3
    uvw = rng.normal(size=(nrow, 3)) * 100
    lm = rng.normal(size=(nsrc, 2)) * 1e-3
    freq = np.linspace(1e9, 2e9, nchan)
    vis = Cplx(rng.normal(size=(nrow, nchan, 1)),
               rng.normal(size=(nrow, nchan, 1)))
    flags = np.zeros((nrow, nchan, 1), bool)

    def fn(tree, valid):
        import jax.numpy as jnp

        flg = ~valid[:, None, None] | tree["flags"]
        return vis_to_im_ri(tree["vis"], tree["uvw"], lm, freq, flg)

    out = stream_rows(fn, {"uvw": uvw, "vis": vis, "flags": flags},
                      chunk=32, combine="sum")
    full = vis_to_im_ri(vis, uvw, lm, freq, flags)
    assert_allclose(np.asarray(out), np.asarray(full), rtol=1e-10)


@pytest.mark.parametrize("use_tiles", [False, True])
def test_sharded_degrid_matches_local(rng, use_tiles):
    """Row-sharded degrid (scatter and per-shard Pallas tile plans) must
    match the single-device result."""
    from africanus_tpu.gridding.wgridder.core import degrid_ri
    from africanus_tpu.parallel import sharded_degrid

    nx = 16
    cell = 5.0 * np.pi / 180 / nx
    freq = 1e9 + np.arange(2) * 1e8
    uvw = (rng.uniform(size=(240, 3)) - 0.5) / (cell * freq[-1] / C)
    image = rng.normal(size=(nx, nx))
    mesh = make_mesh((8,), ("row",))

    out = sharded_degrid(mesh, uvw, freq, image, cell=cell, epsilon=1e-5,
                         do_wstacking=True, use_tiles=use_tiles)
    ref = degrid_ri(uvw, freq, image, None, cell, cell, 1e-5, True,
                    use_tiles=False)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    want = np.asarray(ref.re) + 1j * np.asarray(ref.im)
    tol = 5e-6 if use_tiles else 1e-10
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < tol


@pytest.mark.parametrize("use_tiles", [False, True])
def test_sharded_residual_matches_local(rng, use_tiles):
    """sharded residual (dirty of vis − degrid(image)) equals the
    unsharded composition."""
    from africanus_tpu.gridding.wgridder.core import degrid_ri, grid_adjoint
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.parallel import make_mesh, sharded_residual

    mesh = make_mesh((8,), ("row",))
    nx = 16
    cell = 4.0 * np.pi / 180 / nx
    freq = 1e9 + np.arange(2) * 1e8
    nrow = 64
    uvw = ((rng.uniform(size=(nrow, 3)) - 0.5)
           / (cell * freq[-1] / 2.99792458e8)).astype(np.float32)
    vis = Cplx(rng.normal(size=(nrow, 2)).astype(np.float32),
               rng.normal(size=(nrow, 2)).astype(np.float32))
    image = rng.normal(size=(nx, nx)).astype(np.float32)

    got = np.asarray(
        sharded_residual(mesh, uvw, freq, vis, image, cell, epsilon=1e-5,
                         do_wstacking=True, use_tiles=use_tiles)
    )
    model = degrid_ri(uvw, freq, image, None, cell, cell, 1e-5, True,
                      use_tiles=use_tiles)
    resid = Cplx(vis.re - model.re, vis.im - model.im)
    want = np.asarray(
        grid_adjoint(uvw, freq, resid, None, nx, nx, cell, cell, 1e-5,
                     True, use_tiles=use_tiles)
    )
    assert_allclose(got, want, rtol=1e-4, atol=1e-5 * np.abs(want).max())


def test_make_mesh_strict_and_degrade():
    """Library default raises on an oversubscribed mesh; explicit
    strict=False degrades to the best-fitting factorisation rather than
    collapsing trailing axes to 1 (round-2 advisor finding)."""
    import warnings

    import pytest

    from africanus_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="devices"):
        make_mesh((16, 2), ("row", "chan"))

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m = make_mesh((4, 4), ("row", "chan"), strict=False)  # 8 devices
    assert dict(m.shape) == {"row": 4, "chan": 2}

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m = make_mesh((2, 8), ("row", "chan"), strict=False)
    assert dict(m.shape) == {"row": 2, "chan": 4}


def test_sharded_pp_gridder_matches_local(rng):
    """Row-sharded Perley-polyhedron gridding (partial grids psum) and
    degridding (replicated grid) equal the single-device calls — the
    reference's dask pp layer property (perleypolyhedron/dask.py)."""
    from africanus_tpu.gridding.perleypolyhedron import (
        degridder, gridder, kernels,
    )
    from africanus_tpu.ops.cplx import Cplx, to_numpy
    from africanus_tpu.parallel import (
        make_mesh, sharded_pp_degridder, sharded_pp_gridder,
    )

    C = 2.99792458e8
    npix, nrow, nchan = 64, 96, 2
    cell = 8.0  # arcsec
    wl = C / np.array([1.0e9, 1.1e9])
    fov = npix * cell / 3600.0 * np.pi / 180.0
    uvw = rng.uniform(-0.4, 0.4, (nrow, 3)) / fov
    uvw[:, 2] = 0.0
    uvw *= wl.min()
    W, os = 7, 63
    kern = kernels.kbsinc(W, oversample=os)
    chanmap = np.zeros(nchan, np.int32)
    centre = (0.2, -0.4)
    pol_args = ("None", "None", "I_FROM_XXYY",
                "conv_1d_axisymmetric_unpacked_scatter")

    v0 = rng.normal(size=(nrow, nchan)) + 1j * rng.normal(size=(nrow, nchan))
    vis = Cplx(np.stack([v0.real] * 2, -1), np.stack([v0.imag] * 2, -1))

    local_grid = to_numpy(
        gridder(uvw, vis, wl, chanmap, npix, cell, centre, centre,
                kern, W, os, *pol_args)
    )
    mesh = make_mesh((8,), ("row",))
    shard_grid = to_numpy(
        sharded_pp_gridder(mesh, uvw, vis, wl, chanmap, npix, cell,
                           centre, centre, kern, W, os, *pol_args)
    )
    assert_allclose(shard_grid, local_grid, rtol=1e-12, atol=1e-12)

    grid_c = Cplx(rng.normal(size=(1, npix, npix)),
                  rng.normal(size=(1, npix, npix)))
    pol_args_d = ("None", "None", "XXYY_FROM_I",
                  "conv_1d_axisymmetric_packed_gather")
    local_vis = to_numpy(
        degridder(uvw, grid_c, wl, chanmap, cell, centre, centre,
                  kern, W, os, *pol_args_d)
    )
    shard_vis = to_numpy(
        sharded_pp_degridder(mesh, uvw, grid_c, wl, chanmap, cell,
                             centre, centre, kern, W, os, *pol_args_d)
    )
    assert_allclose(shard_vis, local_vis, rtol=1e-12, atol=1e-12)


def test_sharded_pp_tiles_matches_local(rng):
    """Row-sharded pp gridding/degridding on the *packed table-mode tile
    path* (per-shard Pallas plans stacked by pack_shard_plans, interpret
    mode on CPU) equals the scatter/gather single-device calls."""
    from africanus_tpu.gridding.perleypolyhedron import (
        degridder, gridder, kernels,
    )
    from africanus_tpu.ops.cplx import Cplx, to_numpy
    from africanus_tpu.parallel import (
        make_mesh, sharded_pp_degridder, sharded_pp_gridder,
    )

    C = 2.99792458e8
    npix, nrow, nchan = 64, 96, 2
    cell = 8.0  # arcsec
    wl = C / np.array([1.0e9, 1.1e9])
    fov = npix * cell / 3600.0 * np.pi / 180.0
    uvw = rng.uniform(-0.4, 0.4, (nrow, 3)) / fov
    uvw[:, 2] = 0.0
    uvw *= wl.min()
    W, os = 7, 63
    kern = kernels.kbsinc(W, oversample=os)
    chanmap = np.zeros(nchan, np.int32)
    centre = (0.2, -0.4)
    pol_args = ("None", "None", "I_FROM_XXYY",
                "conv_1d_axisymmetric_unpacked_scatter")

    v0 = rng.normal(size=(nrow, nchan)) + 1j * rng.normal(size=(nrow, nchan))
    vis = Cplx(np.stack([v0.real] * 2, -1), np.stack([v0.imag] * 2, -1))

    local_grid = to_numpy(
        gridder(uvw, vis, wl, chanmap, npix, cell, centre, centre,
                kern, W, os, *pol_args)
    )
    mesh = make_mesh((8,), ("row",))
    shard_grid = to_numpy(
        sharded_pp_gridder(mesh, uvw, vis, wl, chanmap, npix, cell,
                           centre, centre, kern, W, os, *pol_args,
                           use_tiles=True)
    )
    # tile kernels accumulate in f32
    assert_allclose(shard_grid, local_grid, rtol=3e-5, atol=3e-5)

    grid_c = Cplx(rng.normal(size=(1, npix, npix)),
                  rng.normal(size=(1, npix, npix)))
    pol_args_d = ("None", "None", "XXYY_FROM_I",
                  "conv_1d_axisymmetric_packed_gather")
    local_vis = to_numpy(
        degridder(uvw, grid_c, wl, chanmap, cell, centre, centre,
                  kern, W, os, *pol_args_d)
    )
    shard_vis = to_numpy(
        sharded_pp_degridder(mesh, uvw, grid_c, wl, chanmap, cell,
                             centre, centre, kern, W, os, *pol_args_d,
                             use_tiles=True)
    )
    assert_allclose(shard_vis, local_vis, rtol=3e-5, atol=3e-5)


def test_pack_shard_plans_table_format(rng):
    """pack_shard_plans stacks table-mode plans: padded inert entries
    (scale 0) leave grids/vis untouched, geometry disagreements raise."""
    from africanus_tpu.ops import pallas_grid as pg

    npix, W, os = 64, 7, 63
    n1, n2 = 37, 61  # unequal entry counts -> padding on one shard
    plans = []
    for n in (n1, n2):
        ir0 = rng.integers(0, npix - W, n)
        ic0 = rng.integers(0, npix - W, n)
        fr = rng.integers(0, os, n).astype(np.int32)
        fc = rng.integers(0, os, n).astype(np.int32)
        plans.append(pg.plan_tiles_table(ir0, ic0, fr, fc, W, os,
                                         npix, npix, group=32))
    static, arrays = pg.pack_shard_plans(plans)
    assert static["oversample"] == os and static["wrap"] is False
    ng = static["ngroups"]
    for k in pg.TABLE_PLAN_ARRAY_KEYS:
        assert arrays[k].shape[:2] == (2, ng), k
    # padded groups are inert: scale == 0 everywhere past each shard's
    # own group count
    for s, p in enumerate(plans):
        tail = arrays["scale"][s, p["ngroups"]:]
        assert np.all(tail == 0.0)

    # geometry disagreement raises
    other = pg.plan_tiles_table(
        rng.integers(0, npix - W, 5), rng.integers(0, npix - W, 5),
        np.zeros(5, np.int32), np.zeros(5, np.int32), W, os + 1,
        npix, npix, group=32)
    with pytest.raises(ValueError):
        pg.pack_shard_plans([plans[0], other])
    # format disagreement (table vs virtual-sample) raises
    es_plan = {k: plans[0][k] for k in plans[0]}
    es_plan.pop("oversample")
    with pytest.raises(ValueError):
        pg.pack_shard_plans([plans[0], es_plan])


def test_sharded_residual_vis_and_gauss_newton(rng):
    """Time-bin-sharded calibration equals the single-device calls:
    residual under shard_map, phase-only Gauss-Newton over per-device
    bin groups (the reference's dask time-chunk decomposition)."""
    from africanus_tpu.calibration import (
        chunkify_rows, corrupt_vis_ri, gauss_newton_ri, residual_vis_ri,
    )
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.parallel import (
        make_mesh, sharded_gauss_newton, sharded_residual_vis,
    )

    nant, ntime, nchan = 5, 8, 3
    a1u, a2u = np.triu_indices(nant, 1)
    nbl = a1u.size
    ant1 = np.tile(a1u, ntime)
    ant2 = np.tile(a2u, ntime)
    time = np.repeat(np.arange(ntime, dtype=np.float64), nbl)
    nrow = time.size
    _, tbi, tbc = chunkify_rows(time, 1)

    true_phase = rng.uniform(-0.5, 0.5, (ntime, nant, nchan, 1, 1))
    gains = Cplx(np.cos(true_phase), np.sin(true_phase))
    model = Cplx(rng.normal(size=(nrow, nchan, 1, 1)) + 2.0,
                 rng.normal(size=(nrow, nchan, 1, 1)))
    data = corrupt_vis_ri(tbi, tbc, ant1, ant2, gains, model)
    flag = np.zeros((nrow, nchan, 1), bool)
    weight = np.ones((nrow, nchan, 1))

    mesh = make_mesh((8,), ("row",))

    res_local = residual_vis_ri(tbi, tbc, ant1, ant2, gains, data, flag,
                                model)
    res_shard = sharded_residual_vis(mesh, tbi, tbc, ant1, ant2, gains,
                                     data, flag, model)
    assert_allclose(np.asarray(res_shard.re), np.asarray(res_local.re),
                    rtol=1e-12, atol=1e-12)
    assert_allclose(np.asarray(res_shard.im), np.asarray(res_local.im),
                    rtol=1e-12, atol=1e-12)

    jones0 = Cplx(np.ones((ntime, nant, nchan, 1, 1)),
                  np.zeros((ntime, nant, nchan, 1, 1)))
    gl, _, _, _ = gauss_newton_ri(tbi, tbc, ant1, ant2, jones0, data,
                                  flag, model, weight, tol=1e-10,
                                  maxiter=50)
    gs, _, _, _ = sharded_gauss_newton(mesh, tbi, tbc, ant1, ant2,
                                       jones0, data, flag, model, weight,
                                       tol=1e-10, maxiter=50)
    # phase-only solutions have per-bin phase ambiguity; compare gain
    # PRODUCTS on the baselines, which are the physical observables
    def prods(g):
        c = np.asarray(g.re) + 1j * np.asarray(g.im)
        return c[:, a1u] * np.conj(c[:, a2u])

    assert_allclose(prods(gs), prods(gl), rtol=1e-8, atol=1e-8)


def test_chan_sharded_beam_fr_invariance(rng):
    """The fused beam DDE × feed rotation is sharding-transparent over
    the channel axis: per-chan tables (freq, pointing errors, antenna
    scaling) shard cleanly, the cube and geometry replicate, and each
    shard's chan-invariant fast path matches the unsharded result (the
    reference's dask beam layer chunks chan the same way)."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from africanus_tpu.rime.fast_beam_cubes import beam_cube_dde_fr_ri

    mesh = make_mesh((4,), ("chan",), strict=False)
    nsrc, ntime, nants, nchan, nud = 3, 2, 3, 16, 4
    lw = mh = 8
    beam = (rng.normal(size=(lw, mh, nud, 2, 2))
            + 1j * rng.normal(size=(lw, mh, nud, 2, 2)))
    beam_ri = Cplx(beam.real.astype(np.float32),
                   beam.imag.astype(np.float32))
    extents = np.array([[-0.02, 0.02], [-0.02, 0.02]], np.float32)
    fmap = np.linspace(0.9e9, 1.6e9, nud).astype(np.float32)
    freq = np.linspace(fmap[0], fmap[-1], nchan).astype(np.float32)
    lm = rng.uniform(-0.015, 0.015, (nsrc, 2)).astype(np.float32)
    pa = rng.uniform(-np.pi, np.pi, (ntime, nants)).astype(np.float32)
    pe = np.zeros((ntime, nants, nchan, 2), np.float32)
    asc = np.ones((nants, nchan, 2), np.float32)

    def full():
        return beam_cube_dde_fr_ri(beam_ri, extents, fmap, lm, pa, pe,
                                   asc, freq, use_pallas=False)

    def shard_fn(pe_s, asc_s, freq_s):
        return beam_cube_dde_fr_ri(beam_ri, extents, fmap, lm, pa,
                                   pe_s, asc_s, freq_s,
                                   use_pallas=False,
                                   chan_invariant=True)

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None, "chan"), P(None, "chan"), P("chan")),
        out_specs=P(None, None, None, "chan"),
    )
    want = to_numpy(full())
    got = to_numpy(sharded(pe, asc, freq))
    assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_bda_matches_per_chunk(rng):
    """sharded_bda (per-row-shard host binning + one SPMD average)
    equals running bda() independently on each shard's rows — the
    reference's dask-block BDA semantics (averaging/dask.py: every
    block is binned and averaged on its own)."""
    from africanus_tpu.averaging import bda
    from africanus_tpu.parallel import make_mesh, sharded_bda

    ntime, nshard = 8, 2
    ants = [(0, 1), (0, 2), (1, 2)]
    nbl = len(ants)
    time = np.repeat(5.03e9 + np.arange(ntime) * 2.0, nbl)
    interval = np.full(time.shape, 2.0)
    antenna1 = np.array([a for _ in range(ntime) for a, _ in ants])
    antenna2 = np.array([b for _ in range(ntime) for _, b in ants])
    scale = np.array([10.0, 1000.0, 8000.0])
    uvw = np.zeros((time.shape[0], 3))
    for t in range(ntime):
        for b in range(nbl):
            ang = 1e-3 * t
            uvw[t * nbl + b] = scale[b] * np.array(
                [np.cos(ang), np.sin(ang), 0.01 * np.sin(ang)])
    nchan = 8
    chan_freq = np.linspace(0.856e9, 1.712e9, nchan)
    chan_width = np.full(nchan, (chan_freq[-1] - chan_freq[0]) / (nchan - 1))
    nrow = time.shape[0]
    vis = rng.normal(size=(nrow, nchan, 2)) + 1j * rng.normal(
        size=(nrow, nchan, 2))
    flag = rng.uniform(size=vis.shape) < 0.1
    ws = rng.uniform(0.5, 2.0, vis.shape)

    mesh = make_mesh((nshard,), ("row",))
    out = sharded_bda(mesh, time, interval, antenna1, antenna2, uvw,
                      chan_freq, chan_width, visibilities=vis, flag=flag,
                      weight_spectrum=ws, decorrelation=0.95)

    rp = nrow // nshard
    for s in range(nshard):
        sl = slice(s * rp, (s + 1) * rp)
        ref = bda(time[sl], interval[sl], antenna1[sl], antenna2[sl],
                  uvw=uvw[sl], chan_freq=chan_freq, chan_width=chan_width,
                  visibilities=vis[sl], flag=flag[sl],
                  weight_spectrum=ws[sl], decorrelation=0.95)
        n = int(out.nout[s])
        assert n == np.asarray(ref.time).shape[0]
        assert_allclose(np.asarray(out.time[s, :n]), np.asarray(ref.time))
        assert_allclose(np.asarray(out.interval[s, :n]),
                        np.asarray(ref.interval))
        nr = int(out.nruns[s])
        assert nr == np.asarray(ref.decorr_chan_width).shape[0]
        assert_allclose(np.asarray(out.decorr_chan_width[s, :nr]),
                        np.asarray(ref.decorr_chan_width))
        np.testing.assert_array_equal(np.asarray(out.antenna1[s, :n]),
                                      np.asarray(ref.antenna1))
        np.testing.assert_array_equal(np.asarray(out.antenna2[s, :n]),
                                      np.asarray(ref.antenna2))
        assert_allclose(np.asarray(out.uvw[s, :n]), np.asarray(ref.uvw),
                        rtol=1e-6)
        assert_allclose(np.asarray(out.visibilities[s, :n]),
                        np.asarray(ref.visibilities), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.flag[s, :n]),
                                      np.asarray(ref.flag))
        assert_allclose(np.asarray(out.weight_spectrum[s, :n]),
                        np.asarray(ref.weight_spectrum), rtol=1e-6)


def test_sharded_time_and_channel_matches_per_chunk(rng):
    """sharded_time_and_channel equals running time_and_channel()
    independently on each shard's rows — the reference's dask-block
    averaging semantics (averaging/dask.py)."""
    from africanus_tpu.averaging import time_and_channel
    from africanus_tpu.parallel import make_mesh, sharded_time_and_channel

    ntime, nshard = 8, 2
    ants = [(0, 1), (0, 2), (1, 2)]
    nbl = len(ants)
    time = np.repeat(5.03e9 + np.arange(ntime) * 2.0, nbl)
    interval = np.full(time.shape, 2.0)
    antenna1 = np.array([a for _ in range(ntime) for a, _ in ants])
    antenna2 = np.array([b for _ in range(ntime) for _, b in ants])
    nrow = time.shape[0]
    uvw = rng.normal(size=(nrow, 3)) * 100
    nchan = 8
    chan_freq = np.linspace(0.856e9, 1.712e9, nchan)
    chan_width = np.full(nchan, (chan_freq[-1] - chan_freq[0]) / (nchan - 1))
    vis = rng.normal(size=(nrow, nchan, 2)) + 1j * rng.normal(
        size=(nrow, nchan, 2))
    flag = rng.uniform(size=vis.shape) < 0.1
    ws = rng.uniform(0.5, 2.0, vis.shape)

    mesh = make_mesh((nshard,), ("row",))
    out = sharded_time_and_channel(
        mesh, time, interval, antenna1, antenna2, uvw=uvw,
        chan_freq=chan_freq, chan_width=chan_width, visibilities=vis,
        flag=flag, weight_spectrum=ws, time_bin_secs=4.0,
        chan_bin_size=2)

    rp = nrow // nshard
    for s in range(nshard):
        sl = slice(s * rp, (s + 1) * rp)
        ref = time_and_channel(
            time[sl], interval[sl], antenna1[sl], antenna2[sl],
            uvw=uvw[sl], chan_freq=chan_freq, chan_width=chan_width,
            visibilities=vis[sl], flag=flag[sl], weight_spectrum=ws[sl],
            time_bin_secs=4.0, chan_bin_size=2)
        n = int(out.nout[s])
        assert n == np.asarray(ref.time).shape[0]
        assert_allclose(np.asarray(out.time[s, :n]), np.asarray(ref.time))
        assert_allclose(np.asarray(out.interval[s, :n]),
                        np.asarray(ref.interval))
        np.testing.assert_array_equal(np.asarray(out.antenna1[s, :n]),
                                      np.asarray(ref.antenna1))
        np.testing.assert_array_equal(np.asarray(out.antenna2[s, :n]),
                                      np.asarray(ref.antenna2))
        assert_allclose(np.asarray(out.uvw[s, :n]), np.asarray(ref.uvw),
                        rtol=1e-6)
        assert_allclose(np.asarray(out.chan_freq),
                        np.asarray(ref.chan_freq))
        assert_allclose(np.asarray(out.visibilities[s, :n]),
                        np.asarray(ref.visibilities), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.flag[s, :n]),
                                      np.asarray(ref.flag))
        assert_allclose(np.asarray(out.weight_spectrum[s, :n]),
                        np.asarray(ref.weight_spectrum), rtol=1e-6)
