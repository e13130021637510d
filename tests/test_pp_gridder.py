"""Perley-polyhedron gridder tests (reference:
gridding/perleypolyhedron/{gridder,degridder,kernels,policies})."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.gridding.perleypolyhedron import (
    gridder,
    degridder,
    kernels,
    policies,
)
from africanus_tpu.ops.cplx import Cplx, to_numpy

C = 2.99792458e8


def test_kernels_pack_unpack():
    W, os = 7, 5
    k = kernels.kbsinc(W, oversample=os)
    packed = kernels.pack_kernel(k, W, oversample=os)
    assert_allclose(kernels.unpack_kernel(packed, W, oversample=os), k)


def test_detaper_consistency():
    W, os, npix = 5, 5, 32
    k1d = kernels.kbsinc(W, oversample=os)
    K2d = np.outer(k1d, k1d)
    fft_version = kernels.compute_detaper(npix, K2d, W, os)
    sep_version = kernels.compute_detaper_dft_seperable(npix, k1d, W, os)
    # same up to overall scaling conventions of the fft grid
    ratio = fft_version / sep_version
    assert np.ptp(ratio) / np.abs(ratio).mean() < 1e-8


def test_stokes_policies_roundtrip(rng):
    v = Cplx(rng.normal(size=(6, 3)), rng.normal(size=(6, 3)))
    corr = policies.stokes2corr(v, "XXXYYXYY_FROM_I")
    assert corr.re.shape == (6, 3, 4)
    back = policies.corr2stokes(corr, "I_FROM_XXXYYXYY")
    assert_allclose(np.asarray(back.re), np.asarray(v.re), rtol=1e-12)

    with pytest.raises(ValueError, match="Invalid stokes mapping"):
        policies.corr2stokes(corr, "BOGUS")
    assert policies.ncorr_out("XXYY_FROM_I") == 2


def test_phase_transform_inverse(rng):
    nrow, nchan = 8, 4
    vis = Cplx(rng.normal(size=(nrow, nchan, 1)), rng.normal(size=(nrow, nchan, 1)))
    uvw = rng.uniform(-100, 100, (nrow, 3))
    wl = C / np.linspace(1e9, 2e9, nchan)
    args = (uvw, wl, 0.1, -0.3, 0.12, -0.31)
    fwd = policies.phase_transform(vis, *args, "phase_rotate", phasesign=1.0)
    back = policies.phase_transform(fwd, *args, "phase_rotate", phasesign=-1.0)
    assert_allclose(np.asarray(back.re), np.asarray(vis.re), rtol=1e-10)
    assert_allclose(np.asarray(back.im), np.asarray(vis.im), rtol=1e-10)


@pytest.fixture
def pp_problem(rng):
    npix, nrow, nchan = 64, 100, 2
    cell = 8.0  # arcsec
    wl = C / np.array([1.0e9, 1.1e9])
    fov = npix * cell / 3600.0 * np.pi / 180.0
    uvw = rng.uniform(-0.4, 0.4, (nrow, 3)) / fov * wl.min() / wl.min()
    uvw[:, 2] = 0.0
    uvw *= wl.min()  # metres such that scaled coords stay in grid
    return npix, cell, wl, uvw


def test_gridder_degridder_adjoint(rng, pp_problem):
    """<grid(V), G> == <V, degrid(G)> — scatter/gather with the same
    kernel must form an adjoint pair."""
    npix, cell, wl, uvw = pp_problem
    nrow, nchan = uvw.shape[0], wl.shape[0]
    W, os = 7, 63
    kern = kernels.kbsinc(W, oversample=os)
    chanmap = np.zeros(nchan, np.int32)
    centre = (0.2, -0.4)

    # identical data in both correlations => stokes I equals that value
    v0 = rng.normal(size=(nrow, nchan)) + 1j * rng.normal(size=(nrow, nchan))
    vis = Cplx(np.stack([v0.real] * 2, -1), np.stack([v0.imag] * 2, -1))
    grid = to_numpy(
        gridder(uvw, vis, wl, chanmap, npix, cell, centre, centre,
                kern, W, os, "None", "None", "I_FROM_XXYY",
                "conv_1d_axisymmetric_unpacked_scatter")
    )
    # random test grid for the adjoint identity at the stokes level
    G = rng.normal(size=grid.shape) + 1j * rng.normal(size=grid.shape)
    dg = to_numpy(
        degridder(uvw, Cplx(G.real, G.imag), wl, chanmap, cell, centre,
                  centre, kern, W, os, "None", "None", "XXYY_FROM_I",
                  "conv_1d_axisymmetric_unpacked_gather")
    )
    # degrid is the cw-NORMALISED adjoint (the reference gather policies
    # divide by the accumulated convolution weight): undo cw to test the
    # pure adjoint identity
    from africanus_tpu.gridding.perleypolyhedron.gridder import (
        _scaled_coords, _tap_geometry,
    )

    su, sv = _scaled_coords(uvw, wl, npix, cell)
    kj = np.asarray(kern)
    gu, ku = _tap_geometry(su, npix, W, os)
    gv, kv = _tap_geometry(sv, npix, W, os)
    cw_u = (kj[np.asarray(ku)]
            * ((np.asarray(gu) >= 0) & (np.asarray(gu) < npix))).sum(-1)
    cw_v = (kj[np.asarray(kv)]
            * ((np.asarray(gv) >= 0) & (np.asarray(gv) < npix))).sum(-1)
    cw = cw_v * cw_u + 1e-8

    lhs = np.vdot(G, grid)
    rhs = np.vdot(dg[..., 0] * cw, v0)
    assert_allclose(lhs, rhs, rtol=1e-10)


def test_gridder_point_source_psf(pp_problem):
    """Gridding unit visibilities (a point source at centre) then FFTing
    must peak at the image centre (the PSF)."""
    npix, cell, wl, uvw = pp_problem
    nrow, nchan = uvw.shape[0], wl.shape[0]
    W, os = 7, 63
    kern = kernels.kbsinc(W, oversample=os)
    chanmap = np.zeros(nchan, np.int32)
    centre = (0.0, 0.0)
    vis = Cplx(np.ones((nrow, nchan, 2)), np.zeros((nrow, nchan, 2)))

    grid = to_numpy(
        gridder(uvw, vis, wl, chanmap, npix, cell, centre, centre, kern, W,
                os, "None", "None", "I_FROM_XXYY",
                "conv_1d_axisymmetric_packed_scatter" if False else
                "conv_1d_axisymmetric_unpacked_scatter", do_normalize=True)
    )
    psf = np.fft.fftshift(np.fft.ifft2(np.fft.ifftshift(grid[0]))).real
    peak = np.unravel_index(np.argmax(psf), psf.shape)
    assert peak == (npix // 2, npix // 2)


def test_packed_equals_unpacked(rng, pp_problem):
    npix, cell, wl, uvw = pp_problem
    nrow, nchan = uvw.shape[0], wl.shape[0]
    W, os = 7, 63
    kern = kernels.kbsinc(W, oversample=os)
    packed = kernels.pack_kernel(kern, W, oversample=os)
    chanmap = np.zeros(nchan, np.int32)
    centre = (0.0, 0.0)
    vis = Cplx(rng.normal(size=(nrow, nchan, 2)), rng.normal(size=(nrow, nchan, 2)))

    a = to_numpy(gridder(uvw, vis, wl, chanmap, npix, cell, centre, centre,
                         kern, W, os, "None", "None", "I_FROM_XXYY",
                         "conv_1d_axisymmetric_unpacked_scatter"))
    b = to_numpy(gridder(uvw, vis, wl, chanmap, npix, cell, centre, centre,
                         packed, W, os, "None", "None", "I_FROM_XXYY",
                         "conv_1d_axisymmetric_packed_scatter"))
    assert_allclose(a, b, rtol=1e-12)


def test_degridder_vs_dft(pp_problem):
    """Degridding a centred point source must produce unit visibilities
    (the reference's degridder-vs-DFT strategy)."""
    npix, cell, wl, uvw = pp_problem
    nchan = wl.shape[0]
    W, os = 7, 63
    kern = kernels.kbsinc(W, oversample=os)
    chanmap = np.zeros(nchan, np.int32)
    centre = (0.0, 0.0)

    # FFT-plane representation of a unit point source at the image centre
    # divided by the detaper: a constant uv grid / detaper fourier dual
    detaper = kernels.compute_detaper_dft_seperable(npix, kern, W, os)
    img = np.zeros((npix, npix))
    img[npix // 2, npix // 2] = 1.0
    ftgrid = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(img / detaper)))
    grid = Cplx(ftgrid.real[None], ftgrid.imag[None])

    out = to_numpy(
        degridder(uvw, grid, wl, chanmap, cell, centre, centre, kern, W, os,
                  "None", "None", "XXYY_FROM_I",
                  "conv_1d_axisymmetric_unpacked_gather")
    )
    # a centred point source has flat UNIT visibilities: the gather
    # policy's cw normalisation pins the absolute scale (reference
    # convolution_policies.py:269), and the phase is zero to the kernel
    # accuracy bound
    assert_allclose(np.abs(out), 1.0, rtol=2e-2)
    assert np.abs(np.angle(out)).max() < 2e-2


def test_pp_tile_path_matches_scatter(rng, pp_problem):
    """The table-mode Pallas tile path (interpret mode, forced via a
    precomputed plan) must match the scatter/gather paths exactly."""
    import importlib

    import jax.numpy as jnp

    G = importlib.import_module(
        "africanus_tpu.gridding.perleypolyhedron.gridder"
    )

    npix, cell, wl, uvw = pp_problem
    nrow, nchan = uvw.shape[0], wl.shape[0]
    W, os = 7, 63
    kern = kernels.kbsinc(W, oversample=os)
    chanmap = np.zeros(nchan, np.int32)
    centre = (0.2, -0.4)
    vis = Cplx(rng.normal(size=(nrow, nchan, 2)),
               rng.normal(size=(nrow, nchan, 2)))
    common = (wl, chanmap, npix, cell, centre, centre, kern, W, os,
              "rotate", "phase_rotate", "I_FROM_XXYY",
              "conv_1d_axisymmetric_packed_scatter")

    plan = G.pp_tile_plan(uvw, wl, chanmap, npix, cell, centre, centre,
                          W, os, "rotate")
    tiles = G.gridder(uvw, vis, *common, tile_plan=plan)
    scat = G.gridder(uvw, vis, *common)  # CPU backend → scatter
    assert_allclose(np.asarray(tiles.re), np.asarray(scat.re), rtol=1e-10,
                    atol=1e-14)
    assert_allclose(np.asarray(tiles.im), np.asarray(scat.im), rtol=1e-10,
                    atol=1e-14)

    # degrid dual
    grid = Cplx(rng.normal(size=(1, npix, npix)),
                rng.normal(size=(1, npix, npix)))
    dargs = (wl, chanmap, cell, centre, centre, kern, W, os, "rotate",
             "phase_rotate", "XXYY_FROM_I",
             "conv_1d_axisymmetric_packed_gather")
    dplan = G.pp_tile_plan(uvw, wl, chanmap, npix, cell, centre, centre,
                           W, os, "rotate", direction="degrid")
    dt = G.degridder(uvw, grid, *dargs, tile_plan=dplan)
    dg = G.degridder(uvw, grid, *dargs)
    assert_allclose(np.asarray(dt.re), np.asarray(dg.re), rtol=1e-10,
                    atol=1e-14)


@pytest.mark.parametrize("stokes,fwd,inv", [
    ("I", "XXYY_FROM_I", "I_FROM_XXYY"),
    ("I", "XXXYYXYY_FROM_I", "I_FROM_XXXYYXYY"),
    ("I", "RRLL_FROM_I", "I_FROM_RRLL"),
    ("I", "RRRLLRLL_FROM_I", "I_FROM_RRRLLRLL"),
    ("Q", "XXYY_FROM_Q", "Q_FROM_XXYY"),
    ("Q", "XXXYYXYY_FROM_Q", "Q_FROM_XXXYYXYY"),
    ("Q", "RRRLLRLL_FROM_Q", "Q_FROM_RRRLLRLL"),
    ("U", "XYYX_FROM_U", "U_FROM_XYYX"),
    ("U", "XXXYYXYY_FROM_U", "U_FROM_XXXYYXYY"),
    ("U", "RLLR_FROM_U", "U_FROM_RLLR"),
    ("U", "RRRLLRLL_FROM_U", "U_FROM_RRRLLRLL"),
    ("V", "XYYX_FROM_V", "V_FROM_XYYX"),
    ("V", "XXXYYXYY_FROM_V", "V_FROM_XXXYYXYY"),
    ("V", "RRLL_FROM_V", "V_FROM_RRLL"),
    ("V", "RRRLLRLL_FROM_V", "V_FROM_RRRLLRLL"),
])
def test_stokes_policy_table_roundtrip(rng, stokes, fwd, inv):
    """Every (stokes → corr schema → stokes) policy pair in the table
    must be an exact inverse — the reference sweeps the same pairs
    (perleypolyhedron/policies stokes_conversion_policies.py)."""
    v = Cplx(rng.normal(size=(5, 2)), rng.normal(size=(5, 2)))
    corr = policies.stokes2corr(v, fwd)
    assert corr.re.shape[-1] == policies.ncorr_out(fwd)
    back = policies.corr2stokes(corr, inv)
    assert_allclose(np.asarray(back.re), np.asarray(v.re), rtol=1e-12,
                    atol=1e-13)
    assert_allclose(np.asarray(back.im), np.asarray(v.im), rtol=1e-12,
                    atol=1e-13)


def test_baseline_transform_policies(rng, pp_problem):
    """'rotate' facet-tilt transform at the phase centre itself must be
    the identity; a tilted facet changes w but preserves |uvw|."""
    npix, cell, wl, uvw = pp_problem
    ra0, dec0 = 0.3, -0.5
    same = policies.baseline_transform(uvw, ra0, dec0, ra0, dec0, "rotate")
    assert_allclose(np.asarray(same), uvw, rtol=1e-10, atol=1e-8)
    ident = policies.baseline_transform(uvw, ra0, dec0, 0.31, -0.51, "None")
    assert_allclose(np.asarray(ident), uvw, rtol=1e-14)
    tilted = np.asarray(
        policies.baseline_transform(uvw, ra0, dec0, 0.31, -0.51, "rotate")
    )
    assert not np.allclose(tilted, uvw)
    assert_allclose(np.linalg.norm(tilted, axis=1),
                    np.linalg.norm(uvw, axis=1), rtol=1e-10)


def test_wcorrection_faceting_backward(rng):
    """Facet imaging of an off-centre source: gridding DFT visibilities
    of a point ~600 px from the phase centre into a small facet CENTRED
    on the source (phase rotation + baseline rotation policies) must
    put the peak at the facet centre with near-unit amplitude
    (reference test_wcorrection_faceting_backward,
    perleypolyhedron/tests/test_ppgridder.py:655-799)."""
    from africanus_tpu.coordinates import radec_to_lm
    from africanus_tpu.dft import im_to_vis_ri

    W, os = 5, 9
    kern = kernels.kbsinc(W, oversample=os)
    nrow_bl, ntime = 25, 40
    nrow = nrow_bl * ntime
    d0 = np.pi / 4.0
    blpos = rng.uniform(26, 10000, size=(nrow_bl, 3))
    h0s = np.linspace(np.deg2rad(-20), np.deg2rad(20), ntime)
    s, c = np.sin, np.cos
    uvw = np.zeros((nrow, 3))
    for n in range(nrow_bl):
        for ih, h0 in enumerate(h0s):
            R = np.array([
                [s(h0), c(h0), 0],
                [-s(d0) * c(h0), s(d0) * s(h0), c(d0)],
                [c(d0) * c(h0), -c(d0) * s(h0), s(d0)],
            ])
            uvw[n * ntime + ih] = R @ blpos[n]

    freq = np.array([1.4e9])
    wl = C / freq
    pxacrossbeam = 5
    cell_rad = wl[0] / (max(np.abs(uvw[:, 0]).max(),
                            np.abs(uvw[:, 1]).max()) * pxacrossbeam)
    cell = np.rad2deg(cell_rad) * 3600  # arcsec
    npixfacet = 100

    # source 600 cells off the phase centre; facet centred on it
    offset = 600 * cell_rad
    phase_centre = np.array([0.0, d0])
    source_radec = phase_centre + np.array([offset, offset])
    lm = np.asarray(radec_to_lm(source_radec[None, :], phase_centre))

    image = np.ones((1, 1, 1))
    vis1 = im_to_vis_ri(image, uvw, lm, freq)
    vis = Cplx(np.repeat(np.asarray(vis1.re), 2, axis=-1).reshape(nrow, 1, 2),
               np.repeat(np.asarray(vis1.im), 2, axis=-1).reshape(nrow, 1, 2))

    chanmap = np.array([0], np.int32)
    facet_grid = to_numpy(
        gridder(uvw, vis, wl, chanmap, npixfacet, cell,
                tuple(source_radec), tuple(phase_centre), kern, W, os,
                "rotate", "phase_rotate", "I_FROM_XXYY",
                "conv_1d_axisymmetric_packed_scatter",
                do_normalize=True)
    )
    img = np.fft.fftshift(
        np.fft.ifft2(np.fft.ifftshift(facet_grid[0]))
    ).real * npixfacet**2

    peak = np.unravel_index(np.argmax(img), img.shape)
    # the source lands at the facet centre with unit amplitude — the
    # facet phase rotation has taken out the w-term exactly (the
    # reference asserts |max - 1| < 1e-6 on the same construction)
    assert abs(peak[0] - npixfacet // 2) <= 1
    assert abs(peak[1] - npixfacet // 2) <= 1
    assert abs(img.max() - 1.0) < 1e-6


def test_wcorrection_faceting_forward(rng):
    """Degridding a unit point source at an offset FACET centre
    (baseline 'rotate' + conjugate 'phase_rotate' policies) must match
    the direct w-aware DFT of the same source at the 99th-percentile
    0.05 bar (reference test_wcorrection_faceting_forward,
    perleypolyhedron/tests/test_ppgridder.py:802-900). Regression for
    the conjugate transform reading the baseline-TRANSFORMED uvw."""
    from africanus_tpu.coordinates import radec_to_lm
    from africanus_tpu.dft import im_to_vis_ri

    W, os = 5, 9
    kern = kernels.pack_kernel(kernels.kbsinc(W, oversample=os), W, os)
    nrow_bl, ntime = 25, 40
    nrow = nrow_bl * ntime
    d0 = np.pi / 4.0
    blpos = rng.uniform(26, 10000, size=(nrow_bl, 3))
    h0s = np.linspace(np.deg2rad(-20), np.deg2rad(20), ntime)
    s, c = np.sin, np.cos
    uvw = np.zeros((nrow, 3))
    for n in range(nrow_bl):
        for ih, h0 in enumerate(h0s):
            R = np.array([
                [s(h0), c(h0), 0],
                [-s(d0) * c(h0), s(d0) * s(h0), c(d0)],
                [c(d0) * c(h0), -c(d0) * s(h0), s(d0)],
            ])
            uvw[n * ntime + ih] = R @ blpos[n]

    freq = np.array([1.4e9])
    wl = C / freq
    pxacrossbeam = 5
    cell_rad = wl[0] / (max(np.abs(uvw[:, 0]).max(),
                            np.abs(uvw[:, 1]).max()) * pxacrossbeam)
    cell = np.rad2deg(cell_rad) * 3600  # arcsec
    npixfacet = 100

    # facet centre 20 cells off the phase centre; source AT facet centre
    phase_centre = np.array([0.0, d0])
    facet_centre = phase_centre + 20 * cell_rad
    lm = np.asarray(radec_to_lm(facet_centre[None, :], phase_centre))

    vis_dft = im_to_vis_ri(np.ones((1, 1, 1)), uvw, lm, freq)
    want_re = np.asarray(vis_dft.re)[:, 0, 0]
    want_im = np.asarray(vis_dft.im)[:, 0, 0]

    # a constant uv grid is the FT of a delta at the facet centre
    ftmod = Cplx(np.ones((1, npixfacet, npixfacet)),
                 np.zeros((1, npixfacet, npixfacet)))
    chanmap = np.array([0], np.int32)
    out = degridder(uvw, ftmod, wl, chanmap, cell,
                    tuple(facet_centre), tuple(phase_centre), kern, W, os,
                    "rotate", "phase_rotate", "XXYY_FROM_I",
                    "conv_1d_axisymmetric_packed_gather")
    got_re = np.asarray(out.re)[:, 0, 0]
    got_im = np.asarray(out.im)[:, 0, 0]

    assert np.percentile(np.abs(want_re - got_re), 99.0) < 0.05
    assert np.percentile(np.abs(want_im - got_im), 99.0) < 0.05


def test_kernel_stopband_quality():
    """The windowed sincs must actually anti-alias: compare worst
    stopband leakage (response beyond twice the first null) of each
    kernel's oversampled transfer function. kbsinc must beat the plain
    sinc by > 20 dB and hanning by > 13 dB (assertion form of the
    reference's plot-only test_construct_kernels)."""
    W, os = 5, 101

    def stopband_db(k):
        # transfer function over the oversampled tap support
        sel = kernels.uspace(W, os) <= (W + 2) // 2
        H = np.abs(np.fft.fftshift(np.fft.fft(k[sel])))
        H = H / H.max()
        n = H.size
        # in-band = central 1/os fraction (the image FoV); stopband =
        # beyond 3x that half-width
        hw = max(1, n // (2 * os))
        stop = np.r_[H[: n // 2 - 3 * hw], H[n // 2 + 3 * hw + 1:]]
        return 20 * np.log10(stop.max())

    db_sinc = stopband_db(kernels.sinc(W, oversample=os))
    db_han = stopband_db(kernels.hanningsinc(W, oversample=os))
    db_kb = stopband_db(kernels.kbsinc(W, oversample=os))
    # the KB window is the anti-aliasing workhorse: it must beat the
    # plain sinc by >20 dB and the hanning window by >13 dB, and every
    # candidate kernel must suppress the stopband below -25 dB
    assert db_kb < db_sinc - 20.0
    assert db_kb < db_han - 13.0
    assert max(db_sinc, db_han, db_kb) < -25.0


def test_facet_codepath_offsets(rng, pp_problem):
    """Facet policies must run (and stay finite) for facet centres on
    all sides of the phase centre (reference test_facetcodepath's
    offset sweep, widened to a 4-quadrant parameter sweep)."""
    npix, cell, wl, uvw = pp_problem
    nchan = wl.shape[0]
    W, os = 5, 9
    kern = kernels.pack_kernel(kernels.kbsinc(W, oversample=os), W, os)
    chanmap = np.zeros(nchan, np.int32)
    d0 = 0.3
    cell_rad = np.deg2rad(cell / 3600.0)
    vis = Cplx(rng.normal(size=(uvw.shape[0], nchan, 2)),
               rng.normal(size=(uvw.shape[0], nchan, 2)))

    for dx, dy in ((15, 0), (-15, 0), (0, 15), (0, -15), (10, -10)):
        centre = (dx * cell_rad, d0 + dy * cell_rad)
        g = to_numpy(
            gridder(uvw, vis, wl, chanmap, npix, cell, centre, (0.0, d0),
                    kern, W, os, "rotate", "phase_rotate", "I_FROM_XXYY",
                    "conv_1d_axisymmetric_packed_scatter")
        )
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0
        dg = degridder(uvw, Cplx(g.real, g.imag), wl, chanmap, cell,
                       centre, (0.0, d0), kern, W, os,
                       "rotate", "phase_rotate", "XXYY_FROM_I",
                       "conv_1d_axisymmetric_packed_gather")
        assert np.isfinite(np.asarray(dg.re)).all()
        assert np.isfinite(np.asarray(dg.im)).all()
