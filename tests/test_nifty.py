"""nifty-API gridder tests: grid→dirty vs explicit DFT and grid/degrid
adjointness (reference strategy: gridding/nifty tests compare against
the gridder round trip)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.gridding.nifty import grid_config, grid, degrid, dirty, model
from africanus_tpu.ops.cplx import Cplx, to_numpy

C = 2.99792458e8


@pytest.fixture
def nifty_problem(rng):
    nx = ny = 16
    cell_arcsec = 5.0 * 3600 / 16  # 5 deg fov over 16 pix
    cell_rad = np.deg2rad(cell_arcsec / 3600.0)
    nrow, nchan, ncorr = 200, 2, 2
    freq = 1e9 + np.arange(nchan) * 1e8
    uvw = (rng.uniform(size=(nrow, 3)) - 0.5) / (cell_rad * freq[-1] / C)
    uvw[:, 2] = 0.0  # nifty API path is w-free
    vis = rng.normal(size=(nrow, nchan, ncorr)) + 1j * rng.normal(
        size=(nrow, nchan, ncorr)
    )
    flags = np.zeros(vis.shape, np.uint8)
    gc = grid_config(nx, ny, 1e-7, cell_arcsec, cell_arcsec)
    return gc, uvw, freq, vis, flags


def explicit_dirty(uvw, freq, ms, nx, ny, cell_rad):
    x, y = np.meshgrid(
        *[-s / 2 + np.arange(s) for s in (nx, ny)], indexing="ij"
    )
    x *= cell_rad
    y *= cell_rad
    out = np.zeros((nx, ny))
    for r in range(ms.shape[0]):
        for c in range(ms.shape[1]):
            phase = freq[c] / C * (x * uvw[r, 0] + y * uvw[r, 1])
            out += (ms[r, c] * np.exp(2j * np.pi * phase)).real
    return out


def test_nifty_grid_dirty_vs_dft(nifty_problem):
    gc, uvw, freq, vis, flags = nifty_problem
    g = grid(vis, uvw, flags, None, freq, gc)
    d = np.asarray(dirty(g, gc))
    assert d.shape == (16, 16, 2)

    cell_rad = np.deg2rad(gc.csx / 3600.0)
    ref = explicit_dirty(uvw, freq, vis[:, :, 0], 16, 16, cell_rad)
    l2 = np.sqrt(np.sum((d[:, :, 0] - ref) ** 2) / np.sum(ref**2))
    assert l2 < 1e-5


def test_nifty_grid_degrid_adjoint(rng, nifty_problem):
    gc, uvw, freq, vis, flags = nifty_problem
    g = grid(vis, uvw, flags, None, freq, gc)
    G = rng.normal(size=to_numpy(g).shape) + 1j * rng.normal(
        size=to_numpy(g).shape
    )
    dg = to_numpy(degrid(Cplx(G.real, G.imag), uvw, flags, None, freq, gc))
    lhs = np.vdot(G, to_numpy(g))
    rhs = np.vdot(dg, vis)
    assert_allclose(lhs, rhs, rtol=1e-10)


def test_nifty_model_adjoint_of_dirty(rng, nifty_problem):
    gc, uvw, freq, vis, flags = nifty_problem
    g = rng.normal(size=(32, 32, 1)) + 1j * rng.normal(size=(32, 32, 1))
    img = rng.normal(size=(16, 16, 1))
    # <dirty(G), I> == <G, model(I)>
    lhs = np.sum(np.asarray(dirty(Cplx(g.real, g.imag), gc)) * img)
    m = to_numpy(model(img, gc))
    rhs = np.vdot(g, m).real * (32 * 32) / (32 * 32)  # same scaling
    # dirty uses ifft*N while model uses fft: adjoint up to the N factor
    assert_allclose(lhs, np.vdot(g, m).real, rtol=1e-10)


def test_nifty_flags_zero_contribution(nifty_problem):
    gc, uvw, freq, vis, flags = nifty_problem
    flags_all = np.ones_like(flags)
    g = grid(vis, uvw, flags_all, None, freq, gc)
    assert np.abs(to_numpy(g)).max() == 0.0


def test_nifty_w_window_partitions(nifty_problem, rng):
    """grid() honors [wmin, wmax) row windows (reference getIndices
    w-range selection, nifty/dask.py): two complementary windows must
    partition the default all-rows grid exactly."""
    gc, uvw, freq, vis, flags = nifty_problem
    uvw = uvw.copy()
    uvw[:, 2] = rng.uniform(-50.0, 50.0, uvw.shape[0])
    v = Cplx(vis.real, vis.imag)
    g_all = to_numpy(grid(v, uvw, flags, None, freq, gc))
    wcut = float(np.median(np.abs(uvw[:, 2])))
    g_lo = to_numpy(grid(v, uvw, flags, None, freq, gc,
                         wmin=0.0, wmax=wcut))
    g_hi = to_numpy(grid(v, uvw, flags, None, freq, gc,
                         wmin=wcut, wmax=1e30))
    assert np.abs(g_lo).max() > 0 and np.abs(g_hi).max() > 0
    assert_allclose(g_lo + g_hi, g_all, atol=1e-12 * np.abs(g_all).max())


def test_nifty_degrid_ignores_weights(nifty_problem):
    """degrid() weights are 'Currently unsupported and ignored'
    (reference nifty/dask.py:509): passing weights must not change the
    output, while flags still zero rows."""
    gc, uvw, freq, vis, flags = nifty_problem
    v = Cplx(vis.real, vis.imag)
    g = grid(v, uvw, flags, None, freq, gc)
    d0 = to_numpy(degrid(g, uvw, flags, None, freq, gc))
    d1 = to_numpy(degrid(g, uvw, flags,
                         7.5 * np.ones(vis.shape), freq, gc))
    assert np.array_equal(d0, d1)
    fl = flags.copy()
    fl[::3] = 1
    d2 = to_numpy(degrid(g, uvw, fl, None, freq, gc))
    assert np.all(d2[::3] == 0)
    assert np.array_equal(d2[1::3], d0[1::3])
