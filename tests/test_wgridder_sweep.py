"""wgridder parameter sweep at the reference suite's depth.

Port of /root/reference/africanus/gridding/wgridder/tests/test_wgridder.py
(671 lines: epsilon × precision × nband × weights sweeps of
dirty/adjointness/residual/hessian, single + multi chunk). The dask
chunk legs map to the sharded variants tested in test_parallel.py; here
the single-call API surface is swept: per-band dirty vs the explicit
w-aware DFT, gridder/degridder adjointness, residual/hessian
consistency, all at both precisions with and without weights.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from africanus_tpu.gridding.wgridder import dirty, hessian, model, residual

pmp = pytest.mark.parametrize
C = 2.99792458e8


def _l2error(a, b):
    return np.sqrt(
        np.sum(np.abs(a - b) ** 2)
        / np.maximum(np.sum(np.abs(a) ** 2), np.sum(np.abs(b) ** 2))
    )


def explicit_gridder(uvw, freq, ms, wgt, nx, ny, cellx, celly,
                     apply_w=True):
    """Vectorised w-aware explicit DFT oracle (reference loop semantics,
    test_wgridder.py:14-45). ``apply_w=False`` matches the reference's
    no-w-correction limit: nm1 = 0 and NO 1/n factor (test_wgridder.py
    :26-31) — the do_wstacking=False gridder semantics."""
    x, y = np.meshgrid(
        *[-s / 2 + np.arange(s) for s in (nx, ny)], indexing="ij"
    )
    x = x * cellx
    y = y * celly
    eps = x**2 + y**2
    if apply_w:
        nm1 = -eps / (np.sqrt(1.0 - eps) + 1.0)
        n = nm1 + 1
    else:
        nm1 = np.zeros_like(eps)
        n = 1.0
    w = ms if wgt is None else ms * wgt
    phase = (freq[None, :, None, None] / C) * (
        x[None, None] * uvw[:, 0, None, None, None]
        + y[None, None] * uvw[:, 1, None, None, None]
        - uvw[:, 2, None, None, None] * nm1[None, None]
    )
    return (w[..., None, None] * np.exp(2j * np.pi * phase)).real.sum(
        axis=(0, 1)
    ) / n


def _bands(nchan, nband):
    step = max(nchan // nband, 1)
    fbi = np.arange(0, nchan, step)
    fm = np.append(fbi, nchan)
    return fbi, fm[1:] - fm[:-1]


def _problem(nrow, nchan, nx, cell, precision, seed=420):
    rng = np.random.default_rng(seed)
    rt = np.float32 if precision == "single" else np.float64
    ct = np.complex64 if precision == "single" else np.complex128
    f0 = 1e9
    freq = f0 + np.arange(nchan) * (f0 / nchan)
    uvw = ((rng.uniform(size=(nrow, 3)) - 0.5)
           / (cell * freq[-1] / C)).astype(np.float64)
    vis = (rng.uniform(size=(nrow, nchan)) - 0.5
           + 1j * (rng.uniform(size=(nrow, nchan)) - 0.5)).astype(ct)
    wgt = rng.uniform(size=(nrow, nchan)).astype(rt)
    return freq, uvw, vis, wgt


@pmp("ny", (18, 32))
# valid (nchan, nband) pairs only — a band split needs nband <= nchan,
# so the (1, 3) cell of the reference-style grid is filtered out of the
# parametrization instead of runtime-skipped (round-5 zero-skip audit)
@pmp("nchan,nband", ((1, 1), (7, 1), (7, 3)))
@pmp("precision", ("single", "double"))
@pmp("epsilon", (1e-3, 1e-4))
@pmp("weighted", (False, True))
@pmp("wstacking", (True, False))
def test_dirty_band_sweep(ny, nchan, nband, precision, epsilon, weighted,
                          wstacking):
    """Per-band dirty reaches the requested epsilon against the explicit
    w-aware DFT across band splits, precisions, weights and the
    w-stacking toggle (reference test_gridder, test_wgridder.py:48-110;
    the reference sweeps do_wstacking the same way). Without w-stacking
    the oracle drops the w phase term, matching ducc0 semantics."""
    nx, fov, nrow = 16, 5.0, 400
    cell = fov * np.pi / 180 / nx
    freq, uvw, vis, wgt = _problem(nrow, nchan, nx, cell, precision)
    if not wstacking:
        # planar-array limit: the no-wstacking gridder is only exact
        # for w == 0, like the reference's test problems
        uvw[:, 2] = 0.0
    if not weighted:
        wgt = None
    fbi, fbc = _bands(nchan, nband)

    img = np.asarray(
        dirty(uvw, freq, vis, fbi, fbc, nx, ny, cell, weights=wgt,
              epsilon=epsilon, do_wstacking=wstacking)
    )
    assert img.shape == (fbi.size, nx, ny)
    ref = np.stack(
        [
            explicit_gridder(
                uvw, freq[i : i + c], vis[:, i : i + c],
                None if wgt is None else wgt[:, i : i + c],
                nx, ny, cell, cell, apply_w=wstacking,
            )
            for i, c in zip(fbi, fbc)
        ]
    )
    # single precision cannot go below its own rounding floor; the
    # reference runs the identical bound through ducc0's f32 path
    floor = 3e-5 if precision == "single" else 0.0
    assert _l2error(img, ref) <= max(epsilon, floor)


@pmp("fov", (0.5, 2.5))
@pmp("nrow", (333, 1500))
# valid (nchan, nband) pairs only (see test_dirty_band_sweep)
@pmp("nchan,nband", ((1, 1), (4, 1), (4, 2)))
@pmp("precision", ("single", "double"))
def test_adjointness(fov, nrow, nchan, nband, precision):
    """<R† y, x> == <y, R x>: the gridder (dirty) and degridder (model)
    are exact adjoints up to epsilon (reference test_adjointness,
    test_wgridder.py:125-200)."""
    nx, ny = 30, 50
    cell = fov * np.pi / 180 / nx
    freq, uvw, vis, wgt = _problem(nrow, nchan, nx, cell, precision,
                                   seed=11)
    fbi, fbc = _bands(nchan, nband)
    rng = np.random.default_rng(12)
    image = rng.normal(size=(fbi.size, nx, ny)).astype(
        np.float32 if precision == "single" else np.float64
    )

    dirty_im = np.asarray(
        dirty(uvw, freq, vis, fbi, fbc, nx, ny, cell, weights=wgt,
              epsilon=1e-4, do_wstacking=True)
    )
    model_vis = np.asarray(
        model(uvw, freq, image, fbi, fbc, cell, weights=wgt,
              epsilon=1e-4, do_wstacking=True)
    )
    lhs = np.sum(dirty_im.astype(np.float64) * image)
    rhs = np.vdot(
        (vis * (wgt if wgt is not None else 1)).astype(np.complex128),
        model_vis / (wgt if wgt is not None else 1),
    ).real
    # adjointness holds to the kernel-approximation epsilon relative to
    # the inner-product magnitude
    tol = 1e-4 if precision == "double" else 1e-3
    scale = max(abs(lhs), abs(rhs), 1e-30)
    assert abs(lhs - rhs) / scale < tol


@pmp("precision", ("single", "double"))
@pmp("nband", (1, 2))
@pmp("weighted", (False, True))
@pmp("wstacking", (True, False))
def test_residual_consistency(precision, nband, weighted, wstacking):
    """residual() == dirty(vis) − dirty(degrid(image)) to epsilon
    (reference test_residual, test_wgridder.py:205-275), across weights
    and the w-stacking toggle."""
    nx, ny, fov, nrow, nchan = 24, 24, 1.0, 500, 4
    cell = fov * np.pi / 180 / nx
    freq, uvw, vis, wgt = _problem(nrow, nchan, nx, cell, precision,
                                   seed=21)
    if not weighted:
        wgt = None
    fbi, fbc = _bands(nchan, nband)
    rng = np.random.default_rng(22)
    image = rng.normal(size=(fbi.size, nx, ny)).astype(
        np.float32 if precision == "single" else np.float64
    )

    res = np.asarray(
        residual(uvw, freq, image, vis, fbi, fbc, cell, weights=wgt,
                 epsilon=1e-4, do_wstacking=wstacking)
    )
    mvis = np.asarray(
        model(uvw, freq, image, fbi, fbc, cell, epsilon=1e-4,
              do_wstacking=wstacking)
    )
    ref = np.asarray(
        dirty(uvw, freq, vis - mvis, fbi, fbc, nx, ny, cell, weights=wgt,
              epsilon=1e-4, do_wstacking=wstacking)
    )
    tol = 1e-4 if precision == "double" else 1e-3
    assert _l2error(res, ref) < tol


@pmp("precision", ("single", "double"))
def test_hessian_consistency(precision):
    """hessian(image) == dirty(model(image)) with matched weights
    (reference test_hessian, test_wgridder.py:281-360)."""
    nx, ny, fov, nrow, nchan, nband = 24, 24, 1.0, 500, 2, 1
    cell = fov * np.pi / 180 / nx
    freq, uvw, _, wgt = _problem(nrow, nchan, nx, cell, precision,
                                 seed=31)
    fbi, fbc = _bands(nchan, nband)
    rng = np.random.default_rng(32)
    image = rng.normal(size=(fbi.size, nx, ny)).astype(
        np.float32 if precision == "single" else np.float64
    )

    hess = np.asarray(
        hessian(uvw, freq, image, fbi, fbc, cell, weights=wgt,
                epsilon=1e-4, do_wstacking=True)
    )
    mvis = np.asarray(
        model(uvw, freq, image, fbi, fbc, cell, weights=wgt,
              epsilon=1e-4, do_wstacking=True)
    )
    ref = np.asarray(
        dirty(uvw, freq, mvis, fbi, fbc, nx, ny, cell, weights=wgt,
              epsilon=1e-4, do_wstacking=True)
    )
    tol = 1e-4 if precision == "double" else 1e-3
    assert _l2error(hess, ref) < tol

    # and the hessian is symmetric positive semi-definite on its diagonal
    # probe: <x, H x> >= 0
    quad = float(np.sum(image.astype(np.float64) * hess))
    assert quad > -1e-6 * np.abs(hess).max()


def explicit_degridder(uvw, freq, image, nx, ny, cellx, celly):
    """Forward of :func:`explicit_gridder`: image -> vis by direct
    w-aware DFT (reference test_wgridder.py degridder oracle)."""
    x, y = np.meshgrid(
        *[-s / 2 + np.arange(s) for s in (nx, ny)], indexing="ij"
    )
    x = x * cellx
    y = y * celly
    eps = x**2 + y**2
    nm1 = -eps / (np.sqrt(1.0 - eps) + 1.0)
    phase = (freq[None, :, None, None] / C) * (
        x[None, None] * uvw[:, 0, None, None, None]
        + y[None, None] * uvw[:, 1, None, None, None]
        - uvw[:, 2, None, None, None] * nm1[None, None]
    )
    return (image[None, None] * np.exp(-2j * np.pi * phase)).sum(
        axis=(2, 3)
    )


@pmp("precision", ("single", "double"))
@pmp("epsilon", (1e-3, 1e-4))
@pmp("nband", (1, 2))
@pmp("wstacking", (True, False))
def test_model_band_sweep(precision, epsilon, nband, wstacking):
    """Per-band degrid (model) tracks the requested epsilon against the
    explicit w-aware forward DFT. This EXCEEDS the reference's coverage
    — its suite only exercises dirty2ms through the adjointness identity
    (test_wgridder.py:125) — so the bound is 2·epsilon: the ES kernel's
    truncation constant is direction-dependent and the forward direction
    measures ~1.45× the adjoint's at epsilon 1e-4."""
    nx, ny, fov, nrow, nchan = 16, 20, 2.0, 400, 4
    cell = fov * np.pi / 180 / nx
    freq, uvw, _, _ = _problem(nrow, nchan, nx, cell, precision, seed=41)
    if not wstacking:
        uvw[:, 2] = 0.0
    fbi, fbc = _bands(nchan, nband)
    rng = np.random.default_rng(42)
    image = rng.normal(size=(fbi.size, nx, ny)).astype(
        np.float32 if precision == "single" else np.float64
    )

    mvis = np.asarray(
        model(uvw, freq, image, fbi, fbc, cell, epsilon=epsilon,
              do_wstacking=wstacking)
    )
    ref = np.concatenate(
        [
            explicit_degridder(uvw, freq[i : i + c], image[b], nx, ny,
                               cell, cell)
            for b, (i, c) in enumerate(zip(fbi, fbc))
        ],
        axis=1,
    )
    floor = 3e-5 if precision == "single" else 0.0
    assert _l2error(mvis, ref) <= max(2 * epsilon, floor)


@pmp("wstacking", (True, False))
@pmp("weighted", (False, True))
def test_dirty_double_accum(wstacking, weighted):
    """``double_accum=True`` on the f32 path lands within a few f32
    ulps of the full-f64 computation — strictly closer than the plain
    f32 accumulation (reference double_precision_accumulation leg,
    vis2im.py:55-71)."""
    nx = ny = 16
    fov, nrow, nchan = 2.0, 600, 3
    cell = fov * np.pi / 180 / nx
    freq, uvw, vis, wgt = _problem(nrow, nchan, nx, cell, "single",
                                   seed=51)
    if not wstacking:
        uvw[:, 2] = 0.0
    if not weighted:
        wgt = None
    fbi, fbc = _bands(nchan, 1)

    kw = dict(weights=wgt, epsilon=1e-4, do_wstacking=wstacking)
    img32 = np.asarray(dirty(uvw, freq, vis, fbi, fbc, nx, ny, cell,
                             **kw))
    img_da = np.asarray(dirty(uvw, freq, vis, fbi, fbc, nx, ny, cell,
                              double_accum=True, **kw))
    img64 = np.asarray(
        dirty(uvw.astype(np.float64), freq.astype(np.float64),
              vis.astype(np.complex128),
              fbi, fbc, nx, ny, cell,
              weights=None if wgt is None else wgt.astype(np.float64),
              epsilon=1e-4, do_wstacking=wstacking)
    )
    e_da = _l2error(img_da.astype(np.float64), img64)
    e_32 = _l2error(img32.astype(np.float64), img64)
    assert e_da <= e_32 + 1e-12
    assert e_da < 3e-6
