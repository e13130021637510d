"""linalg (geometry, kronecker) and gps tests (reference:
linalg/geometry.py, linalg/kronecker_tools.py, gps/kernels.py)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.linalg import (
    BoundingConvexHull,
    BoundingBox,
    BoundingBoxFactory,
    kron_matvec,
    kron_tensorvec,
    kron_matmat,
    kron_cholesky,
    kron_N,
)
from africanus_tpu.gps import exponential_squared, abs_diff


def test_kron_matvec(rng):
    K = [rng.normal(size=(3, 3)), rng.normal(size=(4, 4)), rng.normal(size=(2, 2))]
    A = np.kron(np.kron(K[0], K[1]), K[2])
    b = rng.normal(size=A.shape[1])
    assert kron_N(K) == 24
    assert_allclose(np.asarray(kron_matvec(K, b)), A @ b, rtol=1e-10)


def test_kron_tensorvec(rng):
    K = [rng.normal(size=(3, 2)), rng.normal(size=(5, 4))]
    A = np.kron(K[0], K[1])
    b = rng.normal(size=A.shape[1])
    assert_allclose(np.asarray(kron_tensorvec(K, b)), A @ b, rtol=1e-10)


def test_kron_matmat_cholesky(rng):
    K = []
    for n in (3, 4):
        X = rng.normal(size=(n, n))
        K.append(X @ X.T + n * np.eye(n))
    A = np.kron(K[0], K[1])
    B = rng.normal(size=(A.shape[1], 3))
    assert_allclose(np.asarray(kron_matmat(K, B)), A @ B, rtol=1e-10)

    L = kron_cholesky(K)
    Lfull = np.kron(np.asarray(L[0]), np.asarray(L[1]))
    assert_allclose(Lfull @ Lfull.T, A, rtol=1e-6)


def test_gps_kernels(rng):
    x = rng.normal(size=(10, 2))
    xp = rng.normal(size=(7, 2))
    D = np.asarray(abs_diff(x, xp))
    expected = np.linalg.norm(x[:, None] - xp[None, :], axis=-1)
    assert_allclose(D, expected, rtol=1e-12)

    K = np.asarray(exponential_squared(x, xp, 2.0, 0.5))
    assert_allclose(K, 4.0 * np.exp(-(expected**2) / (2 * 0.25)), rtol=1e-12)

    # power spectrum mode on a regular 1D grid
    xr = np.linspace(0, 1, 16)[:, None]
    ps = np.asarray(exponential_squared(xr, xr, 1.0, 0.1, pspec=True))
    assert ps.shape == (16,)
    assert ps.max() == ps[8]  # peak at zero frequency (fftshifted)


def test_bounding_convex_hull_basics():
    hull = BoundingConvexHull([[0, 0], [10, 0], [10, 8], [0, 8], [5, 4]])
    assert (5, 4) in hull
    assert (0, 0) in hull
    assert (20, 20) not in hull
    assert hull.corners.shape[1] == 2
    assert hull.area > 0
    assert hull.circumference > 0
    # all mask cells are inside
    for (y, x) in hull.sparse_mask[:16]:
        assert (x, y) in hull
    m = hull.mask
    assert m.shape == (9, 11)
    assert m.max() == 1.0


def test_hull_overlap():
    h1 = BoundingConvexHull([[0, 0], [4, 0], [4, 4], [0, 4]])
    h2 = BoundingConvexHull([[2, 2], [6, 2], [6, 6], [2, 6]])
    h3 = BoundingConvexHull([[10, 10], [14, 10], [14, 14], [10, 14]])
    assert h1.overlaps_with(h2)
    assert not h1.overlaps_with(h3)


def test_bounding_box_and_factory():
    bb = BoundingBox(0, 9, 0, 7, "box")
    assert bb.box_npx == (10, 8)
    assert (3, 3) in bb
    assert (11, 3) not in bb
    assert len(bb.sparse_mask) == 80

    with pytest.raises(ValueError, match="integers"):
        BoundingBox(0.5, 9, 0, 7)

    hull = BoundingConvexHull([[0, 0], [10, 0], [10, 8], [0, 8]])
    aabb = BoundingBoxFactory.AxisAlignedBoundingBox(hull)
    assert isinstance(aabb, BoundingBox)

    sq = BoundingBoxFactory.AxisAlignedBoundingBox(hull, square=True)
    nx, ny = sq.box_npx
    assert abs(nx - ny) <= 1

    split = BoundingBoxFactory.SplitBox(aabb, nsubboxes=2)
    assert len(split) == 4
    # split boxes tile the original area without overlap
    total = sum(b.box_npx[0] * b.box_npx[1] for b in split)
    assert total >= aabb.box_npx[0] * aabb.box_npx[1]

    padded = BoundingBoxFactory.PadBox(aabb, 21, 21)
    assert padded.box_npx == (21, 21)
    with pytest.raises(ValueError, match="bigger"):
        BoundingBoxFactory.PadBox(aabb, 2, 2)


def test_regional_data_and_project(rng):
    cube = rng.normal(size=(1, 1, 20, 24))  # (..., y, x)
    bb1 = BoundingBox(0, 11, 0, 9, "a")
    bb2 = BoundingBox(12, 23, 10, 19, "b")
    r1, _ = BoundingConvexHull.regional_data(bb1, cube, axes=(2, 3))
    r2, _ = BoundingConvexHull.regional_data(bb2, cube, axes=(2, 3))
    assert r1.shape == (1, 1, 10, 12)
    assert_allclose(r1[0, 0], cube[0, 0, :10, :12], rtol=1e-12)

    stitched, combined = BoundingBox.project_regions([r1, r2], [bb1, bb2])
    assert stitched.shape == (1, 1, 20, 24)
    assert_allclose(stitched[0, 0, :10, :12], cube[0, 0, :10, :12], rtol=1e-12)
    assert_allclose(stitched[0, 0, 10:, 12:], cube[0, 0, 10:, 12:], rtol=1e-12)
    # non-covered corner remains zero
    assert_allclose(stitched[0, 0, 10:, :12], 0.0)


def test_normalize_masks():
    b1 = BoundingBox(0, 5, 0, 5)
    b2 = BoundingBox(3, 8, 0, 5)
    BoundingConvexHull.normalize_masks([b1, b2])
    # overlapping columns 3..5 get weight 0.5
    m1 = b1.mask
    assert_allclose(m1[:, :3], 1.0)
    assert_allclose(m1[:, 3:], 0.5)


def test_kron_cholesky_f32_semidefinite_recovers():
    """jnp.linalg.cholesky returns NaNs (not an exception) for a
    semi-definite factor; kron_cholesky's dtype-aware jitter retry must
    yield a finite factor whose product reconstructs A to f32 accuracy
    (the reference recovers via its except-with-jitter path)."""
    import jax.numpy as jnp
    from africanus_tpu.linalg.kronecker_tools import kron_cholesky

    A = jnp.ones((4, 4), jnp.float32)  # PSD, rank-1: plain chol NaNs
    (L,) = kron_cholesky([A])
    L = np.asarray(L)
    assert np.isfinite(L).all()
    assert np.allclose(L @ L.T, np.asarray(A), atol=1e-2)


def test_kron_matvec_precision_pinned():
    """kron_matvec must agree with the dense f64 matvec to f32-input
    accuracy (guards the HIGHEST-precision pin on the factor matmuls)."""
    from africanus_tpu.linalg.kronecker_tools import kron_matvec

    rng = np.random.default_rng(11)
    K0 = rng.normal(size=(8, 8))
    K1 = rng.normal(size=(6, 6))
    b = rng.normal(size=48)
    want = np.kron(K0, K1) @ b
    got = np.asarray(kron_matvec(
        [K0.astype(np.float32), K1.astype(np.float32)],
        b.astype(np.float32)))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
