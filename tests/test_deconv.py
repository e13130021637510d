"""Hogbom CLEAN tests (reference: deconv/hogbom/clean.py)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.deconv.hogbom import hogbom_clean, find_peak, restore


def _make_psf(npix):
    """Gaussian PSF of shape (2*npix, 2*npix), peak 1 at centre."""
    x = np.arange(2 * npix) - (npix - 1)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    return np.exp(-(xx**2 + yy**2) / (2 * 3.0**2))


def test_find_peak(rng):
    img = rng.normal(size=(16, 16))
    img[5, 9] = 10.0
    img[2, 3] = -11.0
    maxx, maxy, minx, miny, peak = find_peak(img)
    assert (int(maxx), int(maxy)) == (5, 9)
    assert (int(minx), int(miny)) == (2, 3)
    assert float(peak) == 10.0


def test_hogbom_clean_recovers_sources():
    npix = 32
    psf = _make_psf(npix)
    # dirty image: two point sources convolved with the psf
    model = np.zeros((npix, npix))
    model[10, 12] = 1.0
    model[20, 25] = 0.6
    dirty = np.zeros((npix, npix))
    for (p, q), amp in [((10, 12), 1.0), ((20, 25), 0.6)]:
        dirty += amp * psf[npix - 1 - p : 2 * npix - 1 - p,
                           npix - 1 - q : 2 * npix - 1 - q]

    clean, residual = hogbom_clean(dirty, psf, gamma=0.2, threshold=0.05,
                                   niter=500)
    clean = np.asarray(clean)
    residual = np.asarray(residual)

    # residual peak must drop below the threshold
    assert residual.max() <= 0.05 * dirty.max() + 1e-6
    # flux concentrates at the source positions
    assert clean[10, 12] > 0.5
    assert clean[20, 25] > 0.3
    # cleaned flux is non-negative and bounded by dirty peak
    assert clean.max() <= dirty.max()

    # PSF shape validation
    with pytest.raises(ValueError, match="psf not right size"):
        hogbom_clean(dirty, psf[:-2], niter=10)


def test_restore_runs():
    npix = 24
    psf = _make_psf(npix)
    clean = np.zeros((npix, npix))
    clean[12, 12] = 1.0
    residual = np.zeros((npix, npix))
    restored, conv_model = restore(clean, psf, residual)
    assert restored.shape == (npix, npix)
    # restored peak near the source, normalised beam -> peak ~1
    assert abs(restored[12, 12] - 1.0) < 0.1
