"""Parallactic angle tests: physical invariants of the pure-JAX astrometric
backend plus the reference's deterministic 'test' backend semantics
(rime/parangles.py:66)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.rime.parangles import parallactic_angles
from africanus_tpu.utils.astrometry import (
    gmst_from_mjd_seconds,
    itrf_to_geodetic,
    parallactic_angle,
)

# ~2020-01-01 00:00 UTC in MJD seconds
MJD0_SEC = 58849.0 * 86400.0


def test_test_backend(wsrt_ants):
    times = MJD0_SEC + np.arange(5) * 30.0
    fc = np.array([0.1, -0.5])
    out = np.asarray(parallactic_angles(times, wsrt_ants, fc, backend="test"))
    expected = times[:, None] * wsrt_ants.sum(axis=1)[None, :]
    assert_allclose(out, expected, rtol=1e-12)


def test_invalid_backend_and_shape(wsrt_ants):
    times = MJD0_SEC + np.arange(2) * 30.0
    with pytest.raises(ValueError, match="standard backends"):
        parallactic_angles(times, wsrt_ants, np.zeros(2), backend="bogus")
    with pytest.raises(ValueError, match="field_centre shape"):
        parallactic_angles(times, wsrt_ants, np.zeros(3))


def test_itrf_to_geodetic_wsrt(wsrt_ants):
    """WSRT is at ~(6.60°E, 52.91°N, ~70 m)."""
    lon, lat, h = itrf_to_geodetic(wsrt_ants)
    assert_allclose(np.rad2deg(np.asarray(lon)), 6.60, atol=0.05)
    assert_allclose(np.rad2deg(np.asarray(lat)), 52.915, atol=0.01)
    assert np.all(np.asarray(h) > 0) and np.all(np.asarray(h) < 200)


def test_gmst_rate():
    """Sidereal day is ~86164.1 s: GMST must advance 2π in that interval."""
    t0 = MJD0_SEC
    g0 = float(gmst_from_mjd_seconds(t0))
    g1 = float(gmst_from_mjd_seconds(t0 + 86164.0905))
    assert abs(((g1 - g0) + np.pi) % (2 * np.pi) - np.pi) < 1e-5


def test_parallactic_angle_geometry():
    """PA is 0 at upper transit (HA=0) for a source south of the zenith,
    antisymmetric in HA, and ±90° when the source is on the horizon due
    east/west for an equatorial observer."""
    lat = np.deg2rad(52.9)
    dec = np.deg2rad(-10.0)  # south of zenith
    assert abs(float(parallactic_angle(0.0, dec, lat))) < 1e-12

    ha = np.deg2rad(20.0)
    p1 = float(parallactic_angle(ha, dec, lat))
    p2 = float(parallactic_angle(-ha, dec, lat))
    assert_allclose(p1, -p2, rtol=1e-12)
    assert p1 > 0  # west of meridian -> positive PA (N through E convention)

    # equatorial observer, source on celestial equator, 6h east
    p = float(parallactic_angle(np.deg2rad(-90.0), 0.0, 0.0))
    assert_allclose(abs(p), np.pi / 2, rtol=1e-12)


def test_jax_backend_transit(wsrt_ants):
    """At the time the source crosses the local meridian the PA must pass
    through zero (for dec < latitude) — scan a sidereal day for a sign
    change and check the PA magnitude stays within sensible bounds."""
    fc = np.array([1.0, np.deg2rad(-5.0)])  # a southern source from WSRT
    times = MJD0_SEC + np.linspace(0.0, 86164.0, 289)
    pa = np.asarray(parallactic_angles(times, wsrt_ants[:1], fc, backend="jax"))
    assert pa.shape == (289, 1)
    # continuous, bounded
    assert np.all(np.abs(pa) <= np.pi)
    # crosses zero at least once over a sidereal day
    assert (np.signbit(pa[:-1, 0]) != np.signbit(pa[1:, 0])).sum() >= 1
    # antennas in an E-W array agree to < 0.1 deg at the same instant
    pa_all = np.asarray(parallactic_angles(times[:3], wsrt_ants, fc, backend="jax"))
    assert np.ptp(pa_all, axis=1).max() < np.deg2rad(0.1)


def test_numpy_backend_matches_jax_x64(wsrt_ants):
    """The host float64 numpy backend and the jax backend (x64 in tests)
    must agree to machine precision."""
    fc = np.array([1.0, np.deg2rad(-5.0)])
    times = MJD0_SEC + np.linspace(0.0, 3600.0, 16)
    pa_jax = np.asarray(parallactic_angles(times, wsrt_ants, fc, backend="jax"))
    pa_np = parallactic_angles(times, wsrt_ants, fc, backend="numpy")
    assert isinstance(pa_np, np.ndarray)
    assert_allclose(pa_jax, pa_np, atol=1e-12)
