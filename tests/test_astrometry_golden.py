"""Golden external-oracle tests for the pure-JAX astrometry.

The reference treats astropy parallactic angles as *known wrong* and
trusts casacore (africanus/rime/parangles.py:61); neither casacore nor
astropy is installable in this environment, so the astrometry is pinned
to the IAU SOFA library's published validation vectors (t_sofa_c.c —
the same vectors ERFA ships) plus closed-form geometric invariants of
the parallactic angle. Tolerances:

- GMST: our IAU-1982 polynomial vs SOFA ``iauGmst82`` — sub-1e-9 rad.
- GAST: our 2-term IAU-1980 nutation vs SOFA ``iauGst94`` — 1e-6 rad
  (the truncated nutation series carries ~1e-7 rad; full casacore
  agreement for parallactic *angles* was measured in round 1 at the
  arcsecond level, far below beam scales).
- Parallactic angle: exact spherical-trigonometry identities.
"""

import numpy as np
from numpy.testing import assert_allclose

from africanus_tpu.utils.astrometry import (
    gast_from_mjd_seconds,
    gmst_from_mjd_seconds,
    itrf_to_geodetic,
    parallactic_angle,
)

DAY = 86400.0


def test_gmst_sofa_vector():
    """SOFA t_sofa_c: iauGmst82(2400000.5, 53736.0) =
    1.754174981860675096 rad (2006-01-01 00:00 UT1)."""
    got = float(gmst_from_mjd_seconds(np.float64(53736.0 * DAY), xp=np))
    assert abs(got - 1.754174981860675096) < 1e-9


def test_gast_sofa_vector():
    """SOFA t_sofa_c: iauGst94(2400000.5, 53736.0) =
    1.754166136020645203 rad. Our nutation keeps the two dominant
    IAU-1980 terms -> ~1e-7 rad truncation."""
    got = float(gast_from_mjd_seconds(np.float64(53736.0 * DAY), xp=np))
    assert abs(got - 1.754166136020645203) < 1e-6


def test_gmst_rate():
    """The sidereal day implied by GMST must be 23h56m04.0905s
    (86164.0905 SI seconds) to sub-millisecond accuracy."""
    t0 = 55000.0 * DAY
    g0 = float(gmst_from_mjd_seconds(np.float64(t0), xp=np))
    # one sidereal day later GMST returns to the same angle
    sidereal = 86164.09053
    g1 = float(gmst_from_mjd_seconds(np.float64(t0 + sidereal), xp=np))
    dg = (g1 - g0 + np.pi) % (2 * np.pi) - np.pi
    assert abs(dg) < 2 * np.pi * 1e-3 / DAY  # < 1 ms of rotation


def test_itrf_to_geodetic_wgs84():
    """Closed-form checks: a point on the equator at the WGS84 semi-major
    axis has lat=0, h=0; the pole at the semi-minor axis has lat=pi/2."""
    a = 6378137.0
    b = a * (1 - 1 / 298.257223563)
    lon, lat, h = itrf_to_geodetic(np.array([a, 0.0, 0.0]), xp=np)
    assert_allclose([lon, lat, h], [0.0, 0.0, 0.0], atol=1e-6)
    lon, lat, h = itrf_to_geodetic(np.array([0.0, 0.0, b]), xp=np)
    assert_allclose(lat, np.pi / 2, atol=1e-9)


def test_parallactic_angle_identities():
    """Spherical-trig invariants: PA = 0 for a source on the meridian
    (ha = 0) south of zenith; PA is odd in hour angle; at the pole
    (lat = pi/2) PA = pi - ha ... reduced: tan(PA) identity."""
    lat = np.deg2rad(-30.7)  # MeerKAT-like latitude
    dec = np.deg2rad(-45.0)
    assert abs(float(parallactic_angle(0.0, dec, lat, xp=np))) < 1e-12

    for ha_deg in (-60.0, -15.0, 10.0, 45.0):
        ha = np.deg2rad(ha_deg)
        pa_p = float(parallactic_angle(ha, dec, lat, xp=np))
        pa_m = float(parallactic_angle(-ha, dec, lat, xp=np))
        assert_allclose(pa_p, -pa_m, rtol=1e-12)
        # closed form: tan(PA) = sin(ha)cos(lat) /
        #              (cos(dec)sin(lat) - sin(dec)cos(lat)cos(ha))
        want = np.arctan2(
            np.sin(ha) * np.cos(lat),
            np.cos(dec) * np.sin(lat)
            - np.sin(dec) * np.cos(lat) * np.cos(ha),
        )
        assert_allclose(pa_p, want, rtol=1e-12)


def test_parallactic_angles_end_to_end_sanity(wsrt_ants):
    """Full pipeline: over one sidereal day the parallactic angle of a
    field north of WSRT's zenith must cross zero (meridian transit),
    never jump between samples, and be periodic with the sidereal day."""
    from africanus_tpu.rime.parangles import parallactic_angles

    times = 4453500000.0 + np.arange(0, 145) * 600.0  # 24 h @ 10 min
    fc = np.array([1.2, np.deg2rad(80.0)])  # north of zenith, always up
    pa = np.asarray(
        parallactic_angles(times, wsrt_ants[:1], fc, backend="numpy")
    )[:, 0]
    assert pa.min() < 0.0 < pa.max()
    d = (np.diff(pa) + np.pi) % (2 * np.pi) - np.pi
    assert np.all(np.abs(d) < 0.2)
    # sidereal periodicity: PA(t) == PA(t + sidereal day) to ~1e-4 rad
    t2 = times[:1] + 86164.09053
    pa2 = np.asarray(
        parallactic_angles(t2, wsrt_ants[:1], fc, backend="numpy")
    )[0, 0]
    assert abs(((pa2 - pa[0]) + np.pi) % (2 * np.pi) - np.pi) < 1e-4
