"""Coordinate transform parity tests.

Oracle: independent numpy implementation of the standard SIN-projection
direction-cosine math (reference semantics: coordinates/coordinates.py).
"""

import numpy as np
from numpy.testing import assert_allclose

from africanus_tpu.coordinates import (
    radec_to_lmn,
    radec_to_lm,
    lmn_to_radec,
    lm_to_radec,
)


def np_radec_to_lmn(radec, phase_centre=None):
    pc_ra, pc_dec = (0.0, 0.0) if phase_centre is None else phase_centre
    ra, dec = radec[:, 0], radec[:, 1]
    l = np.cos(dec) * np.sin(ra - pc_ra)  # noqa: E741
    m = np.sin(dec) * np.cos(pc_dec) - np.cos(dec) * np.sin(pc_dec) * np.cos(
        ra - pc_ra
    )
    n = np.sqrt(1.0 - l**2 - m**2)
    return np.stack([l, m, n], axis=-1)


def test_radec_to_lmn_matches_oracle(rng):
    radec = rng.uniform(-0.1, 0.1, (20, 2))
    pc = np.array([0.05, -0.7])
    radec[:, 1] -= 0.7

    out = np.asarray(radec_to_lmn(radec, pc))
    assert_allclose(out, np_radec_to_lmn(radec, pc), rtol=1e-12)

    # default phase centre = (0, 0)
    out0 = np.asarray(radec_to_lmn(radec))
    assert_allclose(out0, np_radec_to_lmn(radec), rtol=1e-12)

    # lm variant is the first two components
    assert_allclose(np.asarray(radec_to_lm(radec, pc)), out[:, :2], rtol=1e-12)


def test_radec_lmn_roundtrip(rng):
    pc = np.array([0.3, -0.5])
    radec = pc + rng.uniform(-0.05, 0.05, (30, 2))

    lmn = radec_to_lmn(radec, pc)
    back = np.asarray(lmn_to_radec(lmn, pc))
    assert_allclose(back, radec, rtol=1e-10, atol=1e-12)

    lm = radec_to_lm(radec, pc)
    back2 = np.asarray(lm_to_radec(lm, pc))
    assert_allclose(back2, radec, rtol=1e-10, atol=1e-12)


def test_zenith_is_origin():
    pc = np.array([1.1, -0.4])
    lmn = np.asarray(radec_to_lmn(pc[None, :], pc))
    assert_allclose(lmn, [[0.0, 0.0, 1.0]], atol=1e-14)


def test_radec_to_lmn_wraps(rng):
    """Coordinates wrap: ra and ra + 2π give identical lmn (reference
    test_coordinates.py:61-73)."""
    from africanus_tpu.coordinates import radec_to_lmn

    radec = rng.uniform(-0.5, 0.5, (10, 2))
    phase = rng.uniform(-0.1, 0.1, 2)
    base = np.asarray(radec_to_lmn(radec, phase))
    wrapped = np.asarray(radec_to_lmn(radec + [2 * np.pi, 0.0], phase))
    assert_allclose(base, wrapped, rtol=0, atol=1e-12)
    # and the phase centre itself maps to (0, 0, 1)
    centre = np.asarray(radec_to_lmn(phase[None, :], phase))
    assert_allclose(centre, [[0.0, 0.0, 1.0]], rtol=0, atol=1e-14)
