"""phase_delay parity vs a literal numpy oracle of the reference math
(rime/phase.py:28-61)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.rime import phase_delay

MINUS_TWO_PI_OVER_C = -2.0 * np.pi / 2.99792458e8


def np_phase_delay(lm, uvw, frequency, convention="fourier"):
    constant = MINUS_TWO_PI_OVER_C if convention == "fourier" else -MINUS_TWO_PI_OVER_C
    out = np.zeros((lm.shape[0], uvw.shape[0], frequency.shape[0]), np.complex128)
    for s in range(lm.shape[0]):
        l, m = lm[s]
        n = np.sqrt(max(1.0 - l**2 - m**2, 0.0)) - 1.0
        for r in range(uvw.shape[0]):
            u, v, w = uvw[r]
            real_phase = constant * (l * u + m * v + n * w)
            p = real_phase * frequency
            out[s, r] = np.cos(p) + 1j * np.sin(p)
    return out


@pytest.mark.parametrize("convention", ["fourier", "casa"])
def test_phase_delay_parity(rng, convention):
    lm = rng.uniform(-0.01, 0.01, (7, 2))
    uvw = rng.uniform(-1000.0, 1000.0, (23, 3))
    freq = np.linspace(0.856e9, 2 * 0.856e9, 16)

    out = np.asarray(phase_delay(lm, uvw, freq, convention=convention))
    expected = np_phase_delay(lm, uvw, freq, convention=convention)

    assert out.shape == (7, 23, 16)
    assert out.dtype == np.complex128
    assert_allclose(out, expected, rtol=1e-9, atol=1e-12)


def test_phase_delay_dtype():
    lm = np.zeros((2, 2), np.float32)
    uvw = np.zeros((3, 3), np.float32)
    freq = np.ones(4, np.float32)
    out = phase_delay(lm, uvw, freq)
    assert out.dtype == np.complex64

    with pytest.raises(ValueError):
        phase_delay(lm, uvw, freq, convention="bogus")
