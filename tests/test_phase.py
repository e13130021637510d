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


def _f64_truth(lm, uvw, freq, convention="fourier"):
    """f64 oracle fed the SAME f32-rounded inputs (the repo protocol)."""
    c = MINUS_TWO_PI_OVER_C if convention == "fourier" \
        else -MINUS_TWO_PI_OVER_C
    l = lm[:, 0].astype(np.float64)
    m = lm[:, 1].astype(np.float64)
    n = np.sqrt(np.maximum(1.0 - l * l - m * m, 0.0)) - 1.0
    dot = (l[:, None] * uvw[None, :, 0].astype(np.float64)
           + m[:, None] * uvw[None, :, 1].astype(np.float64)
           + n[:, None] * uvw[None, :, 2].astype(np.float64))
    p = c * dot[:, :, None] * freq.astype(np.float64)
    return np.cos(p) + 1j * np.sin(p), np.abs(p).max()


@pytest.mark.parametrize("uvw_scale", [1e2, 1e3, 1e4, 3e4])
def test_phase_f32_compensated_error_scaling(rng, uvw_scale):
    """The two-float mod-2π pipeline keeps the f32 phase error near the
    reduced-phase rounding floor (~1e-6) regardless of |phase| — a naive
    f32 phase at |phase|~1e4 rad carries ~1e-3 absolute error (round-1's
    accuracy bug). Sweep |uvw| over two decades and bound the error."""
    from jax._src.config import enable_x64

    from africanus_tpu.rime import phase_delay

    lm = rng.uniform(-0.01, 0.01, (5, 2)).astype(np.float32)
    uvw = rng.uniform(-uvw_scale, uvw_scale, (40, 3)).astype(np.float32)
    freq = np.linspace(0.856e9, 1.712e9, 8).astype(np.float32)

    with enable_x64(False):
        got = np.asarray(phase_delay(lm, uvw, freq))
    truth, pmax = _f64_truth(lm, uvw, freq)
    err = np.abs(got - truth).max()

    # naive f32: err ~ |phase| * eps_f32 = pmax * 6e-8; compensated must
    # stay well below it once phases exceed ~1e3 rad, and below 1e-5
    # always (BASELINE.md's 1e-6 relative is an f64 contract)
    assert err < 1e-5
    if pmax > 1e3:
        assert err < 0.05 * pmax * 6e-8


def test_phase_convention_conjugate(rng):
    """casa = conj(fourier) exactly."""
    from africanus_tpu.rime import phase_delay

    lm = rng.uniform(-0.01, 0.01, (4, 2))
    uvw = rng.uniform(-1e3, 1e3, (9, 3))
    freq = np.linspace(1e9, 2e9, 5)
    f = np.asarray(phase_delay(lm, uvw, freq, convention="fourier"))
    c = np.asarray(phase_delay(lm, uvw, freq, convention="casa"))
    assert_allclose(c, np.conj(f), rtol=0, atol=1e-14)


def test_phase_dot_cycles_exactness(rng):
    """phase_dot_cycles returns the uvw·lmn dot in CYCLES as a two-float
    pair whose (hi+lo) matches the f64 dot to ~f64 precision, even when
    the dot is ~1e5 cycles (f32 alone carries only ~7 digits)."""
    from africanus_tpu.rime.phase import phase_dot_cycles

    lm = rng.uniform(-0.02, 0.02, (6, 2)).astype(np.float32)
    uvw = rng.uniform(-3e4, 3e4, (50, 3)).astype(np.float32)

    from jax._src.config import enable_x64

    with enable_x64(False):
        hi, lo = phase_dot_cycles(lm, uvw)
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)

    c64 = -1.0 / 2.99792458e8
    l = lm[:, 0].astype(np.float64)
    m = lm[:, 1].astype(np.float64)
    n = np.sqrt(np.maximum(1.0 - l * l - m * m, 0.0)) - 1.0
    want = c64 * (
        l[:, None] * uvw[None, :, 0].astype(np.float64)
        + m[:, None] * uvw[None, :, 1].astype(np.float64)
        + n[:, None] * uvw[None, :, 2].astype(np.float64)
    )
    # pair-sum accuracy: ~2^-30 of the dot (hi is f32, lo recovers the
    # next 24 bits; the n computation itself carries a two-float path)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 3e-9 * max(scale, 1.0)


def test_phase_zero_w_independent_of_n(rng):
    """With w == 0 the phase must not depend on the n−1 term at all:
    sources at large |lm| (n far from 1) give identical results to the
    2D formula."""
    from africanus_tpu.rime import phase_delay

    lm = rng.uniform(-0.4, 0.4, (6, 2))
    uvw = rng.uniform(-1e3, 1e3, (9, 3))
    uvw[:, 2] = 0.0
    freq = np.linspace(1e9, 2e9, 4)
    got = np.asarray(phase_delay(lm, uvw, freq))

    c = MINUS_TWO_PI_OVER_C
    p = (c * (lm[:, 0][:, None] * uvw[None, :, 0]
              + lm[:, 1][:, None] * uvw[None, :, 1]))[:, :, None] * freq
    want = np.cos(p) + 1j * np.sin(p)
    assert_allclose(got, want, rtol=1e-10, atol=1e-12)
