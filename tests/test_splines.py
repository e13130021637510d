"""Cubic splines (reference averaging/tests/test_splines.py: knot-exact,
~2-decimal mid-knot accuracy on a quadratic)."""

import numpy as np
from numpy.testing import assert_allclose, assert_almost_equal
import pytest

from africanus_tpu.averaging import fit_cubic_spline, evaluate_spline


def f(x):
    return -0.5 * x**2 - 0.3 * x + 5.0


def test_fit_cubic_spline_knots_exact():
    x = np.linspace(-2.0, 2.0, 16)
    y = f(x)
    spline = fit_cubic_spline(x, y)
    assert_almost_equal(evaluate_spline(spline, x), y)

    # between knots: approximate (reference: 2 decimals)
    dx = x[:-1] + np.diff(x) / 2
    assert_almost_equal(evaluate_spline(spline, dx), f(dx), decimal=2)


def test_spline_derivatives_and_extrapolation():
    x = np.linspace(0.0, np.pi, 64)
    y = np.sin(x)
    spline = fit_cubic_spline(x, y)
    xe = np.linspace(0.1, np.pi - 0.1, 37)
    assert_allclose(evaluate_spline(spline, xe, order=1), np.cos(xe),
                    atol=1e-3)
    assert_allclose(evaluate_spline(spline, xe, order=2), -np.sin(xe),
                    atol=2e-2)
    # extrapolation is finite and continuous at the boundary
    lo = evaluate_spline(spline, np.array([-1e-9, 0.0, 1e-9]))
    assert_allclose(np.diff(lo), 0.0, atol=1e-6)


def test_spline_clamped_ends():
    x = np.linspace(0.0, 1.0, 20)
    y = 3.0 * x  # exact linear; clamp slope to 3 at both ends
    spline = fit_cubic_spline(x, y, left_type=1, right_type=1,
                              left_value=3.0, right_value=3.0)
    xe = np.linspace(0.0, 1.0, 55)
    assert_allclose(evaluate_spline(spline, xe), 3.0 * xe, atol=1e-12)
    assert_allclose(evaluate_spline(spline, xe, order=1), 3.0, atol=1e-10)


def test_spline_eval_jnp():
    import jax.numpy as jnp

    x = np.linspace(-1.0, 1.0, 12)
    spline = fit_cubic_spline(x, f(x))
    xe = np.linspace(-1.3, 1.3, 21)
    got = np.asarray(evaluate_spline(spline, jnp.asarray(xe), xp=jnp))
    ref = evaluate_spline(spline, xe)
    assert_allclose(got, ref, rtol=1e-12)


def test_spline_bad_types():
    x = np.linspace(0, 1, 5)
    with pytest.raises(ValueError, match="left_type"):
        fit_cubic_spline(x, x, left_type=3)
    with pytest.raises(ValueError, match="right_type"):
        fit_cubic_spline(x, x, right_type=0)
    with pytest.raises(ValueError, match="order"):
        evaluate_spline(fit_cubic_spline(x, x), x, order=3)
