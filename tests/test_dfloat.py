"""Unit tests for the two-float (double-float) helpers (ops/dfloat.py).

The error-free transformations carry the compensated phase pipeline and
the fused RIME's source accumulation; their contracts are numeric
identities checkable exactly against f64."""

import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose

from africanus_tpu.ops.dfloat import (
    compensated_sum,
    df_add,
    df_mul,
    two_prod,
    two_sum,
)


def test_two_sum_exact(rng):
    a = rng.normal(size=1000).astype(np.float32) * 1e6
    b = rng.normal(size=1000).astype(np.float32)
    s, e = two_sum(jnp.asarray(a), jnp.asarray(b))
    # s + e reproduces the f64 sum exactly (both halves are exact)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert_allclose(got, a.astype(np.float64) + b, rtol=0, atol=0)


def test_two_prod_exact(rng):
    a = rng.normal(size=1000).astype(np.float32)
    b = rng.normal(size=1000).astype(np.float32)
    p, e = two_prod(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert_allclose(got, a.astype(np.float64) * b.astype(np.float64),
                    rtol=0, atol=0)


def test_df_arith_precision(rng):
    a = rng.normal(size=100).astype(np.float32)
    b = rng.normal(size=100).astype(np.float32) * 1e-4
    s = df_add((jnp.asarray(a), jnp.zeros_like(jnp.asarray(a))),
               (jnp.asarray(b), jnp.zeros_like(jnp.asarray(b))))
    got = np.asarray(s[0], np.float64) + np.asarray(s[1], np.float64)
    assert_allclose(got, a.astype(np.float64) + b, rtol=1e-14)

    p = df_mul((jnp.asarray(a), jnp.zeros_like(jnp.asarray(a))),
               (jnp.asarray(b), jnp.zeros_like(jnp.asarray(b))))
    got = np.asarray(p[0], np.float64) + np.asarray(p[1], np.float64)
    assert_allclose(got, a.astype(np.float64) * b.astype(np.float64),
                    rtol=1e-13)


def test_compensated_sum_beats_plain_f32(rng):
    """Summing 10^5 mixed-magnitude f32 terms: the double-float pairwise
    tree stays at the f64-result rounding floor while the plain f32 sum
    drifts by orders of magnitude more."""
    n = 100000
    x = (rng.normal(size=n) * np.logspace(0, 6, n)[rng.permutation(n)])
    x32 = x.astype(np.float32)
    truth = x32.astype(np.float64).sum()

    comp = float(compensated_sum(jnp.asarray(x32), axis=0))
    plain = float(jnp.asarray(x32).sum())

    err_comp = abs(comp - truth)
    err_plain = abs(plain - truth)
    scale = np.abs(x32.astype(np.float64)).sum()
    assert err_comp <= 4.0 * np.finfo(np.float32).eps * scale
    # and strictly better than the plain sum on this stress input
    assert err_comp < err_plain


def test_compensated_sum_axes_and_odd_lengths(rng):
    x = rng.normal(size=(7, 13, 5)).astype(np.float32)
    for ax in range(3):
        got = np.asarray(compensated_sum(jnp.asarray(x), axis=ax))
        ref = x.astype(np.float64).sum(axis=ax)
        assert_allclose(got, ref, rtol=0, atol=2e-6)
        assert got.shape == ref.shape


def test_compensated_sum_empty_axis():
    """A zero-length reduction axis sums to zeros (einsum parity) —
    e.g. a fused predict over a zero-source chunk."""
    import jax.numpy as jnp
    from africanus_tpu.ops.dfloat import compensated_sum

    out = compensated_sum(jnp.zeros((0, 3, 2)), axis=0)
    assert out.shape == (3, 2)
    assert np.all(np.asarray(out) == 0.0)
    out = compensated_sum(jnp.ones((4, 0)), axis=1)
    assert out.shape == (4,)
    assert np.all(np.asarray(out) == 0.0)
