"""Double-float (two-float) arithmetic for precision-critical f32 chains.

The TPU in this environment has no float64, and interferometric phases
reach ~1e4 rad: a plain f32 product ``(-2pi/c)·(u·l+v·m+w·n)·nu`` rounds
to ~6e-4 rad absolute error, which caps visibility accuracy near 1e-3 —
three orders short of the 1e-6 BASELINE.md target. The classical fix
(Dekker 1971; the reference instead relies on float64 numba kernels,
africanus/rime/phase.py:28-61) is to carry the *cycle count* as an
unevaluated sum of two f32s (hi + lo, ~48 significant bits), reduce it
modulo 1 cycle exactly, and hand cos/sin only the small residual.

All primitives are branch-free elementwise jnp ops — they jit, vmap,
shard and run inside Pallas kernels unchanged.

Every intermediate passes through a ``lax.reduce_precision`` barrier:
error-free transformations rely on each op rounding to exactly f32, and
XLA's CPU pipeline otherwise evaluates fused f32 chains at excess
precision (measured: the unhardened composition silently degrades to
plain f32, hi+lo error = ulp(hi)). On TPU (no f64 registers) the
barriers are identity and cost nothing measurable.

Error model: a hardened two_prod/df product carries the full ~2^-46
relative error of the double-f32 format, so a 3e4-cycle phase is good to
~1e-9 cycles — phase error ~1e-8 rad, far below the 1e-6 target.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = [
    "split", "two_sum", "quick_two_sum", "two_prod",
    "df_add", "df_mul", "df_neg", "df_div", "df_sqrt",
    "df_const", "df_dot3", "reduce_cycles", "n_minus_one_df",
    "compensated_sum",
]

# Dekker split factor for f32 (24-bit significand): 2^12 + 1
_SPLIT = 4097.0


def _r(x):
    """Barrier forcing an exact f32 rounding of the intermediate.

    Identity on TPU: the hardware computes f32 ops at f32 (measured
    exact), and Mosaic has no reduce_precision lowering. The CPU
    pipeline is where fused f32 chains run at excess precision and
    break the error-free transformations.
    """
    import jax

    if jax.default_backend() == "tpu":
        return x
    dt = jnp.asarray(x).dtype
    if dt == jnp.float64:
        return lax.reduce_precision(x, 11, 52)
    return lax.reduce_precision(x, 8, 23)


def split(a):
    """Split ``a`` into hi + lo with 12-bit halves (Dekker)."""
    c = _r(a * jnp.asarray(_SPLIT, a.dtype))
    hi = _r(c - _r(c - a))
    return hi, _r(a - hi)


def two_sum(a, b):
    """a + b as (sum, exact error) — no magnitude ordering required."""
    s = _r(a + b)
    v = _r(s - a)
    return s, _r(_r(a - _r(s - v)) + _r(b - v))


def quick_two_sum(a, b):
    """a + b as (sum, exact error); requires |a| >= |b|."""
    s = _r(a + b)
    return s, _r(b - _r(s - a))


def two_prod(a, b):
    """a · b as (product, exact error) via Dekker splitting."""
    p = _r(a * b)
    ah, al = split(a)
    bh, bl = split(b)
    e = _r(_r(_r(_r(ah * bh) - p) + _r(ah * bl) + _r(al * bh)) + _r(al * bl))
    return p, e


def df_add(x, y):
    """(hi, lo) + (hi, lo) -> normalized (hi, lo)."""
    s, e = two_sum(x[0], y[0])
    return quick_two_sum(s, _r(_r(e + x[1]) + y[1]))


def df_mul(x, y):
    """(hi, lo) · (hi, lo) -> normalized (hi, lo)."""
    p, e = two_prod(x[0], y[0])
    return quick_two_sum(p, _r(e + _r(_r(x[0] * y[1]) + _r(x[1] * y[0]))))


def df_neg(x):
    return (-x[0], -x[1])


def df_div(x, y):
    """(hi, lo) / (hi, lo) -> normalized (hi, lo) (one refinement)."""
    q = _r(x[0] / y[0])
    p, e = two_prod(q, y[0])
    rnum = _r(_r(_r(_r(x[0] - p) - e) + x[1]) - _r(q * y[1]))
    return quick_two_sum(q, _r(rnum / y[0]))


def df_sqrt(x):
    """sqrt of a non-negative (hi, lo) -> normalized (hi, lo)."""
    h = _r(jnp.sqrt(x[0]))
    p, e = two_prod(h, h)
    rnum = _r(_r(x[0] - p) - e) + x[1]
    safe = jnp.where(h == 0.0, 1.0, _r(2.0 * h))
    return quick_two_sum(h, _r(rnum / safe))


def df_const(value, dtype=jnp.float32):
    """Represent a python/f64 scalar as a two-f32 (hi, lo) pair."""
    hi = np.asarray(value, np.float32)
    lo = np.asarray(np.float64(value) - np.float64(hi), np.float32)
    return jnp.asarray(hi, dtype), jnp.asarray(lo, dtype)


def df_dot3(a0, b0, a1, b1, a2, b2):
    """a0·b0 + a1·b1 + a2·b2 as a normalized (hi, lo) pair."""
    return df_add(df_add(two_prod(a0, b0), two_prod(a1, b1)),
                  two_prod(a2, b2))


def compensated_sum(x, axis=0):
    """Sum along ``axis`` via a double-float pairwise tree.

    Each tree level halves the axis with :func:`df_add` (error-free
    two_sum plus carried low words), so rounding error stays O(eps)
    independent of length — the parallel-friendly equivalent of the
    reference fused kernel's sequential Kahan accumulation
    (reference experimental/rime/fused/core.py:97-118). Odd levels pad
    with an exact zero. Returns the (hi + lo) collapsed result.
    """
    x = jnp.moveaxis(jnp.asarray(x), axis, 0)
    if x.shape[0] == 0:
        # empty reductions sum to zero (einsum/reference parity; e.g. a
        # fused predict over a zero-source chunk)
        return jnp.zeros(x.shape[1:], x.dtype)
    hi, lo = x, jnp.zeros_like(x)
    while hi.shape[0] > 1:
        n = hi.shape[0]
        if n % 2:
            pad = [(0, 1)] + [(0, 0)] * (hi.ndim - 1)
            hi = jnp.pad(hi, pad)
            lo = jnp.pad(lo, pad)
            n += 1
        hi, lo = df_add((hi[0::2], lo[0::2]), (hi[1::2], lo[1::2]))
    return hi[0] + lo[0]


def n_minus_one_df(l, m):  # noqa: E741
    """n − 1 = −(l²+m²)/(1+sqrt(1−l²−m²)) as a (hi, lo) pair.

    An f32 n−1 still carries ~3 eps of relative rounding, which a long
    baseline turns into ~1e-5 rad of phase (w·ν/c ≈ 5.7 cycles per metre
    at L-band); carrying it as a two-float removes that last term.
    Beyond-horizon directions clamp to n−1 = −1.
    """
    s = df_add(two_prod(l, l), two_prod(m, m))
    one = (jnp.ones_like(s[0]), jnp.zeros_like(s[0]))
    d = df_add(one, df_neg(s))
    clip = d[0] < 0.0
    d = (jnp.where(clip, 0.0, d[0]), jnp.where(clip, 0.0, d[1]))
    y = df_sqrt(d)
    n1 = df_neg(df_div(s, df_add(one, y)))
    return (jnp.where(clip, -1.0, n1[0]), jnp.where(clip, 0.0, n1[1]))


def reduce_cycles(hi, lo):
    """Fractional part (in [-0.5, 0.5] + tiny) of a (hi, lo) cycle count.

    hi − round(hi) is exact (Sterbenz: the operands are within a factor
    of two), so the result carries lo's full precision.
    """
    return _r(_r(hi - jnp.round(hi)) + lo)
