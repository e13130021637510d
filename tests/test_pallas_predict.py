"""Fused Pallas predict kernel vs the einsum formulation (interpret mode
on CPU; the TPU path is exercised by bench.py / the verify drives)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from africanus_tpu.ops.cplx import Cplx
import africanus_tpu.ops.pallas_predict as pp


@pytest.fixture
def problem(rng):
    S, R, F, C = 16, 128, 128, 4
    dot = (rng.uniform(-100, 100, (S, R)) * 1e-7).astype(np.float32)
    u1 = rng.uniform(-100, 100, (S, R)).astype(np.float32)
    v1 = rng.uniform(-100, 100, (S, R)).astype(np.float32)
    freq = np.linspace(0.856e9, 1.712e9, F).astype(np.float32)
    sf = (freq * 1e-12).astype(np.float32)
    b = Cplx(
        rng.normal(size=(S, F, C)).astype(np.float32),
        rng.normal(size=(S, F, C)).astype(np.float32),
    )
    return dot, u1, v1, freq, sf, b


def einsum_oracle(d, u, v, fq, s, b):
    p = d[:, :, None] * fq
    kre, kim = jnp.cos(p), jnp.sin(p)
    if u is not None:
        fu = u[:, :, None] * s
        fv = v[:, :, None] * s
        env = jnp.exp(-(fu * fu + fv * fv))
        kre, kim = kre * env, kim * env

    def dd(k, x):
        return jnp.einsum("srf,sfc->rfc", k, x,
                          precision=lax.Precision.HIGHEST)

    return Cplx(dd(kre, b.re) - dd(kim, b.im), dd(kre, b.im) + dd(kim, b.re))


def _interp_pallas(monkeypatch):
    """Force interpret mode for CPU execution."""
    from jax.experimental import pallas as pl
    from functools import partial

    orig = pl.pallas_call
    monkeypatch.setattr(pp.pl, "pallas_call", partial(orig, interpret=True))


def test_pallas_predict_matches_einsum(monkeypatch, problem):
    _interp_pallas(monkeypatch)
    dot, u1, v1, freq, sf, b = problem
    out = pp.predict_kb_pallas(dot, u1, v1, freq, sf, b)
    ref = einsum_oracle(*(jnp.asarray(x) for x in (dot, u1, v1, freq, sf)), b)
    scale = np.abs(np.asarray(ref.re)).max()
    assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                    atol=1e-5 * scale)
    assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                    atol=1e-5 * scale)


def test_pallas_predict_no_envelope(monkeypatch, problem):
    _interp_pallas(monkeypatch)
    dot, _, _, freq, sf, b = problem
    out = pp.predict_kb_pallas(dot, None, None, freq, sf, b)
    ref = einsum_oracle(jnp.asarray(dot), None, None, jnp.asarray(freq),
                        jnp.asarray(sf), b)
    scale = np.abs(np.asarray(ref.re)).max()
    assert_allclose(np.asarray(out.re), np.asarray(ref.re), atol=1e-5 * scale)


def test_pallas_predict_shape_validation(problem):
    dot, u1, v1, freq, sf, b = problem
    with pytest.raises(ValueError, match="divisible"):
        pp.predict_kb_pallas(dot[:, :100], u1[:, :100], v1[:, :100],
                             freq, sf, b)
