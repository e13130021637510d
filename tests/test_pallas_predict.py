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


def test_pallas_predict_matches_einsum(problem):
    dot, u1, v1, freq, sf, b = problem
    out = pp.predict_kb_pallas(dot, u1, v1, freq, sf, b, interpret=True)
    ref = einsum_oracle(*(jnp.asarray(x) for x in (dot, u1, v1, freq, sf)), b)
    scale = np.abs(np.asarray(ref.re)).max()
    assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                    atol=1e-5 * scale)
    assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                    atol=1e-5 * scale)


def test_pallas_predict_no_envelope(problem):
    dot, _, _, freq, sf, b = problem
    out = pp.predict_kb_pallas(dot, None, None, freq, sf, b, interpret=True)
    ref = einsum_oracle(jnp.asarray(dot), None, None, jnp.asarray(freq),
                        jnp.asarray(sf), b)
    scale = np.abs(np.asarray(ref.re)).max()
    assert_allclose(np.asarray(out.re), np.asarray(ref.re), atol=1e-5 * scale)


def test_pallas_predict_compensated(rng):
    """Two-float phase pair input: the kernel reduces dot·nu mod one cycle
    and must match a float64 complex-exponential oracle at realistic
    (1e4 rad) phase magnitudes, where the plain f32 product cannot."""
    from africanus_tpu.rime.phase import phase_dot_cycles

    S, R, F, C = 16, 128, 128, 2
    lm = rng.uniform(-0.02, 0.02, (S, 2)).astype(np.float32)
    uvw = rng.uniform(-8000, 8000, (R, 3)).astype(np.float32)
    freq = np.linspace(0.856e9, 1.712e9, F).astype(np.float32)
    b = Cplx(rng.normal(size=(S, F, C)).astype(np.float32),
             rng.normal(size=(S, F, C)).astype(np.float32))

    dot_pair = jax.jit(phase_dot_cycles)(lm, uvw)
    out = pp.predict_kb_pallas(tuple(np.asarray(d) for d in dot_pair),
                               None, None, freq, freq * 0, b,
                               interpret=True)

    l, m = lm[:, 0].astype(np.float64), lm[:, 1].astype(np.float64)
    n = np.sqrt(np.maximum(1 - l * l - m * m, 0)) - 1
    dot = (l[:, None] * uvw[None, :, 0] + m[:, None] * uvw[None, :, 1]
           + n[:, None] * uvw[None, :, 2]).astype(np.float64)
    p = (-2 * np.pi / 299792458.0) * dot[:, :, None] * freq.astype(np.float64)
    K = np.exp(1j * p)
    ref = np.einsum("srf,sfc->rfc", K, b.re + 1j * b.im)
    got = np.asarray(out.re) + 1j * np.asarray(out.im)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-6


def test_pallas_predict_blocked_source_axis(problem):
    """src_tile contraction blocking (sequential third grid dim with
    output-block accumulation) must agree with the all-resident path."""
    dot, u1, v1, freq, sf, b = problem
    full = pp.predict_kb_pallas(dot, u1, v1, freq, sf, b, interpret=True)
    blk = pp.predict_kb_pallas(dot, u1, v1, freq, sf, b,
                               src_tile=8, src_block=8, interpret=True)
    scale = np.abs(np.asarray(full.re)).max()
    assert_allclose(np.asarray(blk.re), np.asarray(full.re),
                    atol=2e-6 * scale)
    assert_allclose(np.asarray(blk.im), np.asarray(full.im),
                    atol=2e-6 * scale)

    with pytest.raises(ValueError, match="src_tile"):
        pp.predict_kb_pallas(dot, u1, v1, freq, sf, b,
                             src_tile=6, src_block=8, interpret=True)


def test_pallas_predict_shape_validation(problem):
    dot, u1, v1, freq, sf, b = problem
    with pytest.raises(ValueError, match="divisible"):
        pp.predict_kb_pallas(dot[:, :100], u1[:, :100], v1[:, :100],
                             freq, sf, b)


def test_srclane_matches_einsum(problem):
    """The sources-on-lanes MXU kernel matches the einsum oracle and
    the row/chan-tile kernel (envelope + point paths, non-multiple
    source count exercising the lane padding)."""
    dot, u1, v1, freq, sf, b = problem
    S = dot.shape[0] - 3  # non-multiple source count
    dot, u1, v1 = dot[:S], u1[:S], v1[:S]
    b = Cplx(b.re[:S], b.im[:S])
    args = (jnp.asarray(dot), jnp.asarray(u1), jnp.asarray(v1),
            jnp.asarray(freq), jnp.asarray(sf))
    ref = einsum_oracle(*args, b)
    scale = np.abs(np.asarray(ref.re)).max()
    out = pp.predict_kb_pallas_srclane(dot, u1, v1, freq, sf, b,
                                       chan_tile=16, interpret=True)
    assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                    atol=1e-5 * scale)
    assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                    atol=1e-5 * scale)
    # point-source path
    out_p = pp.predict_kb_pallas_srclane(dot, None, None, freq, sf, b,
                                         chan_tile=16, interpret=True)
    ref_p = einsum_oracle(args[0], None, None, args[3], args[4], b)
    scale = np.abs(np.asarray(ref_p.re)).max()
    assert_allclose(np.asarray(out_p.re), np.asarray(ref_p.re),
                    atol=1e-5 * scale)


def test_srclane_compensated_matches_rowchan(rng):
    """Compensated (two-float mod-1 cycle) phases agree between the two
    kernel layouts at realistic delay magnitudes (~1e4 rad phases)."""
    from africanus_tpu.rime.phase import phase_dot_cycles

    S, R, F, C = 8, 128, 32, 4
    lm = rng.uniform(-0.02, 0.02, (S, 2)).astype(np.float32)
    uvw = rng.uniform(-1000.0, 1000.0, (R, 3)).astype(np.float32)
    freq = np.linspace(0.856e9, 1.712e9, F).astype(np.float32)
    sf = (freq * 1e-12).astype(np.float32)
    b = Cplx(rng.normal(size=(S, F, C)).astype(np.float32),
             rng.normal(size=(S, F, C)).astype(np.float32))
    dot = phase_dot_cycles(lm, uvw)

    out_a = pp.predict_kb_pallas(dot, None, None, freq, sf, b,
                                 row_tile=128, chan_tile=32,
                                 interpret=True)
    out_b = pp.predict_kb_pallas_srclane(dot, None, None, freq, sf, b,
                                         chan_tile=16, interpret=True)
    scale = np.abs(np.asarray(out_a.re)).max()
    assert_allclose(np.asarray(out_b.re), np.asarray(out_a.re),
                    atol=2e-6 * scale)
    assert_allclose(np.asarray(out_b.im), np.asarray(out_a.im),
                    atol=2e-6 * scale)
