"""Sanitizer wiring tests (utils/debug.py — the NRT-fixture analogue)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from africanus_tpu.utils.debug import assert_finite, debug_mode
from africanus_tpu.ops.cplx import Cplx


def test_debug_mode_catches_nan():
    with debug_mode():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) * 0 + jnp.sqrt(x))(
                jnp.asarray(-1.0)
            )


def test_debug_mode_passes_clean_code():
    with debug_mode():
        out = jax.jit(lambda x: jnp.sqrt(x) + 1)(jnp.asarray(4.0))
    assert float(out) == 3.0


def test_assert_finite_names_offenders():
    good = jnp.ones(3)
    bad = Cplx(jnp.asarray([1.0, np.nan]), jnp.asarray([np.inf, 0.0]))
    assert_finite(vis=good)
    with pytest.raises(FloatingPointError, match="coh"):
        assert_finite(vis=good, coh=bad)


def test_sanitizer_env_leg():
    """The whole phase kernel runs NaN-free under the sanitizer (a smoke
    check that hot kernels are compatible with jax_debug_nans)."""
    from africanus_tpu.rime.phase import phase_delay_ri

    rng = np.random.default_rng(0)
    lm = rng.uniform(-0.01, 0.01, (4, 2)).astype(np.float32)
    uvw = rng.uniform(-1000, 1000, (6, 3)).astype(np.float32)
    freq = np.linspace(1e9, 2e9, 4).astype(np.float32)
    with debug_mode():
        out = jax.jit(phase_delay_ri)(lm, uvw, freq)
        np.asarray(out.re)
