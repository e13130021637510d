"""Full predict chain vs the STORED golden-visibility dataset.

The in-environment analogue of the reference's MeqTrees comparison
harness (``africanus/rime/examples/tests/cmp_codex_vs_meq.py``): the
goldens in ``tests/golden/predict_golden.npz`` were derived once by
straight-line scalar-loop float64 numpy written directly from the RIME
definition (``tests/golden/make_golden.py``) and checked in — this test
never re-derives them, so any regression anywhere along
phase_delay → spectral_model → convert → gaussian → predict_vis shows
up against values the library code cannot influence.
"""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "predict_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def _chain(g, xp_dtype):
    """Library predict chain on the golden inputs at ``xp_dtype``."""
    from africanus_tpu.model.coherency import convert
    from africanus_tpu.model.shape import gaussian
    from africanus_tpu.model.spectral import spectral_model
    from africanus_tpu.rime import phase_delay, predict_vis

    f = xp_dtype
    lm = g["lm"].astype(f)
    uvw = g["uvw"].astype(f)
    freq = g["frequency"].astype(f)

    K = phase_delay(lm, uvw, freq, convention="fourier")  # (src, row, chan)
    # one spectral index per source, shared across the 4 stokes
    flux = spectral_model(
        g["stokes"].astype(f), g["alpha"].astype(f)[:, None, None]
        * np.ones((1, 1, 4), f), g["ref_freq"].astype(f), freq,
        base="std",
    )  # (src, chan, 4)
    B = convert(flux, ["I", "Q", "U", "V"],
                [["XX", "XY"], ["YX", "YY"]])  # (src, chan, 2, 2)
    env = gaussian(uvw, freq, g["gauss_shape"].astype(f))  # (src, row, chan)

    coh = (K * env)[..., None, None] * B[:, None]  # (src, row, chan, 2, 2)

    gains = (g["gamp"] * np.exp(1j * g["gphase"])).astype(
        np.result_type(np.complex64, f)
    )  # (t, ant, chan, 2) diagonal
    ntime, nant, nchan, _ = gains.shape
    G = np.zeros((ntime, nant, nchan, 2, 2), gains.dtype)
    G[..., 0, 0] = gains[..., 0]
    G[..., 1, 1] = gains[..., 1]

    return predict_vis(
        jnp.asarray(g["time_index"]), jnp.asarray(g["antenna1"]),
        jnp.asarray(g["antenna2"]), source_coh=jnp.asarray(coh),
        die1_jones=jnp.asarray(G), die2_jones=jnp.asarray(G),
    )


def test_golden_metadata(golden):
    """Guard against silent regeneration with different parameters."""
    assert str(golden["meta"][0]) == (
        "golden-v1: 7ant x 4t x 8chan, 2pt+1gauss, diag gains, "
        "fourier convention"
    )
    assert golden["vis"].shape == (84, 8, 2, 2)


def test_predict_chain_matches_golden_f64(golden):
    vis = np.asarray(_chain(golden, np.float64))
    assert_allclose(vis, golden["vis"], rtol=1e-12, atol=1e-14)


def test_predict_chain_matches_golden_f32(golden):
    """The f32 (TPU-shaped) leg: phase-heavy at |phase| ~ 1e2 rad here,
    so a few 1e-6 of relative error is the f32 bound, not a defect."""
    vis = np.asarray(_chain(golden, np.float32))
    err = np.abs(vis - golden["vis"]).max() / np.abs(golden["vis"]).max()
    assert err < 5e-5
