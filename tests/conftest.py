"""Test configuration: virtual 8-device CPU mesh + 64-bit precision.

Multi-chip sharding is validated on a virtual CPU mesh (the reference's
dask-chunking tests validate chunk-invariance the same way — see SURVEY.md §4
item 5/6); numerical parity against float64 numpy oracles requires x64.
Env vars must be set before jax initialises its backends.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS to the TPU plugin, but
# tests need the virtual 8-device CPU mesh and float64 (no c128 on TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# must happen before the backend is first queried.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from africanus_tpu.utils.debug import (  # noqa: E402
    debug_env_enabled,
    debug_mode,
)


@pytest.fixture(autouse=True)
def _nan_sanitizer():
    """Opt-in NaN sanitizer (AFRICANUS_TPU_DEBUG_NANS=1): every jitted
    computation raises at the first op producing a NaN — the analogue of
    the reference's NUMBA_NRT_STATS leak fixture (conftest.py:10-18)."""
    if debug_env_enabled():
        with debug_mode():
            yield
    else:
        yield


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def wsrt_ants():
    """Westerbork antenna ITRF positions (metres), as in the reference's
    rime test fixtures (rime/tests/conftest.py) — a real East-West array
    layout for geometry-sensitive tests."""
    return np.array(
        [
            [3828763.10544699, 442449.10566454, 5064923.00777],
            [3828746.54957258, 442592.13950824, 5064923.00792],
            [3828729.99081359, 442735.17696417, 5064923.00829],
            [3828713.43109885, 442878.2118934, 5064923.00436],
            [3828696.86994428, 443021.24917264, 5064923.00397],
            [3828680.31391933, 443164.28596862, 5064923.00035],
            [3828663.75159173, 443307.32138056, 5064923.00204],
            [3828647.19342757, 443450.35604638, 5064923.0023],
            [3828630.63486201, 443593.39226634, 5064922.99755],
            [3828614.07606798, 443736.42941621, 5064923.0],
            [3828609.94224429, 443772.19450029, 5064922.99868],
            [3828601.66208572, 443843.71178407, 5064922.99963],
            [3828460.92418735, 445059.52053929, 5064922.99071],
            [3828452.64716351, 445131.03744105, 5064922.98793],
        ]
    )
