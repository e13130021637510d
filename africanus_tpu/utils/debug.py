"""Numerical sanitizers / debug-mode wiring.

The reference's closest analogue is its autouse numba NRT
allocation-balance fixture (africanus/conftest.py:10-18, enabled by
``NUMBA_NRT_STATS`` in CI) — a per-test memory sanitizer. JAX has no
manual allocation to balance; the corresponding failure class here is
silent NaN/Inf generation inside jitted kernels. This module wires
JAX's built-in sanitizers behind one opt-in switch:

- ``debug_mode()``: context manager enabling ``jax_debug_nans`` (every
  jitted computation re-runs eagerly and raises at the op producing the
  first NaN) and optionally ``jax_disable_jit`` for op-by-op stepping.
- ``assert_finite(**named_arrays)``: a cheap explicit guard for
  pipeline boundaries (fetches, so use at host sync points only).

The test suite enables ``debug_mode`` per-test when
``AFRICANUS_TPU_DEBUG_NANS`` is set (tests/conftest.py), mirroring how
the reference CI flips on NRT stats.
"""

from __future__ import annotations

import contextlib
import os

import numpy as np

__all__ = ["debug_mode", "assert_finite", "debug_env_enabled"]


def debug_env_enabled():
    """True when the opt-in env switch is set (any non-empty value)."""
    return bool(os.environ.get("AFRICANUS_TPU_DEBUG_NANS"))


@contextlib.contextmanager
def debug_mode(nans=True, disable_jit=False):
    """Enable JAX numerical sanitizers within the context."""
    import jax

    ctxs = []
    if nans:
        ctxs.append(jax.debug_nans(True))
    if disable_jit:
        ctxs.append(jax.disable_jit())
    with contextlib.ExitStack() as stack:
        for c in ctxs:
            stack.enter_context(c)
        yield


def assert_finite(**arrays):
    """Raise FloatingPointError naming every non-finite array.

    Fetches values to the host — call at host synchronisation points
    (end of a pipeline stage), not inside jitted code.
    """
    bad = []
    for name, arr in arrays.items():
        import jax

        for i, leaf in enumerate(jax.tree_util.tree_leaves(arr)):
            vals = np.asarray(leaf)
            if not np.isfinite(vals).all():
                n = np.size(vals) - int(np.isfinite(vals).sum())
                bad.append(f"{name}[leaf {i}]: {n} non-finite values")
    if bad:
        raise FloatingPointError("; ".join(bad))
