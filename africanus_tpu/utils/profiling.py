"""Tracing / timing / roofline helpers (SURVEY.md §5: the reference's only
profiling hook is a dask ``EstimatingProgressBar``; the TPU build wires
``jax.profiler`` traces and roofline accounting instead).

``measure`` encapsulates the only reliable timing recipe on tunneled TPU
backends (see CLAUDE.md): dispatch completion does not imply execution
completion, so repetitions are amortised *inside* one jitted scan whose
carried scalar is fetched to the host — fetching is the barrier.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["trace", "measure", "Roofline", "roofline"]


@contextlib.contextmanager
def trace(log_dir):
    """Capture a ``jax.profiler`` trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure(fn, *args, reps=10, warmup=True):
    """Wall-clock seconds per call of ``fn(*args)`` on-device.

    ``fn`` must return an array; its [0-index] element is folded into a
    scalar carry so XLA cannot elide iterations, and each iteration's
    input is perturbed so the runtime cannot reuse a cached result. The
    scalar is fetched (the only barrier that works through the tunnel).
    """
    args = tuple(jax.tree_util.tree_map(jnp.asarray, a) for a in args)

    def loop(*a):
        def body(c, i):
            eps = i.astype(jnp.float32) * 1e-9
            first = jax.tree_util.tree_leaves(a[0])[0]
            perturbed = jax.tree_util.tree_map(
                lambda x: x + eps.astype(x.dtype), a[0]
            )
            out = fn(perturbed, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.reshape(-1)[0].astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c

    g = jax.jit(loop)
    if warmup:
        float(np.asarray(g(*args)))
    t0 = time.perf_counter()
    float(np.asarray(g(*args)))
    return (time.perf_counter() - t0) / reps


@dataclass
class Roofline:
    """Arithmetic-intensity accounting against peak compute/bandwidth."""

    seconds: float
    flops: float
    bytes: float
    peak_flops: float
    peak_bw: float

    @property
    def intensity(self):
        return self.flops / self.bytes if self.bytes else float("inf")

    @property
    def attainable(self):
        """Roofline-attainable FLOP/s for this intensity."""
        return min(self.peak_flops, self.peak_bw * self.intensity)

    @property
    def achieved(self):
        return self.flops / self.seconds

    @property
    def fraction(self):
        """Fraction of the attainable roofline actually achieved."""
        return self.achieved / self.attainable

    def __str__(self):
        return (
            f"{self.achieved / 1e12:.2f} TFLOP/s "
            f"({100 * self.fraction:.0f}% of roofline at "
            f"AI={self.intensity:.1f} flop/B)"
        )


# v5e per-chip peaks: 197 TFLOP/s bf16 MXU (f32 ~1/4), 819 GB/s HBM;
# VPU f32 is ~4 TFLOP/s-class — pass peak_flops explicitly for VPU-bound
# kernels (transcendental-heavy code retires well below the FMA peak).
_V5E_PEAK_F32 = 49e12
_V5E_HBM_BW = 819e9


def roofline(seconds, flops, bytes, peak_flops=_V5E_PEAK_F32,
             peak_bw=_V5E_HBM_BW):
    """Build a :class:`Roofline` with TPU v5e defaults."""
    return Roofline(seconds, flops, bytes, peak_flops, peak_bw)
