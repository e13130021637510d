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


_DISPATCH_OVERHEAD = {}


def dispatch_overhead():
    """Fixed cost of one dispatch+fetch round trip (seconds, cached).

    On the tunneled backend this is ~30 ms — larger than many kernels —
    so per-call times must subtract it and amortise over enough
    repetitions that the remainder is the kernel. Distinct inputs per
    probe (the terminal reuses results for identical dispatches)."""
    key = jax.default_backend()
    if key not in _DISPATCH_OVERHEAD:
        f = jax.jit(lambda x: x + 1.0)
        float(np.asarray(f(jnp.float32(0.0))))  # compile warm-up
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            float(np.asarray(f(jnp.float32(i + 1.0))))
            ts.append(time.perf_counter() - t0)
        _DISPATCH_OVERHEAD[key] = min(ts)
    return _DISPATCH_OVERHEAD[key]


def measure(fn, *args, reps=10, warmup=True, adaptive=True,
            target_seconds=1.5, max_reps=3000):
    """Wall-clock seconds per call of ``fn(*args)`` on-device.

    ``fn`` must return an array; its [0-index] element is folded into a
    scalar carry so XLA cannot elide iterations, and each iteration's
    input is perturbed so the runtime cannot reuse a cached result. The
    scalar is fetched (the only barrier that works through the tunnel).

    The repetition loop is a ``fori_loop`` with a *runtime* trip count,
    so rep counts can be rescaled without recompiling: with ``adaptive``
    a first probe at ``reps`` estimates the per-call time, and if the
    fixed dispatch+fetch round trip (~30 ms through the tunnel) is not
    well amortised the loop is re-timed with enough repetitions to fill
    ``target_seconds``. The round-trip cost is subtracted in all cases —
    without this, sub-millisecond kernels read as tunnel latency.
    """
    args = tuple(jax.tree_util.tree_map(jnp.asarray, a) for a in args)

    def loop(n, *a):
        def body(i, c):
            eps = i.astype(jnp.float32) * 1e-9
            perturbed = jax.tree_util.tree_map(
                lambda x: x + eps.astype(x.dtype), a[0]
            )
            out = fn(perturbed, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    g = jax.jit(loop)
    overhead = dispatch_overhead()

    def timed(n):
        t0 = time.perf_counter()
        float(np.asarray(g(jnp.int32(n), *args)))
        return time.perf_counter() - t0

    if warmup:
        float(np.asarray(g(jnp.int32(reps), *args)))
    total = timed(reps)
    per_call = max(total - overhead, 1e-9) / reps
    if adaptive and overhead > 0.05 * total:
        n2 = int(np.clip(np.ceil(target_seconds / max(per_call, 1e-9)),
                         reps, max_reps))
        if n2 > reps:
            total2 = timed(n2)
            per_call = max(total2 - overhead, 1e-9) / n2
    return per_call


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
