#!/usr/bin/env python
"""Simple SPI fitter example (reference:
africanus/model/spi/examples/simple_spi_fitter.py, with the FITS-image IO
replaced by a synthetic component spectrum cube)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import os

    import jax

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.model.spi import fit_spi_components

    rng = np.random.default_rng(3)
    f32 = np.float32
    ncomp, nchan = 512, 64
    freqs = np.linspace(0.856e9, 1.712e9, nchan)
    freq0 = 1.2e9

    alpha_true = rng.uniform(-1.2, -0.2, ncomp)
    i0_true = rng.uniform(0.5, 5.0, ncomp)
    sigma = 0.01
    data = i0_true[:, None] * (freqs / freq0) ** alpha_true[:, None]
    data = data + rng.normal(scale=sigma, size=data.shape)
    weights = np.full(nchan, 1.0 / sigma**2)

    fit = jax.jit(
        lambda d, w, f: fit_spi_components(d, w, f, freq0, maxiter=100)
    )
    t0 = time.perf_counter()
    out = np.asarray(
        jax.block_until_ready(
            fit(data.astype(f32), weights.astype(f32), freqs.astype(f32))
        )
    )
    dt = time.perf_counter() - t0

    alpha, alpha_var, i0, i0_var = out
    print(f"device: {jax.devices()[0]}")
    print(f"fitted {ncomp} components in {dt:.2f}s (incl. compile)")
    print(f"alpha error: mean {np.abs(alpha - alpha_true).mean():.4f} "
          f"(typical 1σ {np.sqrt(alpha_var).mean():.4f})")
    print(f"I0 rel error: mean "
          f"{(np.abs(i0 - i0_true) / i0_true).mean():.4f}")


if __name__ == "__main__":
    main()
