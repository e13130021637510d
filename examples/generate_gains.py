#!/usr/bin/env python
"""Simulate smooth phase-only gains from a Gaussian process.

TPU-native analogue of the reference's
``gps/examples/generate_phase_only_gains.py``: per-antenna phase screens
drawn from a separable GP over (time, frequency, direction) using the
exponential-squared kernel and Kronecker algebra
(kron_cholesky/kron_matvec), then written as gain tables. MS IO is
replaced by a synthetic layout; gains are saved to .npy.

Usage: python examples/generate_gains.py [out.npy]
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    if os.environ.get("AFRICANUS_TPU_FORCE_CPU"):
        # the axon plugin ignores JAX_PLATFORMS; tests use this escape hatch
        jax.config.update("jax_platforms", "cpu")

    from africanus_tpu.coordinates import radec_to_lm
    from africanus_tpu.gps import exponential_squared
    from africanus_tpu.linalg import kron_cholesky, kron_matvec

    rng = np.random.default_rng(42)
    ntime, nchan, nant, ndir = 16, 8, 7, 3

    # normalised coordinates, as in the reference example
    t = np.linspace(0.0, 1.0, ntime)
    nu = np.linspace(0.0, 1.0, nchan)
    radec = rng.uniform(-0.01, 0.01, (ndir, 2)) + np.array([1.0, -0.9])
    lm = np.asarray(radec_to_lm(radec, radec.mean(axis=0)))
    src_coord = lm / np.abs(lm).max()

    # separable covariance: K = Kt ⊗ Knu ⊗ Ks (+ f32-scale jitter)
    kt = np.asarray(exponential_squared(t, t, 0.25, 0.2))
    knu = np.asarray(exponential_squared(nu, nu, 0.25, 0.3))
    ks = np.asarray(exponential_squared(src_coord, src_coord, 0.25, 0.5))
    kt = kt + 1e-6 * np.eye(ntime)
    knu = knu + 1e-6 * np.eye(nchan)
    ks = ks + 1e-6 * np.eye(ndir)

    factors = np.empty(3, dtype=object)
    factors[0], factors[1], factors[2] = kt, knu, ks
    ll = kron_cholesky(factors)
    n = ntime * nchan * ndir
    phases = np.zeros((ntime, nant, nchan, ndir))
    for p in range(nant):
        xi = rng.normal(size=n)
        sample = np.asarray(kron_matvec(ll, xi)).reshape(ntime, nchan, ndir)
        phases[:, p] = sample

    gains = np.exp(1j * phases)[..., None]  # trailing corr axis
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gp_gains.npy"
    np.save(out, gains)
    print(f"device: {jax.devices()[0]}")
    print(f"gains: {gains.shape} -> {out}")
    print(f"phase std: {phases.std():.3f} rad; "
          f"|g|=1 check: {np.abs(np.abs(gains) - 1).max():.1e}")


if __name__ == "__main__":
    main()
