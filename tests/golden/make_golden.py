#!/usr/bin/env python
"""Generate the stored golden-visibility dataset (predict_golden.npz).

The reference keeps a human-run comparison against an independent
simulator (MeqTrees turbo-sim:
``africanus/rime/examples/tests/cmp_codex_vs_meq.py``). Neither
casacore nor MeqTrees exists in this environment, so the analogue is a
small observation whose model visibilities are derived HERE, once, by
straight-line float64 numpy written directly from the RIME definition —
scalar loops, no vectorised shortcuts shared with the library, no
library imports — and stored. ``tests/test_golden_predict.py`` then
drives the library's full predict chain against the stored values.

The physics, written independently from the RIME (Smirnov 2011, paper I):

    V_pq(f) = G_p(t) · ( Σ_s  E_ps(t,f) · K_pqs(f) · B_s(f) · E_qs(t,f)^H ) · G_q(t)^H

with K the phase delay e^{-2πi·(u·l + v·m + w·(n-1))·f/c} (the 'fourier'
convention), B the linear-feed brightness [[I+Q, U+iV], [U-iV, I-Q]] with
a power-law spectrum I(f) = I0·(f/f0)^α, a gaussian shape envelope on
resolved sources (FWHM-major/minor/PA convention of the reference), and
G diagonal per-antenna complex gains. E (beam DDEs) are identity here —
beam parity has its own golden tests (SOFA astrometry, FITS cubes).

Run ``python tests/golden/make_golden.py`` to regenerate; the test
asserts byte-identical metadata so accidental regeneration with
different parameters is caught.
"""

import math
import os

import numpy as np

C = 299792458.0  # m/s, CODATA — independent of the library's constants


def main():
    rng = np.random.default_rng(20260819)

    # -- observation geometry: 7 antennas (KAT-7-like scale), 4 times --
    nant, ntime, nchan = 7, 4, 8
    ants = rng.uniform(-200.0, 200.0, (nant, 3))
    ants[:, 2] *= 0.05  # nearly coplanar, a few metres of w
    a1, a2 = np.triu_indices(nant, 1)
    nbl = a1.size
    nrow = nbl * ntime
    antenna1 = np.tile(a1, ntime).astype(np.int32)
    antenna2 = np.tile(a2, ntime).astype(np.int32)
    time_index = np.repeat(np.arange(ntime), nbl).astype(np.int32)

    # slowly rotating baselines (a crude hour-angle sweep is enough —
    # the golden only needs SOME time variation, not real astrometry)
    uvw = np.empty((nrow, 3))
    for t in range(ntime):
        ha = 0.1 * t
        rot = np.array([
            [math.cos(ha), -math.sin(ha), 0.0],
            [math.sin(ha), math.cos(ha), 0.0],
            [0.0, 0.0, 1.0],
        ])
        bl = (ants[a1] - ants[a2]) @ rot.T
        uvw[t * nbl:(t + 1) * nbl] = bl

    frequency = np.linspace(1.40e9, 1.50e9, nchan)

    # -- sky: two points + one gaussian, power-law spectra --
    lm = np.array([
        [0.004, -0.003],
        [-0.0065, 0.0042],
        [0.0012, 0.0068],
    ])
    stokes = np.array([  # I, Q, U, V at ref_freq
        [1.20, 0.10, -0.05, 0.02],
        [0.80, -0.04, 0.03, 0.00],
        [2.10, 0.00, 0.08, -0.01],
    ])
    alpha = np.array([-0.7, 0.1, -0.55])
    ref_freq = np.array([1.42e9, 1.45e9, 1.42e9])
    # emaj, emin (radians), position angle — source 2 is resolved
    gauss_shape = np.array([
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
        [2.5e-4, 1.1e-4, 0.6],
    ])

    # -- direction-independent gains: diagonal complex per (t, ant, f) --
    gphase = rng.uniform(-0.4, 0.4, (ntime, nant, nchan, 2))
    gamp = 1.0 + rng.uniform(-0.08, 0.08, (ntime, nant, nchan, 2))

    # -- straight-line scalar-loop RIME --------------------------------
    fwhm = 2.0 * math.sqrt(2.0 * math.log(2.0))
    scale_const = math.pi * math.sqrt(2.0) / (fwhm * C)
    vis = np.zeros((nrow, nchan, 2, 2), complex)
    for r in range(nrow):
        t = time_index[r]
        p, q = antenna1[r], antenna2[r]
        u, v, w = uvw[r]
        for f in range(nchan):
            nu = frequency[f]
            coh = np.zeros((2, 2), complex)
            for s in range(lm.shape[0]):
                l, m = lm[s]
                n = math.sqrt(1.0 - l * l - m * m)
                phase = -2.0 * math.pi * (u * l + v * m + w * (n - 1.0)) \
                    * nu / C
                K = complex(math.cos(phase), math.sin(phase))
                spec = (nu / ref_freq[s]) ** alpha[s]
                I, Q, U, V = stokes[s] * spec
                B = np.array([[I + Q, U + 1j * V],
                              [U - 1j * V, I - Q]])
                emaj, emin, ang = gauss_shape[s]
                if emaj > 0.0:
                    el = emaj * math.sin(ang)
                    em = emaj * math.cos(ang)
                    er = emin / emaj
                    u1 = (u * em - v * el) * er * scale_const * nu
                    v1 = (u * el + v * em) * scale_const * nu
                    env = math.exp(-(u1 * u1 + v1 * v1))
                else:
                    env = 1.0
                coh = coh + K * env * B
            Gp = np.diag(gamp[t, p, f] * np.exp(1j * gphase[t, p, f]))
            Gq = np.diag(gamp[t, q, f] * np.exp(1j * gphase[t, q, f]))
            vis[r, f] = Gp @ coh @ Gq.conj().T

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "predict_golden.npz")
    np.savez_compressed(
        out,
        uvw=uvw, frequency=frequency, antenna1=antenna1,
        antenna2=antenna2, time_index=time_index,
        lm=lm, stokes=stokes, alpha=alpha, ref_freq=ref_freq,
        gauss_shape=gauss_shape, gamp=gamp, gphase=gphase,
        vis=vis,
        meta=np.array(["golden-v1: 7ant x 4t x 8chan, 2pt+1gauss, "
                       "diag gains, fourier convention"]),
    )
    print(f"wrote {out}: vis {vis.shape}, |vis| mean "
          f"{np.abs(vis).mean():.4f}")


if __name__ == "__main__":
    main()
