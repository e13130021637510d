"""Gaussian shape parity vs numpy oracle (model/shape/gaussian_shape.py:20-66)."""

import numpy as np
from numpy.testing import assert_allclose

from africanus_tpu.model.shape import gaussian

C = 2.99792458e8
FWHM = 2.0 * np.sqrt(2.0 * np.log(2.0))
GAUSS_SCALE = np.sqrt(2.0) * np.pi / (FWHM * C)


def np_gaussian(uvw, frequency, shape_params):
    nsrc, nrow, nchan = shape_params.shape[0], uvw.shape[0], frequency.shape[0]
    out = np.empty((nsrc, nrow, nchan))
    sf = frequency * GAUSS_SCALE
    for s in range(nsrc):
        emaj, emin, angle = shape_params[s]
        el = emaj * np.sin(angle)
        em = emaj * np.cos(angle)
        er = emin / (1.0 if emaj == 0.0 else emaj)
        for r in range(nrow):
            u, v, _ = uvw[r]
            u1 = (u * em - v * el) * er
            v1 = u * el + v * em
            out[s, r] = np.exp(-((u1 * sf) ** 2 + (v1 * sf) ** 2))
    return out


def test_gaussian_parity(rng):
    uvw = rng.uniform(-1000, 1000, (25, 3))
    freq = np.linspace(0.856e9, 1.712e9, 8)
    shape_params = np.column_stack(
        [
            rng.uniform(1e-5, 1e-4, 6),
            rng.uniform(1e-6, 1e-5, 6),
            rng.uniform(0, np.pi, 6),
        ]
    )
    # include a point source (emaj == 0)
    shape_params[0] = (0.0, 0.0, 0.0)

    out = np.asarray(gaussian(uvw, freq, shape_params))
    assert out.shape == (6, 25, 8)
    assert_allclose(out, np_gaussian(uvw, freq, shape_params), rtol=1e-12)
    assert_allclose(out[0], 1.0)  # point source has unit envelope
