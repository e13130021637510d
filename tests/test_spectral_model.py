"""spectral_model parity vs a numpy oracle of the reference math
(model/spectral/spec_model.py:110-210)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.model.spectral import spectral_model


def np_spectral_model(stokes, spi, ref_freq, frequency, base):
    out_shape = (stokes.shape[0], frequency.shape[0]) + stokes.shape[1:]
    if stokes.ndim == 1:
        stokes = stokes[:, None]
    if spi.ndim == 2:
        spi = spi[:, :, None]
    npol = spi.shape[2]
    if isinstance(base, list):
        base = base + [base[-1]] * (npol - len(base))
    else:
        base = [base] * npol
    spi_exps = np.arange(1, spi.shape[1] + 1)
    out = np.empty((stokes.shape[0], frequency.shape[0], npol), stokes.dtype)
    out[:, :, :] = stokes[:, None, :]
    for p, b in enumerate(base):
        if b in ("std", 0):
            fr = frequency[None, :] / ref_freq[:, None]
            term = fr[:, None, :] ** spi[:, :, p, None]
            out[:, :, p] *= term.prod(axis=1)
        elif b in ("log", 1):
            fr = np.log(frequency[None, :] / ref_freq[:, None])
            term = spi[:, :, p, None] * fr[:, None, :] ** spi_exps[None, :, None]
            out[:, :, p] = stokes[:, p, None] * np.exp(term.sum(axis=1))
        elif b in ("log10", 2):
            fr = np.log10(frequency[None, :] / ref_freq[:, None])
            term = spi[:, :, p, None] * fr[:, None, :] ** spi_exps[None, :, None]
            out[:, :, p] = stokes[:, p, None] * 10 ** (term.sum(axis=1))
    return out.reshape(out_shape)


@pytest.fixture
def spec_data(rng):
    nsrc, nspi, nchan = 5, 3, 16
    stokes = rng.normal(size=(nsrc, 4)) + 2.0
    spi = rng.normal(scale=0.3, size=(nsrc, nspi, 4))
    ref_freq = rng.uniform(1.0e9, 1.5e9, nsrc)
    freq = np.linspace(0.856e9, 1.712e9, nchan)
    return stokes, spi, ref_freq, freq


@pytest.mark.parametrize("base", ["std", "log", "log10", 0, 1, 2, ["std", "log"]])
def test_spectral_model_pol(spec_data, base):
    stokes, spi, ref_freq, freq = spec_data
    out = np.asarray(spectral_model(stokes, spi, ref_freq, freq, base=base))
    expected = np_spectral_model(
        stokes, spi, ref_freq, freq, base if not isinstance(base, list) else list(base)
    )
    assert out.shape == (5, 16, 4)
    assert_allclose(out, expected, rtol=1e-10)


def test_spectral_model_no_pol(spec_data):
    stokes, spi, ref_freq, freq = spec_data
    out = np.asarray(spectral_model(stokes[:, 0], spi[:, :, 0], ref_freq, freq))
    expected = np_spectral_model(stokes[:, 0], spi[:, :, 0], ref_freq, freq, 0)
    assert out.shape == (5, 16)
    assert_allclose(out, expected, rtol=1e-10)


def test_spectral_model_errors(spec_data):
    stokes, spi, ref_freq, freq = spec_data
    with pytest.raises(ValueError):
        spectral_model(stokes, spi, ref_freq, freq, base="bogus")
    with pytest.raises(ValueError):
        spectral_model(stokes[:, 0], spi, ref_freq, freq)
