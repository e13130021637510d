"""WSClean spectra, component-file parsing and predict parity tests
(reference: model/wsclean/spec_model.py, file_model.py,
rime/wsclean_predict.py)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.model.wsclean.spec_model import spectra
from africanus_tpu.model.wsclean.file_model import load
from africanus_tpu.rime.wsclean_predict import wsclean_predict

C = 2.99792458e8


def np_ordinary(I, coeffs, ref_freq, freq):  # noqa: E741
    idx = np.arange(1, coeffs.shape[1] + 1)
    term = (freq[None, :, None] / ref_freq[:, None, None]) - 1.0
    term = coeffs[:, None, :] * term ** idx[None, None, :]
    return I[:, None] + term.sum(axis=2)


def np_log(I, coeffs, ref_freq, freq):  # noqa: E741
    idx = np.arange(1, coeffs.shape[1] + 1)
    term = np.log(freq[None, :, None] / ref_freq[:, None, None])
    term = coeffs[:, None, :] * term ** idx[None, None, :]
    return I[:, None] * np.exp(term.sum(axis=2))


@pytest.fixture
def spec_data(rng):
    nsrc, ncoeff, nchan = 6, 3, 10
    I = rng.uniform(0.5, 2.0, nsrc)  # noqa: E741
    coeffs = rng.normal(scale=0.1, size=(nsrc, ncoeff))
    ref_freq = rng.uniform(1.0e9, 1.4e9, nsrc)
    freq = np.linspace(0.856e9, 1.712e9, nchan)
    return I, coeffs, ref_freq, freq


def test_spectra_scalar_bool(spec_data):
    I, coeffs, ref_freq, freq = spec_data  # noqa: E741
    assert_allclose(
        np.asarray(spectra(I, coeffs, False, ref_freq, freq)),
        np_ordinary(I, coeffs, ref_freq, freq),
        rtol=1e-12,
    )
    assert_allclose(
        np.asarray(spectra(I, coeffs, True, ref_freq, freq)),
        np_log(I, coeffs, ref_freq, freq),
        rtol=1e-12,
    )


def test_spectra_per_source(spec_data):
    I, coeffs, ref_freq, freq = spec_data  # noqa: E741
    log_poly = np.array([True, False, True, False, False, True])
    out = np.asarray(spectra(I, coeffs, log_poly, ref_freq, freq))
    exp_log = np_log(I, coeffs, ref_freq, freq)
    exp_ord = np_ordinary(I, coeffs, ref_freq, freq)
    assert_allclose(out, np.where(log_poly[:, None], exp_log, exp_ord), rtol=1e-12)


WSCLEAN_MODEL = """\
Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, ReferenceFrequency='125584411.621094', MajorAxis, MinorAxis, Orientation
s0c0,POINT,08:28:05.152,39.35.08.511,0.000748810650400475,[-0.00695379313004673,-0.0849693907803257],false,125584411.621094,,,
s0c1,GAUSSIAN,08:29:05.152,39.36.08.511,0.003171,[0.002,0.001],true,125584411.621094,83.6144111272856,83.6144111272856,0
s0c2,POINT,-08:30:05.152,-39.37.08.511,1.62e-2,[],false,,,,
"""


def test_file_model_load():
    cols = dict(load(iter(WSCLEAN_MODEL.splitlines())))

    assert cols["Name"] == ["s0c0", "s0c1", "s0c2"]
    assert cols["Type"] == ["POINT", "GAUSSIAN", "POINT"]

    # 08:28:05.152 hours -> radians
    ra0 = 2 * np.pi * (8 / 24 + 28 / (24 * 60) + 5.152 / 86400)
    assert_allclose(cols["Ra"][0], ra0, rtol=1e-12)
    assert cols["Ra"][2] < 0  # negative sign honoured

    dec0 = 2 * np.pi * (39 / 360 + 35 / (360 * 60) + 8.511 / (360 * 3600))
    assert_allclose(cols["Dec"][0], dec0, rtol=1e-12)
    assert cols["Dec"][2] < 0

    assert cols["LogarithmicSI"] == [False, True, False]
    assert cols["SpectralIndex"][2] == []
    # empty ReferenceFrequency falls back to the header default
    assert_allclose(cols["ReferenceFrequency"][2], 125584411.621094)
    # arcsec -> rad
    assert_allclose(cols["MajorAxis"][1], np.deg2rad(83.6144111272856 / 3600))
    # empty MajorAxis with no default: converter default (0.0)
    assert cols["MajorAxis"][0] == 0.0


def test_file_model_nonfinite_zeroed():
    model = (
        "Format = Name, Type, Ra, Dec, I, SpectralIndex, LogarithmicSI, "
        "ReferenceFrequency, MajorAxis, MinorAxis, Orientation\n"
        "bad,POINT,00:00:01.0,00.00.01.0,inf,[0.1],false,1e9,,,\n"
        "badlog,POINT,00:00:01.0,00.00.01.0,nan,[0.1],true,1e9,,,\n"
    )
    with pytest.warns(UserWarning):
        cols = dict(load(iter(model.splitlines())))
    assert cols["I"] == [0.0, 1.0]  # log-SI zeroes to 1 (log 1 = 0)
    assert cols["SpectralIndex"] == [[0.0], [0.0]]


def np_wsclean_predict(uvw, lm, stype, spectrum, gauss_shape, freq):
    two_pi_over_c = 2 * np.pi / C
    fwhm = 2 * np.sqrt(2 * np.log(2))
    gscale = np.sqrt(2) * np.pi / fwhm / C
    nrow, nchan = uvw.shape[0], freq.shape[0]
    vis = np.zeros((nrow, nchan, 1), np.complex128)
    sf = freq * gscale
    for s in range(lm.shape[0]):
        l, m = lm[s]
        n = np.sqrt(1 - l * l - m * m) - 1
        for r in range(nrow):
            u, v, w = uvw[r]
            rp = two_pi_over_c * (u * l + v * m + w * n)
            amp = spectrum[s] * np.exp(1j * rp * freq)
            if stype[s] == "GAUSSIAN":
                emaj, emin, ang = gauss_shape[s]
                el, em = emaj * np.sin(ang), emaj * np.cos(ang)
                er = emin / (1.0 if emaj == 0 else emaj)
                u1 = (u * em - v * el) * er
                v1 = u * el + v * em
                amp = amp * np.exp(-((u1 * sf) ** 2 + (v1 * sf) ** 2))
            vis[r, :, 0] += amp
    return vis


def test_wsclean_predict_parity(rng, spec_data):
    I, coeffs, ref_freq, freq = spec_data  # noqa: E741
    nsrc = I.shape[0]
    lm = rng.uniform(-0.01, 0.01, (nsrc, 2))
    uvw = rng.uniform(-1000, 1000, (20, 3))
    stype = np.array(["POINT", "GAUSSIAN", "POINT", "GAUSSIAN", "POINT", "POINT"])
    gauss_shape = np.column_stack(
        [rng.uniform(1e-5, 1e-4, nsrc), rng.uniform(1e-6, 1e-5, nsrc),
         rng.uniform(0, np.pi, nsrc)]
    )
    log_poly = np.array([False, True, False, False, True, False])

    out = np.asarray(
        wsclean_predict(uvw, lm, stype, I, coeffs, log_poly, ref_freq,
                        gauss_shape, freq)
    )
    spectrum = np.asarray(spectra(I, coeffs, log_poly, ref_freq, freq))
    expected = np_wsclean_predict(uvw, lm, stype, spectrum, gauss_shape, freq)
    assert out.shape == (20, 10, 1)
    assert_allclose(out, expected, rtol=1e-9, atol=1e-11)

    with pytest.raises(ValueError, match="POINT or GAUSSIAN"):
        wsclean_predict(uvw, lm, np.array(["BLOB"] * nsrc), I, coeffs,
                        log_poly, ref_freq, gauss_shape, freq)
