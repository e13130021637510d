"""FITS IO, beam header parsing and beam factory tests (reference:
util/beams.py, testing/beam_factory.py, util/tests/test_beam_utils.py)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.utils.fits import read_fits, write_fits
from africanus_tpu.utils.beams import beam_filenames, beam_grids, load_beam_cube
from africanus_tpu.testing.beam_factory import beam_factory


def test_fits_roundtrip(tmp_path, rng):
    data = rng.normal(size=(3, 5, 7))
    path = tmp_path / "test.fits"
    write_fits(path, data, [
        ("CTYPE1", "X", "l axis"),
        ("CRVAL1", -1.5),
        ("CRPIX1", 4),
        ("CDELT1", 0.25),
        ("OBJECT", "beam"),
        ("FLAG", True),
    ])
    header, out = read_fits(path)
    assert header["SIMPLE"] is True
    assert header["BITPIX"] == -64
    assert header["NAXIS"] == 3
    assert header["NAXIS1"] == 7 and header["NAXIS3"] == 3
    assert header["CTYPE1"] == "X"
    assert header["CRVAL1"] == -1.5
    assert header["FLAG"] is True
    assert header["OBJECT"] == "beam"
    assert_allclose(out, data)


def test_beam_filenames():
    fn = beam_filenames("beam_$(corr)_$(reim).fits", [9, 10, 11, 12])
    assert fn["xx"] == ("beam_xx_re.fits", "beam_xx_im.fits")
    assert fn["yy"] == ("beam_yy_re.fits", "beam_yy_im.fits")

    fn_up = beam_filenames("beam_$(CORR)_$(REIM).fits", [5, 8])
    assert fn_up["rr"] == ("beam_RR_RE.fits", "beam_RR_IM.fits")

    with pytest.raises(ValueError, match="Invalid correlation type"):
        beam_filenames("beam_$(corr)_$(reim).fits", [999])


def test_beam_factory_and_grids(tmp_path, rng):
    schema = tmp_path / "test_beam_$(corr)_$(reim).fits"
    freq = np.linspace(0.856e9, 1.712e9, 32)
    filenames = beam_factory(
        polarisation_type="linear", frequency=freq, npix=17,
        schema=schema, rng=rng,
    )
    assert set(filenames.keys()) == {"xx", "xy", "yx", "yy"}

    header, data = read_fits(filenames["xx"][0])
    assert data.shape == (33, 17, 17)  # (freq, y, x)

    (l_ax, l_grid), (m_ax, m_grid), (f_ax, f_grid) = beam_grids(header)
    assert len(l_grid) == 17 and len(m_grid) == 17 and len(f_grid) == 33
    # degree axes converted to radians, symmetric about 0
    assert_allclose(l_grid[0], -np.deg2rad(1.5), rtol=1e-10)
    assert_allclose(l_grid[-1], np.deg2rad(1.5), rtol=1e-10)
    # irregular GFREQ grid: endpoints exact
    assert_allclose(f_grid[0], freq[0])
    assert_allclose(f_grid[-1], freq[-1])
    assert (np.diff(f_grid) >= 0).all()


def test_load_beam_cube_and_dde(tmp_path, rng):
    """End-to-end: fabricate beams, load, interpolate with beam_cube_dde."""
    from africanus_tpu.rime import beam_cube_dde

    schema = tmp_path / "test_beam_$(corr)_$(reim).fits"
    beam_factory(polarisation_type="linear", npix=17, schema=schema, rng=rng)
    beam, extents, freq_map = load_beam_cube(
        schema, [9, 10, 11, 12]
    )
    assert beam.shape == (17, 17, 33, 4)
    assert np.iscomplexobj(beam)
    assert extents.shape == (2, 2)

    # interpolate at the beam centre: cos^3 model is 1 there
    lm = np.zeros((1, 2))
    pa = np.zeros((1, 1))
    pe = np.zeros((1, 1, 2, 2))
    ascale = np.ones((1, 2, 2))
    freq = np.array([freq_map[3], freq_map[20]])
    ddes = np.asarray(
        beam_cube_dde(
            beam.reshape(17, 17, 33, 2, 2), extents, freq_map, lm, pa, pe,
            ascale, freq,
        )
    )
    assert ddes.shape == (1, 1, 1, 2, 2, 2)
    assert_allclose(ddes[0, 0, 0, :, 0, 0].real, 1.0, rtol=1e-6)
