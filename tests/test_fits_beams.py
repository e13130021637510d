"""FITS IO, beam header parsing and beam factory tests (reference:
util/beams.py, testing/beam_factory.py, util/tests/test_beam_utils.py)."""

import numpy as np
from numpy.testing import (
    assert_allclose,
    assert_array_almost_equal,
    assert_array_equal,
)
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


@pytest.fixture
def vla_beam_header():
    """VLA-style beam cube header (reference test_beam_utils.py fixture
    shape: 513^2 x 33 with an irregular GFREQ table)."""
    hdr = {
        "SIMPLE": "T",
        "BITPIX": -64,
        "NAXIS": 3,
        "NAXIS1": 513,
        "NAXIS2": 513,
        "NAXIS3": 33,
        "CTYPE1": "L       ",
        "CUNIT1": "DEG     ",
        "CDELT1": 0.011082,
        "CRPIX1": 257,
        "CRVAL1": 0.0110828777007,
        "CTYPE2": "M       ",
        "CUNIT2": "DEG     ",
        "CDELT2": 0.011082,
        "CRPIX2": 257,
        "CRVAL2": -2.14349358381e-07,
        "CTYPE3": "FREQ    ",
        "CDELT3": 1008000.0,
        "CRPIX3": 1,
        "CRVAL3": 1400256000.0,
        "CTYPE4": "STOKES  ",
        "CDELT4": 1,
        "CRPIX4": 1,
        "CRVAL4": -5,
    }
    # irregular GFREQ table (last entry deliberately non-linear)
    for i in range(33):
        hdr[f"GFREQ{i + 1}"] = 1400256000.0 + i * 1008000.0 + (i % 5) * 997.0
    hdr["GFREQ33"] = 1432456789.0
    return hdr


def test_fits_axes_reference_semantics(vla_beam_header):
    """BeamAxes converts degree axes to radians and prefers the GFREQ
    table over the regular grid; removing a GFREQ falls back to the
    regular CRVAL/CDELT grid (reference test_fits_axes,
    util/tests/test_beam_utils.py:81-121)."""
    from africanus_tpu.utils.beams import BeamAxes

    hdr = vla_beam_header
    ax = BeamAxes(hdr)
    assert ax.ctype[0] == "L"
    assert ax.cunit[0] == "RAD"
    assert ax.crval[0] == np.deg2rad(hdr["CRVAL1"])
    assert ax.cdelt[0] == np.deg2rad(hdr["CDELT1"])
    assert ax.ctype[1] == "M"
    assert ax.cunit[1] == "RAD"

    gfreqs = [hdr[f"GFREQ{i + 1}"] for i in range(hdr["NAXIS3"])]
    assert_array_almost_equal(ax.grid[2], gfreqs)

    hdr2 = dict(hdr)
    del hdr2["GFREQ30"]
    ax2 = BeamAxes(hdr2)
    R = np.arange(ax2.naxis[2])
    want = (R - ax2.crpix[2]) * ax2.cdelt[2] + ax2.crval[2]
    assert_array_equal(ax2.grid[2], want)


@pytest.mark.parametrize("m_axis", [None, "M", "-M", "Y", "-Y"])
@pytest.mark.parametrize("l_axis", [None, "L", "-L", "X", "-X"])
@pytest.mark.parametrize("header_m", ["M", "Y"])
@pytest.mark.parametrize("header_l", ["L", "X"])
def test_beam_grids_axis_variants(vla_beam_header, header_l, header_m,
                                  l_axis, m_axis):
    """beam_grids resolves L/M axes under every naming/sign variant the
    reference supports (reference test_beam_grids,
    util/tests/test_beam_utils.py:124-167)."""
    from africanus_tpu.utils.beams import axis_and_sign, beam_grids

    hdr = dict(vla_beam_header)
    hdr["CTYPE1"] = header_l
    hdr["CTYPE2"] = header_m

    _, l_sgn = axis_and_sign(l_axis, "L")
    _, m_sgn = axis_and_sign(m_axis, "M")

    (l_ax, l_grid), (m_ax, m_grid), (_, freq_grid) = beam_grids(
        hdr, l_axis, m_axis
    )

    assert hdr[f"CTYPE{l_ax}"] == header_l
    R = np.arange(float(hdr[f"NAXIS{l_ax}"]))
    exp = (R - (hdr[f"CRPIX{l_ax}"] - 1)) * hdr[f"CDELT{l_ax}"] \
        + hdr[f"CRVAL{l_ax}"]
    assert_array_almost_equal(np.deg2rad(exp) * l_sgn, l_grid)

    assert hdr[f"CTYPE{m_ax}"] == header_m
    R = np.arange(float(hdr[f"NAXIS{m_ax}"]))
    exp = (R - (hdr[f"CRPIX{m_ax}"] - 1)) * hdr[f"CDELT{m_ax}"] \
        + hdr[f"CRVAL{m_ax}"]
    assert_array_almost_equal(np.deg2rad(exp) * m_sgn, m_grid)

    gfreqs = [hdr[f"GFREQ{i + 1}"] for i in range(hdr["NAXIS3"])]
    assert_array_almost_equal(freq_grid, gfreqs)


def test_fits_end_card_not_confused_by_endlike_keywords(tmp_path):
    """The header parser must only stop at the true END card (keyword
    field exactly 'END', blank remainder) — not at keywords that merely
    start with END (ENDTIME) or comment text ending in END."""
    from africanus_tpu.utils.fits import read_fits, write_fits

    arr = np.arange(24, dtype=float).reshape(2, 3, 4)
    path = tmp_path / "endlike.fits"
    write_fits(str(path), arr, [
        ("ENDTIME", 12345.0),
        ("ENDX", 1.0, "history comment mentioning END"),
        ("CRVAL1", 0.25),
    ])
    hdr, data = read_fits(str(path))
    # every card after the END-like keywords must survive, and the data
    # payload must be read from the correct offset
    assert hdr["ENDTIME"] == 12345.0
    assert hdr["ENDX"] == 1.0
    assert hdr["CRVAL1"] == 0.25
    np.testing.assert_allclose(data, arr)
