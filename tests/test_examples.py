"""Smoke tests for the example scripts and CLI utilities (reference
strategy: rime/examples/tests/test_examples.py smoke-imports)."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
ENV_PATCH = {"AFRICANUS_TPU_FORCE_CPU": "1"}


def _run(args, timeout=240):
    import os

    env = dict(os.environ)
    env.update(ENV_PATCH)
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=env,
    )


def test_predict_dft_example():
    r = _run([REPO / "examples" / "predict_dft.py", "--nsrc", "10",
              "--nchan", "8", "--ntime", "2"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "throughput" in r.stdout


def test_predict_wsclean_example():
    r = _run([REPO / "examples" / "predict_wsclean.py"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "predicted vis" in r.stdout


def test_plot_cli(tmp_path):
    out = tmp_path / "f.png"
    r = _run([REPO / "africanus_tpu" / "scripts" / "plot_filter.py",
              "--output", str(out)])
    assert r.returncode == 0, r.stderr[-800:]
    assert out.exists()


def test_predict_shapelet_example():
    r = _run([REPO / "examples" / "predict_shapelet.py"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "predicted vis" in r.stdout


def test_make_dirty_example():
    r = _run([REPO / "examples" / "make_dirty.py", "48", "2000"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "peak at" in r.stdout
    # every source recovered within 10%
    for line in r.stdout.splitlines():
        if "recovered" in line:
            true = float(line.split("true")[1].split(",")[0])
            got = float(line.split("recovered")[1])
            assert abs(got - true) < 0.1 * true


@pytest.mark.parametrize("script", ["custom_rime_term", "apply_gains",
                                    "generate_gains", "predict_from_fits"])
def test_more_examples(script):
    r = _run([REPO / "examples" / f"{script}.py"])
    assert r.returncode == 0, r.stderr[-800:]


def test_predict_to_ms_store_example(tmp_path):
    """The MS-shaped read -> predict -> MODEL_DATA write-back pipeline
    (reference rime/examples/predict.py:531-587 analogue)."""
    r = _run([REPO / "examples" / "predict_to_ms_store.py",
              str(tmp_path / "store")])
    assert r.returncode == 0, r.stderr[-800:]
    assert "round-trip max abs err" in r.stdout


def test_selfcal_ms_store_example(tmp_path):
    """Full L4 pipeline on the MS-shaped store: solve gains, write
    CORRECTED_DATA back, image + CLEAN."""
    r = _run([REPO / "examples" / "selfcal_ms_store.py",
              str(tmp_path / "store")])
    assert r.returncode == 0, r.stderr[-800:]
    assert "selfcal pipeline round trip OK" in r.stdout


def test_spi_fitter_cube_example(tmp_path):
    """End-to-end image-cube SPI fit: fabricate a model cube with known
    power-law sources + residual cube, run the CLI, check the alpha/I0
    maps recover the truth at the source pixels (reference
    simple_spi_fitter.py parity example)."""
    import numpy as np

    from africanus_tpu.utils.fits import read_fits, write_fits

    rng = np.random.default_rng(5)
    nband, npl, npm = 6, 48, 48
    ref_freq = 1.2e9
    freqs = np.linspace(0.9e9, 1.5e9, nband)
    cell = 0.01  # deg

    truth = [(12, 15, 2.0, -0.7), (30, 33, 3.0, -1.2), (40, 12, 1.5, 0.3)]
    cube = np.zeros((nband, npl, npm))
    for (px, py, i0, alpha) in truth:
        cube[:, px, py] = i0 * (freqs / ref_freq) ** alpha

    cards = [
        ("CTYPE1", "RA---SIN"), ("CUNIT1", "deg"),
        ("CRPIX1", npm / 2 + 1.0), ("CDELT1", -cell), ("CRVAL1", 0.0),
        ("CTYPE2", "DEC--SIN"), ("CUNIT2", "deg"),
        ("CRPIX2", npl / 2 + 1.0), ("CDELT2", cell), ("CRVAL2", 0.0),
        ("CTYPE3", "FREQ"), ("CUNIT3", "Hz"),
        ("CRPIX3", 1.0 + (ref_freq - freqs[0]) / (freqs[1] - freqs[0])),
        ("CDELT3", freqs[1] - freqs[0]), ("CRVAL3", ref_freq),
        ("CTYPE4", "STOKES"),
        ("BMAJ", 3 * cell), ("BMIN", 2 * cell), ("BPA", 30.0),
    ]
    model_path = tmp_path / "model.fits"
    resid_path = tmp_path / "resid.fits"
    write_fits(model_path, cube.reshape(1, nband, npl, npm), cards)
    write_fits(
        resid_path,
        (rng.normal(scale=1e-4, size=cube.shape)
         .reshape(1, nband, npl, npm)),
        cards,
    )

    r = _run([
        REPO / "examples" / "spi_fitter_cube.py",
        "--fitsmodel", str(model_path),
        "--fitsresidual", str(resid_path),
        "--outfile", str(tmp_path / "out-"),
        "--threshold", "50",
    ], timeout=400)
    assert r.returncode == 0, r.stderr[-1500:]

    _, alpha_map = read_fits(tmp_path / "out-alpha.fits")
    _, i0_map = read_fits(tmp_path / "out-I0.fits")
    _, rec = read_fits(tmp_path / "out-Irec_cube.fits")
    assert rec.reshape(cube.shape).shape == cube.shape
    for (px, py, i0, alpha) in truth:
        # restored peak keeps the component's spectral index; I0 scales
        # by the (local) beam volume normalisation but stays positive
        assert abs(alpha_map[px, py] - alpha) < 0.05, (px, py)
        assert i0_map[px, py] > 0.5 * i0


def test_apply_phase_screen_example(tmp_path):
    """Phase-screen corruption + recovery pipeline (reference
    apply_phase_screen_to_ms.py parity example)."""
    r = _run([REPO / "examples" / "apply_phase_screen_ms_store.py",
              str(tmp_path / "store")], timeout=400)
    assert r.returncode == 0, r.stderr[-1500:]
    assert "recovered OK" in r.stdout
