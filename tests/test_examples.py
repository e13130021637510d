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
