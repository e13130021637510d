"""The bench.py TPU-capture bank: merge semantics of the runtime
(gitignored) and tracked cache files (round-4 verdict directive 1a).

Importing bench.py is side-effect-light (no jax/device work at module
scope beyond a constants import); the capture paths are monkeypatched
so the real cache files are never touched.
"""

import importlib
import json
import sys


def _bench(monkeypatch, tmp_path):
    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")
    monkeypatch.setattr(bench, "_TPU_CAPTURE_PATH",
                        str(tmp_path / "runtime.json"))
    monkeypatch.setattr(bench, "_TPU_CAPTURE_TRACKED",
                        str(tmp_path / "tracked.json"))
    return bench


def test_merge_newest_stamp_wins(monkeypatch, tmp_path):
    bench = _bench(monkeypatch, tmp_path)
    (tmp_path / "tracked.json").write_text(json.dumps({"configs": {
        "config1_dft_im_to_vis": {"name": "config1_dft_im_to_vis",
                                  "value": 1.0, "captured_unix": 100},
        "config2_rime_predict": {"name": "config2_rime_predict",
                                 "value": 2.0, "captured_unix": 300},
    }}))
    (tmp_path / "runtime.json").write_text(json.dumps({"configs": {
        "config1_dft_im_to_vis": {"name": "config1_dft_im_to_vis",
                                  "value": 9.0, "captured_unix": 200},
        "config2_rime_predict": {"name": "config2_rime_predict",
                                 "value": 8.0, "captured_unix": 250},
    }}))
    merged = bench._merged_tpu_configs()
    assert merged["config1_dft_im_to_vis"]["value"] == 9.0  # 200 > 100
    assert merged["config2_rime_predict"]["value"] == 2.0   # 300 > 250


def test_missing_files_are_fine(monkeypatch, tmp_path):
    bench = _bench(monkeypatch, tmp_path)
    assert bench._merged_tpu_configs() == {}
    assert bench._load_tpu_capture() is None


def test_save_writes_both_and_load_orders_by_plan(monkeypatch, tmp_path):
    bench = _bench(monkeypatch, tmp_path)
    bench._save_tpu_config({"name": "config5_selfcal_loop", "value": 5.0})
    bench._save_tpu_config({"name": "config2_rime_predict", "value": 2.0})
    for p in ("runtime.json", "tracked.json"):
        cache = json.loads((tmp_path / p).read_text())
        assert set(cache["configs"]) == {"config5_selfcal_loop",
                                         "config2_rime_predict"}
        for cfg in cache["configs"].values():
            assert "git" in cfg and "captured_unix" in cfg
    loaded = bench._load_tpu_capture()
    # _PLAN order: config2 first, config5 fourth
    names = [c["name"] for c in loaded["configs"]]
    assert names == ["config2_rime_predict", "config5_selfcal_loop"]
    assert "NOT this run's live numbers" in loaded["note"]
