#!/bin/bash
# Tunnel monitor (round-4 verdict directive 1c): probe the axon tunnel
# in a loop; on a healthy window run bench.py (which banks per-config
# TPU captures into .bench_cache/last_tpu_capture.json). Exits once all
# five configs are banked. Log: /tmp/tunnel_monitor.log
cd /root/repo
LOG=/tmp/tunnel_monitor.log
PROBE='
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
x = jax.jit(lambda a: a * 2)(np.float32(21.0))
assert float(np.asarray(x)) == 42.0
'
DONE='
import json, sys
try:
    c = json.load(open("/root/repo/.bench_cache/last_tpu_capture.json"))["configs"]
except Exception:
    sys.exit(1)
need = {"config1_dft_im_to_vis", "config2_rime_predict",
        "config3_beam_dde_chain", "config4_wgridder_bda",
        "config5_selfcal_loop"}
sys.exit(0 if need <= set(c) else 1)
'
while true; do
  if python -c "$DONE" 2>/dev/null; then
    echo "$(date -u +%FT%TZ) all five configs banked; monitor exiting" >> "$LOG"
    exit 0
  fi
  if timeout 100 python -c "$PROBE" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP; running bench" >> "$LOG"
    timeout 520 python bench.py >> "$LOG" 2>&1
    echo "$(date -u +%FT%TZ) bench run finished (rc=$?)" >> "$LOG"
  else
    echo "$(date -u +%FT%TZ) tunnel down" >> "$LOG"
    sleep 45
  fi
done
