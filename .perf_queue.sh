#!/bin/bash
# Perf-work queue: waits for .tunnel_monitor.sh to finish banking all
# five bench configs, then spends subsequent tunnel windows on the
# round-5 perf tasks, in order:
#   1. benchmarks/profile_config5.py   (find config-5's limiting stage)
#   2. benchmarks/sweep_wgrid.py       (row-bucket/group/tile sweep)
#   3. benchmarks/reprobe_toolchain.py (TOOLCHAIN.md blockers)
# Each task runs at most once to completion; output to /tmp/perf_queue/.
cd /root/repo
LOG=/tmp/perf_queue/queue.log
mkdir -p /tmp/perf_queue
PROBE='
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
x = jax.jit(lambda a: a * 2)(np.float32(21.0))
assert float(np.asarray(x)) == 42.0
'

# wait until banking is done (monitor writes this line then exits)
until grep -q "all five configs banked" /tmp/tunnel_monitor.log 2>/dev/null; do
  sleep 60
done
echo "$(date -u +%FT%TZ) banking done; starting perf queue" >> "$LOG"

run_task () {  # $1 marker, $2 timeout, $3... command
  local MARK="/tmp/perf_queue/$1.done"
  local OUT="/tmp/perf_queue/$1.log"
  local T="$2"; shift 2
  [ -f "$MARK" ] && return 0
  if timeout 100 python -c "$PROBE" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) window: running $MARK" >> "$LOG"
    timeout "$T" "$@" >> "$OUT" 2>&1
    local RC=$?
    echo "$(date -u +%FT%TZ) $MARK rc=$RC" >> "$LOG"
    # mark done only on success; timeouts retry next window
    [ $RC -eq 0 ] && touch "$MARK"
  else
    sleep 30
  fi
  return 1
}

while true; do
  if [ -f /tmp/perf_queue/profile5.done ] \
     && [ -f /tmp/perf_queue/reprobe.done ]; then
    echo "$(date -u +%FT%TZ) perf queue complete" >> "$LOG"
    exit 0
  fi
  run_task profile5 320 python benchmarks/profile_config5.py
  run_task reprobe 500 python benchmarks/reprobe_toolchain.py
  sleep 5
done
