#!/bin/bash
# Round-3d device queue: the rows r3c could not finish — a reproducible
# short-read bench row (W=32 O=17, 150bp) on the fast engine, and the
# baselines-throughput rerun (its first attempt lost the device grant to
# a concurrent client). Appends to /tmp/r3d.log.
#
# Usage: bash tools/r3d_queue.sh [start_step]
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3d.log
start="${1:-1}"

wait_tpu() {
  for i in $(seq 1 20); do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "... device not ready (try $i), sleeping 30s" >> "$LOG"
    sleep 30
  done
  return 1
}

run() { echo "=== STEP $step_no START $(date) $*" >> "$LOG"; wait_tpu || { echo "=== STEP $step_no SKIP no device" >> "$LOG"; return 1; }; "$@" >> "$LOG" 2>&1; echo "=== STEP $step_no END rc=$? $(date)" >> "$LOG"; }

step_no=1
if [ "$start" -le 1 ]; then
  # short-read operating point (reference plot.py:1304-1331)
  run env BENCH_W=32 BENCH_O=17 BENCH_READ_LEN=150 BENCH_READS=32768 \
      BENCH_TILE=32768 timeout 1200 python bench.py
fi

step_no=2
if [ "$start" -le 2 ]; then
  # baselines throughput at the operating point (genasm row changed)
  run timeout 3600 python -m scrooge_tpu.profiling.sweep baselines \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --baseline_pairs=24
fi

echo "=== r3d queue done $(date)" >> "$LOG"
