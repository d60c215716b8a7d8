#!/bin/bash
# Round-3c device queue: refresh the artifacts still recorded on the
# pre-segment-slice engine (ablation, config4, baselines row) and take
# fresh headline / ONT bench rows. Appends to /tmp/r3c.log.
#
# Usage: bash tools/r3c_queue.sh [start_step]
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3c.log
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
  # fresh headline with the fast segment path
  run timeout 1200 python bench.py
fi

step_no=2
if [ "$start" -le 2 ]; then
  # ONT-class (85% accuracy) headline row on the fast engine
  run env BENCH_ACCURACY=0.85 BENCH_READS=16384 BENCH_TILE=16384 \
      timeout 1200 python bench.py
fi

step_no=3
if [ "$start" -le 3 ]; then
  # baselines throughput at the operating point (genasm row changed)
  run timeout 3600 python -m scrooge_tpu.profiling.sweep baselines \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --baseline_pairs=24
fi

step_no=4
if [ "$start" -le 4 ]; then
  # kernel ablation table at the new balance
  run timeout 3600 python tools/ablate_run.py
fi

step_no=5
if [ "$start" -le 5 ]; then
  # stage breakdown (gather/pat/scan split) on the fast engine
  run timeout 1800 python tools/probe_scan.py
fi

step_no=6
if [ "$start" -le 6 ]; then
  # BASELINE config 4 at scale with the fast segment path
  run timeout 7200 python tools/config4_run.py
fi

echo "=== r3c queue done $(date)" >> "$LOG"
