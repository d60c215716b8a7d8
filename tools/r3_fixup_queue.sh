#!/bin/bash
# Round-3 fixup queue: re-runs the measurements invalidated by the
# 2026-08-19 fixes (single-tile sweep timing, kernel-grid slab-bound
# guard, tools sys.path) plus the steps that failed on the dead TPU
# worker. Run AFTER tools/r3_master_queue.sh completes. Appends to
# /tmp/r3_fixup.log.
#
# Usage: bash tools/r3_fixup_queue.sh [start_step]
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_fixup.log
start="${1:-1}"

wait_tpu() {
  # the TPU worker can take ~1 min to restart after a crash; don't let
  # one wedged step cascade into every later step failing instantly
  for i in $(seq 1 20); do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "... device not ready (try $i), sleeping 30s" >> "$LOG"
    sleep 30
  done
  return 1
}

run() { echo "=== STEP $step_no START $(date) $*" >> "$LOG"; wait_tpu; "$@" >> "$LOG" 2>&1; echo "=== STEP $step_no END rc=$? $(date)" >> "$LOG"; }

step_no=1
if [ "$start" -le 1 ]; then
  # device sweeps with single-full-tile timing + guarded kernel grid
  run timeout 10800 python -m scrooge_tpu.profiling.sweep device \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --max_experiments=8
fi

step_no=2
if [ "$start" -le 2 ]; then
  # high-error tb_cap retry-cliff sweep (died on the crashed worker)
  run timeout 7200 python -m scrooge_tpu.profiling.sweep tbcap \
      simulated:16384:10000:0:0.85 --profile_dir=profile \
      --batch_tile=16384
fi

step_no=3
if [ "$start" -le 3 ]; then
  # BASELINE config 4: ~1 Gbase multi-chromosome genome, 1M streamed reads
  run timeout 10800 python tools/config4_run.py
fi

step_no=4
if [ "$start" -le 4 ]; then
  # kernel ablation table at the headline shape
  run timeout 5400 python tools/ablate_run.py
fi

step_no=5
if [ "$start" -le 5 ]; then
  # W=512 XLA-fallback throughput row
  run timeout 2400 python tools/w512_row.py
fi

step_no=6
if [ "$start" -le 6 ]; then
  # final headline bench (records the native extract_runs packed path)
  run timeout 2400 python bench.py
fi

echo "=== r3 fixup queue done $(date)" >> "$LOG"
