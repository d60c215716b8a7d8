#!/bin/bash
# Round-3b device queue: re-record every throughput artifact after the
# segment-slice optimization (engine 2.1x faster; all recorded numbers
# stale). Appends to /tmp/r3b.log. ONE process may own the TPU.
#
# Usage: bash tools/r3b_queue.sh [start_step]
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3b.log
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

run() { echo "=== STEP $step_no START $(date) $*" >> "$LOG"; wait_tpu; "$@" >> "$LOG" 2>&1; echo "=== STEP $step_no END rc=$? $(date)" >> "$LOG"; }

step_no=1
if [ "$start" -le 1 ]; then
  # fresh headline numbers with the fast segment path
  run timeout 2400 python bench.py
fi

step_no=2
if [ "$start" -le 2 ]; then
  # operating-point device sweeps (also picks up the 2048-lane cap fix)
  run timeout 10800 python -m scrooge_tpu.profiling.sweep device \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --max_experiments=8
fi

step_no=3
if [ "$start" -le 3 ]; then
  # high-error tb_cap retry-cliff sweep
  run timeout 7200 python -m scrooge_tpu.profiling.sweep tbcap \
      simulated:16384:10000:0:0.85 --profile_dir=profile \
      --batch_tile=16384
fi

step_no=4
if [ "$start" -le 4 ]; then
  # ONT-class headline row
  run env BENCH_ACCURACY=0.85 BENCH_READS=16384 BENCH_TILE=16384 \
      timeout 1800 python bench.py
fi

step_no=5
if [ "$start" -le 5 ]; then
  # kernel ablation table at the new balance
  run timeout 5400 python tools/ablate_run.py
fi

step_no=6
if [ "$start" -le 6 ]; then
  # stage breakdown record (gather/pat/scan split) for the model
  run timeout 2400 python tools/probe_scan.py
fi

step_no=7
if [ "$start" -le 7 ]; then
  # BASELINE config 4 at scale with the fast segment path
  run timeout 10800 python tools/config4_run.py
fi

step_no=8
if [ "$start" -le 8 ]; then
  # baselines throughput at the operating point (genasm row changed)
  run timeout 7200 python -m scrooge_tpu.profiling.sweep baselines \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --baseline_pairs=24
fi

step_no=9
if [ "$start" -le 9 ]; then
  # final headline bench
  run timeout 1800 python bench.py
fi

echo "=== r3b queue done $(date)" >> "$LOG"
