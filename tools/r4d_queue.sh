#!/bin/bash
# Round-4 queue D: re-record the operating-point sweeps + ablation on the
# round-4 engine (rebase + pair-packed entries + two-level compaction),
# plus the short-read and ONT operating points. Run after r4c_queue.sh.
cd "$(dirname "$0")/.."
LOG=tools/r4d_queue.log
start=${1:-1}

wait_tpu() {
  for i in $(seq 1 20); do
    timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null && return 0
    sleep 30
  done
  return 1
}

run() { echo "=== STEP $step_no START $(date) $*" >> "$LOG"; wait_tpu || { echo "=== STEP $step_no SKIP no device" >> "$LOG"; return 1; }; "$@" >> "$LOG" 2>&1; echo "=== STEP $step_no END rc=$? $(date)" >> "$LOG"; }

step_no=1
if [ "$start" -le 1 ]; then
  # headline (round-4 engine + two-level compaction)
  run timeout 1800 python bench.py
fi

step_no=2
if [ "$start" -le 2 ]; then
  # short-read Illumina-style operating point (now correctly labeled)
  run env BENCH_W=32 BENCH_O=17 BENCH_READ_LEN=150 BENCH_GENOME=300000 \
      timeout 1800 python bench.py
fi

step_no=3
if [ "$start" -le 3 ]; then
  # ONT-class stress point with the escalation ladder on
  run env BENCH_ACCURACY=0.85 BENCH_READS=16384 BENCH_TILE=16384 \
      timeout 3600 python bench.py
fi

step_no=4
if [ "$start" -le 4 ]; then
  # operating-point device sweeps (W/O, O, batch, kernel knobs)
  run timeout 10800 python -m scrooge_tpu.profiling.sweep device \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --max_experiments=8
fi

step_no=5
if [ "$start" -le 5 ]; then
  # kernel-section ablation on the round-4 engine
  run timeout 7200 python tools/ablate_run.py
fi

echo "=== QUEUE D DONE $(date)" >> "$LOG"
