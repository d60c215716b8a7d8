#!/bin/bash
# Round-4 queue E: clean re-measurements (run AFTER r4b_queue.sh — waits
# for its DONE marker). The config4 row recorded by queue B step 1 was
# contaminated by concurrent host work (chunks 10-16 ran while tests
# executed on this single-core host); step 1 re-runs it on a quiet host.
cd "$(dirname "$0")/.."
LOG=tools/r4e_queue.log
start=${1:-1}

# serialize behind queue B (both its TPU and CPU steps are measurements)
for i in $(seq 1 480); do
  grep -q "QUEUE B DONE" tools/r4b_queue.log 2>/dev/null && break
  sleep 60
done

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
  # clean full-human-scale rerun (quiet host)
  run timeout 28800 python tools/config4_run.py \
      --genome_bases 3100000000 --chroms 24 --reads 1000000
fi

step_no=2
if [ "$start" -le 2 ]; then
  # headline bench: round-4 engine + packed identity fast path
  run timeout 3600 python bench.py
fi

step_no=3
if [ "$start" -le 3 ]; then
  # pipelining A/B: with the predicted-cap fast path there are no
  # mid-pipeline cap syncs left — re-test whether multi-tile overlap now
  # beats the single full tile (r3 measured 8 tiles 2.5x slower)
  run env BENCH_TILE=16384 timeout 3600 python bench.py
fi

step_no=4
if [ "$start" -le 4 ]; then
  run env BENCH_TILE=8192 timeout 3600 python bench.py
fi

step_no=5
if [ "$start" -le 5 ]; then
  # short-read point with the fast path
  run env BENCH_W=32 BENCH_O=17 BENCH_READ_LEN=150 BENCH_GENOME=300000 \
      timeout 1800 python bench.py
fi

step_no=6
if [ "$start" -le 6 ]; then
  # ONT-class stress point (escalation ladder on)
  run env BENCH_ACCURACY=0.85 BENCH_READS=16384 BENCH_TILE=16384 \
      timeout 3600 python bench.py
fi

echo "=== QUEUE E DONE $(date)" >> "$LOG"
