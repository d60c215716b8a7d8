#!/bin/bash
# Round-4 queue C: post-rebase kernel A/B + device parity + postprocess
# split. Run after r4_queue.sh.
cd "$(dirname "$0")/.."
LOG=tools/r4c_queue.log
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
  # on-device bit-exactness of the rebased/pair-packed kernel
  run timeout 3600 python tools/probe_parity.py
fi

step_no=2
if [ "$start" -le 2 ]; then
  # A/B: rebased kernel at kw=8 (default shape, fresh compile)
  run timeout 3600 python bench.py
fi

step_no=3
if [ "$start" -le 3 ]; then
  run env SCROOGE_KW=16 timeout 3600 python bench.py
fi

step_no=4
if [ "$start" -le 4 ]; then
  run env SCROOGE_KW=32 timeout 3600 python bench.py
fi

step_no=5
if [ "$start" -le 5 ]; then
  run timeout 1800 python tools/probe_compact.py
fi

step_no=6
if [ "$start" -le 6 ]; then
  # stage-isolated core split (gather/scan/noents/full)
  run timeout 3600 python tools/probe_scan.py
fi

echo "=== QUEUE C DONE $(date)" >> "$LOG"
