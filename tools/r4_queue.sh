#!/bin/bash
# Round-4 device measurement queue: one TPU job at a time (the tunnel
# serves a single chip; concurrent processes fight over it).
# Usage: tools/r4_queue.sh [start_step] >> run log at tools/r4_queue.log
cd "$(dirname "$0")/.."
LOG=tools/r4_queue.log
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
  # tile pipelining: 2 tiles of 16384 (prep/upload of tile n+1 under
  # compute+postprocess of tile n)
  run env BENCH_TILE=16384 timeout 1800 python bench.py
fi

step_no=2
if [ "$start" -le 2 ]; then
  # 4 tiles of 8192
  run env BENCH_TILE=8192 timeout 1800 python bench.py
fi

step_no=3
if [ "$start" -le 3 ]; then
  # kw=16 slab fusion (select-tree unpack lifted the Mosaic chain bound)
  run env SCROOGE_KW=16 timeout 3600 python bench.py
fi

step_no=4
if [ "$start" -le 4 ]; then
  # kw=32
  run env SCROOGE_KW=32 timeout 3600 python bench.py
fi

step_no=5
if [ "$start" -le 5 ]; then
  # compact/tokenize device-time split at the headline shape
  run timeout 1800 python tools/probe_compact.py
fi

step_no=6
if [ "$start" -le 6 ]; then
  # W=512 XLA-fallback row (reference sweep stops at 256)
  run timeout 7200 python tools/w512_row.py
fi

step_no=7
if [ "$start" -le 7 ]; then
  # tb_cap retry-cliff sweep regenerated WITH the escalation ladder on
  run timeout 7200 python -m scrooge_tpu.profiling.sweep tbcap \
      simulated:16384:10000:0:0.85 --profile_dir=profile \
      --batch_tile=16384
fi

step_no=8
if [ "$start" -le 8 ]; then
  # baselines CSV rerun on the fast engine (PARITY.md pending-rerun row)
  run timeout 7200 python -m scrooge_tpu.profiling.sweep baselines \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --baseline_pairs=24
fi

echo "=== QUEUE DONE $(date)" >> "$LOG"
