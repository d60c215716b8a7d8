#!/bin/bash
# Round-3 master device queue: every on-device measurement this round,
# ordered by VERDICT.md leverage. ONE process may own the TPU — run this
# alone and in order. Appends to /tmp/r3_master.log; each step also
# drops a marker line so progress is greppable.
#
# Usage: bash tools/r3_master_queue.sh [start_step]
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_master.log
start="${1:-1}"

run() { echo "=== STEP $step_no START $(date) $*" >> "$LOG"; "$@" >> "$LOG" 2>&1; echo "=== STEP $step_no END rc=$? $(date)" >> "$LOG"; }

step_no=1
if [ "$start" -le 1 ]; then
  # validate the round-3 host-path changes (fused C++ prep, packed API)
  # and record the new end-to-end number
  run timeout 2400 python bench.py
fi

step_no=2
if [ "$start" -le 2 ]; then
  # VERDICT #1: operating-point device sweeps, W=16..256 at batch 32768
  run timeout 10800 python -m scrooge_tpu.profiling.sweep device \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --max_experiments=8
fi

step_no=3
if [ "$start" -le 3 ]; then
  # VERDICT #2: BASELINE config 4 — ~1 Gbase multi-chromosome genome,
  # 1M streamed reads
  run timeout 10800 python tools/config4_run.py
fi

step_no=4
if [ "$start" -le 4 ]; then
  # VERDICT #4: high-error (ONT-like 85%) tb_cap retry-cliff sweep
  run timeout 5400 python -m scrooge_tpu.profiling.sweep tbcap \
      simulated:16384:10000:0:0.85 --profile_dir=profile \
      --batch_tile=16384
fi

step_no=5
if [ "$start" -le 5 ]; then
  # VERDICT #4b: high-error headline bench for the PARITY.md paragraph
  run env BENCH_ACCURACY=0.85 BENCH_READS=16384 BENCH_TILE=16384 \
      timeout 1800 python bench.py
fi

step_no=6
if [ "$start" -le 6 ]; then
  # VERDICT #6: kernel ablation table at the headline shape
  run timeout 5400 python tools/ablate_run.py
fi

step_no=7
if [ "$start" -le 7 ]; then
  # VERDICT #10: W=512 XLA-fallback throughput row
  run timeout 2400 python tools/w512_row.py
fi

step_no=8
if [ "$start" -le 8 ]; then
  # ground-truth accuracy at the 10 kbp operating point
  run timeout 5400 python -m scrooge_tpu.profiling.sweep groundtruth \
      simulated:512:10000 --profile_dir=profile --max_experiments=8 \
      --max_W=128 --baseline_pairs=16
fi

step_no=9
if [ "$start" -le 9 ]; then
  # baselines throughput sweep at the operating point (incl. real edlib)
  run timeout 7200 python -m scrooge_tpu.profiling.sweep baselines \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --baseline_pairs=24
fi

step_no=10
if [ "$start" -le 10 ]; then
  # final headline bench with everything in place
  run timeout 1800 python bench.py
fi

echo "=== r3 master queue done $(date)" >> "$LOG"
