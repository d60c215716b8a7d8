#!/bin/bash
# Round-5 queue 2: re-record the families the W=256 worker crash killed
# (fresh process per family), probe W=240/256 in isolation, and re-run
# the baselines row under the engine-only protocol.
cd "$(dirname "$0")/.." || exit 1
LOG=tools/r5_queue2.log
step() {
  echo "=== STEP $1 START $(date -u) $2" | tee -a "$LOG"
  shift 2
  timeout "$@" >> "$LOG" 2>&1
  echo "=== END rc=$? $(date -u)" | tee -a "$LOG"
}

step 1 "O family" 7200 python -m scrooge_tpu.profiling.sweep device \
  simulated:32768:10000 --profile_dir=profile --batch_tile=16384 \
  --max_experiments=16 --families O

step 2 "batch family" 7200 python -m scrooge_tpu.profiling.sweep device \
  simulated:32768:10000 --profile_dir=profile --batch_tile=16384 \
  --max_experiments=8 --families batch

step 3 "kernel family" 7200 python -m scrooge_tpu.profiling.sweep device \
  simulated:32768:10000 --profile_dir=profile --batch_tile=16384 \
  --max_experiments=8 --families kernel

# W=240 and W=256 rows in isolation (each its own process; the W=256
# config crashed the TPU worker in queue 1) — written to a side dir and
# appended to the main WO CSV only on success
step 4 "W=240 row" 3600 python -m scrooge_tpu.profiling.sweep device \
  simulated:32768:10000 --profile_dir=profile/wtail240 \
  --batch_tile=16384 --max_experiments=1 --max_W=240 --families WO

step 5 "W=256 row" 3600 python -m scrooge_tpu.profiling.sweep device \
  simulated:32768:10000 --profile_dir=profile/wtail256 \
  --batch_tile=16384 --max_experiments=1 --max_W=256 --families WO

step 6 "baselines (engine-only protocol)" 7200 python -m \
  scrooge_tpu.profiling.sweep baselines simulated:32768:10000 \
  --profile_dir=profile --batch_tile=16384 --baseline_pairs 32

echo "=== QUEUE2 DONE $(date -u)" | tee -a "$LOG"
