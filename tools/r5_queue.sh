#!/bin/bash
# Round-5 TPU measurement queue (run from the repo root). Steps are
# independent: a failure logs and the queue continues. Each step's
# timeout bounds a hung tunnel.
cd "$(dirname "$0")/.." || exit 1
LOG=tools/r5_queue.log
step() {
  echo "=== STEP $1 START $(date -u) $2" | tee -a "$LOG"
  shift 2
  timeout "$@" >> "$LOG" 2>&1
  echo "=== END rc=$? $(date -u)" | tee -a "$LOG"
}

# 1. operating-point device sweeps at the reference's W grid (W=16..256
#    step 16, profile.py:65-82) on the round-5 engine; O/batch/kernel
#    families re-record alongside (PARITY drift fix)
step 1 "device sweep W-grid" 14400 python -m scrooge_tpu.profiling.sweep \
  device simulated:32768:10000 --profile_dir=profile --batch_tile=16384 \
  --max_experiments=16

# 2. 85%-accuracy (ONT-class) bench row on the final engine
step 2 "bench 0.85" 3600 env BENCH_ACCURACY=0.85 BENCH_READS=16384 \
  python bench.py

# 3. short-read representative config (W=32 O=17, plot.py:1304-1331)
step 3 "bench short" 3600 env BENCH_W=32 BENCH_O=17 BENCH_READ_LEN=150 \
  BENCH_GENOME=400000 python bench.py

# 4. baselines throughput row re-record (final engine)
step 4 "baselines" 7200 python -m scrooge_tpu.profiling.sweep baselines \
  simulated:32768:10000 --profile_dir=profile --batch_tile=16384 \
  --baseline_pairs 32

# 5. tb_cap sweep re-record at the ONT stress point (final engine)
step 5 "tbcap" 7200 python -m scrooge_tpu.profiling.sweep tbcap \
  simulated:16384:10000:0:0.85 --profile_dir=profile --batch_tile=16384

echo "=== QUEUE DONE $(date -u)" | tee -a "$LOG"
