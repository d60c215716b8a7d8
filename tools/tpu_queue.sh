#!/bin/bash
# TPU-gated validation queue: run IN ORDER once the device is reachable,
# ONE step at a time (a single process may own the TPU; see
# PARITY.md / memory notes). Each step appends to /tmp/tpu_queue.log.
#
# Usage: bash tools/tpu_queue.sh [step]   (default: run all steps)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue.log
step="${1:-all}"

run() { echo "=== $(date) $*" >> "$LOG"; "$@" >> "$LOG" 2>&1; echo "rc=$?" >> "$LOG"; }

if [ "$step" = 1 ] || [ "$step" = all ]; then
  # 1. headline bench (validates the pipelined tile loop + failed-bitmask
  #    kernel changes; first compile can take ~10-20 min)
  run timeout 3600 python bench.py
fi

if [ "$step" = 2 ] || [ "$step" = all ]; then
  # 2. W=256 Pallas validation (VMEM budget 92MB): parity + throughput
  run timeout 3600 python -m pytest tests/test_engine_pallas.py -x -q -k vmem
  run timeout 3600 python -m scrooge_tpu.cli.baseline_cli --simulated=256,2000 \
      --algorithms=genasm_device --threads=2048
fi

if [ "$step" = 3 ] || [ "$step" = all ]; then
  # 3. operating-point sweeps (VERDICT item 5): batch to 32768, W/O at
  #    the bench batch
  run timeout 7200 python -m scrooge_tpu.profiling.sweep device \
      simulated:2048:10000 --profile_dir=profile --batch_tile=32768 \
      --max_experiments=8
fi

if [ "$step" = 4 ] || [ "$step" = all ]; then
  # 4. ground-truth accuracy at long reads on device
  run timeout 7200 python -m scrooge_tpu.profiling.sweep groundtruth \
      simulated:512:10000 --profile_dir=profile --max_experiments=8 \
      --max_W=128 --baseline_pairs=16
fi

if [ "$step" = 5 ] || [ "$step" = all ]; then
  # 5. baselines throughput sweep on device (feeds baselines +
  #    representative figures; includes wfa/wfa_lm/sw now)
  run timeout 7200 python -m scrooge_tpu.profiling.sweep baselines \
      simulated:2048:10000 --profile_dir=profile --batch_tile=32768 \
      --baseline_pairs=24
fi

echo "=== $(date) queue done" >> "$LOG"
