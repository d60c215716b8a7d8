#!/bin/bash
# Round-3 TPU validation/measurement queue. Run IN ORDER, ONE step at a
# time (a single process may own the TPU). Appends to /tmp/tpu_queue_r3.log.
#
# Usage: bash tools/tpu_queue_r3.sh [step]   (default: all)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue_r3.log
step="${1:-all}"

run() { echo "=== $(date) $*" >> "$LOG"; "$@" >> "$LOG" 2>&1; echo "rc=$?" >> "$LOG"; }

# 1. ground-truth accuracy at the 10 kbp operating point (queue-r2 step 4)
if [ "$step" = 1 ] || [ "$step" = all ]; then
  run timeout 7200 python -m scrooge_tpu.profiling.sweep groundtruth \
      simulated:512:10000 --profile_dir=profile --max_experiments=8 \
      --max_W=128 --baseline_pairs=16
fi

# 2. baselines throughput sweep at the operating point (now incl. edlib)
if [ "$step" = 2 ] || [ "$step" = all ]; then
  run timeout 14400 python -m scrooge_tpu.profiling.sweep baselines \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --baseline_pairs=24
fi

# 3. high-error (ONT-like, 85% accuracy) tb_cap retry-cliff sweep
if [ "$step" = 3 ] || [ "$step" = all ]; then
  run timeout 14400 python -m scrooge_tpu.profiling.sweep tbcap \
      simulated:16384:10000:0:0.85 --profile_dir=profile \
      --batch_tile=16384
fi

# 4. high-error headline bench (85% accuracy) for the PARITY.md paragraph
if [ "$step" = 4 ] || [ "$step" = all ]; then
  run env BENCH_ACCURACY=0.85 BENCH_READS=16384 BENCH_TILE=16384 \
      timeout 3600 python bench.py
fi

# 5. BASELINE config 4 at scale: 1 Gbase multi-chromosome genome,
#    1M streamed reads (PreparedGenome keeps it device-resident)
if [ "$step" = 5 ] || [ "$step" = all ]; then
  run timeout 28800 python tools/config4_run.py
fi

# 6. kernel ablation table at the headline shape
if [ "$step" = 6 ] || [ "$step" = all ]; then
  run timeout 7200 python tools/ablate_run.py
fi

# 7. W=512 XLA-fallback throughput (one recorded row past the Pallas
#    fast-path bound; reference sweep stops at 256)
if [ "$step" = 7 ] || [ "$step" = all ]; then
  run timeout 7200 python - <<'PYEOF'
import csv, os, time
import numpy as np
from scrooge_tpu.api import align_reads, prepare_genome
from scrooge_tpu.config import AlignConfig
from scrooge_tpu.utils.simulate import simulate_dataset

ds = simulate_dataset(genome_len=1_000_000, num_reads=2048,
                      read_len=10_000, accuracy=0.95, seed=7)
pg = prepare_genome(ds.genome)
rows = []
for batch in (2048, 1024):
    try:
        cfg = AlignConfig(W=512, K=512, O=257, backend="xla",
                          batch_tile=batch)
        reads = ds.reads[:batch]
        align_reads(pg, reads, cfg)  # compile + warm
        _, stats = align_reads(pg, reads, cfg, return_stats=True)
        rows.append([512, 257, True, batch, stats.aligns_per_second])
        print(f"W=512 xla batch={batch}: "
              f"{stats.aligns_per_second:,.0f} aligns/s")
        break
    except Exception as e:
        print(f"batch={batch} failed: {e}")
os.makedirs("profile", exist_ok=True)
with open("profile/w512_xla.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["W", "O", "early termination", "batch", "aligns/second"])
    w.writerows(rows)
PYEOF
fi

# 8. final headline bench (fused prep + packed path in place)
if [ "$step" = 8 ] || [ "$step" = all ]; then
  run timeout 3600 python bench.py
fi

echo "=== $(date) r3 queue done" >> "$LOG"
