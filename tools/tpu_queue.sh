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
  # 2. W=256 Pallas validation ON DEVICE: Mosaic-compiles the W=256
  #    K=256 O=129 kernel (VMEM budget 92MB), checks bit-parity vs the
  #    XLA engine, and reports throughput. (pytest is the wrong vehicle:
  #    tests/conftest.py pins JAX_PLATFORMS=cpu.)
  run timeout 3600 python - <<'PYEOF'
import time, numpy as np
from scrooge_tpu.config import AlignConfig
from scrooge_tpu.ops import engine_pallas, engine_xla
import jax
print("devices:", jax.devices())
cfg = AlignConfig(W=256, K=256, O=129, batch_tile=1024)
B, rl, tl = 1024, 2000, 2400
rng = np.random.default_rng(7)
text = rng.integers(0, 4, (B, tl), dtype=np.uint8)
pattern = np.where(rng.random((B, rl)) < 0.05,
                   rng.integers(0, 4, (B, rl), dtype=np.uint8),
                   text[:, :rl]).astype(np.uint8)
tlen = np.full(B, tl, np.int32); plen = np.full(B, rl, np.int32)
maxw = cfg.max_windows(rl)
sk, kw = engine_pallas.choose_kernel_shape(cfg, B // 128)
print("sk,kw =", sk, kw, "maxw =", maxw)
tw = engine_pallas.pack_2bit_host(text)
pw = engine_pallas.pack_2bit_host(pattern)
t0 = time.time()
rp = engine_pallas.align_batch(cfg, maxw, sk, kw, tw, tlen, pw, plen)
edp = np.asarray(rp.edit_distance)   # readback = real sync on axon
t1 = time.time()
rp = engine_pallas.align_batch(cfg, maxw, sk, kw, tw, tlen, pw, plen)
edp = np.asarray(rp.edit_distance)
t2 = time.time()
rx = engine_xla.align_batch(cfg, maxw, text, tlen, pattern, plen)
edx = np.asarray(rx.edit_distance)
print("W256 PARITY equal =", bool((edp == edx).all()),
      "failed =", int(np.asarray(rp.failed).sum()))
print(f"W256 compile+run {t1-t0:.1f}s, warm {t2-t1:.2f}s "
      f"({B/(t2-t1):.0f} aligns/s incl. readback)")
PYEOF
fi

if [ "$step" = 3 ] || [ "$step" = all ]; then
  # 3. operating-point sweeps: batch tiles to 32768 and W/O sweeps at
  #    the bench batch, on a bench-sized dataset (smaller sets would
  #    measure tile padding). Sweeps write their CSVs incrementally, so
  #    a timeout keeps the completed configs.
  run timeout 14400 python -m scrooge_tpu.profiling.sweep device \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
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
  #    representative figures; includes wfa/wfa_lm/sw now). Same
  #    bench-sized dataset so the device tile is fully populated.
  run timeout 14400 python -m scrooge_tpu.profiling.sweep baselines \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --baseline_pairs=24
fi

echo "=== $(date) queue done" >> "$LOG"
