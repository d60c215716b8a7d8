#!/bin/bash
# Round-4 queue B: scale + scaling-proxy measurements (run AFTER
# r4_queue.sh; steps 2-3 are CPU-only but still serialized — the host has
# one core and concurrent jobs distort each other's timings).
cd "$(dirname "$0")/.."
LOG=tools/r4b_queue.log
start=${1:-1}

wait_tpu() {
  for i in $(seq 1 20); do
    timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null && return 0
    sleep 30
  done
  return 1
}

run() { echo "=== STEP $step_no START $(date) $*" >> "$LOG"; "$@" >> "$LOG" 2>&1; echo "=== STEP $step_no END rc=$? $(date)" >> "$LOG"; }
run_tpu() { echo "=== STEP $step_no START $(date) $*" >> "$LOG"; wait_tpu || { echo "=== STEP $step_no SKIP no device" >> "$LOG"; return 1; }; "$@" >> "$LOG" 2>&1; echo "=== STEP $step_no END rc=$? $(date)" >> "$LOG"; }

step_no=1
if [ "$start" -le 1 ]; then
  # FULL human scale: ~3.1 Gbase x 24 chromosomes x 1M reads, streamed
  # (BASELINE config 4; the r3 run stopped at 1 Gbase)
  run_tpu timeout 28800 python tools/config4_run.py \
      --genome_bases 3100000000 --chroms 24 --reads 1000000
fi

step_no=2
if [ "$start" -le 2 ]; then
  # per-device device-time constancy proxy on the 8-virtual-device mesh
  run env JAX_PLATFORMS=cpu \
      XLA_FLAGS="--xla_force_host_platform_device_count=8 --xla_llvm_disable_expensive_passes=true" \
      timeout 7200 python -m scrooge_tpu.profiling.scaling --device_time \
      --engine pallas --per_device 1024 --read_len 600 --reps 3 \
      --out profile/devicetime_virtual.csv
fi

step_no=3
if [ "$start" -le 3 ]; then
  # real 2-process jax.distributed (gloo) weak-scaling run. NOTE: this
  # host has ONE core, so both processes timeshare it — the efficiency
  # recorded here is a floor under maximal host contention, not an ICI
  # number (the CSV's platform column says cpu).
  run timeout 7200 python -m scrooge_tpu.profiling.scaling \
      --distributed 2 --per_process 4096 --read_len 600 \
      --out profile/scaling_gloo_2proc.csv
fi

echo "=== QUEUE B DONE $(date)" >> "$LOG"
