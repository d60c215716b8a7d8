#!/bin/bash
# Round-4 queue F: A/Bs + re-records on the FINAL round-4 engine
# (predicted-cap fast path + packed identity fast path committed).
# Chains behind r4e_queue.sh.
cd "$(dirname "$0")/.."
LOG=tools/r4f_queue.log
start=${1:-1}

for i in $(seq 1 480); do
  grep -q "QUEUE E DONE" tools/r4e_queue.log 2>/dev/null && break
  sleep 60
done

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
  # device-time constancy proxy, now actually on the 8-virtual-device
  # CPU mesh (the module forces the platform itself since c6ec5e0)
  run timeout 7200 python -m scrooge_tpu.profiling.scaling --device_time \
      --engine pallas --per_device 1024 --read_len 600 --reps 3 \
      --out profile/devicetime_virtual.csv
fi

step_no=2
if [ "$start" -le 2 ]; then
  # upload-streams A/B at the headline point
  run_tpu env SCROOGE_UPLOAD_STREAMS=2 timeout 3600 python bench.py
fi

step_no=3
if [ "$start" -le 3 ]; then
  run_tpu env SCROOGE_UPLOAD_STREAMS=3 timeout 3600 python bench.py
fi

step_no=4
if [ "$start" -le 4 ]; then
  # kernel-only kw A/B with the dedicated kernel pass
  run_tpu env SCROOGE_KW=16 timeout 3600 python bench.py
fi

step_no=5
if [ "$start" -le 5 ]; then
  # re-record the operating-point sweeps on the final engine (the r4d
  # record predates the predicted-cap fast path, so its api-core rates
  # carry two extra tunnel syncs per tile)
  run_tpu timeout 10800 python -m scrooge_tpu.profiling.sweep device \
      simulated:32768:10000 --profile_dir=profile --batch_tile=32768 \
      --max_experiments=8
fi

echo "=== QUEUE F DONE $(date)" >> "$LOG"
