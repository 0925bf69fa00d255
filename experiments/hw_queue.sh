#!/bin/bash
# Round-3c HW experiment queue: waits for the axon tunnel to return,
# then runs the queued measurements sequentially (one TPU job at a
# time). Logs to /tmp/hw_queue/NN_name.log.
set -u
mkdir -p /tmp/hw_queue
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

log() { echo "[hw_queue $(date +%H:%M:%S)] $*" >> /tmp/hw_queue/queue.log; }

log "waiting for TPU..."
for i in $(seq 1 200); do
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    log "TPU up after $i probes"
    touch /tmp/hw_queue/tpu_up
    break
  fi
  sleep 120
done
if [ ! -f /tmp/hw_queue/tpu_up ]; then
  log "TPU never came back; giving up"
  exit 1
fi

run() {
  local name=$1 tmo=$2; shift 2
  log "START $name"
  timeout "$tmo" "$@" > "/tmp/hw_queue/$name.log" 2>&1
  log "END $name rc=$?"
}

run 01_verify_stride   3000 python -u experiments/verify_stride_kernel_hw.py
run 02_gather_width    1800 python -u experiments/exp_gather_width.py
run 03_probe9          1500 python -u experiments/exp_pallas_probe9.py
run 04_patch_parity    2400 python -u experiments/verify_patch_hw.py parity
run 05_patch_perf      3000 python -u experiments/verify_patch_hw.py perf
run 06_chunk_ladder    3000 python -u experiments/exp_chunk_ladder.py
run 07_patch_quality   3600 python -u experiments/verify_patch_hw.py quality
run 08_bench_headline  1800 python bench.py
run 09_bench_patch     1800 python bench.py --coherent-gather
log "QUEUE DONE"
