#!/bin/bash
# Third HW queue: follow-ups from this session's results. Waits for
# queue2C to finish so TPU jobs never overlap.
set -u
mkdir -p /tmp/hw_queue
log() { echo "[hw_queue3 $(date +%H:%M:%S)] $*" >> /tmp/hw_queue/queue.log; }
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
for i in $(seq 1 600); do
  grep -q "QUEUE2C DONE" /tmp/hw_queue/queue.log 2>/dev/null && break
  sleep 120
done
grep -q "QUEUE2C DONE" /tmp/hw_queue/queue.log || { log "queue2 never finished"; exit 1; }
log "START 15_verify_stride_rerouted"
timeout 3000 python -u experiments/verify_stride_kernel_hw.py > /tmp/hw_queue/15_verify_stride_rerouted.log 2>&1
log "END 15_verify_stride_rerouted rc=$?"
log "QUEUE3 DONE"
