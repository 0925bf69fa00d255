#!/bin/bash
# Round-4 HW queue C2: after queue C, official bench legs for the
# (3,2) patch shape (HW-parity-verified exact at bench density,
# verify_pm_patch_hw: |err| 8.2e-5; rows 192 B vs 384 B).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q6.log; }

for i in $(seq 1 360); do
  if grep -q "queue C done" /tmp/hw_queue/q6.log; then break; fi
  sleep 15
done

log "leg 4: bench patch (3,2) official"
timeout 2400 python bench.py --coherent-gather --patch-shape 3 2 \
  > /tmp/hw_queue/bench_patch32.json 2> /tmp/hw_queue/bench_patch32.err
log "leg 4 rc=$?"

log "leg 5: bench patch (3,2) + compact16 official"
timeout 2400 python bench.py --coherent-gather --patch-shape 3 2 \
  --compact-samples 16 \
  > /tmp/hw_queue/bench_patch32_c16.json \
  2> /tmp/hw_queue/bench_patch32_c16.err
log "leg 5 rc=$?"
log "queue C2 done"
