#!/bin/bash
# Round-4b queue 11: multi-axis blend+shade fusion on HW (llff/n3d
# parity + chunk timing via the existing multiaxis harness).
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q11.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

for i in $(seq 1 360); do
  grep -q "queue 10b done" /tmp/hw_queue/q10.log 2>/dev/null && break
  sleep 60
done
log "queue 10 finished; starting"

log "leg 1: exp_multiaxis_patch (multi-axis fusion parity + timing)"
timeout 3600 python -u experiments/exp_multiaxis_patch.py \
  > /tmp/hw_queue/multiaxis_patch2.log 2>&1
log "leg 1 rc=$?"
log "queue 11 done"
