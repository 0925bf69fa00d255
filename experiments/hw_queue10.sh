#!/bin/bash
# Round-4b queue 10: final-scale train attribution (HLO source lines)
# + corrected-leaf-sum trace rerun + schedule-rate cross-check.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q10.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

for i in $(seq 1 360); do
  grep -q "queue 9 done" /tmp/hw_queue/q9.log 2>/dev/null && break
  sleep 60
done
log "queue 9 finished; starting"

log "leg 1: exp_train_hlo 800 (source attribution of the hot fusions)"
timeout 3600 python -u experiments/exp_train_hlo.py 800 \
  > /tmp/hw_queue/train_hlo_800.log 2>&1
log "leg 1 rc=$?"

log "leg 2: exp_train_trace 800 rerun (leaf-sum fix)"
timeout 3600 python -u experiments/exp_train_trace.py 800 \
  > /tmp/hw_queue/train_trace_800b.log 2>&1
log "leg 2 rc=$?"
log "queue 10 done"

log "leg 3: exp_train_trace 800 l1 (TV share A/B - the post-120K regime)"
timeout 3600 python -u experiments/exp_train_trace.py 800 l1 \
  > /tmp/hw_queue/train_trace_800_l1.log 2>&1
log "leg 3 rc=$?"
log "queue 10b done"
