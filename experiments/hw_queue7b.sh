#!/bin/bash
# Round-4b follow-up: re-run the q7 experiment legs that failed on
# PYTHONPATH (experiments/*.py scripts put experiments/ at sys.path[0],
# so hyperreel_tpu needs the repo on PYTHONPATH — APPEND, never clobber:
# /root/.axon_site must stay).
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q7b.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

# wait for queue 7 (bench legs) to release the chip
for i in $(seq 1 240); do
  grep -q "queue 7 done" /tmp/hw_queue/q7.log 2>/dev/null && break
  sleep 60
done
log "queue 7 finished; starting"

log "leg 1: exp_viewer_ladder rerun (device-put params + pm contract + probe gate)"
timeout 3600 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder2.log 2>&1
log "leg 1 rc=$?"

log "leg 2: verify_pm_patch_hw (patch-shape ladder (3,2)/(2,2)/(3,3))"
timeout 3600 python -u experiments/verify_pm_patch_hw.py \
  > /tmp/hw_queue/verify_pm2.log 2>&1
log "leg 2 rc=$?"

log "leg 3: exp_train_trace 800 (final-scale train attribution)"
timeout 3600 python -u experiments/exp_train_trace.py 800 \
  > /tmp/hw_queue/train_trace_800.log 2>&1
log "leg 3 rc=$?"
log "queue 7b done"
