#!/bin/bash
# Round-5 queue 12: (1) scatter-add formulation probe (the 63% train
# lever), (2) fresh attribution of the bench-default fused (3,2) chunk
# (headline item), (3) patch-row gather alignment probe.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q12.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

log "leg 1: exp_scatter_probe"
timeout 3600 python -u experiments/exp_scatter_probe.py \
  > /tmp/hw_queue/scatter_probe.log 2>&1
log "leg 1 rc=$?"

log "leg 2: exp_fused_glue both"
timeout 3600 python -u experiments/exp_fused_glue.py both \
  > /tmp/hw_queue/fused_glue.log 2>&1
log "leg 2 rc=$?"

log "leg 3: exp_gather_align"
timeout 3600 python -u experiments/exp_gather_align.py \
  > /tmp/hw_queue/gather_align.log 2>&1
log "leg 3 rc=$?"
log "queue 12 done"
