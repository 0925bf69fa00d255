#!/bin/bash
# Round-5 queue 13: (1) multi-axis fused-patch FIX verification (axis-
# outer kernel + variant-specific tile_fp — VERDICT item 1): default
# route should now compile AND beat the published two-kernel rows;
# (2) two-kernel A/B regression guard; (3) flagship verify_pm rerun
# (the coverage-witness scalar is new in the eval graph); (4) scatter
# probe rerun with end-to-end sorted variants + fixed v7.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q13.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

for i in $(seq 1 120); do
  grep -q "queue 12 done" /tmp/hw_queue/q12.log 2>/dev/null && break
  sleep 60
done
log "queue 12 finished; starting"

log "leg 1: exp_multiaxis_patch (default = structural gate -> fused)"
unset HYPERREEL_FUSED_PATCH_MULTI
timeout 3600 python -u experiments/exp_multiaxis_patch.py \
  > /tmp/hw_queue/multiaxis_patch3.log 2>&1
log "leg 1 rc=$?"

log "leg 2: exp_multiaxis_patch MULTI=0 (two-kernel regression guard)"
HYPERREEL_FUSED_PATCH_MULTI=0 timeout 3600 \
  python -u experiments/exp_multiaxis_patch.py \
  > /tmp/hw_queue/multiaxis_patch3_nofuse.log 2>&1
log "leg 2 rc=$?"

log "leg 3: verify_pm_patch_hw (flagship, coverage witness in graph)"
timeout 3600 python -u experiments/verify_pm_patch_hw.py \
  > /tmp/hw_queue/verify_pm4.log 2>&1
log "leg 3 rc=$?"

log "leg 4: exp_scatter_probe rerun (e2e sorted variants)"
timeout 3600 python -u experiments/exp_scatter_probe.py \
  > /tmp/hw_queue/scatter_probe2.log 2>&1
log "leg 4 rc=$?"
log "queue 13 done"
