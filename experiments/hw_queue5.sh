#!/bin/bash
# Round-4 HW queue B: patch-path v3 (in-kernel uv + slice anchors + pm
# contract + prepared tables) verification & measurement, then the
# multi-axis fast-stack matrix (VERDICT item 2).
mkdir -p /tmp/hw_queue
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q5.log; }

log "leg 1: verify_pm_patch_hw (parity + pm timing + (3,2) probe)"
timeout 3600 python -u experiments/verify_pm_patch_hw.py \
  > /tmp/hw_queue/verify_pm.log 2>&1
log "leg 1 rc=$?"

log "leg 2: bench --coherent-gather (v3 official)"
timeout 3600 python bench.py --coherent-gather \
  > /tmp/hw_queue/bench_patch_v3.json 2> /tmp/hw_queue/bench_patch_v3.err
log "leg 2 rc=$?"

log "leg 3: bench --coherent-gather --compact-samples 16 (v3 official)"
timeout 3600 python bench.py --coherent-gather --compact-samples 16 \
  > /tmp/hw_queue/bench_patch_c16_v3.json \
  2> /tmp/hw_queue/bench_patch_c16_v3.err
log "leg 3 rc=$?"

log "leg 4: bench headline quad with prepared tables"
timeout 3600 python bench.py \
  > /tmp/hw_queue/bench_quad_prep.json 2> /tmp/hw_queue/bench_quad_prep.err
log "leg 4 rc=$?"

log "leg 5: exp_multiaxis_patch (llff + n3d fast-stack matrix)"
timeout 5400 python -u experiments/exp_multiaxis_patch.py \
  > /tmp/hw_queue/multiaxis_patch.log 2>&1
log "leg 5 rc=$?"

log "leg 6: exp_multiaxis_tile (tile128 + pack kernel probe)"
timeout 5400 python -u experiments/exp_multiaxis_tile.py \
  > /tmp/hw_queue/multiaxis_tile.log 2>&1
log "leg 6 rc=$?"
log "queue B done"
