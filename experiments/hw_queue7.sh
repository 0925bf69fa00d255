#!/bin/bash
# Round-4b HW queue: viewer-fix drive, (3,2)-default bench official,
# (3,2)+c16 anomaly reruns, patch-shape ladder, final-scale train trace.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q7.log; }
cd /root/repo

log "leg 1: bench.py default ((3,2) patch, flipped default) official"
timeout 2400 python bench.py \
  > /tmp/hw_queue/bench_default_r4b.json \
  2> /tmp/hw_queue/bench_default_r4b.err
log "leg 1 rc=$?"

log "leg 2: exp_viewer_ladder rerun (device-put params + pm contract + probe gate)"
timeout 3600 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder2.log 2>&1
log "leg 2 rc=$?"

log "leg 3: bench patch (3,2) + compact16 rerun A (anomaly check)"
timeout 2400 python bench.py --coherent-gather --patch-shape 3 2 \
  --compact-samples 16 \
  > /tmp/hw_queue/bench_patch32_c16_a.json \
  2> /tmp/hw_queue/bench_patch32_c16_a.err
log "leg 3 rc=$?"

log "leg 4: bench patch (3,2) + compact16 rerun B"
timeout 2400 python bench.py --coherent-gather --patch-shape 3 2 \
  --compact-samples 16 \
  > /tmp/hw_queue/bench_patch32_c16_b.json \
  2> /tmp/hw_queue/bench_patch32_c16_b.err
log "leg 4 rc=$?"

log "leg 5: verify_pm_patch_hw (patch-shape ladder (3,2)/(2,2)/(3,3))"
timeout 3600 python -u experiments/verify_pm_patch_hw.py \
  > /tmp/hw_queue/verify_pm2.log 2>&1
log "leg 5 rc=$?"

log "leg 6: exp_train_trace 800 (final-scale train attribution)"
timeout 3600 python -u experiments/exp_train_trace.py 800 \
  > /tmp/hw_queue/train_trace_800.log 2>&1
log "leg 6 rc=$?"
log "queue 7 done"
