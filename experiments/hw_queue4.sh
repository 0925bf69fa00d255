#!/bin/bash
# Round-4 HW queue A: official bench legs for the phase-major coherent
# patch-gather (VERDICT item 1): patch, patch+compact16, headline quad
# regression. Sequential; each leg logs to /tmp/hw_queue/.
mkdir -p /tmp/hw_queue
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q4.log; }

log "leg 1: bench --coherent-gather"
timeout 3600 python bench.py --coherent-gather \
  > /tmp/hw_queue/bench_patch.json 2> /tmp/hw_queue/bench_patch.err
log "leg 1 rc=$?"

log "leg 2: bench --coherent-gather --compact-samples 16"
timeout 3600 python bench.py --coherent-gather --compact-samples 16 \
  > /tmp/hw_queue/bench_patch_c16.json 2> /tmp/hw_queue/bench_patch_c16.err
log "leg 2 rc=$?"

log "leg 3: bench headline (quad regression)"
timeout 3600 python bench.py \
  > /tmp/hw_queue/bench_quad.json 2> /tmp/hw_queue/bench_quad.err
log "leg 3 rc=$?"
log "queue A done"
