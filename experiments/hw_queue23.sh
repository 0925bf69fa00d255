#!/bin/bash
# Round-5 queue 23: k-major SH tail (wb_t row permutation) — verify,
# bench, re-ablate, and re-map the chunk HLO. Waits for queue 22.
mkdir -p /tmp/hw_queue /root/repo/experiments/logs/r5
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q23.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
harvest() { cp -f "$1" /root/repo/experiments/logs/r5/ 2>/dev/null; }

log "waiting for queue-22 (pid $(cat /tmp/q22.pid 2>/dev/null))"
while kill -0 "$(cat /tmp/q22.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
log "q22 done"

log "leg 1: verify drive (k-major SH tail in)"
timeout 4800 python -u experiments/verify_round5_drive.py \
  > /tmp/hw_queue/verify_r5_drive8.log 2>&1
log "leg 1 rc=$?"; harvest /tmp/hw_queue/verify_r5_drive8.log

log "leg 2: bench default chunk 2^18"
timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8e.log 2>&1
log "leg 2 rc=$?"; harvest /tmp/hw_queue/bench_r8e.log

log "leg 3: bench chunk 2^19"
BENCH_CHUNK=524288 timeout 5400 python -u bench.py \
  > /tmp/hw_queue/bench_r8e_c19.log 2>&1
log "leg 3 rc=$?"; harvest /tmp/hw_queue/bench_r8e_c19.log

log "leg 4: bench chunk 2^19 + compact16"
BENCH_CHUNK=524288 BENCH_COMPACT_SAMPLES=16 timeout 5400 \
  python -u bench.py > /tmp/hw_queue/bench_r8e_c19_c16.log 2>&1
log "leg 4 rc=$?"; harvest /tmp/hw_queue/bench_r8e_c19_c16.log

log "leg 5: shade ablation ladder (k-major tail)"
timeout 5400 python -u experiments/exp_shade_breakdown2.py \
  > /tmp/hw_queue/shade_breakdown2c.log 2>&1
log "leg 5 rc=$?"; harvest /tmp/hw_queue/shade_breakdown2c.log

log "leg 6: fused_glue trace+hlo (post k-major)"
BENCH_PATCH_SHAPE=5,2 BENCH_PATCH_BLOCK=8 timeout 5400 \
  python -u experiments/exp_fused_glue.py both \
  > /tmp/hw_queue/fused_glue_r8c.log 2>&1
log "leg 6 rc=$?"; harvest /tmp/hw_queue/fused_glue_r8c.log
cp -f /tmp/hw_queue/fused_glue_hlo.txt /root/repo/experiments/logs/r5/fused_glue_hlo_r8c.txt 2>/dev/null
log "queue 23 done"

log "leg 7: pareto n3d (no tile force, shipping route)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py n3d \
  > /tmp/hw_queue/pareto_n3d4.log 2>&1
log "leg 7 rc=$?"; harvest /tmp/hw_queue/pareto_n3d4.log
log "queue 23 done (with leg 7)"
