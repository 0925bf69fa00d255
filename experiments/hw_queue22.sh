#!/bin/bash
# Round-5 queue 22: rt_real strip trim verification + post-lever
# attribution, fixed pareto reruns (production gate + auto-widen),
# and the chunk-size probe. Waits for queue 21 (leg 8 pareto n3d)
# to finish first; the verify drive 7 already ran concurrently.
mkdir -p /tmp/hw_queue /root/repo/experiments/logs/r5
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q22.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
harvest() { cp -f "$1" /root/repo/experiments/logs/r5/ 2>/dev/null; }

log "waiting for queue-21 (pid $(cat /tmp/q21.pid 2>/dev/null))"
while kill -0 "$(cat /tmp/q21.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
log "q21 done"; harvest /tmp/hw_queue/pareto_n3d2.log

log "leg 1: bench R=8 (5,2) default route (rt_real strip trim in)"
timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8d.log 2>&1
log "leg 1 rc=$?"; harvest /tmp/hw_queue/bench_r8d.log

log "leg 2: bench + compact16"
BENCH_COMPACT_SAMPLES=16 timeout 5400 python -u bench.py \
  > /tmp/hw_queue/bench_r8d_c16.log 2>&1
log "leg 2 rc=$?"; harvest /tmp/hw_queue/bench_r8d_c16.log

log "leg 3: shade-kernel ablation ladder (device-trace version)"
timeout 5400 python -u experiments/exp_shade_breakdown2.py \
  > /tmp/hw_queue/shade_breakdown2b.log 2>&1
log "leg 3 rc=$?"; harvest /tmp/hw_queue/shade_breakdown2b.log

log "leg 4: fused_glue trace post-levers (R=8 5,2)"
BENCH_PATCH_SHAPE=5,2 BENCH_PATCH_BLOCK=8 timeout 5400 \
  python -u experiments/exp_fused_glue.py trace \
  > /tmp/hw_queue/fused_glue_r8b.log 2>&1
log "leg 4 rc=$?"; harvest /tmp/hw_queue/fused_glue_r8b.log

log "leg 5: chunk-size probe (2^19-ray chunks, 2/frame)"
BENCH_CHUNK=524288 timeout 5400 python -u bench.py \
  > /tmp/hw_queue/bench_chunk19.log 2>&1
log "leg 5 rc=$?"; harvest /tmp/hw_queue/bench_chunk19.log

log "leg 6: pareto llff (production gate + auto-widen)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py llff \
  > /tmp/hw_queue/pareto_llff3.log 2>&1
log "leg 6 rc=$?"; harvest /tmp/hw_queue/pareto_llff3.log

log "leg 7: pareto n3d (production gate + auto-widen)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py n3d \
  > /tmp/hw_queue/pareto_n3d3.log 2>&1
log "leg 7 rc=$?"; harvest /tmp/hw_queue/pareto_n3d3.log
log "queue 22 done"
