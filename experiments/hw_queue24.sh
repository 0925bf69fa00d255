#!/bin/bash
# Round-5 queue 24: hat-form two-hot verification + the post-lever
# bench composition trace (device vs piped vs single-dispatch) to
# locate the now-dominant unhidden host share. Waits for queue 23
# (leg 7 n3d pareto).
mkdir -p /tmp/hw_queue /root/repo/experiments/logs/r5
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q24.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
harvest() { cp -f "$1" /root/repo/experiments/logs/r5/ 2>/dev/null; }

log "waiting for queue-23 (pid $(cat /tmp/q23.pid 2>/dev/null))"
while kill -0 "$(cat /tmp/q23.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
log "q23 done"; harvest /tmp/hw_queue/pareto_n3d4.log

log "leg 1: verify drive (hat-form two-hot in)"
timeout 4800 python -u experiments/verify_round5_drive.py \
  > /tmp/hw_queue/verify_r5_drive9.log 2>&1
log "leg 1 rc=$?"; harvest /tmp/hw_queue/verify_r5_drive9.log

log "leg 2: bench composition trace (R=8, post all levers)"
timeout 5400 python -u experiments/exp_bench_trace.py \
  > /tmp/hw_queue/bench_trace2.log 2>&1
log "leg 2 rc=$?"; harvest /tmp/hw_queue/bench_trace2.log

log "leg 3: bench (hat-form in)"
timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8f.log 2>&1
log "leg 3 rc=$?"; harvest /tmp/hw_queue/bench_r8f.log

log "leg 4: bench repeat (variance bracket)"
timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8f2.log 2>&1
log "leg 4 rc=$?"; harvest /tmp/hw_queue/bench_r8f2.log

log "leg 5: bench + compact16"
BENCH_COMPACT_SAMPLES=16 timeout 5400 python -u bench.py \
  > /tmp/hw_queue/bench_r8f_c16.log 2>&1
log "leg 5 rc=$?"; harvest /tmp/hw_queue/bench_r8f_c16.log

log "leg 6: shade ablation (hat-form)"
timeout 5400 python -u experiments/exp_shade_breakdown2.py \
  > /tmp/hw_queue/shade_breakdown2d.log 2>&1
log "leg 6 rc=$?"; harvest /tmp/hw_queue/shade_breakdown2d.log
log "queue 24 done"

log "leg 7: viewer ladder (pipelined mode)"
timeout 5400 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder5.log 2>&1
log "leg 7 rc=$?"; harvest /tmp/hw_queue/viewer_ladder5.log
log "queue 24 done (with leg 7)"

log "leg 8: bench 24-frame steady-state"
timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8g.log 2>&1
log "leg 8 rc=$?"; harvest /tmp/hw_queue/bench_r8g.log

log "leg 9: bench 24-frame + compact16"
BENCH_COMPACT_SAMPLES=16 timeout 5400 python -u bench.py \
  > /tmp/hw_queue/bench_r8g_c16.log 2>&1
log "leg 9 rc=$?"; harvest /tmp/hw_queue/bench_r8g_c16.log
log "queue 24 done (with legs 8-9)"

log "leg 10: viewer ladder (cam_pack single upload + pipelined)"
timeout 5400 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder6.log 2>&1
log "leg 10 rc=$?"; harvest /tmp/hw_queue/viewer_ladder6.log
log "queue 24 done (with leg 10)"
