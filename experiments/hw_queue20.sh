#!/bin/bash
# Round-5 queue 20: (1) bench-composition trace — device/frame vs
# pipelined wall vs single-dispatch wall, R=4 vs R=8 in one session
# (why doesn't the halved gather move the pipelined number?); then the
# q18/q19 big legs: (2) 40K training confirmation, (3) matched-tile
# multi-axis fused re-verify, (4-5) pareto ladders with full-r8 rows,
# (6) viewer ladder.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q20.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
harvest() { cp -f "$1" /root/repo/experiments/logs/r5/ 2>/dev/null; }

log "leg 1: bench-composition trace (R=4 vs R=8)"
timeout 4800 python -u experiments/exp_bench_trace.py \
  > /tmp/hw_queue/bench_trace.log 2>&1
log "leg 1 rc=$?"; harvest /tmp/hw_queue/bench_trace.log

log "leg 2: full-schedule 40K iters (round-5 train path)"
FS_ITERS=40000 FS_VAL_EVERY=40000 timeout 9000 \
  python -u experiments/exp_full_schedule_ref.py \
  > /tmp/hw_queue/full_schedule_r5.log 2>&1
log "leg 2 rc=$?"; harvest /tmp/hw_queue/full_schedule_r5.log

log "leg 3: multiaxis_patch MULTI=1 (matched-tile fused re-verify)"
HYPERREEL_FUSED_PATCH_MULTI=1 timeout 3600 \
  python -u experiments/exp_multiaxis_patch.py \
  > /tmp/hw_queue/multiaxis_patch4_fused.log 2>&1
log "leg 3 rc=$?"; harvest /tmp/hw_queue/multiaxis_patch4_fused.log

log "leg 4: pareto llff (full-r8 rows)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py llff \
  > /tmp/hw_queue/pareto_llff2.log 2>&1
log "leg 4 rc=$?"; harvest /tmp/hw_queue/pareto_llff2.log

log "leg 5: pareto n3d (full-r8 rows)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py n3d \
  > /tmp/hw_queue/pareto_n3d2.log 2>&1
log "leg 5 rc=$?"; harvest /tmp/hw_queue/pareto_n3d2.log

log "leg 6: viewer ladder ((3,2) + fp_lane VMEM fix)"
timeout 5400 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder4.log 2>&1
log "leg 6 rc=$?"; harvest /tmp/hw_queue/viewer_ladder4.log
log "queue 20 done"
