#!/bin/bash
# Round-5 queue 21: device-time push on the fused chunk. Queue-20 leg
# 1 (bench_trace) proved the bench is DEVICE-limited (61 ms/frame vs
# 64.6 piped; R=4 == R=8 device time), so the 18 Mrays/s target needs
# ~1.5 ms/chunk of device work removed. This queue verifies + times
# the three landed levers (MLP skip-split, emit_idx=False dead pack
# write, batched M=128 compaction matmul) and runs the in-kernel
# ablation ladder to name the next one. Then the standing legs:
# multiaxis fused re-verify, viewer ladder, paretos.
# Waits for the in-flight queue-20 leg 2 (full-schedule 40K) first.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q21.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
harvest() { cp -f "$1" /root/repo/experiments/logs/r5/ 2>/dev/null; }

log "waiting for queue-20 leg 2 (full_schedule 40K, pid $(cat /tmp/fs.pid 2>/dev/null))"
while kill -0 "$(cat /tmp/fs.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
log "leg 2 of q20 done"; harvest /tmp/hw_queue/full_schedule_r5.log

log "leg 1: verify drive (kernel-tail batching + skip-split + emit_idx)"
timeout 4800 python -u experiments/verify_round5_drive.py \
  > /tmp/hw_queue/verify_r5_drive6.log 2>&1
log "leg 1 rc=$?"; harvest /tmp/hw_queue/verify_r5_drive6.log

log "leg 2: bench R=8 fused (5,2) post-fixes"
BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 timeout 5400 \
  python -u bench.py > /tmp/hw_queue/bench_r8c.log 2>&1
log "leg 2 rc=$?"; harvest /tmp/hw_queue/bench_r8c.log

log "leg 3: bench R=8 fused + compact16 post-fixes"
BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 BENCH_COMPACT_SAMPLES=16 \
  timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8c_c16.log 2>&1
log "leg 3 rc=$?"; harvest /tmp/hw_queue/bench_r8c_c16.log

log "leg 4: shade-kernel ablation ladder (fused-patch R=8 premixed)"
timeout 5400 python -u experiments/exp_shade_breakdown2.py \
  > /tmp/hw_queue/shade_breakdown2.log 2>&1
log "leg 4 rc=$?"; harvest /tmp/hw_queue/shade_breakdown2.log

log "leg 5: multiaxis_patch MULTI=1 (matched-tile fused re-verify)"
HYPERREEL_FUSED_PATCH_MULTI=1 timeout 3600 \
  python -u experiments/exp_multiaxis_patch.py \
  > /tmp/hw_queue/multiaxis_patch4_fused.log 2>&1
log "leg 5 rc=$?"; harvest /tmp/hw_queue/multiaxis_patch4_fused.log

log "leg 6: viewer ladder ((3,2) + fp_lane VMEM fix)"
timeout 5400 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder4.log 2>&1
log "leg 6 rc=$?"; harvest /tmp/hw_queue/viewer_ladder4.log

log "leg 7: pareto llff (full-r8 rows)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py llff \
  > /tmp/hw_queue/pareto_llff2.log 2>&1
log "leg 7 rc=$?"; harvest /tmp/hw_queue/pareto_llff2.log

log "leg 8: pareto n3d (full-r8 rows)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py n3d \
  > /tmp/hw_queue/pareto_n3d2.log 2>&1
log "leg 8 rc=$?"; harvest /tmp/hw_queue/pareto_n3d2.log
log "queue 21 done"
