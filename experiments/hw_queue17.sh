#!/bin/bash
# Round-5 queue 17 (after 16): the R=8 coherent-block candidates, the
# matched-tile multi-axis fused re-verification (the "Mosaic
# miscompile" was a lane-decode bug — fused_eval fp_lane note), the
# fixed pareto llff leg, and the viewer ladder rerun (fp_lane fixes
# the (4,3) VMEM OOM; ladder now measures the shipped (3,2)).
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q17.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

for i in $(seq 1 240); do
  grep -q "queue 16 done" /tmp/hw_queue/q16.log 2>/dev/null && break
  sleep 60
done
log "queue 16 finished; starting"

log "leg 1: verify drive (now incl. R=8 fused + two-kernel sections)"
timeout 4800 python -u experiments/verify_round5_drive.py \
  > /tmp/hw_queue/verify_r5_drive5.log 2>&1
log "leg 1 rc=$?"

log "leg 2: bench R=8 fused (5,2)"
BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 timeout 5400 \
  python -u bench.py > /tmp/hw_queue/bench_r8.log 2>&1
log "leg 2 rc=$?"

log "leg 3: bench R=8 two-kernel (keeps tile128 + pack kernel)"
HYPERREEL_FUSED_PATCH=0 BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 \
  timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8_2k.log 2>&1
log "leg 3 rc=$?"

log "leg 4: bench R=8 fused + compact16"
BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 BENCH_COMPACT_SAMPLES=16 \
  timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8_c16.log 2>&1
log "leg 4 rc=$?"

log "leg 5: multiaxis_patch MULTI=1 (matched-tile fused re-verify)"
HYPERREEL_FUSED_PATCH_MULTI=1 timeout 3600 \
  python -u experiments/exp_multiaxis_patch.py \
  > /tmp/hw_queue/multiaxis_patch4_fused.log 2>&1
log "leg 5 rc=$?"

log "leg 6: pareto llff (fixed: invalid_sort_far scoped to compact)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py llff \
  > /tmp/hw_queue/pareto_llff2.log 2>&1
log "leg 6 rc=$?"

log "leg 6b: pareto n3d (same fix)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py n3d \
  > /tmp/hw_queue/pareto_n3d2.log 2>&1
log "leg 6b rc=$?"

log "leg 7: viewer ladder rerun ((3,2) + fp_lane VMEM fix)"
timeout 5400 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder4.log 2>&1
log "leg 7 rc=$?"
log "queue 17 done"
