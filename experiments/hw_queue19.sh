#!/bin/bash
# Round-5 queue 19: q18 reordered after the R=8 fused diagnosis. The
# first bench_r8 leg ran tile=64 WITHOUT the pack-build kernel (5.51
# Mrays/s): the (5,2) R=8 fused VMEM estimate (fp_lane) blew the
# 16.25 MB cap and shrank the tile. Fixes: bf16 patch transpose in the
# fused kernels (lossless — rows are bf16; halves the dominant term)
# + premix-aware scratch/fp_lane (uniform_time shrinks the time table
# (TH+2)x) -> tile=128 + pack kernel verified by eval_shape route
# debug. Legs: fixed R=8 benches first (headline), then the 40K
# training confirmation, multi-axis re-verify + pareto (R=8 rows),
# viewer ladder, train HLO, fused-glue trace.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q19.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
harvest() { cp -f "$1" /root/repo/experiments/logs/r5/ 2>/dev/null; }

log "leg 1: bench R=8 fused (5,2), VMEM fixes"
BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 timeout 5400 \
  python -u bench.py > /tmp/hw_queue/bench_r8b.log 2>&1
log "leg 1 rc=$?"; harvest /tmp/hw_queue/bench_r8b.log

log "leg 2: bench R=8 fused + compact16"
BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 BENCH_COMPACT_SAMPLES=16 \
  timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8b_c16.log 2>&1
log "leg 2 rc=$?"; harvest /tmp/hw_queue/bench_r8b_c16.log

log "leg 3: full-schedule 40K iters (round-5 train path)"
FS_ITERS=40000 FS_VAL_EVERY=40000 timeout 9000 \
  python -u experiments/exp_full_schedule_ref.py \
  > /tmp/hw_queue/full_schedule_r5.log 2>&1
log "leg 3 rc=$?"; harvest /tmp/hw_queue/full_schedule_r5.log

log "leg 4: multiaxis_patch MULTI=1 (matched-tile fused re-verify)"
HYPERREEL_FUSED_PATCH_MULTI=1 timeout 3600 \
  python -u experiments/exp_multiaxis_patch.py \
  > /tmp/hw_queue/multiaxis_patch4_fused.log 2>&1
log "leg 4 rc=$?"; harvest /tmp/hw_queue/multiaxis_patch4_fused.log

log "leg 5: pareto llff (now incl. full-r8 rows)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py llff \
  > /tmp/hw_queue/pareto_llff2.log 2>&1
log "leg 5 rc=$?"; harvest /tmp/hw_queue/pareto_llff2.log

log "leg 6: pareto n3d"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py n3d \
  > /tmp/hw_queue/pareto_n3d2.log 2>&1
log "leg 6 rc=$?"; harvest /tmp/hw_queue/pareto_n3d2.log

log "leg 7: viewer ladder ((3,2) + fp_lane VMEM fix)"
timeout 5400 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder4.log 2>&1
log "leg 7 rc=$?"; harvest /tmp/hw_queue/viewer_ladder4.log

log "leg 8: grid-800 train HLO attribution (post-redesign)"
timeout 5400 python -u experiments/exp_train_hlo.py 800 \
  > /tmp/hw_queue/train_hlo_800_r5.log 2>&1
log "leg 8 rc=$?"; harvest /tmp/hw_queue/train_hlo_800_r5.log

log "leg 9: fused glue trace (R=8 chunk budget for the memo)"
BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 timeout 3600 \
  python -u experiments/exp_fused_glue.py \
  > /tmp/hw_queue/fused_glue_r8.log 2>&1
log "leg 9 rc=$?"; harvest /tmp/hw_queue/fused_glue_r8.log
log "queue 19 done"
