#!/bin/bash
# Round-5 queue 18: rerun of the reboot-lost queues 16-17, reordered
# by judge value. (1) verify drive incl. R=8 fused/two-kernel HW
# parity (gates any headline flip); (2-4) R=8 bench legs — R=8 halves
# the per-row gather floor (flat in row bytes, gather_align.log), the
# route to vs_baseline >= 1.0; (5) full-schedule 40K confirmation
# (VERDICT item 4 "Done="); (6) matched-tile multi-axis fused
# re-verify (lane-decode root cause, eb4246a); (7-8) multi-axis
# pareto; (9) viewer ladder; (10) post-redesign train HLO.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q18.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

log "leg 1: verify drive (R=8 fused + two-kernel HW parity)"
timeout 4800 python -u experiments/verify_round5_drive.py \
  > /tmp/hw_queue/verify_r5_drive5.log 2>&1
log "leg 1 rc=$?"

log "leg 2: bench R=8 fused (5,2)"
BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 timeout 5400 \
  python -u bench.py > /tmp/hw_queue/bench_r8.log 2>&1
log "leg 2 rc=$?"

log "leg 3: bench R=8 fused + compact16"
BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 BENCH_COMPACT_SAMPLES=16 \
  timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8_c16.log 2>&1
log "leg 3 rc=$?"

log "leg 4: bench R=8 two-kernel"
HYPERREEL_FUSED_PATCH=0 BENCH_PATCH_BLOCK=8 BENCH_PATCH_SHAPE=5,2 \
  timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r8_2k.log 2>&1
log "leg 4 rc=$?"

log "leg 5: full-schedule 40K iters (round-5 train path)"
FS_ITERS=40000 FS_VAL_EVERY=40000 timeout 9000 \
  python -u experiments/exp_full_schedule_ref.py \
  > /tmp/hw_queue/full_schedule_r5.log 2>&1
log "leg 5 rc=$?"

log "leg 6: multiaxis_patch MULTI=1 (matched-tile fused re-verify)"
HYPERREEL_FUSED_PATCH_MULTI=1 timeout 3600 \
  python -u experiments/exp_multiaxis_patch.py \
  > /tmp/hw_queue/multiaxis_patch4_fused.log 2>&1
log "leg 6 rc=$?"

log "leg 7: pareto llff (invalid_sort_far scoped to compact)"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py llff \
  > /tmp/hw_queue/pareto_llff2.log 2>&1
log "leg 7 rc=$?"

log "leg 8: pareto n3d"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py n3d \
  > /tmp/hw_queue/pareto_n3d2.log 2>&1
log "leg 8 rc=$?"

log "leg 9: viewer ladder ((3,2) + fp_lane VMEM fix)"
timeout 5400 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder4.log 2>&1
log "leg 9 rc=$?"

log "leg 10: grid-800 train HLO attribution (post-redesign)"
timeout 5400 python -u experiments/exp_train_hlo.py 800 \
  > /tmp/hw_queue/train_hlo_800_r5.log 2>&1
log "leg 10 rc=$?"
log "queue 18 done"
