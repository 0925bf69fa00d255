#!/bin/bash
# Round-5 queue 16 (after 15): training-wall confirmation (VERDICT
# item 4). (1) 40K-iter reference-scale run with the round-5 scatter +
# residual-q backward — steps/s, post-upsample spot rate, holdout
# PSNR@40K vs the round-4 run's 59.0 (the gradient path is
# value-exact, so the curve must be unchanged up to f32 summation
# order); (2) fresh grid-800 HLO attribution (what's hot AFTER the
# scatter redesign: fwd gather / scan / cond shares).
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q16.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

for i in $(seq 1 240); do
  grep -q "queue 15 done" /tmp/hw_queue/q15.log 2>/dev/null && break
  sleep 60
done
log "queue 15 finished; starting"

log "leg 1: full-schedule 40K iters (round-5 train path)"
FS_ITERS=40000 FS_VAL_EVERY=40000 timeout 7200 \
  python -u experiments/exp_full_schedule_ref.py \
  > /tmp/hw_queue/full_schedule_r5.log 2>&1
log "leg 1 rc=$?"

log "leg 2: grid-800 train HLO attribution (post-redesign)"
timeout 5400 python -u experiments/exp_train_hlo.py 800 \
  > /tmp/hw_queue/train_hlo_800_r5.log 2>&1
log "leg 2 rc=$?"

log "leg 3: fused glue trace (post-premix chunk budget)"
timeout 3600 python -u experiments/exp_fused_glue.py \
  > /tmp/hw_queue/fused_glue2.log 2>&1
log "leg 3 rc=$?"
log "queue 16 done"
