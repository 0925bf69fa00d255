#!/bin/bash
# Round-5 queue 14: (1) the /verify drive — fast-scatter grad with the
# HIGHEST-precision fix, witnesses, uniform-time premix on HW;
# (2) official bench protocol with the premix (default) and the
# BENCH_UNIFORM_T=0 A/B; (3) the compact16 fast point on the premixed
# path; (4) grid-800 train trace with the fast scatter (the 63%
# while-body attribution's fix) + the XLA-scatter A/B.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q14.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

log "leg 1: verify_round5_drive"
timeout 3600 python -u experiments/verify_round5_drive.py \
  > /tmp/hw_queue/verify_r5_drive2.log 2>&1
log "leg 1 rc=$?"

log "leg 2: official bench (premix default)"
timeout 5400 python -u bench.py \
  > /tmp/hw_queue/bench_premix.log 2>&1
log "leg 2 rc=$?"

log "leg 3: bench BENCH_UNIFORM_T=0 (premix A/B)"
BENCH_UNIFORM_T=0 timeout 5400 python -u bench.py \
  > /tmp/hw_queue/bench_nopremix.log 2>&1
log "leg 3 rc=$?"

log "leg 4: bench compact16 + premix (fast point)"
BENCH_COMPACT_SAMPLES=16 timeout 5400 python -u bench.py \
  > /tmp/hw_queue/bench_premix_c16.log 2>&1
log "leg 4 rc=$?"

log "leg 5: grid-800 train trace, fast scatter ON (default)"
timeout 5400 python -u experiments/exp_train_trace.py 800 tv \
  > /tmp/hw_queue/train_trace_800_fs.log 2>&1
log "leg 5 rc=$?"

log "leg 6: grid-800 train trace, fast scatter OFF (A/B)"
HYPERREEL_FAST_SCATTER=0 timeout 5400 \
  python -u experiments/exp_train_trace.py 800 tv \
  > /tmp/hw_queue/train_trace_800_nofs.log 2>&1
log "leg 6 rc=$?"
log "queue 14 done"
