#!/bin/bash
# Round-5 queue 15: (1) official bench rerun with the CALIBRATED
# exactness gate (viol<=1e-4 exact-class; q14's zero-tolerance gate
# tripped on ~2 boundary blocks/megapixel and timed the quad path);
# (2) compact16 fast point; (3) (2,2) separation evidence — the gate
# must trip with viol >> 1e-4; (4) redesigned-viewer ladder (pose-only
# in-graph ray gen + uint8 readback + premix); (5-6) multi-axis Pareto
# ladders (VERDICT item 6); (7) grid-800 train trace at M=1024/K=4096.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q15.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

log "leg 1: official bench (premix + patch(3,2), calibrated gate)"
timeout 5400 python -u bench.py > /tmp/hw_queue/bench_r5.log 2>&1
log "leg 1 rc=$?"

log "leg 2: bench compact16"
BENCH_COMPACT_SAMPLES=16 timeout 5400 python -u bench.py \
  > /tmp/hw_queue/bench_r5_c16.log 2>&1
log "leg 2 rc=$?"

log "leg 3: bench (2,2) gate-separation evidence"
BENCH_PATCH_SHAPE=2,2 timeout 5400 python -u bench.py \
  > /tmp/hw_queue/bench_r5_22.log 2>&1
log "leg 3 rc=$?"

log "leg 4: viewer ladder (redesigned pose path + premix)"
timeout 5400 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder3.log 2>&1
log "leg 4 rc=$?"

log "leg 5: multi-axis pareto llff"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py llff \
  > /tmp/hw_queue/pareto_llff.log 2>&1
log "leg 5 rc=$?"

log "leg 6: multi-axis pareto n3d"
timeout 7200 python -u experiments/exp_multiaxis_pareto.py n3d \
  > /tmp/hw_queue/pareto_n3d.log 2>&1
log "leg 6 rc=$?"

log "leg 7: grid-800 train trace (M=1024/K=4096)"
timeout 5400 python -u experiments/exp_train_trace.py 800 tv \
  > /tmp/hw_queue/train_trace_800_fs2.log 2>&1
log "leg 7 rc=$?"
log "queue 15 done"
