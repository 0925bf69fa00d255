#!/bin/bash
# Second HW queue: waits for hw_queue.sh to finish, then runs the
# compact-k Pareto ladders (part A flagship points 28/24/20, part B
# multi-axis neural_3d) — each trains 600 iters on the chip.
set -u
log() { echo "[hw_queue2 $(date +%H:%M:%S)] $*" >> /tmp/hw_queue/queue.log; }
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
for i in $(seq 1 400); do
  grep -q "QUEUE DONE" /tmp/hw_queue/queue.log 2>/dev/null && break
  sleep 120
done
grep -q "QUEUE DONE" /tmp/hw_queue/queue.log || { log "queue1 never finished"; exit 1; }
log "START 10_compact_ladder_A"
timeout 5400 python -u experiments/exp_compact_ladder2.py A > /tmp/hw_queue/10_compact_A.log 2>&1
log "END 10_compact_ladder_A rc=$?"
log "START 11_compact_ladder_B"
timeout 5400 python -u experiments/exp_compact_ladder2.py B > /tmp/hw_queue/11_compact_B.log 2>&1
log "END 11_compact_ladder_B rc=$?"
log "QUEUE2 DONE"
log "START 12_bench_compact16"
timeout 1800 python bench.py --compact-samples 16 > /tmp/hw_queue/12_bench_compact16.log 2>&1
log "END 12_bench_compact16 rc=$?"
log "START 13_bench_patch_compact16"
timeout 1800 python bench.py --coherent-gather --compact-samples 16 > /tmp/hw_queue/13_bench_patch_compact16.log 2>&1
log "END 13_bench_patch_compact16 rc=$?"
log "QUEUE2B DONE"
log "START 14_bench_stride16_patch"
timeout 1800 python bench.py --inference-samples 16 --coherent-gather > /tmp/hw_queue/14_bench_stride16_patch.log 2>&1
log "END 14_bench_stride16_patch rc=$?"
log "QUEUE2C DONE"
