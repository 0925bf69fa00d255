#!/bin/bash
# Round-4b queue 8: (3,2) serving-chunk attribution, c16 budget,
# hostile fine-tuned ladder, multiaxis default-tile confirmation.
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q8.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

for i in $(seq 1 360); do
  grep -q "queue 7b done" /tmp/hw_queue/q7b.log 2>/dev/null && break
  sleep 60
done
log "queue 7b finished; starting"

log "leg 1: exp_patch32_trace 3 2 (headline chunk attribution)"
timeout 3600 python -u experiments/exp_patch32_trace.py 3 2 \
  > /tmp/hw_queue/patch32_trace.log 2>&1
log "leg 1 rc=$?"

log "leg 2: exp_patch32_trace 3 2 16 (fast-point chunk attribution)"
timeout 3600 python -u experiments/exp_patch32_trace.py 3 2 16 \
  > /tmp/hw_queue/patch32_c16_trace.log 2>&1
log "leg 2 rc=$?"

log "leg 3: exp_finetune_ladder hostile (fine-tuned Pareto on the hostile scene)"
timeout 3600 python -u experiments/exp_finetune_ladder.py hostile \
  > /tmp/hw_queue/finetune_hostile.log 2>&1
log "leg 3 rc=$?"

log "leg 4: exp_multiaxis_tile (17MB default cap confirmation)"
timeout 3600 python -u experiments/exp_multiaxis_tile.py \
  > /tmp/hw_queue/multiaxis_tile2.log 2>&1
log "leg 4 rc=$?"
log "queue 8 done"
