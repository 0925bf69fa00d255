#!/bin/bash
# Round-4 HW queue C: wait for the full-schedule run's it=40000
# validation (all five optimizer resets + the whole event ladder are
# behind it; the remaining 280K steps are steady-state and the rate
# projection is already measured), stop it, then run the remaining
# VERDICT measurement legs on the freed chip.
set -u
mkdir -p /tmp/hw_queue
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q6.log; }

log "waiting for full-schedule it=40000 validation..."
for i in $(seq 1 240); do
  if grep -q '"it": 40000' /tmp/hw_queue/full_schedule/run.log; then break; fi
  sleep 15
done
sleep 30   # let the checkpoint write finish
if [ -f /tmp/full_schedule.pid ]; then
  kill "$(cat /tmp/full_schedule.pid)" 2>/dev/null
  log "full-schedule stopped after it=40000 val"
fi
sleep 10

log "leg 1: exp_hostile_ladder (hostile + blob Pareto, VERDICT item 4)"
timeout 3000 python -u experiments/exp_hostile_ladder.py \
  > /tmp/hw_queue/hostile_ladder.log 2>&1
log "leg 1 rc=$?"

log "leg 2: exp_viewer_ladder (512^2 + 1MP FPS, VERDICT item 6)"
timeout 2400 python -u experiments/exp_viewer_ladder.py \
  > /tmp/hw_queue/viewer_ladder.log 2>&1
log "leg 2 rc=$?"

log "leg 3: exp_bf16_tail (precision A/B, VERDICT item 7)"
timeout 1800 python -u experiments/exp_bf16_tail.py \
  > /tmp/hw_queue/bf16_tail.log 2>&1
log "leg 3 rc=$?"
log "queue C done"
