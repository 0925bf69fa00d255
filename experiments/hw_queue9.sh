#!/bin/bash
# Round-4b queue 9: blend+shade fusion HW validation + parity
# attribution. The 04:20 verify_pm failure (3.23e-4 > 2e-4) ran against
# a mid-edit tree (bf16 pack input default-ON + partial fusion); these
# legs attribute it against the settled tree (fusion ON, bf16 input
# OFF by default).
mkdir -p /tmp/hw_queue
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hw_queue/q9.log; }
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

for i in $(seq 1 360); do
  grep -q "queue 8 done" /tmp/hw_queue/q8.log 2>/dev/null && break
  sleep 60
done
log "queue 8 finished; starting"

log "leg 1: verify_pm_patch_hw (fusion ON, bf16 input OFF - the settled default)"
timeout 3600 python -u experiments/verify_pm_patch_hw.py \
  > /tmp/hw_queue/verify_pm3.log 2>&1
log "leg 1 rc=$?"

log "leg 2: verify_pm_patch_hw FUSION OFF (isolates fusion from any residual)"
timeout 3600 env HYPERREEL_FUSED_PATCH=0 \
  python -u experiments/verify_pm_patch_hw.py \
  > /tmp/hw_queue/verify_pm3_nofuse.log 2>&1
log "leg 2 rc=$?"

log "leg 3: verify_pm_patch_hw BF16 PACK INPUT ON (records its parity cost)"
timeout 3600 env HYPERREEL_BF16_PACK_INPUT=1 \
  python -u experiments/verify_pm_patch_hw.py \
  > /tmp/hw_queue/verify_pm3_bf16in.log 2>&1
log "leg 3 rc=$?"

log "leg 4: bench.py default (fusion active headline)"
timeout 2400 python bench.py \
  > /tmp/hw_queue/bench_fused.json 2> /tmp/hw_queue/bench_fused.err
log "leg 4 rc=$?"

log "leg 5: bench.py +c16 (fusion active fast point)"
timeout 2400 python bench.py --compact-samples 16 \
  > /tmp/hw_queue/bench_fused_c16.json \
  2> /tmp/hw_queue/bench_fused_c16.err
log "leg 5 rc=$?"
log "queue 9 done"
