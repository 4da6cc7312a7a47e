#!/bin/bash
# Round-5 TPU queue — VERDICT r4 priority order, serialized on the one
# chip. Static HBM budgets pre-checked (membudget: testnet k=18 peak
# 5.6 GiB / 35% of chip; step k=17 ~8.5 GiB est).
#   1. committee testnet 512-key k=18 prove x2 (VERDICT #2 — PK cached,
#      OOM #7 fix unvalidated on chip until now)
#   2. step nano k=17 keygen(checkpointed)+prove x2 (VERDICT #3 — first
#      real step proof; k=17 layout is 174 advice vs k=15's 687)
# Run: nohup bash scripts/tpu_queue_r5.sh > /tmp/q_r5_queue.log 2>&1 &
set -u
cd /root/repo || exit 1
R=benchmarks/records

echo "[queue] $(date -u +%H:%M:%S) committee testnet 512 keys k=18 (VERDICT #2)"
SPECTRE_TRACE=1 timeout 21600 python -u scripts/prove_committee.py \
  --spec testnet --k 18 --repeat 2 2>&1 | tee /tmp/q_r5_testnet.log
grep -E "^\{" /tmp/q_r5_testnet.log | tail -1 \
  > "$R/committee_testnet_k18_r5.json" || true

echo "[queue] $(date -u +%H:%M:%S) step nano k=17 real prove (VERDICT #3)"
SPECTRE_TRACE=1 timeout 21600 python -u scripts/prove_step.py \
  --spec nano --k 17 --repeat 2 2>&1 | tee /tmp/q_r5_step.log
grep -E "^\{" /tmp/q_r5_step.log | tail -1 \
  > "$R/step_nano_k17_r5.json" || true

echo "[queue] $(date -u +%H:%M:%S) queue done"
