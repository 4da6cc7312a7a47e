#!/bin/bash
# Round-3 tail queue (~55 min TPU window): only runs that COMPLETE.
# The step-nano real prove was killed mid-keygen — 687 advice + 625 fixed
# columns at k=15 extrapolates to ~2-3h of keygen, past the round end.
# Run: nohup bash scripts/tpu_queue_r3_tail.sh > /tmp/q_r3_tail.log 2>&1 &
set -u
cd /root/repo || exit 1
R=benchmarks/records

echo "[queue] $(date -u +%H:%M:%S) nano k=13 traced prove x3 (driver-bench path validation)"
SPECTRE_TRACE=1 timeout 1500 python -u scripts/prove_committee.py \
  --spec nano --k 13 --repeat 3 2>&1 | tee /tmp/q_r3_nano_trace.log
grep -E "^\{" /tmp/q_r3_nano_trace.log | tail -1 > "$R/committee_nano_k13_warm_r3.json" || true

echo "[queue] $(date -u +%H:%M:%S) compressed pipeline on TPU (toy inner, agg k=13)"
timeout 1800 python -u scripts/prove_aggregation.py --k 13 \
  2>&1 | tee /tmp/q_r3_agg_toy_tpu.log
grep -E "^\{" /tmp/q_r3_agg_toy_tpu.log | tail -1 > "$R/aggregation_toy_tpu_r3.json" || true

echo "[queue] $(date -u +%H:%M:%S) tail queue done"
