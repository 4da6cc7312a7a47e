#!/bin/bash
# Round-3 TPU queue. Benches FIRST (a dead scale-up must not wipe the
# BASELINE metrics again — VERDICT r2 next #5), then the scale-ups.
# Run: nohup bash scripts/tpu_queue_r3.sh > /tmp/q_r3_queue.log 2>&1 &
set -u
cd /root/repo || exit 1
R=benchmarks/records

echo "[queue] $(date -u +%H:%M:%S) bench msm 2^16"
SPECTRE_BENCH_METRIC=msm SPECTRE_BENCH_MSM_K=16 timeout 3000 python -u bench.py \
  2>&1 | tee "$R/bench_msm16_r3.log"
echo "[queue] $(date -u +%H:%M:%S) bench msm 2^18"
SPECTRE_BENCH_METRIC=msm SPECTRE_BENCH_MSM_K=18 timeout 4000 python -u bench.py \
  2>&1 | tee "$R/bench_msm18_r3.log"
echo "[queue] $(date -u +%H:%M:%S) bench ntt 2^23"
SPECTRE_BENCH_METRIC=ntt timeout 3000 python -u bench.py \
  2>&1 | tee "$R/bench_ntt_r3.log"

echo "[queue] $(date -u +%H:%M:%S) advice-phase trace (nano k=13, warm x3)"
SPECTRE_TRACE=1 timeout 7000 python -u scripts/prove_committee.py \
  --spec nano --k 13 --repeat 3 2>&1 | tee /tmp/q_r3_nano_trace.log
grep -E "^\{" /tmp/q_r3_nano_trace.log | tail -1 > "$R/committee_nano_k13_warm_r3.json" || true

echo "[queue] $(date -u +%H:%M:%S) step nano REAL prove (k=17)"
timeout 28800 python -u scripts/prove_step.py --spec nano --repeat 2 \
  2>&1 | tee /tmp/q_r3_step_nano.log
grep -E "^\{" /tmp/q_r3_step_nano.log | tail -1 > "$R/step_nano_real_r3.json" || true

echo "[queue] $(date -u +%H:%M:%S) compressed pipeline over committee-nano"
timeout 28800 python -u scripts/prove_aggregation.py \
  --inner committee-nano --k 17 2>&1 | tee /tmp/q_r3_agg_nano.log
grep -E "^\{" /tmp/q_r3_agg_nano.log | tail -1 > "$R/aggregation_committee_nano_r3.json" || true

echo "[queue] $(date -u +%H:%M:%S) queue done"
