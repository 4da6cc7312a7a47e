#!/bin/bash
# Round-4 TPU queue. Sanity FIRST (the commit path moved onto pallas
# fused kernels this round — a 2-minute parity check must gate the long
# windows), then the scale-ups in VERDICT priority order:
#   1. committee testnet 512-key k=18 keygen(checkpointed)+prove (#1)
#   2. step nano k=15 keygen(checkpointed)+prove (#2) — resumable
#   3. nano k=13 warm-prove trace (the scored BENCH metric) + MSM bench
#   4. thin-committee inner prove + aggregation budget (#4/#5)
# Run: nohup bash scripts/tpu_queue_r4.sh > /tmp/q_r4_queue.log 2>&1 &
set -u
cd /root/repo || exit 1
R=benchmarks/records

echo "[queue] $(date -u +%H:%M:%S) sanity: pallas MSM parity + timing"
timeout 1800 python -u scripts/tpu_sanity.py --n 8192 --cols 32 \
  2>&1 | tee "$R/tpu_sanity_r4.log"
if ! grep -q '"parity_ok": true' "$R/tpu_sanity_r4.log"; then
  echo "[queue] PALLAS MSM PARITY FAILED — falling back to XLA combine"
  export SPECTRE_PALLAS_MSM=0
  timeout 1800 python -u scripts/tpu_sanity.py --n 8192 --cols 32 \
    2>&1 | tee "$R/tpu_sanity_r4_fallback.log"
  grep -q '"parity_ok": true' "$R/tpu_sanity_r4_fallback.log" || exit 1
fi

echo "[queue] $(date -u +%H:%M:%S) nano k=13 warm prove x3 (scored metric)"
SPECTRE_TRACE=1 timeout 7200 python -u scripts/prove_committee.py \
  --spec nano --k 13 --repeat 3 2>&1 | tee /tmp/q_r4_nano_trace.log
grep -E "^\{" /tmp/q_r4_nano_trace.log | tail -1 \
  > "$R/committee_nano_k13_warm_r4.json" || true

echo "[queue] $(date -u +%H:%M:%S) committee testnet 512 keys k=18 (VERDICT #1)"
timeout 43200 python -u scripts/prove_committee.py \
  --spec testnet --k 18 --repeat 2 2>&1 | tee /tmp/q_r4_testnet.log
grep -E "^\{" /tmp/q_r4_testnet.log | tail -1 \
  > "$R/committee_testnet_k18_r4.json" || true

echo "[queue] $(date -u +%H:%M:%S) step nano k=15 real prove (VERDICT #2)"
timeout 43200 python -u scripts/prove_step.py --spec nano --repeat 2 \
  2>&1 | tee /tmp/q_r4_step_nano.log
grep -E "^\{" /tmp/q_r4_step_nano.log | tail -1 \
  > "$R/step_nano_real_r4.json" || true

echo "[queue] $(date -u +%H:%M:%S) MSM bench 2^16"
SPECTRE_BENCH_METRIC=msm SPECTRE_BENCH_MSM_K=16 timeout 3000 \
  python -u bench.py 2>&1 | tee "$R/bench_msm16_r4.log"

echo "[queue] $(date -u +%H:%M:%S) queue done"
