#!/bin/bash
# Sequential TPU job queue (single chip — jobs must not overlap).
# Logs to /tmp/q_*.log; each step tolerates failure and continues.
set -u
cd /root/repo

echo "[queue] $(date -u +%H:%M:%S) warm nano k=13 rerun"
SPECTRE_TRACE=1 timeout 5400 python -u scripts/prove_committee.py \
  --spec nano --k 13 > /tmp/q_nano_warm.log 2>&1
echo "[queue] nano warm exit=$?"

echo "[queue] $(date -u +%H:%M:%S) minimal k=14 committee prove"
SPECTRE_TRACE=1 timeout 14400 python -u scripts/prove_committee.py \
  --spec minimal --k 14 > /tmp/q_minimal14.log 2>&1
echo "[queue] minimal exit=$?"

echo "[queue] $(date -u +%H:%M:%S) bench msm"
SPECTRE_BENCH_METRIC=msm timeout 3600 python -u bench.py \
  > /tmp/q_bench_msm.log 2>&1
echo "[queue] bench msm exit=$?"

echo "[queue] $(date -u +%H:%M:%S) bench ntt"
SPECTRE_BENCH_METRIC=ntt timeout 3600 python -u bench.py \
  > /tmp/q_bench_ntt.log 2>&1
echo "[queue] bench ntt exit=$?"

echo "[queue] $(date -u +%H:%M:%S) aggregation pipeline (toy inner)"
timeout 14400 python -u scripts/prove_aggregation.py --k 14 --inner-k 5 \
  > /tmp/q_agg.log 2>&1
echo "[queue] aggregation exit=$?"
echo "[queue] all done $(date -u +%H:%M:%S)"
