#!/bin/bash
# Sequential TPU job queue (single chip — jobs must not overlap).
# Logs to /tmp/q_*.log; each step tolerates failure and continues.
set -u
cd /root/repo || exit 1

echo "[queue] $(date -u +%H:%M:%S) ntt4 batched (vmap) check"
timeout 7200 python -u scripts/ntt4_many_check.py > /tmp/q_ntt4_many.log 2>&1
echo "[queue] ntt4_many exit=$?"

echo "[queue] $(date -u +%H:%M:%S) nano k=13 committee prove (ntt4 pipeline)"
SPECTRE_TRACE=1 timeout 7200 python -u scripts/prove_committee.py \
  --spec nano --k 13 > /tmp/q_nano_ntt4.log 2>&1
echo "[queue] nano exit=$?"

echo "[queue] $(date -u +%H:%M:%S) bench ntt"
SPECTRE_BENCH_METRIC=ntt timeout 3600 python -u bench.py \
  > /tmp/q_bench_ntt.log 2>&1
echo "[queue] bench ntt exit=$?"

echo "[queue] $(date -u +%H:%M:%S) bench msm (sliced commit)"
SPECTRE_BENCH_METRIC=msm timeout 7200 python -u bench.py \
  > /tmp/q_bench_msm.log 2>&1
echo "[queue] bench msm exit=$?"
echo "[queue] all done $(date -u +%H:%M:%S)"
