#!/bin/bash
# Session queue: warm the fresh machine's compile cache in bench-priority
# order (driver runs bench.py at round end), then push the prover milestones.
set -u
cd /root/repo || exit 1

echo "[queue] $(date -u +%H:%M:%S) bench ntt (cache warm, driver metric)"
SPECTRE_BENCH_METRIC=ntt timeout 3000 python -u bench.py \
  > /tmp/q_bench_ntt.log 2>&1
echo "[queue] bench ntt exit=$?"

echo "[queue] $(date -u +%H:%M:%S) nano k=13 committee prove (warm prover kernels)"
SPECTRE_TRACE=1 timeout 5400 python -u scripts/prove_committee.py \
  --spec nano --k 13 > /tmp/q_nano.log 2>&1
echo "[queue] nano exit=$?"

echo "[queue] $(date -u +%H:%M:%S) minimal k=14 committee prove (BASELINE #3 scale-up)"
SPECTRE_TRACE=1 timeout 10800 python -u scripts/prove_committee.py \
  --spec minimal --k 14 > /tmp/q_minimal.log 2>&1
echo "[queue] minimal exit=$?"

echo "[queue] $(date -u +%H:%M:%S) bench msm"
SPECTRE_BENCH_METRIC=msm timeout 5400 python -u bench.py \
  > /tmp/q_bench_msm.log 2>&1
echo "[queue] bench msm exit=$?"
echo "[queue] all done $(date -u +%H:%M:%S)"
