#!/bin/bash
# Round-5c TPU queue — r5b with per-job RETRY loops: the axon tunnel
# drops long-lived remote_compile reads occasionally ("response body
# closed before all bytes were read", killed the first nano attempt at
# +318 s). Retries are cheap: the persistent XLA cache + keygen
# checkpoints + PK pickles mean a retry resumes almost where the last
# attempt died.
# Run: nohup bash scripts/tpu_queue_r5c.sh > /tmp/q_r5c.log 2>&1 &
set -u
cd /root/repo || exit 1
R=benchmarks/records

run_retry() {  # run_retry <name> <tries> <timeout_s> <record> <cmd...>
  local name=$1 tries=$2 tmo=$3 rec=$4; shift 4
  local i
  for i in $(seq 1 "$tries"); do
    echo "[queue] $(date -u +%H:%M:%S) $name attempt $i/$tries"
    timeout "$tmo" "$@" 2>&1 | tee "/tmp/q_r5c_${name}.log"
    if grep -qE '^\{.*"verified": true' "/tmp/q_r5c_${name}.log"; then
      grep -E "^\{" "/tmp/q_r5c_${name}.log" | tail -1 > "$R/$rec"
      echo "[queue] $name OK (attempt $i)"
      return 0
    fi
  done
  echo "[queue] $name FAILED after $tries attempts"
  return 1
}

run_retry nano 3 3600 committee_nano_k13_r5.json \
  env SPECTRE_TRACE=1 python -u scripts/prove_committee.py \
      --spec nano --k 13 --repeat 2

echo "[queue] $(date -u +%H:%M:%S) NTT 2^23 (bench fallback warm-up)"
SPECTRE_BENCH_METRIC=ntt timeout 1500 python -u bench.py \
  2>&1 | tee /tmp/q_r5c_ntt.log
grep -E "^\{" /tmp/q_r5c_ntt.log | tail -1 > "$R/bench_ntt23_r5.log" || true

run_retry step 2 10800 step_nano_k17_r5.json \
  env SPECTRE_TRACE=1 python -u scripts/prove_step.py \
      --spec nano --k 17 --repeat 2

run_retry testnet 2 10800 committee_testnet_k18_r5.json \
  env SPECTRE_TRACE=1 python -u scripts/prove_committee.py \
      --spec testnet --k 18 --repeat 2

echo "[queue] $(date -u +%H:%M:%S) queue done"
