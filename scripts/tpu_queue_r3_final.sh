#!/bin/bash
# Round-3 final-stretch TPU queue (~100 min wall budget).
# Benches FIRST (MSM points/s/chip has never been recorded — VERDICT r2
# next #5), then the step-nano REAL prove (VERDICT r2 next #3). The
# testnet-512 cold prove is deliberately NOT here: it cannot finish in the
# remaining round wall-clock and a dead run would hold the chip when the
# driver's end-of-round bench.py needs it.
# Run: nohup bash scripts/tpu_queue_r3_final.sh > /tmp/q_r3_final.log 2>&1 &
set -u
cd /root/repo || exit 1
R=benchmarks/records
DEADLINE=$(( $(date +%s) + 5200 ))

left() { echo $(( DEADLINE - $(date +%s) )); }

echo "[queue] $(date -u +%H:%M:%S) bench msm 2^16"
SPECTRE_BENCH_METRIC=msm SPECTRE_BENCH_MSM_K=16 timeout 1200 python -u bench.py \
  2>&1 | tee "$R/bench_msm16_r3.log"
echo "[queue] $(date -u +%H:%M:%S) bench msm 2^18"
SPECTRE_BENCH_METRIC=msm SPECTRE_BENCH_MSM_K=18 timeout 1500 python -u bench.py \
  2>&1 | tee "$R/bench_msm18_r3.log"

T=$(left)
if [ "$T" -gt 600 ]; then
  echo "[queue] $(date -u +%H:%M:%S) step nano REAL prove (k=17), budget ${T}s"
  timeout "$T" python -u scripts/prove_step.py --spec nano --repeat 2 \
    2>&1 | tee /tmp/q_r3_step_nano.log
  grep -E "^\{" /tmp/q_r3_step_nano.log | tail -1 > "$R/step_nano_real_r3.json" || true
fi
echo "[queue] $(date -u +%H:%M:%S) queue done"
