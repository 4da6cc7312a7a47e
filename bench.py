#!/usr/bin/env python3
"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current headline metric: BN254 Fr NTT throughput at 2^20 (the polynomial
backbone of the prover; BASELINE.md targets NTT 2^23 elems/s). vs_baseline
compares against an estimated reference-prover CPU FFT throughput of
10M elems/s for a 64-core host (the reference publishes no numbers —
BASELINE.md; this estimate is recorded here so the ratio is reproducible).
"""
import json
import sys
import time

BASELINE_NTT_ELEMS_PER_S = 10e6  # assumed 64-core rayon halo2 FFT @ 2^20


def main():
    import numpy as np
    import jax

    k = 20
    n = 1 << k

    from spectre_tpu.fields import limb as L
    from spectre_tpu.poly.ntt_fast import ntt_t

    spec = L.fr_spec
    rng = np.random.RandomState(0)
    # random Montgomery-form limb vectors in transposed (limb, batch) layout:
    # random canonical limbs are a valid representative set for throughput
    a = jax.device_put(
        rng.randint(0, spec.B, size=(spec.n_limbs, n)).astype(np.int32))

    # warmup + compile; fetching a slice forces real completion (on
    # tunnel-attached TPUs block_until_ready can return before execution)
    np.asarray(ntt_t(a, k)[:, :2])

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        np.asarray(ntt_t(a, k)[:, :2])
    dt = (time.time() - t0) / iters

    value = n / dt
    print(json.dumps({
        "metric": f"ntt_bn254_fr_2^{k}",
        "value": round(value, 1),
        "unit": "elems/s",
        "vs_baseline": round(value / BASELINE_NTT_ELEMS_PER_S, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
