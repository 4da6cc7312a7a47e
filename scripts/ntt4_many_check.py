#!/usr/bin/env python3
"""Validate + time the vmapped batched four-step NTT on the current device.

Checks ntt_t4_many/intt_t4_many against per-column ntt_t4 and times a
column batch vs the stage-wise batched path. One JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    from spectre_tpu.poly import ntt4, ntt_fast
    from spectre_tpu.fields import limb as L

    spec = L.fr_spec
    rng = np.random.RandomState(3)

    def rand_t(c, k):
        n = 1 << k
        a = rng.randint(0, spec.B, size=(c, spec.n_limbs, n)).astype(np.int32)
        a[:, spec.n_limbs - 2:] = 0
        return jax.device_put(a)

    for c, k in ((4, 8), (3, 16)):
        a = rand_t(c, k)
        t0 = time.time()
        got = np.asarray(ntt4.ntt_t4_many(a, k))
        cold = time.time() - t0
        ref = np.stack([np.asarray(ntt4.ntt_t4(a[i], k)) for i in range(c)])
        ok_f = bool(np.array_equal(got, ref))
        rt = np.asarray(ntt4.intt_t4_many(ntt4.ntt_t4_many(a, k), k))
        ok_r = bool(np.array_equal(rt, np.asarray(a)))
        print(json.dumps({"check_c": c, "check_k": k, "fwd_ok": ok_f,
                          "rt_ok": ok_r, "cold_s": round(cold, 2)}),
              flush=True)
        if not (ok_f and ok_r):
            return 1

    # timing: 8 x 2^20 batch (the quotient-stage shape at k=18/ext 20)
    c, k = 8, 20
    a = rand_t(c, k)
    t0 = time.time()
    np.asarray(ntt4.ntt_t4_many(a, k)[:, :, :2])
    cold = time.time() - t0
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        np.asarray(ntt4.ntt_t4_many(a, k)[:, :, :2])
    dt = (time.time() - t0) / iters
    print(json.dumps({"metric": f"ntt4_many_{c}x2^{k}",
                      "cold_s": round(cold, 2), "warm_s": round(dt, 4),
                      "elems_per_s": round(c * (1 << k) / dt, 1)}),
          flush=True)
    t0 = time.time()
    np.asarray(ntt_fast.ntt_many_t(a, k, True)[:, :, :2])
    cold = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        np.asarray(ntt_fast.ntt_many_t(a, k, True)[:, :, :2])
    dt = (time.time() - t0) / iters
    print(json.dumps({"metric": f"ntt_many_t_{c}x2^{k}",
                      "cold_s": round(cold, 2), "warm_s": round(dt, 4),
                      "elems_per_s": round(c * (1 << k) / dt, 1)}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
