#!/usr/bin/env python3
"""Validate + time the four-step NTT (poly/ntt4) on the current device.

Checks ntt_t4/intt_t4 against ntt_fast.ntt_t at small k, then times large k
vs the stage-at-a-time path. One JSON line per measurement.
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
    rng = np.random.RandomState(2)

    def rand_t(k):
        n = 1 << k
        a = rng.randint(0, spec.B, size=(spec.n_limbs, n)).astype(np.int32)
        a[spec.n_limbs - 2:] = 0  # keep < p comfortably
        return jax.device_put(a)

    # correctness: vs the proven stage-wise path
    for k in (8, 15, 16, 18):
        a_t = rand_t(k)
        t0 = time.time()
        got = np.asarray(ntt4.ntt_t4(a_t, k))
        t_new = time.time() - t0
        ref = np.asarray(ntt_fast.ntt_t(a_t, k))
        ok_f = bool(np.array_equal(got, ref))
        rt = np.asarray(ntt4.intt_t4(ntt4.ntt_t4(a_t, k), k))
        ok_r = bool(np.array_equal(rt, np.asarray(a_t)))
        print(json.dumps({"check_k": k, "fwd_ok": ok_f, "rt_ok": ok_r,
                          "cold_s": round(t_new, 2)}), flush=True)
        if not (ok_f and ok_r):
            return 1

    # timing: big sizes
    for k in (20, 23):
        a_t = rand_t(k)
        t0 = time.time()
        np.asarray(ntt4.ntt_t4(a_t, k)[:, :2])
        cold = time.time() - t0
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            np.asarray(ntt4.ntt_t4(a_t, k)[:, :2])
        dt = (time.time() - t0) / iters
        print(json.dumps({"metric": f"ntt4_2^{k}", "cold_s": round(cold, 2),
                          "warm_s": round(dt, 4),
                          "elems_per_s": round((1 << k) / dt, 1)}), flush=True)
        # old path for comparison
        t0 = time.time()
        np.asarray(ntt_fast.ntt_t(a_t, k)[:, :2])
        cold = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            np.asarray(ntt_fast.ntt_t(a_t, k)[:, :2])
        dt = (time.time() - t0) / iters
        print(json.dumps({"metric": f"ntt_t_2^{k}", "cold_s": round(cold, 2),
                          "warm_s": round(dt, 4),
                          "elems_per_s": round((1 << k) / dt, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
