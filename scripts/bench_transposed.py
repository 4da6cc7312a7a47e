#!/usr/bin/env python3
"""Measure AoS vs transposed kernels on the real chip (round-2 layout work).

Usage: python scripts/bench_transposed.py [msm|ntt|both]
Writes one JSON line per measurement to stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_msm():
    import jax
    import jax.numpy as jnp
    from spectre_tpu.fields import limb as L
    from spectre_tpu.poly import kzg
    from spectre_tpu.poly.msm_pippenger import commit_dev, commit_dev_t

    k = int(os.environ.get("SPECTRE_BENCH_MSM_K", "18"))
    n = 1 << k
    srs = kzg.cached_srs(k)
    rng = np.random.RandomState(0)
    s = rng.randint(0, 2048, size=(n, L.fr_spec.n_limbs)).astype(np.int32)
    s[:, -1] = 0

    for name, fn in (
        ("msm_t", lambda sc: commit_dev_t(kzg._lag_enc_dev_t(srs, n), sc)),
        ("msm_aos", lambda sc: commit_dev(kzg._lag_enc_dev(srs), sc)),
    ):
        sc = jax.device_put(s.T if name == "msm_t" else s)
        t0 = time.time()
        fn(sc)
        warm = time.time() - t0
        iters = 2
        t0 = time.time()
        for _ in range(iters):
            fn(sc)
        dt = (time.time() - t0) / iters
        print(json.dumps({"metric": f"{name}_2^{k}", "cold_s": round(warm, 2),
                          "warm_s": round(dt, 3),
                          "points_per_s": round(n / dt, 1)}), flush=True)


def bench_ntt():
    import jax
    from spectre_tpu.fields import limb as L
    from spectre_tpu.poly.ntt_fast import ntt_t

    spec = L.fr_spec
    rng = np.random.RandomState(0)
    for k in (20, 23):
        n = 1 << k
        a = jax.device_put(
            rng.randint(0, spec.B, size=(spec.n_limbs, n)).astype(np.int32))
        t0 = time.time()
        np.asarray(ntt_t(a, k)[:, :2])
        warm = time.time() - t0
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            np.asarray(ntt_t(a, k)[:, :2])
        dt = (time.time() - t0) / iters
        print(json.dumps({"metric": f"ntt_t_2^{k}", "cold_s": round(warm, 2),
                          "warm_s": round(dt, 4),
                          "elems_per_s": round(n / dt, 1)}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("ntt", "both"):
        bench_ntt()
    if which in ("msm", "both"):
        bench_msm()
