#!/usr/bin/env python3
"""TPU-path sanity before committing a long window to a big run:

1. batched transposed commit (the keygen/prover MSM path, now on the
   pallas fused segmented-add kernels) vs the host oracle;
2. quick timing of a nano-advice-shaped commit batch, with the pallas
   kernels on vs off (SPECTRE_PALLAS_MSM), so regressions surface in
   ~2 minutes instead of mid-keygen.

Usage: python scripts/tpu_sanity.py [--n 8192] [--cols 32]
Prints one JSON line; exit 1 on any mismatch.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--cols", type=int, default=32)
    ap.add_argument("--skip-off", action="store_true",
                    help="skip the pallas-off timing pass")
    args = ap.parse_args()

    from spectre_tpu.jax_cache import enable as _enable_cache
    _enable_cache()
    import numpy as np
    import jax

    from spectre_tpu.curves import host as H
    from spectre_tpu.curves.limbjax import bn254_g1_ops_t
    from spectre_tpu.fields import limb as L
    from spectre_tpu.poly import msm_pippenger as MP

    rng = np.random.default_rng(7)
    n, C = args.n, args.cols
    pts = [H.bn254_g1.mul(H.bn254_g1.gen, int(rng.integers(1, 1 << 62)))
           for _ in range(min(n, 512))]
    # tile the small unique set out to n (throughput-representative,
    # keeps host point generation cheap)
    pts = (pts * ((n + len(pts) - 1) // len(pts)))[:n]
    scal = [[int(rng.integers(0, 1 << 62)) for _ in range(n)]
            for _ in range(C)]

    import jax.numpy as jnp
    X, Y, Z = bn254_g1_ops_t.encode_points_t(pts) \
        if hasattr(bn254_g1_ops_t, "encode_points_t") else (None,) * 3
    if X is None:
        from spectre_tpu.curves.limbjax import bn254_g1_ops
        Xa, Ya, Za = bn254_g1_ops.encode_points(pts)
        X = jnp.asarray(np.ascontiguousarray(np.asarray(Xa).T))
        Y = jnp.asarray(np.ascontiguousarray(np.asarray(Ya).T))
        Z = jnp.asarray(np.ascontiguousarray(np.asarray(Za).T))
    S = np.zeros((C, L.fr_spec.n_limbs, n), np.int32)
    for c in range(C):
        for i, s in enumerate(scal[c]):
            S[c, :, i] = L.int_to_limbs(s, L.fr_spec.limb_bits,
                                        L.fr_spec.n_limbs)
    S = jnp.asarray(S)

    t0 = time.time()
    got = MP.commit_dev_many_t((X, Y, Z), S)
    t_cold = time.time() - t0
    t0 = time.time()
    got2 = MP.commit_dev_many_t((X, Y, Z), S)
    t_warm = time.time() - t0

    # host oracle on a few columns
    ok = True
    for c in (0, C // 2, C - 1):
        want = H.bn254_g1.msm(pts, scal[c])
        if got[c] != want:
            ok = False
            print(f"MISMATCH col {c}: {got[c]} != {want}", flush=True)
    pts_per_s = C * n / t_warm

    out = {"metric": "tpu_sanity_msm", "n": n, "cols": C,
           "parity_ok": ok, "cold_s": round(t_cold, 2),
           "warm_s": round(t_warm, 2),
           "points_per_s_warm": round(pts_per_s, 1),
           "pallas": os.environ.get("SPECTRE_PALLAS_MSM",
                                    "default(on for tpu)"),
           "backend": jax.default_backend()}
    print(json.dumps(out), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
