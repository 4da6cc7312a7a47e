#!/usr/bin/env python3
"""Measure tunnel-TPU dispatch/transfer costs (drives the batching design).

Prints per-op wall-clock for: trivial jit dispatch, eager op, scalar
download, 1 MB / 36 MB uploads, NTT 2^15, batched NTT (8, 2^15).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, n=5):
    fn()  # warm (compile)
    t0 = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r) if hasattr(r, "block_until_ready") or \
        isinstance(r, jax.Array) else None
    dt = (time.time() - t0) / n
    print(f"{label:44s} {dt*1000:9.1f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)

    x = jnp.zeros((8, 128), jnp.int32)

    @jax.jit
    def trivial(a):
        return a + 1

    timed("trivial jit dispatch (block)",
          lambda: jax.block_until_ready(trivial(x)))
    timed("trivial jit dispatch (async, no block)", lambda: trivial(x), n=20)
    timed("eager add (block)",
          lambda: jax.block_until_ready(x + 1))
    timed("scalar download", lambda: np.asarray(trivial(x))[0, 0])

    one_mb = np.zeros((1 << 18,), np.int32)
    timed("upload 1 MB (device_put, block)",
          lambda: jax.block_until_ready(jax.device_put(one_mb)))
    big = np.zeros((9 << 20,), np.int32)
    timed("upload 36 MB (device_put, block)",
          lambda: jax.block_until_ready(jax.device_put(big)), n=3)

    from spectre_tpu.poly import fr_vec as V
    col = V.upload_ints(list(range(1000)), 1 << 15)
    timed("ntt_dev 2^15 (block)",
          lambda: jax.block_until_ready(V.ntt_dev(col, 15)))
    batch = jnp.stack([col] * 8)
    timed("ntt_dev_many (8, 2^15) (block)",
          lambda: jax.block_until_ready(V.ntt_dev_many(batch, 15)), n=3)
    batch64 = jnp.stack([col] * 64)
    timed("ntt_dev_many (64, 2^15) (block)",
          lambda: jax.block_until_ready(V.ntt_dev_many(batch64, 15)), n=3)

    # chained async dispatches: how much does the tunnel pipeline?
    t0 = time.time()
    y = x
    for _ in range(50):
        y = trivial(y)
    jax.block_until_ready(y)
    print(f"{'50 chained trivial dispatches (1 block)':44s} "
          f"{(time.time()-t0)*1000:9.1f} ms total", flush=True)


if __name__ == "__main__":
    main()
