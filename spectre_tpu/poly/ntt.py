"""Radix-2 NTT over limb tensors (JAX) for BN254 Fr.

Single-chip version: iterative DIT with a bit-reversal gather, then k stages
of fully vectorized butterflies over the (n/2, n_limbs) halves. Lazy
amplitude: the even branch grows by 2p per stage (a + t and a - t + c·p),
multiplications reset twiddle products below 2p; after k stages amplitude is
2k + 2 — far below the REDC headroom (α·β < 2^10), so no per-stage
reductions at all. Outputs are canonicalized only by explicit request.

Twiddle tables and the bit-reversal permutation are passed as *runtime
arguments*, never baked as constants: XLA constant-folds closure constants
through every butterfly stage, which is both a compile-time explosion and a
bloated executable.

The ICI-sharded multi-chip NTT (butterfly stages exchanged over the mesh)
lives in parallel/ntt_sharded.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as L
from .domain import Domain


def ntt_graph(spec: L.FieldSpec, k: int, a, bitrev, tables, amp0: int = 2):
    """Core NTT graph. a: (n, n_limbs) Montgomery limbs; bitrev: (n,) int32;
    tables: tuple of per-stage twiddle arrays (2^(s-1), n_limbs)."""
    ops = L.make_ops(spec)
    n = 1 << k
    a = jnp.asarray(a, jnp.int32)
    a = jnp.take(a, bitrev, axis=0)
    amp = amp0
    for s in range(1, k + 1):
        m = 1 << s
        half = m // 2
        tw = tables[s - 1]  # (half, n_limbs)
        x = a.reshape(n // m, m, spec.n_limbs)
        even = x[:, :half]
        odd = x[:, half:]
        t = ops.mont_mul(tw[None, :, :], odd)       # < 2p
        lo = ops.add(even, t)                        # amp + 2
        hi = ops.sub(even, t, amplitude=2)           # amp + 2
        a = jnp.concatenate([lo, hi], axis=1).reshape(n, spec.n_limbs)
        amp = amp + 2
    return a, amp


@functools.lru_cache(maxsize=None)
def _ntt_jit(k: int, inverse: bool, scale: bool):
    dom = Domain(k)
    spec = dom.spec
    ops = L.make_ops(spec)
    amp_final = 2 * k + 2
    amp_pow2 = 1 << max(1, (amp_final - 1).bit_length())

    @jax.jit
    def f(a, bitrev, tables, n_inv_mont):
        out, _ = ntt_graph(spec, k, a, bitrev, tables)
        if scale:
            out = ops.mont_mul(out, n_inv_mont)
            return ops.canon(out, amplitude=2)
        return ops.canon(out, amplitude=amp_pow2)

    # twiddle tables / bitrev live on device once per domain (transfers over
    # a tunnel-attached TPU otherwise dominate the runtime)
    state = {}

    def wrapper(a):
        if "tables" not in state:
            state["tables"] = tuple(
                jax.device_put(t)
                for t in (dom.twiddles_inv if inverse else dom.twiddles_fwd))
            state["bitrev"] = jax.device_put(dom.bitrev.astype(np.int32))
            state["n_inv"] = jax.device_put(dom.n_inv_mont)
        return f(a, state["bitrev"], state["tables"], state["n_inv"])

    return wrapper


def ntt(a, k: int):
    """Forward NTT; a (2^k, n_limbs) Montgomery limbs -> canonical Montgomery."""
    return _ntt_jit(k, False, False)(a)


def intt(a, k: int):
    """Inverse NTT with 1/n scaling."""
    return _ntt_jit(k, True, True)(a)


@functools.lru_cache(maxsize=None)
def _ntt_many_jit(k: int, inverse: bool, scale: bool):
    """Batched transform: (C, 2^k, n_limbs) in ONE device call (vmapped
    whole-array butterflies — the prover's per-column coefficient pass)."""
    dom = Domain(k)
    spec = dom.spec
    ops = L.make_ops(spec)
    amp_final = 2 * k + 2
    amp_pow2 = 1 << max(1, (amp_final - 1).bit_length())

    def one(a, bitrev, tables, n_inv_mont):
        out, _ = ntt_graph(spec, k, a, bitrev, tables)
        if scale:
            out = ops.mont_mul(out, n_inv_mont)
            return ops.canon(out, amplitude=2)
        return ops.canon(out, amplitude=amp_pow2)

    f = jax.jit(jax.vmap(one, in_axes=(0, None, None, None)))
    state = {}

    def wrapper(a):
        if "tables" not in state:
            state["tables"] = tuple(
                jax.device_put(t)
                for t in (dom.twiddles_inv if inverse else dom.twiddles_fwd))
            state["bitrev"] = jax.device_put(dom.bitrev.astype(np.int32))
            state["n_inv"] = jax.device_put(dom.n_inv_mont)
        return f(a, state["bitrev"], state["tables"], state["n_inv"])

    return wrapper


def ntt_many(a, k: int):
    """(C, 2^k, n_limbs) batched forward NTT, one call."""
    return _ntt_many_jit(k, False, False)(a)


def intt_many(a, k: int):
    """(C, 2^k, n_limbs) batched inverse NTT with 1/n scaling, one call."""
    return _ntt_many_jit(k, True, True)(a)
