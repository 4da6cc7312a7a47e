"""Transposed-layout NTT driven by the fused Pallas butterfly kernel.

Data lives as (n_limbs, 2^k) — limbs on sublanes, elements on lanes — so
each stage is: gather even/odd column sets, one fused
mul+add+sub VMEM kernel over all n/2 butterflies, scatter back. Per-stage
HBM traffic is 5 block-array passes instead of the ~50 the whole-array XLA
formulation needs.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as L
from ..fields.pallas_ops import butterfly_kernel
from .domain import Domain


@functools.lru_cache(maxsize=None)
def _stage_twiddles_t(k: int, inverse: bool):
    """Per-stage COMPACT twiddle tables (m/2, n_limbs) transposed, on
    device. Tiling to n/2 happens inside the jit per stage: resident
    twiddle memory is Σ m/2 = n entries (~100 MB at 2^23) instead of the
    k·n/2 (~9 GB at 2^23) the pre-tiled variant held."""
    dom = Domain(k)
    tables = dom.twiddles_inv if inverse else dom.twiddles_fwd
    out = []
    for s in range(1, k + 1):
        tw = np.asarray(tables[s - 1])          # (m/2, n_limbs)
        out.append(jax.device_put(np.ascontiguousarray(tw.T)))
    return out


@functools.lru_cache(maxsize=None)
def _ntt_t_jit(k: int, inverse: bool, scale: bool):
    dom = Domain(k)
    spec = dom.spec
    ops = L.make_ops(spec)
    n = dom.n
    bf = butterfly_kernel(spec.name, T=min(512, n // 2))

    @jax.jit
    def f(a_t, bitrev, tables, n_inv_t):
        # a_t: (n_limbs, n)
        a = jnp.take(a_t, bitrev, axis=1)
        for s in range(1, k + 1):
            m = 1 << s
            half = m // 2
            x = a.reshape(spec.n_limbs, n // m, m)
            even = x[:, :, :half].reshape(spec.n_limbs, n // 2)
            odd = x[:, :, half:].reshape(spec.n_limbs, n // 2)
            tw = jnp.tile(tables[s - 1], (1, n // m))  # (nl, n/2) transient
            lo, hi = bf(tw, odd, even)
            x = jnp.concatenate(
                [lo.reshape(spec.n_limbs, n // m, half),
                 hi.reshape(spec.n_limbs, n // m, half)], axis=2)
            a = x.reshape(spec.n_limbs, n)
        if scale:
            amp = 2
            a = ops.mont_mul(a.T, n_inv_t).T
            a = ops.canon(a.T, amplitude=2).T
        else:
            amp = 2 * k + 2
            a = ops.canon(a.T, amplitude=1 << max(1, (amp - 1).bit_length())).T
        return a

    state = {}

    def wrapper(a_t):
        if "tables" not in state:
            state["tables"] = tuple(_stage_twiddles_t(k, inverse))
            state["bitrev"] = jax.device_put(dom.bitrev.astype(np.int32))
            state["n_inv"] = jax.device_put(dom.n_inv_mont)
        return f(a_t, state["bitrev"], state["tables"], state["n_inv"])

    return wrapper


def ntt_t(a_t, k: int):
    """Forward NTT on transposed (n_limbs, 2^k) Montgomery limbs."""
    return _ntt_t_jit(k, False, False)(a_t)


def intt_t(a_t, k: int):
    return _ntt_t_jit(k, True, True)(a_t)
