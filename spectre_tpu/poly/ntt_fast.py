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


# ---------------------------------------------------------------------------
# Pure-XLA transposed NTT (no Pallas): the CPU-mesh test path and the vmap
# base for batched transforms. Same stage structure as the Pallas kernel
# above — (NL, n) throughout, twiddles tiled per stage.
# ---------------------------------------------------------------------------

def ntt_graph_t(spec, k: int, a_t, bitrev, tables):
    """a_t (..., NL, n) Montgomery; tables: per-stage (NL, m/2) compact."""
    from ..fields.limb_t import carry_relax_t, schoolbook_t, redc_t
    from ..fields import limb as L_
    nl = spec.n_limbs
    n = 1 << k
    a = jnp.take(a_t, bitrev, axis=-1)
    kp2 = jnp.asarray(L_.int_to_limbs(2 * spec.p, spec.limb_bits, nl))[:, None]
    for s in range(1, k + 1):
        m = 1 << s
        half = m // 2
        lead = a.shape[:-2]
        x = a.reshape(lead + (nl, n // m, m))
        even = x[..., :, :, :half].reshape(lead + (nl, n // 2))
        odd = x[..., :, :, half:].reshape(lead + (nl, n // 2))
        tw = jnp.tile(tables[s - 1], (1, n // m))        # (NL, n/2)
        t = redc_t(spec, schoolbook_t(spec, tw, odd))    # < 2p
        lo = carry_relax_t(spec, even + t, passes=1)
        hi = carry_relax_t(spec, even - t + kp2, passes=2)
        x = jnp.concatenate(
            [lo.reshape(lead + (nl, n // m, half)),
             hi.reshape(lead + (nl, n // m, half))], axis=-1)
        a = x.reshape(lead + (nl, n))
    return a


@functools.lru_cache(maxsize=None)
def _ntt_t_xla_jit(k: int, inverse: bool, scale: bool, batched: bool):
    from ..fields.limb_t import make_ops_t
    dom = Domain(k)
    spec = dom.spec
    ops_t = make_ops_t(spec.name)
    amp_final = 2 * k + 2
    amp_pow2 = 1 << max(1, (amp_final - 1).bit_length())

    def one(a_t, bitrev, tables, n_inv_t):
        out = ntt_graph_t(spec, k, a_t, bitrev, tables)
        if scale:
            out = ops_t.mont_mul(out, n_inv_t)
            return ops_t.canon(out, amplitude=2)
        return ops_t.canon(out, amplitude=amp_pow2)

    f = jax.jit(jax.vmap(one, in_axes=(0, None, None, None))) if batched \
        else jax.jit(one)
    state = {}

    def wrapper(a_t):
        if "tables" not in state:
            state["tables"] = tuple(_stage_twiddles_t(k, inverse))
            state["bitrev"] = jax.device_put(dom.bitrev.astype(np.int32))
            state["n_inv"] = jax.device_put(
                np.ascontiguousarray(np.asarray(dom.n_inv_mont)[:, None]))
        return f(a_t, state["bitrev"], state["tables"], state["n_inv"])

    return wrapper


def ntt_t_xla(a_t, k: int):
    """Forward NTT on (NL, 2^k) without Pallas (CPU test path)."""
    return _ntt_t_xla_jit(k, False, False, False)(a_t)


def intt_t_xla(a_t, k: int):
    return _ntt_t_xla_jit(k, True, True, False)(a_t)


def ntt_many_t(a_t, k: int, use_pallas: bool):
    """(C, NL, 2^k) batched forward NTT, one call."""
    if use_pallas:
        return _ntt_t_many_pallas(k, False, False)(a_t)
    return _ntt_t_xla_jit(k, False, False, True)(a_t)


def intt_many_t(a_t, k: int, use_pallas: bool):
    if use_pallas:
        return _ntt_t_many_pallas(k, True, True)(a_t)
    return _ntt_t_xla_jit(k, True, True, True)(a_t)


@functools.lru_cache(maxsize=None)
def _ntt_t_many_pallas(k: int, inverse: bool, scale: bool):
    """Batched Pallas-butterfly NTT: vmap over the leading column axis."""
    dom = Domain(k)
    spec = dom.spec
    ops = L.make_ops(spec)
    n = dom.n
    bf = butterfly_kernel(spec.name, T=min(512, n // 2))

    def one(a, bitrev, tables, n_inv_t):
        a = jnp.take(a, bitrev, axis=1)
        for s in range(1, k + 1):
            m = 1 << s
            half = m // 2
            x = a.reshape(spec.n_limbs, n // m, m)
            even = x[:, :, :half].reshape(spec.n_limbs, n // 2)
            odd = x[:, :, half:].reshape(spec.n_limbs, n // 2)
            tw = jnp.tile(tables[s - 1], (1, n // m))
            lo, hi = bf(tw, odd, even)
            x = jnp.concatenate(
                [lo.reshape(spec.n_limbs, n // m, half),
                 hi.reshape(spec.n_limbs, n // m, half)], axis=2)
            a = x.reshape(spec.n_limbs, n)
        if scale:
            a = ops.mont_mul(a.T, n_inv_t).T
            a = ops.canon(a.T, amplitude=2).T
        else:
            amp = 2 * k + 2
            a = ops.canon(a.T, amplitude=1 << max(1, (amp - 1).bit_length())).T
        return a

    f = jax.jit(jax.vmap(one, in_axes=(0, None, None, None)))
    state = {}

    def wrapper(a_t):
        if "tables" not in state:
            state["tables"] = tuple(_stage_twiddles_t(k, inverse))
            state["bitrev"] = jax.device_put(dom.bitrev.astype(np.int32))
            state["n_inv"] = jax.device_put(dom.n_inv_mont)
        return f(a_t, state["bitrev"], state["tables"], state["n_inv"])

    return wrapper
