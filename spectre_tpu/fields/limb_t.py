"""Transposed-limb-layout field ops: limbs on axis -2, rows on axis -1.

WHY (measured, ARCHITECTURE.md "limb-layout ceiling"): the default (n, NL)
layout tiles as T(8,128) and pads the 24-limb minor axis to 128 lanes —
~512 bytes per cell, a 5.3x HBM waste that caps circuit size (StepCircuit's
20M cells cannot fit). With limbs on sublanes ((NL, n): 24 = 3x8 sublanes,
rows on lanes) residency drops to ~96 B/cell and memory-bound kernels gain
the same factor in effective bandwidth.

This module is the transposed counterpart of fields/limb.py's device ops —
same schoolbook + scatter-free REDC + lazy-amplitude algebra, re-indexed to
axis -2. The prover pipeline migrates onto it incrementally (round-3 work);
parity with the AoS ops is pinned in tests/test_limb_t.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import limb as L

LAX = -2   # limb axis


def to_t(a):
    """(..., n, NL) -> (..., NL, n)."""
    return jnp.swapaxes(a, -1, -2)


def from_t(a):
    return jnp.swapaxes(a, -1, -2)


def _shift_up_t(c):
    """Shift carries one limb position up along axis -2."""
    pad = [(0, 0)] * c.ndim
    pad[-2] = (1, 0)
    return jnp.pad(c[..., :-1, :], pad)


def carry_relax_t(spec: L.FieldSpec, t, passes: int = 2):
    mask = spec.B - 1
    sh = spec.limb_bits
    for _ in range(passes):
        c = t >> sh
        t = (t & mask) + _shift_up_t(c)
    return t


def _relax_signed_t(spec: L.FieldSpec, t, passes: int):
    mask = spec.B - 1
    sh = spec.limb_bits
    for _ in range(passes):
        c = t >> sh
        low = jnp.concatenate(
            [t[..., :-1, :] & mask, t[..., -1:, :]], axis=-2)
        t = low + _shift_up_t(c)
    return t


def carry_exact_t(spec: L.FieldSpec, t):
    """Exact carry propagation (log-depth scan along the limb axis)."""
    t = _relax_signed_t(spec, t, passes=3)
    sh = spec.limb_bits
    mask = spec.B - 1
    fm = (t - 1) >> sh
    f0 = t >> sh
    fp = (t + 1) >> sh

    def compose(a, b):
        am, a0, ap = a
        bm, b0, bp = b

        def app(x):
            return jnp.where(x == -1, bm, jnp.where(x == 0, b0, bp))

        return (app(am), app(a0), app(ap))

    _, s0, _ = jax.lax.associative_scan(compose, (fm, f0, fp), axis=-2)
    v = t + _shift_up_t(s0)
    return jnp.concatenate([v[..., :-1, :] & mask, v[..., -1:, :]], axis=-2)


# ---- runtime amplitude-checked mode (SPECTRE_CHECKED=1) ----
# Lazy reduction keeps limbs "relaxed" (< 2^(limb_bits+1)); a misplaced
# carry_relax_t silently wraps int32 inside schoolbook/REDC and corrupts
# proofs. Checked mode converts that class of bug into a loud
# JaxRuntimeError at the offending op (VERDICT r3 weak #7). The bound is
# 2^(limb_bits+2): legitimate relaxed operands stay below 2^(limb_bits+1);
# past 4x the base, n_limbs accumulated cross products no longer fit i32.
import os as _os

_CHECKED = _os.environ.get("SPECTRE_CHECKED") == "1"


def _amp_raise(maxabs, bound, name):
    if int(maxabs) >= int(bound):
        raise AssertionError(
            f"SPECTRE_CHECKED: limb amplitude {int(maxabs)} >= {int(bound)} "
            f"entering {name} — a lazy-reduction bound was violated "
            f"(missing carry_relax_t?)")


def _check_amp(spec: L.FieldSpec, name: str, *tensors):
    if not _CHECKED:
        return
    bound = 1 << (spec.limb_bits + 2)
    for t in tensors:
        jax.debug.callback(_amp_raise, jnp.max(jnp.abs(t)), bound, name)


def schoolbook_t(spec: L.FieldSpec, a, b):
    """(…, n, R) x (…, n, R) -> (…, 2n+1, R) full product."""
    _check_amp(spec, "schoolbook_t", a, b)
    n = spec.n_limbs
    parts = []
    for i in range(n):
        prod = a[..., i:i + 1, :] * b      # may broadcast leading dims
        pad = [(0, 0)] * prod.ndim
        pad[-2] = (i, n + 1 - i)
        parts.append(jnp.pad(prod, pad))
    t = parts[0]
    for p in parts[1:]:
        t = t + p
    return t


def redc_t(spec: L.FieldSpec, t, unroll: bool | None = None):
    n = spec.n_limbs
    mask = spec.B - 1
    sh = spec.limb_bits
    n0inv = jnp.int32(spec.n0inv)
    p0 = jnp.int32(int(spec.p_limbs[0]))
    rows = jnp.asarray(spec.p_shift_rows)       # (n, 2n+1)
    c = jnp.zeros(t.shape[:-2] + t.shape[-1:], jnp.int32)
    if unroll is None:
        unroll = L.REDC_UNROLL

    if unroll:
        for i in range(n):
            v = t[..., i, :] + c
            m = (v & mask) * n0inv & mask
            t = t + m[..., None, :] * rows[i][:, None]
            c = (v + m * p0) >> sh
    else:
        def body(carry, xs):
            t, c = carry
            row, i = xs
            v = jnp.take(t, i, axis=-2) + c
            t = t + (((jnp.take(t, i, axis=-2) + c) & mask) * n0inv
                     & mask)[..., None, :] * row[:, None]
            m = (v & mask) * n0inv & mask
            c = (v + m * p0) >> sh
            return (t, c), None

        (t, c), _ = jax.lax.scan(
            body, (t, c), (rows, jnp.arange(n, dtype=jnp.int32)))
    r = t[..., n:2 * n, :]
    r = jnp.concatenate([r[..., :1, :] + c[..., None, :], r[..., 1:, :]],
                        axis=-2)
    return carry_relax_t(spec, r, passes=2)


@functools.lru_cache(maxsize=None)
def make_ops_t(spec_name: str):
    """Transposed op namespace for the named spec ('fr', 'fq', ...)."""
    spec = {"bn254_fr": L.fr_spec, "bn254_fq": L.fq_spec,
            "bls12_381_fq": L.bls_fq_spec,
            "bls12_381_fr": L.bls_fr_spec}[spec_name]
    n = spec.n_limbs

    def _i32(x):
        return jnp.asarray(x, jnp.int32)

    def _kp_col(amplitude: int):
        return jnp.asarray(
            L.int_to_limbs(amplitude * spec.p, spec.limb_bits, n))[:, None]

    @jax.jit
    def mont_mul(a, b):
        return redc_t(spec, schoolbook_t(spec, _i32(a), _i32(b)))

    @jax.jit
    def mont_sqr(a):
        a = _i32(a)
        return redc_t(spec, schoolbook_t(spec, a, a))

    @jax.jit
    def add(a, b):
        return carry_relax_t(spec, _i32(a) + _i32(b), passes=1)

    @functools.partial(jax.jit, static_argnames=("amplitude",))
    def sub(a, b, amplitude: int = 1):
        return carry_relax_t(
            spec, _i32(a) - _i32(b) + _kp_col(amplitude), passes=2)

    @functools.partial(jax.jit, static_argnames=("amplitude",))
    def neg(a, amplitude: int = 2):
        return carry_relax_t(spec, _kp_col(amplitude) - _i32(a), passes=2)

    one_m = jnp.asarray(np.asarray(spec.one_mont))[:, None]

    @jax.jit
    def fold(a):
        return redc_t(spec, schoolbook_t(
            spec, _i32(a), jnp.broadcast_to(one_m, a.shape)))

    @functools.partial(jax.jit, static_argnames=("amplitude",))
    def canon(a, amplitude: int = 2):
        """Reduce amplitude-bounded (a < amplitude*p) limbs to canonical."""
        v = carry_exact_t(spec, a)
        k = 1
        while k < amplitude:
            k <<= 1
        k >>= 1
        ks = []
        while k >= 1:
            ks.append(k)
            k >>= 1
        for k in ks or [1]:
            d = carry_exact_t(spec, v - _kp_col(k))
            v = jnp.where(d[..., -1:, :] < 0, v, d)
        return v

    @jax.jit
    def select(c, a, b):
        """c ? a : b with c a lane-shaped (..., n_rows) bool array."""
        return jnp.where(jnp.asarray(c)[..., None, :], _i32(a), _i32(b))

    @functools.partial(jax.jit, static_argnames=("amplitude",))
    def is_zero(a, amplitude: int = 8):
        return jnp.all(canon(a, amplitude) == 0, axis=-2)

    @jax.jit
    def from_mont(a):
        """Montgomery -> canonical plain limbs (same (NL, n) layout)."""
        a = _i32(a)
        one = jnp.zeros_like(a).at[..., 0, :].set(1)
        return canon(mont_mul(a, one), 2)

    import types
    return types.SimpleNamespace(
        spec=spec, mont_mul=mont_mul, mont_sqr=mont_sqr, add=add, sub=sub,
        neg=neg, fold=fold, canon=canon, select=select, is_zero=is_zero,
        from_mont=from_mont)
