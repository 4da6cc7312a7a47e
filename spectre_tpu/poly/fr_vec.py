"""Device vector engine over BN254 Fr — the prover's polynomial substrate.

Everything the PLONK prover does to whole polynomials (NTT/coset moves,
prefix/suffix products, batched inversion, grand products, Horner suffix
division for KZG openings, point evaluation) runs here as jitted whole-column
passes over TRANSPOSED (n_limbs, n) int32 Montgomery limb tensors — limbs on
sublanes (24 = 3x8, zero padding), rows on lanes. The round-1/2 AoS layout
(n, 24) padded the 24-limb minor axis to 128 lanes (~512 B/cell, 5.3x HBM
waste; ARCHITECTURE.md "limb-layout ceiling"); this layout cuts residency to
~96 B/cell and raises effective bandwidth by the same factor, which is what
lets StepCircuit-sized columns fit 16 GB HBM.

Layout: a column is (NL, n); a batch of C columns is (C, NL, n); a scalar is
(NL, 1). Sequential-looking recurrences (prefix products, Horner division)
are log-depth doubling passes along the lane axis — k elementwise passes for
2^k rows, no data-dependent control flow (XLA-friendly per SURVEY §7).
"""
from __future__ import annotations

import functools
import os
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as L
from ..fields.limb_t import make_ops_t, carry_relax_t
from ..fields.params import BN254_FR as FR
from ..fields.host import inv_mod
from .domain import Domain

spec = L.fr_spec
ops = make_ops_t("bn254_fr")
NL = spec.n_limbs


def enc_s(x: int):
    """Host int -> (NL, 1) device-ready Montgomery scalar."""
    return jnp.asarray(spec.encode(x))[:, None]


# --------------------------- upload / download ---------------------------

@functools.lru_cache(maxsize=None)
def _up_small_jit(n: int):
    r2 = spec.encode_plain(spec.R2)

    @jax.jit
    def f(v):           # (n,) int32 values < 2^31 -> (NL, n) mont
        limbs = [(v >> (11 * i)) & 2047 for i in range(3)]
        plain = jnp.stack(limbs + [jnp.zeros_like(v)] * (NL - 3), axis=0)
        return ops.mont_mul(plain, jnp.asarray(r2)[:, None])

    return f


@functools.lru_cache(maxsize=None)
def _up_bytes_jit(n: int):
    r2 = spec.encode_plain(spec.R2)

    @jax.jit
    def f(b):           # (..., n, 34) uint8 LE bytes -> (..., NL, n) mont
        b = b.astype(jnp.int32)
        limbs = []
        for i in range(NL):
            off = 11 * i
            j, r = off // 8, off % 8
            w = b[..., j] | (b[..., j + 1] << 8) | (b[..., j + 2] << 16)
            limbs.append((w >> r) & 2047)
        plain = jnp.stack(limbs, axis=-2)
        return ops.mont_mul(plain, jnp.asarray(r2)[:, None])

    return f


def upload_ints(values: List[int], n: int | None = None):
    """Canonical ints -> device (NL, n) Montgomery limbs (zero padded)."""
    m = len(values)
    n = n if n is not None else m
    assert m <= n
    big = any(v >> 31 for v in values)
    if not big:
        arr = np.zeros(n, np.int32)
        if m:
            arr[:m] = np.asarray(values, dtype=np.int64).astype(np.int32)
        return _up_small_jit(n)(jnp.asarray(arr))
    buf = b"".join(int(v).to_bytes(34, "little") for v in values)
    arr = np.zeros((n, 34), np.uint8)
    if m:
        arr[:m] = np.frombuffer(buf, dtype=np.uint8).reshape(m, 34)
    return _up_bytes_jit(n)(jnp.asarray(arr))


_SYNC_MIN_N = int(os.environ.get("SPECTRE_SYNC_MIN_N", str(1 << 16)))


def sync_chunk(x, n: int):
    """Device barrier after a chunk of a big-n batched pipeline.

    JAX dispatch is async: the host enqueues whole phases in seconds while
    the device is minutes behind, and every enqueued op's OUTPUT buffer is
    allocated at dispatch — so an unbounded queue multiplies peak HBM by
    the queue depth. That (not steady residency: live arrays were 6 GiB
    at the r5 step-k=17 OOM) is what the round-4 OOM whack-a-mole was
    chasing. Blocking once per chunk bounds the in-flight window to ~one
    chunk; below _SYNC_MIN_N rows (default 2^16) it's a no-op so small
    proves keep full overlap."""
    if n >= _SYNC_MIN_N:
        jax.block_until_ready(x)
    return x


def col_chunk(n: int, bytes_per_row: int = 400, cap: int = 1 << 28) -> int:
    """How many columns one whole-stack program may touch: the Montgomery
    conversion/REDC temps cost ~400 B/row/column in HLO, and the k=18
    512-key keygen showed a single 57-column from_mont compiling to 18.8 GB
    of HBM temps. Power of two so few program shapes exist."""
    w = max(1, min(64, cap // max(n * bytes_per_row, 1)))
    return 1 << (w.bit_length() - 1)


def upload_ints_many(columns, n: int):
    """List of C int-lists -> (C, NL, n) device Montgomery limbs in a few
    transfers (column-chunked at big n; chunks padded to a power of two)."""
    C = len(columns)
    step = col_chunk(n)
    outs = []
    for off in range(0, C, step):
        blk = columns[off:off + step]
        width = 1 << max(0, (len(blk) - 1).bit_length())
        arr = np.zeros((width, n, 34), np.uint8)
        for i, values in enumerate(blk):
            m = len(values)
            if m:
                buf = b"".join(int(v).to_bytes(34, "little")
                               for v in values)
                arr[i, :m] = np.frombuffer(buf, np.uint8).reshape(m, 34)
        out = _up_bytes_jit((width, n))(jnp.asarray(arr))
        outs.append(out[:len(blk)] if len(blk) < width else out)
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def download_ints(a) -> List[int]:
    """Device (…, NL, n) Montgomery limbs -> canonical python ints."""
    plain = np.asarray(ops.from_mont(a))
    rows = np.swapaxes(plain, -1, -2)
    return spec.decode_plain_batch(rows)


def download_int(a) -> int:
    return download_ints(a.reshape(NL, 1))[0]


# ----------------------------- graph pieces -----------------------------

def _ones_cols(sh: int):
    one = jnp.asarray(spec.one_mont, jnp.int32)[:, None]
    return jnp.broadcast_to(one, (NL, sh))


def _powers_graph(x_mont, n: int):
    """p_i = x^i, i < n (Montgomery), via log-doubling prefix products.
    x_mont: (NL, 1)."""
    one = jnp.asarray(spec.one_mont, jnp.int32)[:, None]
    v = jnp.broadcast_to(x_mont, (NL, n))
    idx = jnp.arange(n)[None, :]
    p = jnp.where(idx == 0, one, v)
    s = 1
    while s < n:
        shifted = jnp.concatenate([_ones_cols(s), p[:, :-s]], axis=-1)
        p = ops.mont_mul(p, shifted)
        s <<= 1
    return p


def _prefix_graph(v):
    """Inclusive prefix product along the lane axis of (NL, n)."""
    n = v.shape[-1]
    p = v
    s = 1
    while s < n:
        shifted = jnp.concatenate([_ones_cols(s), p[:, :-s]], axis=-1)
        p = ops.mont_mul(p, shifted)
        s <<= 1
    return p


def _ones_like_slice(v, s: int):
    one = jnp.asarray(spec.one_mont, jnp.int32)[:, None]
    return jnp.broadcast_to(one, v.shape[:-1] + (s,))


def _prefix_graph_b(v):
    """Inclusive prefix product along the last axis of (..., NL, n) —
    the batched _prefix_graph (one graph for C independent columns)."""
    n = v.shape[-1]
    p = v
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [_ones_like_slice(v, s), p[..., :-s]], axis=-1)
        p = ops.mont_mul(p, shifted)
        s <<= 1
    return p


def _suffix_graph_b(v):
    n = v.shape[-1]
    p = v
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [p[..., s:], _ones_like_slice(v, s)], axis=-1)
        p = ops.mont_mul(p, shifted)
        s <<= 1
    return p


def _suffix_graph(v):
    """Inclusive suffix product along the lane axis of (NL, n)."""
    n = v.shape[-1]
    p = v
    s = 1
    while s < n:
        shifted = jnp.concatenate([p[:, s:], _ones_cols(s)], axis=-1)
        p = ops.mont_mul(p, shifted)
        s <<= 1
    return p


def _sum_graph(a):
    """Exact sum of (NL, m) Montgomery columns -> (NL, 1), amplitude < 2."""
    while a.shape[-1] > 1:
        m = a.shape[-1]
        c = min(256, m)
        if m % c:
            pad = c - m % c
            a = jnp.concatenate(
                [a, jnp.zeros((NL, pad), jnp.int32)], axis=-1)
            m += pad
        a = a.reshape(NL, m // c, c).sum(axis=-1, dtype=jnp.int32)
        a = carry_relax_t(spec, a, passes=2)
        a = ops.fold(a)
    return a


@functools.lru_cache(maxsize=None)
def _wsum_jit(P: int):
    @jax.jit
    def f(stacked, w):
        """stacked (P, NL, n) mont, w (P, NL, 1) mont -> (NL, n) amp<2.

        Per-limb bound: mont_mul output amplitude < 2 so the int32 sum over
        P<=64 rows stays < 128*B << 2^31; one relax pass then REDC-fold."""
        prod = ops.mont_mul(stacked, w)
        s = prod.sum(axis=0, dtype=jnp.int32)
        s = carry_relax_t(spec, s, passes=2)
        return ops.fold(s)
    return f


_WSUM_CHUNK = 64


def weighted_sum_cols(cols, weights):
    """sum_i weights[i] * cols[i] for device (NL, n) Montgomery columns and
    python-int weights, chunked (row-aware: ~96 B/row in this layout).
    Returns (NL, n) Montgomery, amplitude < 2."""
    P = len(cols)
    assert P == len(weights) and P > 0
    rows = int(cols[0].shape[-1])
    chunk = max(4, min(_WSUM_CHUNK, (1 << 28) // max(rows * 96, 1)))
    chunk = 1 << max(0, (chunk - 1).bit_length() - 1) \
        if chunk & (chunk - 1) else chunk
    acc = None
    for off in range(0, P, chunk):
        blk = [c if c.dtype == jnp.int32 else c.astype(jnp.int32)
               for c in cols[off:off + chunk]]
        w = [spec.encode(x)[:, None] for x in weights[off:off + len(blk)]]
        # pad to a power of two with zero weights: few program shapes
        width = 1 << max(0, (len(blk) - 1).bit_length())
        zero = None
        while len(blk) < width:
            if zero is None:
                zero = jnp.zeros_like(blk[0])
            blk.append(zero)
            w.append(spec.encode(0)[:, None])
        part = _wsum_jit(width)(jnp.stack(blk), jnp.asarray(np.stack(w)))
        acc = part if acc is None else _add_fold_jit()(acc, part)
    return acc


@functools.lru_cache(maxsize=None)
def _unstack_jit(C: int):
    @jax.jit
    def f(a):
        return tuple(a[i] for i in range(C))
    return f


def unstack(a):
    """(C, ...) device array -> C device arrays in ONE dispatch (eager
    per-row slicing costs a full tunnel RTT per row on axon)."""
    return list(_unstack_jit(a.shape[0])(a))


@functools.lru_cache(maxsize=None)
def _add_fold_jit():
    @jax.jit
    def f(a, b):
        return ops.fold(carry_relax_t(spec, a + b, passes=1))
    return f


# ----------------------------- jitted entries -----------------------------

@functools.lru_cache(maxsize=None)
def _powers_jit(n: int):
    @jax.jit
    def f(x_mont):
        return _powers_graph(x_mont, n)
    return f


def powers(x: int, n: int):
    """Device vector [1, x, x^2, ..., x^{n-1}] as (NL, n) Montgomery."""
    return _powers_jit(n)(enc_s(x))


@functools.lru_cache(maxsize=None)
def _mul_jit():
    @jax.jit
    def f(a, b):
        return ops.mont_mul(a, b)
    return f


def mul(a, b):
    return _mul_jit()(a, b)


@functools.lru_cache(maxsize=None)
def _scalar_mul_jit():
    @jax.jit
    def f(a, s_mont):
        return ops.mont_mul(a, s_mont)
    return f


def scalar_mul(a, s: int):
    return _scalar_mul_jit()(a, enc_s(s))


def _sum_lanes_graph(a):
    """Exact sum over the lane axis of (m, NL, n) Montgomery -> (m, NL, 1),
    amplitude < 2 (the batched _sum_graph)."""
    while a.shape[-1] > 1:
        m, n = a.shape[0], a.shape[-1]
        c = min(256, n)
        if n % c:
            pad = c - n % c
            a = jnp.concatenate(
                [a, jnp.zeros((m, NL, pad), jnp.int32)], axis=-1)
            n += pad
        a = a.reshape(m, NL, n // c, c).sum(axis=-1, dtype=jnp.int32)
        a = carry_relax_t(spec, a, passes=2)
        a = ops.fold(a)
    return a


@functools.lru_cache(maxsize=None)
def _eval_many_jit(n: int, m: int):
    @jax.jit
    def f(stacked, x_mont):  # stacked (m, NL, n)
        pw = _powers_graph(x_mont, n)
        t = ops.mont_mul(stacked, pw[None])
        return ops.canon(_sum_lanes_graph(t), 2)
    return f


def eval_polys_at(coeff_list, x: int) -> List[int]:
    """Evaluate several device coefficient vectors at the same point.

    One device call (m padded to a power of two so few program shapes
    exist); returns canonical ints.
    """
    if not coeff_list:
        return []
    n = coeff_list[0].shape[-1]
    m = len(coeff_list)
    width = 1 << max(0, (m - 1).bit_length())
    stacked = jnp.stack([c if c.dtype == jnp.int32
                         else c.astype(jnp.int32) for c in coeff_list])
    if m < width:
        stacked = jnp.concatenate(
            [stacked, jnp.zeros((width - m, NL, n), jnp.int32)])
    out = _eval_many_jit(n, width)(stacked, enc_s(x))
    rows = np.swapaxes(np.asarray(out), -1, -2)
    return [spec.from_mont_int(v) % FR
            for v in spec.decode_plain_batch(rows)][:m]


def eval_poly_at(coeffs, x: int) -> int:
    return eval_polys_at([coeffs], x)[0]


@functools.lru_cache(maxsize=None)
def _binv_jit(n: int):
    @jax.jit
    def pre(v):
        return _prefix_graph(v)

    @jax.jit
    def combine(v, pre_p, tinv_mont):
        suf = _suffix_graph(v)
        p_ex = jnp.concatenate([_ones_cols(1), pre_p[:, :-1]], axis=-1)
        s_ex = jnp.concatenate([suf[:, 1:], _ones_cols(1)], axis=-1)
        r = ops.mont_mul(p_ex, s_ex)
        return ops.mont_mul(r, tinv_mont)

    return pre, combine


def batch_inv(v):
    """Elementwise inverse of a nonzero (NL, n) vector (one host inversion)."""
    n = v.shape[-1]
    pre, combine = _binv_jit(n)
    P = pre(v)
    total = download_int(P[:, -1:])
    tinv = inv_mod(total, FR)
    return combine(v, P, enc_s(tinv))


@functools.lru_cache(maxsize=None)
def _binv_many_jit(C: int, n: int):
    @jax.jit
    def pre(v):                       # (C, NL, n)
        return _prefix_graph_b(v)

    @jax.jit
    def combine(v, pre_p, tinv):      # tinv (C, NL, 1)
        suf = _suffix_graph_b(v)
        p_ex = jnp.concatenate(
            [_ones_like_slice(v, 1), pre_p[..., :-1]], axis=-1)
        s_ex = jnp.concatenate(
            [suf[..., 1:], _ones_like_slice(v, 1)], axis=-1)
        r = ops.mont_mul(p_ex, s_ex)
        return ops.mont_mul(r, tinv)

    return pre, combine


def _ones_block(C: int, NLn, n: int):
    one = jnp.asarray(spec.one_mont, jnp.int32)[None, :, None]
    return jnp.broadcast_to(one, (C, NLn, n))


def _pad_cols_pow2(blk, n):
    """Pad a (take, NL, n) block with Montgomery-one columns to the next
    power of two (identity for inverse/grand-product pipelines); returns
    (padded, take)."""
    take = blk.shape[0]
    w = 1 << max(0, (take - 1).bit_length())
    if take < w:
        blk = jnp.concatenate(
            [blk, _ones_block(w - take, blk.shape[1], n)])
    return blk, take


def _batch_inv_block(v):
    C, n = v.shape[0], v.shape[-1]
    pre, combine = _binv_many_jit(C, n)
    P = pre(v)
    totals = download_ints(P[..., -1:])       # C canonical ints
    tinvs = [inv_mod(t, FR) for t in totals]
    tinv = jnp.swapaxes(upload_ints(tinvs, C), 0, 1)[:, :, None]
    return combine(v, P, tinv)


def batch_inv_many(v):
    """Elementwise inverse of C stacked nonzero columns (C, NL, n): per
    block, one device prefix pass, one host transfer of per-column totals,
    host inversions, one combine pass. Blocks are bounded by col_chunk(n)
    — the whole-stack prefix/suffix scans cost several live copies per
    column, and the unsliced version OOM'd the 16 GB chip at k=18 with ~50
    grand-product columns (round-4 testnet run)."""
    C, n = v.shape[0], v.shape[-1]
    B = col_chunk(n)
    if C <= B:
        return _batch_inv_block(v)
    outs = []
    for off in range(0, C, B):
        blk, take = _pad_cols_pow2(v[off:off + B], n)
        outs.append(sync_chunk(_batch_inv_block(blk)[:take], n))
    return jnp.concatenate(outs)


@functools.lru_cache(maxsize=None)
def _grand_product_jit(n: int, usable: int):
    @jax.jit
    def f(ratio, start_mont, blind_tail):
        # rows >= usable contribute 1 to the prefix
        idx = jnp.arange(n)[None, :]
        one = jnp.asarray(spec.one_mont, jnp.int32)[:, None]
        r = jnp.where(idx < usable, ratio, one)
        pp = _prefix_graph(r)
        pp_ex = jnp.concatenate([_ones_cols(1), pp[:, :-1]], axis=-1)
        z = ops.mont_mul(pp_ex, jnp.broadcast_to(start_mont, (NL, n)))
        z = jnp.where(idx <= usable, z, blind_tail)
        last = ops.mont_mul(pp[:, usable - 1:usable], start_mont)
        return z, ops.canon(last, 2)
    return f


def grand_product(ratio, start: int, usable: int, blind: List[int]):
    """Z with Z_0 = start, Z_{r+1} = Z_r * ratio_r for r < usable; rows
    usable+1.. take the supplied blinding values. Returns (Z, Z_usable)."""
    n = ratio.shape[-1]
    tail = upload_ints([0] * (usable + 1) + list(blind), n)
    z, last = _grand_product_jit(n, usable)(ratio, enc_s(start), tail)
    return z, download_int(last)


@functools.lru_cache(maxsize=None)
def _grand_product_many_jit(C: int, n: int, usable: int):
    @jax.jit
    def f(ratios, blind_tails):       # (C, NL, n) each
        idx = jnp.arange(n)[None, :]
        one = jnp.asarray(spec.one_mont, jnp.int32)[:, None]
        r = jnp.where(idx < usable, ratios, one)
        pp = _prefix_graph_b(r)
        pp_ex = jnp.concatenate(
            [_ones_like_slice(r, 1), pp[..., :-1]], axis=-1)
        z = jnp.where(idx <= usable, pp_ex, blind_tails)
        lasts = pp[..., usable - 1:usable]
        return z, ops.canon(lasts, 2)

    @jax.jit
    def scale(z, starts):             # starts (C, NL, 1)
        idx = jnp.arange(z.shape[-1])[None, :]
        scaled = ops.mont_mul(z, starts)
        return jnp.where(idx <= usable, scaled, z)

    return f, scale


def grand_product_many(ratios, usable: int, blinds):
    """C grand-product columns in one pass, each with Z_{c,0} = 1 and the
    supplied blinding tails. Returns (Z, lasts) where lasts[c] = Z_c at row
    `usable` (canonical ints, ONE transfer). For halo2's cross-chunk
    chaining scale afterwards with grand_product_scale."""
    C, n = ratios.shape[0], ratios.shape[-1]
    B = col_chunk(n)
    zs, lasts = [], []
    for off in range(0, C, B):
        blk, take = _pad_cols_pow2(ratios[off:off + B], n)
        f, _scale = _grand_product_many_jit(blk.shape[0], n, usable)
        blk_blinds = list(blinds[off:off + take])
        blk_blinds += [[0] * len(blk_blinds[0])] * (blk.shape[0] - take) \
            if blk_blinds else []
        tails = upload_ints_many(
            [[0] * (usable + 1) + list(b) for b in blk_blinds], n)
        z, lb = f(blk, tails)
        zs.append(sync_chunk(z[:take], n))
        lasts.extend(download_ints(lb)[:take])
    return (jnp.concatenate(zs) if len(zs) > 1 else zs[0]), lasts


def grand_product_scale(z, usable: int, starts):
    """Scale rows <= usable of each Z column by starts[c] (canonical ints);
    blinding rows stay untouched."""
    C, n = z.shape[0], z.shape[-1]
    B = col_chunk(n)
    outs = []
    for off in range(0, C, B):
        blk, take = _pad_cols_pow2(z[off:off + B], n)
        _f, scale = _grand_product_many_jit(blk.shape[0], n, usable)
        st = list(starts[off:off + take]) + [1] * (blk.shape[0] - take)
        s_m = jnp.swapaxes(upload_ints(st, len(st)), 0, 1)[:, :, None]
        outs.append(sync_chunk(scale(blk, s_m)[:take], n))
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


@functools.lru_cache(maxsize=None)
def _quotient_jit(n: int):
    k = max(1, (n - 1).bit_length())

    @jax.jit
    def f(coeffs, zpows):  # zpows (k, NL, 1): z^(2^s)
        q = jnp.concatenate(
            [coeffs[:, 1:], jnp.zeros((NL, 1), jnp.int32)], axis=-1)
        for s in range(k):
            sh = 1 << s
            if sh >= n:
                break
            shifted = jnp.concatenate(
                [q[:, sh:], jnp.zeros((NL, sh), jnp.int32)], axis=-1)
            q = carry_relax_t(
                spec, q + ops.mont_mul(shifted, zpows[s]), passes=1)
            q = ops.fold(q)
        return q
    return f


def kzg_quotient(coeffs, z: int):
    """(f(X) - f(z)) / (X - z) coefficient vector on device."""
    n = coeffs.shape[-1]
    k = max(1, (n - 1).bit_length())
    zp = []
    cur = z % FR
    for _ in range(k):
        zp.append(cur)
        cur = cur * cur % FR
    zpows = jnp.asarray(np.stack([spec.encode(v)[:, None] for v in zp]))
    return _quotient_jit(n)(coeffs, zpows)


# ----------------------------- NTT / cosets -----------------------------

def _use_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


# Four-step VMEM-resident NTT (poly/ntt4): ~3x the stage-wise throughput
# (12.1M vs 3.7M elems/s at 2^23 on a v5e) and O(#stages/4) dispatches.
# Validated bit-exact vs ntt_t on-chip at k=8/15/16/18 (scripts/ntt4_check).
_NTT4_MIN_K = 8


def _use_ntt4(k: int) -> bool:
    return (_use_pallas() and k >= _NTT4_MIN_K
            and os.environ.get("SPECTRE_NTT4", "1") != "0")


def _mesh_ntt(a, k: int, inverse: bool):
    """Route a single-column transform through the ICI-sharded four-step
    NTT when a prover mesh is installed (parallel/context). The sharded
    kernel is row-major (AoS); boundary transposes bridge the layouts —
    the one all_to_all dominates at sharding-worthy sizes."""
    from ..parallel import context as _pctx
    mesh = _pctx.prover_mesh()
    if mesh is None or k < _pctx.SHARD_NTT_MIN_K or a.ndim != 2:
        return None
    if (1 << k) % mesh.devices.size:
        return None
    from ..parallel import intt_sharded, ntt_sharded
    fn = intt_sharded if inverse else ntt_sharded
    return jnp.swapaxes(fn(jnp.swapaxes(a, -1, -2), k, mesh), -1, -2)


def ntt_dev(a, k: int):
    """Forward NTT of (NL, 2^k) Montgomery limbs (canonical output)."""
    from . import ntt_fast
    routed = _mesh_ntt(a, k, inverse=False)
    if routed is not None:
        return routed
    if _use_ntt4(k):
        from .ntt4 import ntt_t4
        return ntt_t4(a, k)
    if _use_pallas():
        return ntt_fast.ntt_t(a, k)
    return ntt_fast.ntt_t_xla(a, k)


def intt_dev(a, k: int):
    from . import ntt_fast
    routed = _mesh_ntt(a, k, inverse=True)
    if routed is not None:
        return routed
    if _use_ntt4(k):
        from .ntt4 import intt_t4
        return intt_t4(a, k)
    if _use_pallas():
        return ntt_fast.intt_t(a, k)
    return ntt_fast.intt_t_xla(a, k)


# batched transforms: chunk so one call touches <= 2^23 rows of limbs
_NTT_BATCH_ROWS = 1 << 23


def _batched_transform(cols, k, fn_many, fn_one):
    """Chunk a (C, NL, n) batch at ONE fixed width (zero-padding the tail)
    so exactly one vmapped program per k exists — tunnel compiles are
    minutes each, so program-shape count beats padding waste."""
    n = 1 << k
    C = cols.shape[0]
    if C == 1:
        return fn_one(cols[0])[None]
    step = max(1, _NTT_BATCH_ROWS // n)
    outs = []
    for off in range(0, C, step):
        blk = cols[off:off + step]
        take = blk.shape[0]
        # pad to the next power of two: <= log2(step) program shapes per k
        width = 1 << max(0, (take - 1).bit_length())
        width = min(width, step)
        if take < width:
            blk = jnp.concatenate(
                [blk, jnp.zeros((width - take,) + blk.shape[1:], blk.dtype)])
        out = fn_many(blk)
        sync_chunk(out, out.shape[-1])
        outs.append(out[:take] if take < width else out)
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def intt_dev_many(cols, k: int):
    """(C, NL, 2^k) -> batched coefficient forms, few device calls."""
    if _use_ntt4(k):
        from .ntt4 import intt_t4_many
        return _batched_transform(jnp.asarray(cols), k,
                                  lambda c: intt_t4_many(c, k),
                                  lambda c: intt_dev(c, k))
    from .ntt_fast import intt_many_t
    up = _use_pallas()
    return _batched_transform(jnp.asarray(cols), k,
                              lambda c: intt_many_t(c, k, up),
                              lambda c: intt_dev(c, k))


def ntt_dev_many(cols, k: int):
    if _use_ntt4(k):
        from .ntt4 import ntt_t4_many
        return _batched_transform(jnp.asarray(cols), k,
                                  lambda c: ntt_t4_many(c, k),
                                  lambda c: ntt_dev(c, k))
    from .ntt_fast import ntt_many_t
    up = _use_pallas()
    return _batched_transform(jnp.asarray(cols), k,
                              lambda c: ntt_many_t(c, k, up),
                              lambda c: ntt_dev(c, k))


@functools.lru_cache(maxsize=None)
def _pad_mul_many_jit(n: int, n_ext: int):
    @jax.jit
    def f(coeffs, sp):  # (C, NL, n), (NL, n)
        c = ops.mont_mul(coeffs, sp[None])
        return jnp.concatenate(
            [c, jnp.zeros((coeffs.shape[0], NL, n_ext - n), jnp.int32)],
            axis=-1)
    return f


def coset_ntt_many(coeffs_cols, ext_k: int, shift: int, out_dtype=None):
    """(C, NL, n) coefficient columns -> (C, NL, n_ext) coset evals.
    Column-chunked (the shift multiply's REDC temps cost ~400 B/row/col in
    HLO; one whole-stack pass OOMs the compile at k=18 x 200 columns);
    chunks padded to a power of two to bound program shapes.

    Accepts int16 input (canonical 11-bit limbs at rest — the quotient's
    big-k storage format); out_dtype=jnp.int16 stores the result compactly
    too (outputs are canonical, max 2047)."""
    coeffs_cols = jnp.asarray(coeffs_cols)
    C, n = coeffs_cols.shape[0], coeffs_cols.shape[-1]
    n_ext = 1 << ext_k
    sp = _shift_pows(n, shift)
    step = col_chunk(max(n_ext, n))
    outs = []
    for off in range(0, C, step):
        blk = coeffs_cols[off:off + step]
        if blk.dtype != jnp.int32:
            blk = blk.astype(jnp.int32)
        take = blk.shape[0]
        width = 1 << max(0, (take - 1).bit_length())
        if take < width:
            blk = jnp.concatenate(
                [blk, jnp.zeros((width - take, NL, n), jnp.int32)])
        padded = _pad_mul_many_jit(n, n_ext)(blk, sp)
        out = ntt_dev_many(padded, ext_k)
        if take < width:
            out = out[:take]
        if out_dtype is not None and out.dtype != out_dtype:
            out = out.astype(out_dtype)
        outs.append(out)
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


@functools.lru_cache(maxsize=None)
def _update_cols_jit(ndim: int):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def f(stack, part, off):
        return jax.lax.dynamic_update_slice(
            stack, part, (off,) + (0,) * (ndim - 1))
    return f


def coset_ntt_many_hosted(coeffs_host, ext_k: int, shift: int,
                          out_dtype=None):
    """coset_ntt_many reading a HOST (numpy) coefficient stack: chunks
    upload from host RAM and land in a preallocated device output via
    DONATED in-place dynamic updates. Device residency = the output stack
    + one chunk of transients — neither the input stack nor the
    chunk-concat copy that coset_ntt_many's device path materializes
    (at step k=17 those two were ~7.6 GiB on top of the output; OOM #9)."""
    import numpy as _np
    C, n = coeffs_host.shape[0], coeffs_host.shape[-1]
    n_ext = 1 << ext_k
    dt = out_dtype or jnp.int32
    sp = _shift_pows(n, shift)
    step = col_chunk(max(n_ext, n))
    out = jnp.zeros((C, NL, n_ext), dt)
    for off in range(0, C, step):
        blk = jnp.asarray(
            _np.ascontiguousarray(coeffs_host[off:off + step],
                                  dtype=_np.int32))
        take = blk.shape[0]
        width = 1 << max(0, (take - 1).bit_length())
        if take < width:
            blk = jnp.concatenate(
                [blk, jnp.zeros((width - take, NL, n), jnp.int32)])
        part = ntt_dev_many(_pad_mul_many_jit(n, n_ext)(blk, sp), ext_k)
        if take < width:
            part = part[:take]
        out = _update_cols_jit(out.ndim)(out, part.astype(dt), off)
    return out


@functools.lru_cache(maxsize=None)
def _shift_pows(n: int, shift: int):
    """Device powers of a coset shift (held resident per domain)."""
    return jax.device_put(powers(shift, n))


@functools.lru_cache(maxsize=None)
def _pad_mul_jit(n: int, n_ext: int):
    @jax.jit
    def f(coeffs, sp):
        c = ops.mont_mul(coeffs, sp)
        return jnp.concatenate(
            [c, jnp.zeros((NL, n_ext - n), jnp.int32)], axis=-1)
    return f


def coset_ntt(coeffs, ext_k: int, shift: int):
    """Evaluate a degree-<n polynomial on the coset shift * W_ext^i."""
    n = coeffs.shape[-1]
    n_ext = 1 << ext_k
    sp = _shift_pows(n, shift)
    padded = _pad_mul_jit(n, n_ext)(coeffs, sp)
    return ntt_dev(padded, ext_k)


def coset_intt(evals, ext_k: int, shift: int):
    """Coset evals -> coefficient vector (length n_ext)."""
    c = intt_dev(evals, ext_k)
    sp = _shift_pows(1 << ext_k, inv_mod(shift, FR))
    return _mul_jit()(c, sp)


@functools.lru_cache(maxsize=None)
def _subcoset_recombine_jit(f: int, n: int):
    @jax.jit
    def fn(g, sinv_pows, d):
        # g (f, NL, n) per-sub-coset INTTs; sinv_pows (f, NL, n) powers of
        # s_j^{-1}; d (f, f, NL, 1) the inverse f-point DFT matrix with
        # 1/f and shift^{-tn} folded in
        h = ops.mont_mul(g, sinv_pows)
        outs = []
        for t_ in range(f):
            acc = None
            for j in range(f):
                term = ops.mont_mul(h[j], d[j, t_])
                acc = term if acc is None else ops.add(acc, term)
            outs.append(ops.fold(acc))
        return jnp.stack(outs)
    return fn


def coset_intt_pieces(sub_evals, k: int, ext_k: int, shift: int):
    """Inverse of f = 2^(ext_k-k) per-sub-coset coset NTTs, directly as
    coefficient BLOCKS: piece t = coeffs[t*n:(t+1)*n] of the degree-<fn
    polynomial whose sub-coset-j evals (on shift*w_ext^j*<w_n>) are
    sub_evals[j]. Equivalent to interleave + coset_intt(2^ext_k) +
    block-split, but every program stays at size n:

      intt_n(E_j)[r] = s_j^r * sum_t a_{tn+r} (s_j^n)^t, and s_j^n =
      shift^n * W^j with W = w_ext^n of order f — so after the s_j^{-r}
      scale, recovering a_{tn+r} is an f-point inverse DFT across j.

    Replaces the prover's h-assembly 2^ext_k INTT whose fresh program +
    twiddle constants OOM'd the 512-key k=18 prove on a chip already
    holding the coefficient stack (r5 OOM #8)."""
    from .domain import root_of_unity
    sub = jnp.stack([jnp.asarray(e) for e in sub_evals])
    f, n = sub.shape[0], sub.shape[-1]
    assert f == 1 << (ext_k - k) and n == 1 << k
    g = intt_dev_many(sub, k)
    w_ext = root_of_unity(ext_k)
    sinv = jnp.stack([
        _shift_pows(n, inv_mod(shift * pow(w_ext, j, FR) % FR, FR))
        for j in range(f)])
    W_inv = inv_mod(pow(w_ext, n, FR), FR)
    f_inv = inv_mod(f, FR)
    shn_inv = pow(inv_mod(shift, FR), n, FR)
    d = np.stack([[
        spec.encode(pow(W_inv, j * t, FR) * f_inv % FR
                    * pow(shn_inv, t, FR) % FR)[:, None]
        for t in range(f)] for j in range(f)])
    return _subcoset_recombine_jit(f, n)(g, sinv, jnp.asarray(d))
