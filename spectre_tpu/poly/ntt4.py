"""Four-step NTT with VMEM-resident sub-transforms (the fast path).

The stage-at-a-time NTT (ntt_fast.ntt_t) traverses HBM ~5 times per stage —
at 2^23 that is ~115 array passes and measured 2.25 s on a v5e. This module
restructures the transform so ~all butterflies happen on VMEM-resident
blocks:

  n = n_out · 2^15, natural index j = j_out·n_in + j_in.
  X[k1 + n_out·k2] = NTT_{n_in} over j_in [ ω^{j_in·k1} ·
                        NTT_{n_out} over j_out x[j_out·n_in + j_in] ]

  * pass 1 (only when k > 15): blocks (NL, n_out, 128 lanes of j_in);
    DIF butterflies along the sublane axis (the strided digit is contiguous
    inside a block — no transpose, the classic four-step transpose is
    absorbed by the 2D block shape), with the ω^{j_in·k1} coupling fused as
    two small-table Montgomery multiplies (j_in = 128·g + b factorization).
  * pass 2: one block per k1-row: (NL, 256, 128) = a full 2^15-point
    sub-NTT in VMEM (itself a 256×128 four-step with an in-VMEM coupling
    table), DIF along sublanes then lanes.
  * one final XLA gather un-reverses all DIF digit orders and interleaves
    k = k1 + n_out·k2 (plus the 1/n scale + canon for the inverse).

Every butterfly stage is ONE fused multiply on constant-shape blocks:
  d = where(p<h, x + roll(x,-h), roll(x,+h) - x + 2p);  x' = tw_full ⊙ d
where tw_full holds w^{p-h} on the odd half and 1 on the even half — the
uniform multiply keeps amplitudes < 2p at every stage (no carry growth) and
avoids shape-changing Stockham reindexing that Mosaic tiles badly.

DIF digit order: for natural input, stage cascade m = M..2 leaves
coefficient k at position rev_M(k); all reorders compose into the final
gather's index vector. Host reference `_ntt_host_factored` pins the exact
digit algebra; kernels are validated against poly.ntt on CPU (interpret
mode) and bit-exact on TPU.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import limb as L
from ..fields.params import BN254_FR as FR
from ..fields.host import inv_mod
from .domain import root_of_unity

spec = L.fr_spec
NL = spec.n_limbs

SB_BITS = 7            # lane digit of the sub-transform (128 lanes)
KIN = 15               # sub-transform size: fits (NL, 256, 128) in VMEM
SA_MAX = KIN - SB_BITS


def _rev(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


# --------------------------- host reference ---------------------------
# Pure-int mirror of the kernel pipeline (same DIF stages, same digit
# orders); pins the twiddle algebra for the kernels and the final gather.

def _dif_host(vals, w):
    """In-place DIF cascade: natural input -> rev-indexed output."""
    M = len(vals)
    m = M
    while m >= 2:
        h = m // 2
        wm = pow(w, M // m, FR)
        for blk in range(0, M, m):
            for p in range(h):
                a = vals[blk + p]
                b = vals[blk + p + h]
                vals[blk + p] = (a + b) % FR
                vals[blk + p + h] = (a - b) * pow(wm, p, FR) % FR
        m = h
    return vals


def ntt_host_factored(x, k: int):
    """Reference: the exact factored pipeline on python ints."""
    n = 1 << k
    assert len(x) == n
    w = root_of_unity(k)
    k_out = max(0, k - KIN)
    n_out = 1 << k_out
    k_in = k - k_out
    n_in = 1 << k_in
    ka = k_in - SB_BITS if k_in > SB_BITS else 0
    sa, sb = 1 << ka, 1 << (k_in - ka)
    w_in = pow(w, n_out, FR)           # root of the inner size-n_in domain

    cols = [[x[j1 * n_in + j2] for j1 in range(n_out)] for j2 in range(n_in)]
    # pass 1: DIF over j_out per j_in + coupling twiddle w^{j_in * rev(i1)}
    if k_out:
        w_out = pow(w, n_in, FR)
        for j2 in range(n_in):
            _dif_host(cols[j2], w_out)
            for i1 in range(n_out):
                k1 = _rev(i1, k_out)
                cols[j2][i1] = cols[j2][i1] * pow(w, j2 * k1, FR) % FR
    # pass 2: size-n_in sub-NTT per i1 row (ra on "sublanes", rb on "lanes")
    out_pos = [[0] * n_in for _ in range(n_out)]
    for i1 in range(n_out):
        row = [cols[j2][i1] for j2 in range(n_in)]
        # view r = ra*sb + rb; DIF over ra per rb
        grid = [[row[ra * sb + rb] for ra in range(sa)] for rb in range(sb)]
        w_a = pow(w_in, sb, FR)
        for rb in range(sb):
            if sa > 1:
                _dif_host(grid[rb], w_a)
            for ia in range(sa):
                ca = _rev(ia, ka)
                grid[rb][ia] = grid[rb][ia] * pow(w_in, rb * ca, FR) % FR
        # DIF over rb per ia
        for ia in range(sa):
            lane = [grid[rb][ia] for rb in range(sb)]
            _dif_host(lane, pow(w_in, sa, FR))
            for ib in range(sb):
                out_pos[i1][ia * sb + ib] = lane[ib]
    # final reorder: X[k1 + n_out*k2], k1 = rev(i1), k2 = rev_a(ia)+sa*rev_b(ib)
    X = [0] * n
    for i1 in range(n_out):
        k1 = _rev(i1, k_out)
        for ia in range(sa):
            for ib in range(sb):
                k2 = _rev(ia, ka) + sa * _rev(ib, k_in - ka)
                X[k1 + n_out * k2] = out_pos[i1][ia * sb + ib]
    return X


def ntt_host_direct(x, k: int, w=None):
    """O(n log n) oracle (recursive CT) on ints, natural in/out."""
    n = 1 << k
    if w is None:
        w = root_of_unity(k)
    if n == 1:
        return list(x)
    w2 = w * w % FR
    E = ntt_host_direct(x[::2], k - 1, w2)
    O = ntt_host_direct(x[1::2], k - 1, w2)
    X = [0] * n
    t = 1
    for i in range(n // 2):
        X[i] = (E[i] + t * O[i]) % FR
        X[i + n // 2] = (E[i] - t * O[i]) % FR
        t = t * w % FR
    return X


# --------------------------- kernel helpers ---------------------------

def _mont_mul_nd(sp: L.FieldSpec, a, b):
    """Schoolbook + REDC with limbs on axis 0, any trailing dims.
    Inputs amplitude < ~16p; output < 2p."""
    n = sp.n_limbs
    mask = sp.B - 1
    sh = sp.limb_bits
    n0inv = jnp.int32(sp.n0inv)
    trail = max(a.ndim, b.ndim) - 1
    zpad = [(0, 0)] * trail

    t = None
    for i in range(n):
        part = a[i:i + 1] * b
        part = jnp.pad(part, [(i, n + 1 - i)] + zpad)
        t = part if t is None else t + part

    p_list = [int(x) for x in sp.p_limbs]
    p0 = p_list[0]
    c = jnp.zeros_like(t[0:1])
    for i in range(n):
        v = t[i:i + 1] + c
        m = (v & mask) * n0inv & mask
        contrib = jnp.concatenate([m * pj for pj in p_list], axis=0)
        t = t + jnp.pad(contrib, [(i, n + 1 - i)] + zpad)
        c = (v + m * p0) >> sh
    r = t[n:2 * n]
    r = jnp.concatenate([r[:1] + c, r[1:]], axis=0)
    for _ in range(2):
        cr = r >> sh
        r = (r & mask) + jnp.pad(cr[:-1], [(1, 0)] + zpad)
    return r


def _roll_axis(x, shift: int, axis: int):
    """Static circular shift via slice+concat: result[i] = x[(i - shift) % M]
    (jnp.roll convention)."""
    M = x.shape[axis]
    s = (-shift) % M
    if s == 0:
        return x
    idx_a = [slice(None)] * x.ndim
    idx_b = [slice(None)] * x.ndim
    idx_a[axis] = slice(s, None)
    idx_b[axis] = slice(0, s)
    return jnp.concatenate([x[tuple(idx_a)], x[tuple(idx_b)]], axis=axis)


def _dif_stages(sp: L.FieldSpec, x, tw_refs, axis: int, m0: int = None):
    """DIF cascade along `axis` of x using per-stage full-M twiddle rows.

    tw_refs: list over stages (m = m0, m0/2, ...; one per ref) of arrays
    broadcastable to x's shape, holding w_m^{p-h} at odd positions
    (p = i mod m >= h) and Montgomery 1 at even positions. m0 defaults to
    the axis size (a full cascade down to m=2); pass a smaller m0 to run a
    chunk of a cascade split across kernels. Input amplitude < 2p,
    output < 2p.
    """
    axis = axis % x.ndim
    M = x.shape[axis]
    twop = [int(v) for v in L.int_to_limbs(2 * sp.p, sp.limb_bits,
                                           sp.n_limbs)]
    mask = sp.B - 1
    sh = sp.limb_bits
    trail = x.ndim - 1
    zpad = [(0, 0)] * trail

    pos_shape = [1] * x.ndim
    pos_shape[axis] = M
    pos = jax.lax.broadcasted_iota(jnp.int32, tuple(pos_shape), axis)

    m = M if m0 is None else m0
    si = 0
    while si < len(tw_refs):
        h = m // 2
        is_even = (pos & (m - 1)) < h
        lo = x + _roll_axis(x, -h, axis)             # amplitude < 4p
        d = _roll_axis(x, h, axis) - x
        d = jnp.concatenate(
            [d[j:j + 1] + twop[j] for j in range(sp.n_limbs)], axis=0)
        hi = d                                        # amplitude < 4p
        v = jnp.where(is_even, lo, hi)
        for _ in range(1):
            cr = v >> sh
            v = (v & mask) + jnp.pad(cr[:-1], [(1, 0)] + zpad)
        x = _mont_mul_nd(sp, tw_refs[si], v)          # < 2p
        m = h
        si += 1
    return x


def _stage_tw_rows(M: int, w: int, inverse: bool) -> np.ndarray:
    """(n_stages, NL, M) Montgomery twiddle rows for _dif_stages."""
    if inverse:
        w = inv_mod(w, FR)
    rows = []
    m = M
    while m >= 2:
        h = m // 2
        wm = pow(w, M // m, FR)
        vals = []
        for i in range(M):
            p = i & (m - 1)
            vals.append(pow(wm, p - h, FR) if p >= h else 1)
        rows.append(np.stack([spec.encode(v) for v in vals], axis=-1))
        m = h
    return np.stack(rows)  # (log2 M, NL, M)


# --------------------------- pass kernels ---------------------------

def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# v5e has 128 MiB VMEM; the default 16 MiB scoped limit rejects the
# (NL, 256, 128) pass-2 working set (~36 MiB live across stages).
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# Stages fused per Pallas kernel. One monolithic kernel per pass (15+
# mont-mul stages) sends Mosaic compile time superlinear (25+ min at
# k=15 through the tunnel); groups of ~4 keep each program small (~2 min)
# at the cost of one extra HBM round trip per group.
GROUP = int(os.environ.get("SPECTRE_NTT4_GROUP", "4"))


def _chunks(n_st: int):
    return [(lo, min(lo + GROUP, n_st)) for lo in range(0, n_st, GROUP)]


@functools.lru_cache(maxsize=None)
def _pass1_call(k: int, inverse: bool):
    """Blocks (NL, n_out, 128): DIF along sublanes + fused coupling,
    chunked GROUP stages per kernel."""
    k_out = k - KIN
    n_out = 1 << k_out
    n_in = 1 << KIN
    n_grid = n_in // 128
    w = root_of_unity(k)
    if inverse:
        w = inv_mod(w, FR)

    tw = _stage_tw_rows(n_out, root_of_unity(k_out) if not inverse
                        else root_of_unity(k_out), inverse)
    tw = tw[:, :, :, None]                        # (st, NL, n_out, 1)
    # coupling w^{j_in * rev(i1)}; j_in = 128 g + b
    A = np.zeros((NL, n_out, 128), np.int32)      # w^{b * rev(i1)}
    B = np.zeros((n_grid, NL, n_out), np.int32)   # (w^128)^{g * rev(i1)}
    w128 = pow(w, 128, FR)
    for i1 in range(n_out):
        k1 = _rev(i1, k_out)
        wb = pow(w, k1, FR)
        cur = 1
        for b in range(128):
            A[:, i1, b] = spec.encode(cur)
            cur = cur * wb % FR
        wg = pow(w128, k1, FR)
        cur = 1
        for g in range(n_grid):
            B[g, :, i1] = spec.encode(cur)
            cur = cur * wg % FR

    n_st = tw.shape[0]

    bs_x = pl.BlockSpec((NL, n_out, 128), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    bs_a = pl.BlockSpec((NL, n_out, 128), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    bs_b = pl.BlockSpec((1, NL, n_out), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bs_tw = pl.BlockSpec((1, NL, n_out, 1), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = None  # set in run (closes over shape)

    def make_chunk(lo: int, hi: int, couple: bool):
        n_tw = hi - lo

        def kernel(*refs):
            x_ref = refs[0]
            pos = 1
            if couple:
                a_ref = refs[pos]
                b_ref = refs[pos + 1]
                pos += 2
            tw_refs = [refs[pos + i][0] for i in range(n_tw)]
            out_ref = refs[pos + n_tw]
            x = x_ref[...]
            if n_tw:
                x = _dif_stages(spec, x, tw_refs, axis=1, m0=n_out >> lo)
            if couple:
                x = _mont_mul_nd(spec, a_ref[...], x)
                bcol = b_ref[0][:, :, None]       # (NL, n_out, 1)
                x = _mont_mul_nd(spec, bcol, x)
            out_ref[...] = x

        in_specs = [bs_x] + ([bs_a, bs_b] if couple else []) + \
            [bs_tw] * n_tw
        args_const = ([jnp.asarray(A), jnp.asarray(B)] if couple else []) + \
            [jnp.asarray(tw[i:i + 1]) for i in range(lo, hi)]

        def call(x):
            return pl.pallas_call(
                kernel,
                grid=(n_grid,),
                in_specs=in_specs,
                out_specs=bs_x,
                out_shape=jax.ShapeDtypeStruct((NL, n_out, n_in), jnp.int32),
                interpret=_interpret(),
                compiler_params=_CPARAMS,
            )(x, *args_const)

        return call

    chunks = _chunks(n_st)
    calls = [make_chunk(lo, hi, couple=(hi == n_st))
             for lo, hi in chunks] if chunks else [make_chunk(0, 0, True)]

    def run(x):   # x (NL, n_out, n_in)
        for call in calls:
            x = call(x)
        return x

    return run


@functools.lru_cache(maxsize=None)
def _pass2_call(k: int, inverse: bool, scale: bool):
    """Blocks (NL, 1, sa, sb): full size-2^k_in sub-NTT in VMEM."""
    k_out = max(0, k - KIN)
    n_out = 1 << k_out
    k_in = k - k_out
    ka = k_in - SB_BITS if k_in > SB_BITS else 0
    kb = k_in - ka
    sa, sb = 1 << ka, 1 << kb
    w_all = root_of_unity(k)
    if inverse:
        w_all = inv_mod(w_all, FR)
    w_in = pow(w_all, n_out, FR)

    tws_a = (_stage_tw_rows(sa, pow(root_of_unity(k_in), sb, FR), inverse)
             if ka else None)
    if tws_a is not None:
        tws_a = tws_a[:, None, :, :, None].transpose(0, 2, 1, 3, 4)
        # shape (st, NL, 1, sa, 1)
    tws_b = _stage_tw_rows(sb, pow(root_of_unity(k_in), sa, FR), inverse)
    tws_b = tws_b[:, :, None, None, :]            # (st, NL, 1, 1, sb)

    # mid coupling w_in^{rb * rev_a(ca)} as (NL, 1, sa, sb)
    MID = np.zeros((NL, 1, sa, sb), np.int32)
    for ia in range(sa):
        ca = _rev(ia, ka)
        base = pow(w_in, ca, FR)
        cur = 1
        for rb in range(sb):
            MID[:, 0, ia, rb] = spec.encode(cur)
            cur = cur * base % FR

    n_inv_limbs = [int(v) for v in spec.encode(inv_mod(1 << k, FR))]

    n_sta = tws_a.shape[0] if tws_a is not None else 0
    n_stb = tws_b.shape[0]

    bs_x = pl.BlockSpec((NL, 1, sa, sb), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    bs_mid = pl.BlockSpec((NL, 1, sa, sb), lambda i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    bs_ta = pl.BlockSpec((1, NL, 1, sa, 1), lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bs_tb = pl.BlockSpec((1, NL, 1, 1, sb), lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    def make_chunk(kind: str, lo: int, hi: int, mid: bool, do_scale: bool):
        """One kernel: DIF stages [lo, hi) along the kind axis, with the
        mid-coupling multiply (after a-stages / before b-stages) and the
        1/n scale optionally fused in."""
        n_tw = hi - lo
        axis = 2 if kind == "a" else 3
        m0 = (sa if kind == "a" else sb) >> lo

        def kernel(*refs):
            pos = 0
            x_ref = refs[pos]
            pos += 1
            mid_ref = None
            if mid:
                mid_ref = refs[pos]
                pos += 1
            tw_refs = [refs[pos + i][0] for i in range(n_tw)]
            pos += n_tw
            out_ref = refs[pos]
            x = x_ref[...]                        # (NL, 1, sa, sb)
            if kind == "a" and n_tw:
                x = _dif_stages(spec, x, tw_refs, axis=axis, m0=m0)
            if mid:
                x = _mont_mul_nd(spec, mid_ref[...], x)
            if kind == "b" and n_tw:
                x = _dif_stages(spec, x, tw_refs, axis=axis, m0=m0)
            if do_scale:
                ninv = jnp.concatenate(
                    [jnp.full_like(x[:1], v) for v in n_inv_limbs], axis=0)
                x = _mont_mul_nd(spec, ninv, x)
            out_ref[...] = x

        tws = tws_a if kind == "a" else tws_b
        in_specs = [bs_x] + ([bs_mid] if mid else []) + \
            [bs_ta if kind == "a" else bs_tb] * n_tw
        args_const = ([jnp.asarray(MID)] if mid else []) + \
            [jnp.asarray(tws[i:i + 1]) for i in range(lo, hi)]

        def call(x):
            return pl.pallas_call(
                kernel,
                grid=(n_out,),
                in_specs=in_specs,
                out_specs=bs_x,
                out_shape=jax.ShapeDtypeStruct((NL, n_out, sa, sb),
                                               jnp.int32),
                interpret=_interpret(),
                compiler_params=_CPARAMS,
            )(x, *args_const)

        return call

    plan = []
    a_chunks = _chunks(n_sta)
    for j, (lo, hi) in enumerate(a_chunks):
        plan.append(("a", lo, hi, hi == n_sta, False))
    if not a_chunks:
        plan.append(("a", 0, 0, True, False))      # mid-only kernel
    b_chunks = _chunks(n_stb)
    for j, (lo, hi) in enumerate(b_chunks):
        plan.append(("b", lo, hi, False, scale and hi == n_stb))
    calls = [make_chunk(*c) for c in plan]

    def run(x):   # x (NL, n_out, sa, sb)
        for call in calls:
            x = call(x)
        return x

    return run


@functools.lru_cache(maxsize=None)
def _final_idx(k: int) -> np.ndarray:
    """Gather index: out[k] = y_flat[idx[k]] over the (i1, ia, ib) layout."""
    k_out = max(0, k - KIN)
    n_out = 1 << k_out
    k_in = k - k_out
    ka = k_in - SB_BITS if k_in > SB_BITS else 0
    kb = k_in - ka
    sa, sb = 1 << ka, 1 << kb
    n = 1 << k
    idx = np.empty(n, np.int32)
    for kk in range(n):
        k1 = kk & (n_out - 1)
        k2 = kk >> k_out
        i1 = _rev(k1, k_out)
        ia = _rev(k2 & (sa - 1), ka)
        ib = _rev(k2 >> ka, kb)
        idx[kk] = (i1 * sa + ia) * sb + ib
    return idx


@functools.lru_cache(maxsize=None)
def _ntt4_jit(k: int, inverse: bool):
    k_out = max(0, k - KIN)
    n_out = 1 << k_out
    k_in = k - k_out
    ka = k_in - SB_BITS if k_in > SB_BITS else 0
    sa, sb = 1 << ka, 1 << (k_in - ka)
    p1 = _pass1_call(k, inverse) if k_out else None
    p2 = _pass2_call(k, inverse, scale=inverse)
    from ..fields.limb_t import make_ops_t
    ops_t = make_ops_t(spec.name)

    @jax.jit
    def f(a_t, idx):
        x = a_t.reshape(NL, n_out, 1 << k_in)
        if p1 is not None:
            x = p1(x)
        x = p2(x.reshape(NL, n_out, sa, sb))
        y = x.reshape(NL, 1 << k)
        y = jnp.take(y, idx, axis=-1)
        return ops_t.canon(y, 2)

    state = {}

    def wrapper(a_t):
        if "idx" not in state:
            state["idx"] = jax.device_put(_final_idx(k))
        return f(a_t, state["idx"])

    return wrapper


def ntt_t4(a_t, k: int):
    """Forward NTT on transposed (NL, 2^k) Montgomery limbs (natural order,
    canonical output). Requires k >= 8."""
    return _ntt4_jit(k, False)(a_t)


def intt_t4(a_t, k: int):
    """Inverse NTT with 1/n scaling."""
    return _ntt4_jit(k, True)(a_t)


@functools.lru_cache(maxsize=None)
def _ntt4_many_jit(k: int, inverse: bool):
    """Batched pipeline: vmap over a leading column axis (one extra grid
    dimension per pallas kernel — still one dispatch per chunk)."""
    k_out = max(0, k - KIN)
    n_out = 1 << k_out
    k_in = k - k_out
    ka = k_in - SB_BITS if k_in > SB_BITS else 0
    sa, sb = 1 << ka, 1 << (k_in - ka)
    p1 = _pass1_call(k, inverse) if k_out else None
    p2 = _pass2_call(k, inverse, scale=inverse)
    from ..fields.limb_t import make_ops_t
    ops_t = make_ops_t(spec.name)

    def one(a_t, idx):
        x = a_t.reshape(NL, n_out, 1 << k_in)
        if p1 is not None:
            x = p1(x)
        x = p2(x.reshape(NL, n_out, sa, sb))
        y = x.reshape(NL, 1 << k)
        y = jnp.take(y, idx, axis=-1)
        return ops_t.canon(y, 2)

    f = jax.jit(jax.vmap(one, in_axes=(0, None)))
    state = {}

    def wrapper(a_t):   # (C, NL, 2^k)
        if "idx" not in state:
            state["idx"] = jax.device_put(_final_idx(k))
        return f(a_t, state["idx"])

    return wrapper


def ntt_t4_many(a_t, k: int):
    """(C, NL, 2^k) batched forward NTT."""
    return _ntt4_many_jit(k, False)(a_t)


def intt_t4_many(a_t, k: int):
    """(C, NL, 2^k) batched inverse NTT with 1/n scaling."""
    return _ntt4_many_jit(k, True)(a_t)
