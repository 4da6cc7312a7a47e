"""Pallas TPU kernels for limb-field arithmetic (the hot path).

Layout: *transposed* limb tensors (n_limbs, batch) — limbs ride the sublane
dimension, the batch rides the 128-wide lane dimension, so every row op uses
full lanes. The fused butterfly kernel performs
    t  = mont_mul(tw, odd)
    lo = relax(even + t)
    hi = relax(even + 2p - t)
entirely in VMEM: one read of each operand block and one write of each
output block per stage — the XLA whole-array formulation materializes every
REDC iteration to HBM (~100 MB per step at 2^20), which measured ~10x
slower than compute on a v5e.

Kernels run in interpret mode off-TPU so the same path is testable on the
CPU mesh.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limb as L


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _lane_tiles(T: int, N: int):
    """(Tb, Np): lane-tile width and padded width for arbitrary N >= 1.

    Callers arrive with whatever slice lengths lax.associative_scan's
    recursion produces (odd halves, length-0 tails at num_elems=2), so the
    kernels cannot assume N % T == 0. TPU lanes are 128-wide: round N up to
    a multiple of 128; one block if that fits in T, else pad to a multiple
    of T."""
    Np = -(-N // 128) * 128
    if Np <= T:
        return Np, Np
    return T, -(-N // T) * T


def _pad_lanes(arrs, Np: int):
    return tuple(
        a if a.shape[-1] == Np else
        jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, Np - a.shape[-1]),))
        for a in arrs)


def _mont_mul_rows(spec: L.FieldSpec, a, b):
    """Schoolbook + REDC on (n_limbs, T) register values inside a kernel."""
    n = spec.n_limbs
    mask = spec.B - 1
    sh = spec.limb_bits
    n0inv = jnp.int32(spec.n0inv)
    T = a.shape[-1]

    # schoolbook into 2n+1 rows via shifted pads
    t = jnp.zeros((2 * n + 1, T), jnp.int32)
    for i in range(n):
        part = a[i:i + 1, :] * b  # (n, T)
        t = t + jnp.pad(part, ((i, n + 1 - i), (0, 0)))

    # REDC (modulus limbs enter as python-int scalars — pallas kernels may
    # not capture array constants)
    p_list = [int(x) for x in spec.p_limbs]
    p0 = p_list[0]
    c = jnp.zeros((1, T), jnp.int32)
    for i in range(n):
        v = t[i:i + 1, :] + c
        m = (v & mask) * n0inv & mask
        contrib = jnp.concatenate([m * pj for pj in p_list], axis=0)
        t = t + jnp.pad(contrib, ((i, n + 1 - i), (0, 0)))
        c = (v + m * p0) >> sh
    r = t[n:2 * n]
    r = jnp.concatenate([r[:1] + c, r[1:]], axis=0)
    # relax 2 passes
    for _ in range(2):
        cr = r >> sh
        r = (r & mask) + jnp.pad(cr[:-1], ((1, 0), (0, 0)))
    return r


@functools.lru_cache(maxsize=None)
def butterfly_kernel(spec_name: str, T: int = 512):
    """(tw, odd, even) (n, N) blocks -> (lo, hi); N multiple of T."""
    spec = {s.name: s for s in
            (L.fr_spec, L.fq_spec, L.bls_fq_spec, L.bls_fr_spec)}[spec_name]
    n = spec.n_limbs
    mask = spec.B - 1
    sh = spec.limb_bits
    twop = [int(x) for x in L.int_to_limbs(2 * spec.p, spec.limb_bits, n)]

    def kernel(tw_ref, odd_ref, even_ref, lo_ref, hi_ref):
        t = _mont_mul_rows(spec, tw_ref[...], odd_ref[...])
        even = even_ref[...]
        lo = even + t
        cr = lo >> sh
        lo = (lo & mask) + jnp.pad(cr[:-1], ((1, 0), (0, 0)))
        d = even - t
        hi = jnp.concatenate([d[j:j + 1] + twop[j] for j in range(n)], axis=0)
        for _ in range(2):
            cr = hi >> sh
            hi = (hi & mask) + jnp.pad(cr[:-1], ((1, 0), (0, 0)))
        lo_ref[...] = lo
        hi_ref[...] = hi

    @jax.jit
    def run(tw, odd, even):
        N = tw.shape[-1]
        if N == 0:
            return odd, even
        Tb, Np = _lane_tiles(T, N)
        args = _pad_lanes((tw, odd, even), Np)
        grid = (Np // Tb,)
        bs = pl.BlockSpec((n, Tb), lambda i: (0, i), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs, bs, bs],
            out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((n, Np), jnp.int32)] * 2,
            interpret=_interpret(),
        )(*args)
        if Np != N:
            out = [o[..., :N] for o in out]
        return tuple(out)

    return run


@functools.lru_cache(maxsize=None)
def padd_kernel(spec_name: str, b: int, T: int = 256):
    """Fused RCB complete addition on transposed (n, N) coordinate blocks.

    (X1,Y1,Z1,X2,Y2,Z2) -> (X3,Y3,Z3); 12 mont-muls + 2 b3-muls + adds all
    in VMEM. Used by MSM tree reductions where the XLA formulation spills
    every intermediate to HBM.
    """
    spec = {s.name: s for s in
            (L.fr_spec, L.fq_spec, L.bls_fq_spec, L.bls_fr_spec)}[spec_name]
    n = spec.n_limbs
    mask = spec.B - 1
    sh = spec.limb_bits
    b3_limbs = [int(x) for x in spec.encode(3 * b)]
    eightp = [int(x) for x in L.int_to_limbs(8 * spec.p, spec.limb_bits, n)]

    def relax(x, passes=1):
        for _ in range(passes):
            cr = x >> sh
            x = (x & mask) + jnp.pad(cr[:-1], ((1, 0), (0, 0)))
        return x

    def add(a, b):
        return relax(a + b, 1)

    def sub(a, b):
        # a - b + 8p, signed-safe relax
        d = a - b
        d = jnp.concatenate([d[j:j + 1] + eightp[j] for j in range(n)], axis=0)
        return relax(d, 2)

    def mulc_b3(a):
        b3a = jnp.concatenate([jnp.full_like(a[:1], v) for v in b3_limbs],
                              axis=0)
        return _mont_mul_rows(spec, a, b3a)

    def mul(a, b):
        return _mont_mul_rows(spec, a, b)

    def kernel(x1r, y1r, z1r, x2r, y2r, z2r, x3r, y3r, z3r):
        X1, Y1, Z1 = x1r[...], y1r[...], z1r[...]
        X2, Y2, Z2 = x2r[...], y2r[...], z2r[...]
        t0 = mul(X1, X2)
        t1 = mul(Y1, Y2)
        t2 = mul(Z1, Z2)
        t3 = mul(add(X1, Y1), add(X2, Y2))
        t3 = sub(t3, add(t0, t1))
        t4 = mul(add(Y1, Z1), add(Y2, Z2))
        t4 = sub(t4, add(t1, t2))
        X3 = mul(add(X1, Z1), add(X2, Z2))
        Y3 = sub(X3, add(t0, t2))
        X3 = add(add(t0, t0), t0)
        t2 = mulc_b3(t2)
        Z3 = add(t1, t2)
        t1 = sub(t1, t2)
        Y3 = mulc_b3(Y3)
        x3r[...] = sub(mul(t3, t1), mul(t4, Y3))
        y3r[...] = add(mul(Y3, X3), mul(t1, Z3))
        z3r[...] = add(mul(Z3, t4), mul(X3, t3))

    @jax.jit
    def run(X1, Y1, Z1, X2, Y2, Z2):
        N = X1.shape[-1]
        if N == 0:
            return X1, Y1, Z1
        Tb, Np = _lane_tiles(T, N)
        args = _pad_lanes((X1, Y1, Z1, X2, Y2, Z2), Np)
        grid = (Np // Tb,)
        bs = pl.BlockSpec((n, Tb), lambda i: (0, i), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs] * 6,
            out_specs=[bs] * 3,
            out_shape=[jax.ShapeDtypeStruct((n, Np), jnp.int32)] * 3,
            interpret=_interpret(),
        )(*args)
        if Np != N:
            out = [o[..., :N] for o in out]
        return tuple(out)

    return run


@functools.lru_cache(maxsize=None)
def mont_mul_kernel(spec_name: str, T: int = 512):
    """Plain fused mont_mul on transposed (n, N) blocks."""
    spec = {s.name: s for s in
            (L.fr_spec, L.fq_spec, L.bls_fq_spec, L.bls_fr_spec)}[spec_name]
    n = spec.n_limbs

    def kernel(a_ref, b_ref, out_ref):
        out_ref[...] = _mont_mul_rows(spec, a_ref[...], b_ref[...])

    @jax.jit
    def run(a, b):
        N = a.shape[-1]
        if N == 0:
            return a
        Tb, Np = _lane_tiles(T, N)
        a2, b2 = _pad_lanes((a, b), Np)
        grid = (Np // Tb,)
        bs = pl.BlockSpec((n, Tb), lambda i: (0, i), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs, bs],
            out_specs=bs,
            out_shape=jax.ShapeDtypeStruct((n, Np), jnp.int32),
            interpret=_interpret(),
        )(a2, b2)
        return out[..., :N] if Np != N else out

    return run


def _padd_rows(spec: L.FieldSpec, b3_limbs, P, Q):
    """RCB complete addition on transposed (n, T) register blocks (the
    padd_kernel body, shared so segmented/select variants fuse it too)."""
    n = spec.n_limbs
    mask = spec.B - 1
    sh = spec.limb_bits
    eightp = [int(x) for x in L.int_to_limbs(8 * spec.p, spec.limb_bits, n)]

    def relax(x, passes=1):
        for _ in range(passes):
            cr = x >> sh
            x = (x & mask) + jnp.pad(cr[:-1], ((1, 0), (0, 0)))
        return x

    def add(a, b):
        return relax(a + b, 1)

    def sub(a, b):
        d = a - b
        d = jnp.concatenate([d[j:j + 1] + eightp[j] for j in range(n)],
                            axis=0)
        return relax(d, 2)

    def mulc_b3(a):
        b3a = jnp.concatenate([jnp.full_like(a[:1], v) for v in b3_limbs],
                              axis=0)
        return _mont_mul_rows(spec, a, b3a)

    def mul(a, b):
        return _mont_mul_rows(spec, a, b)

    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(add(t0, t0), t0)
    t2 = mulc_b3(t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mulc_b3(Y3)
    return (sub(mul(t3, t1), mul(t4, Y3)),
            add(mul(Y3, X3), mul(t1, Z3)),
            add(mul(Z3, t4), mul(X3, t3)))


@functools.lru_cache(maxsize=None)
def padd_seg_kernel(spec_name: str, b: int, T: int = 256):
    """Fused SEGMENTED complete addition: the associative-scan combine of
    the Pippenger bucket accumulation (msm_pippenger), in one VMEM pass.

    Inputs are two scan elements (X, Y, Z, flag) of transposed (n, N)
    coords + (1, N) int32 segment-start flags; output is the monoid
    combine: where flag2 keeps the right element, else the complete sum,
    and flag1|flag2. The XLA-graph formulation of the same combine
    materializes every REDC iteration of its 14 field muls to HBM — this
    kernel reads each operand block once and writes each output block once
    (measured ~8x on the v5e commit path; see ARCHITECTURE.md).
    """
    spec = {s.name: s for s in
            (L.fr_spec, L.fq_spec, L.bls_fq_spec, L.bls_fr_spec)}[spec_name]
    n = spec.n_limbs
    b3_limbs = [int(x) for x in spec.encode(3 * b)]

    def kernel(x1r, y1r, z1r, f1r, x2r, y2r, z2r, f2r,
               x3r, y3r, z3r, f3r):
        P = (x1r[...], y1r[...], z1r[...])
        Q = (x2r[...], y2r[...], z2r[...])
        f1, f2 = f1r[...], f2r[...]
        sx, sy, sz = _padd_rows(spec, tuple(b3_limbs), P, Q)
        keep = f2 != 0
        x3r[...] = jnp.where(keep, Q[0], sx)
        y3r[...] = jnp.where(keep, Q[1], sy)
        z3r[...] = jnp.where(keep, Q[2], sz)
        f3r[...] = f1 | f2

    @jax.jit
    def run(X1, Y1, Z1, F1, X2, Y2, Z2, F2):
        N = X1.shape[-1]
        if N == 0:
            return X2, Y2, Z2, F2
        Tb, Np = _lane_tiles(T, N)
        args = _pad_lanes((X1, Y1, Z1, F1, X2, Y2, Z2, F2), Np)
        grid = (Np // Tb,)
        bs = pl.BlockSpec((n, Tb), lambda i: (0, i), memory_space=pltpu.VMEM)
        fs = pl.BlockSpec((1, Tb), lambda i: (0, i), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs, bs, bs, fs, bs, bs, bs, fs],
            out_specs=[bs, bs, bs, fs],
            out_shape=[jax.ShapeDtypeStruct((n, Np), jnp.int32)] * 3
            + [jax.ShapeDtypeStruct((1, Np), jnp.int32)],
            interpret=_interpret(),
        )(*args)
        if Np != N:
            out = [o[..., :N] for o in out]
        return tuple(out)

    return run
