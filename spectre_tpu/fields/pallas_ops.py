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
        grid = (N // T,)
        bs = pl.BlockSpec((n, T), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs, bs, bs],
            out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((n, N), jnp.int32)] * 2,
            interpret=_interpret(),
        )(tw, odd, even)

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
        grid = (N // T,)
        bs = pl.BlockSpec((n, T), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs, bs],
            out_specs=bs,
            out_shape=jax.ShapeDtypeStruct((n, N), jnp.int32),
            interpret=_interpret(),
        )(a, b)

    return run
