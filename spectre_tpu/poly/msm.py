"""Multi-scalar multiplication on TPU (batched, branch-free).

v0 strategy ("bit-serial with batched tree reduction"):
  S = Σ_i k_i·P_i = Σ_b 2^b · (Σ_{i: bit b of k_i} P_i)
Per bit-chunk, select P_i or the identity (complete addition makes the
identity a perfectly ordinary operand), tree-reduce over the point axis with
all bits of the chunk batched together, then fold chunks with doublings
(Horner in 2^b). Cost ≈ n_bits·N complete adds, fully vectorized, zero
data-dependent control flow.

A sorted-bucket Pippenger (digit sort + segmented associative scan) is the
planned fast path; this version is the correctness baseline and is already
sharding-friendly: points split across devices, partial sums psum-reduced.

Scalars arrive as canonical plain limb vectors (11-bit limbs); bits are
extracted on device.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as L
from ..curves.limbjax import CurveOps, bn254_g1_ops, bls_g1_ops


def scalars_to_plain_limbs(scalars, scalar_spec: L.FieldSpec) -> np.ndarray:
    """Host: python ints -> (N, n_limbs) canonical plain (non-Montgomery)."""
    return np.stack([
        L.int_to_limbs(s % scalar_spec.p, scalar_spec.limb_bits,
                       scalar_spec.n_limbs)
        for s in scalars
    ])


def _bit_of(plain_limbs, b: int, limb_bits: int):
    """Extract bit b from plain limb vectors; returns (...,) int32 0/1."""
    return (plain_limbs[..., b // limb_bits] >> (b % limb_bits)) & 1


def _tree_reduce_axis(cops: CurveOps, P, axis_len: int):
    """Reduce points along axis -2 of (..., N, n_limbs) coords."""
    X, Y, Z = P
    n = axis_len
    while n > 1:
        half = n // 2
        odd = None
        if n % 2 == 1:
            odd = tuple(c[..., n - 1:n, :] for c in (X, Y, Z))
        lo = tuple(c[..., :half, :] for c in (X, Y, Z))
        hi = tuple(c[..., half:2 * half, :] for c in (X, Y, Z))
        X, Y, Z = cops.padd_graph(lo, hi)
        if odd is not None:
            X = jnp.concatenate([X, odd[0]], axis=-2)
            Y = jnp.concatenate([Y, odd[1]], axis=-2)
            Z = jnp.concatenate([Z, odd[2]], axis=-2)
        n = X.shape[-2]
    return (X[..., 0, :], Y[..., 0, :], Z[..., 0, :])


def _msm_graph(cops: CurveOps, scalar_spec: L.FieldSpec, P, scalars_plain,
               n_bits: int):
    """P: (X, Y, Z) each (N, n_limbs); scalars_plain: (N, s_limbs)."""
    sb = scalar_spec.limb_bits
    ident = tuple(jnp.asarray(c) for c in cops.identity_like(()))

    # per-bit selected points: (n_bits, N, n_limbs)
    bits = jnp.stack([
        _bit_of(scalars_plain, b, sb).astype(bool) for b in range(n_bits)
    ])  # (n_bits, N)
    sel = tuple(
        jnp.where(bits[..., None], c[None, :, :], i[None, None, :])
        for c, i in zip(P, ident)
    )
    # batched tree reduce over N -> (n_bits,) points
    Tb = _tree_reduce_axis(cops, sel, sel[0].shape[1])
    # Horner over bits, high to low: acc = 2*acc + T_b (lax.scan keeps the
    # 254-step loop out of the traced graph)
    acc0 = tuple(c[n_bits - 1] for c in Tb)
    rest = tuple(c[:n_bits - 1] for c in Tb)

    def body(acc, tb):
        acc = cops.pdbl_graph(acc)
        acc = cops.padd_graph(acc, tb)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, rest, reverse=True)
    return acc


@functools.lru_cache(maxsize=None)
def _msm_jit(curve_name: str, n_bits: int):
    cops = {"bn254_g1": bn254_g1_ops, "bls12_381_g1": bls_g1_ops}[curve_name]
    scalar_spec = {"bn254_g1": L.fr_spec, "bls12_381_g1": L.bls_fr_spec}[curve_name]

    @jax.jit
    def f(P, scalars_plain):
        return _msm_graph(cops, scalar_spec, P, scalars_plain, n_bits)

    return f


def msm(points, scalars, curve: str = "bn254_g1", n_bits: int = 254):
    """Host entry: affine points + int scalars -> affine point | None."""
    cops = {"bn254_g1": bn254_g1_ops, "bls12_381_g1": bls_g1_ops}[curve]
    scalar_spec = {"bn254_g1": L.fr_spec, "bls12_381_g1": L.bls_fr_spec}[curve]
    P = cops.encode_points(points)
    s = scalars_to_plain_limbs(scalars, scalar_spec)
    acc = _msm_jit(curve, n_bits)(P, jnp.asarray(s))
    return cops.decode_points(tuple(np.asarray(c)[None] for c in acc))[0]


def msm_device(P, scalars_plain, curve: str = "bn254_g1", n_bits: int = 254):
    """Device-resident entry for use inside larger jits."""
    return _msm_jit(curve, n_bits)(P, scalars_plain)


@functools.lru_cache(maxsize=None)
def _fixed_base_jit(curve_name: str, n_bits: int):
    cops = {"bn254_g1": bn254_g1_ops, "bls12_381_g1": bls_g1_ops}[curve_name]

    @jax.jit
    def f(table, scalars_plain):
        """table: (n_bits, 3, n_limbs) multiples 2^j*G; scalars (N, s_limbs).

        Returns per-scalar points (3 coord arrays of (N, n_limbs)):
        tree-reduce over the bit axis of bit-selected table entries.
        """
        spec = {"bn254_g1": L.fr_spec,
                "bls12_381_g1": L.bls_fr_spec}[curve_name]
        sb = spec.limb_bits
        ident = tuple(jnp.asarray(c) for c in cops.identity_like(()))
        bits = jnp.stack([
            _bit_of(scalars_plain, b, sb).astype(bool)
            for b in range(n_bits)
        ], axis=1)  # (N, n_bits)
        sel = tuple(
            jnp.where(bits[..., None], table[None, :, ci, :],
                      i[None, None, :])
            for ci, i in enumerate(ident)
        )  # each (N, n_bits, n_limbs)
        from ..fields import limb as LL
        with LL.compact_redc():
            out = _tree_reduce_axis(cops, sel, n_bits)
        return out

    return f


def batch_fixed_base_mul(scalars, curve: str = "bn254_g1",
                         n_bits: int = 254, chunk: int = 8192):
    """[s_i]G for many scalars — device tree-reduction over bit-selected
    precomputed doublings. Used for SRS generation at big k (the host loop
    costs hours at 2^17+)."""
    import numpy as np
    from ..curves import host as CH
    cops = {"bn254_g1": bn254_g1_ops, "bls12_381_g1": bls_g1_ops}[curve]
    hcurve = {"bn254_g1": CH.bn254_g1, "bls12_381_g1": CH.bls_g1}[curve]
    scalar_spec = {"bn254_g1": L.fr_spec,
                   "bls12_381_g1": L.bls_fr_spec}[curve]
    # host: 2^j G table
    mults = []
    pt = hcurve.gen
    for _ in range(n_bits):
        mults.append(pt)
        pt = hcurve.add(pt, pt)
    X, Y, Z = cops.encode_points(mults)
    table = jnp.asarray(np.stack([X, Y, Z], axis=1))  # (n_bits, 3, limbs)
    f = _fixed_base_jit(curve, n_bits)
    out = []
    N = len(scalars)
    chunk = min(chunk, max(1, N))
    for off in range(0, N, chunk):
        sl = list(scalars[off:off + chunk])
        pad = chunk - len(sl)
        sl += [0] * pad  # 0*G = identity; keeps shapes static
        sp = jnp.asarray(scalars_to_plain_limbs(sl, scalar_spec))
        coords = f(table, sp)
        pts = cops.decode_points(tuple(np.asarray(c) for c in coords))
        out.extend(pts[:chunk - pad])
    return out
