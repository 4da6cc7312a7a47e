"""Batched elliptic-curve arithmetic on limb tensors (JAX/TPU).

Points are projective (X, Y, Z) triples of Montgomery limb tensors with
identity (0, 1, 0). Addition uses the Renes–Costello–Batina *complete*
addition law for short-Weierstrass a=0 curves (eprint 2015/1060, Algs 7/9):
one branch-free formula valid for every input pair — doubling, identity,
inverses included. Completeness is what makes EC reduction associative-scan
and tree-reduce friendly on TPU: no data-dependent control flow at all.

Amplitude analysis (see fields.limb): every output coordinate is a mul
result (< 2p) or mul ± mul (< 4p); intermediates stay ≤ 24p and amplitude
products stay far below the REDC headroom (2^10 for 24-limb BN254,
2^15 for 36-limb BLS12-381 Fq).

The reference has no analog of this module — its curve arithmetic lives in
halo2curves (CPU, per-scalar branches); the MSM/witness parallelism axes it
feeds are surveyed in SURVEY.md §2c.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as L
from ..fields.host import inv_mod


class CurveOps:
    """Batched projective ops for y^2 = x^3 + b over one limbed field."""

    def __init__(self, spec: L.FieldSpec, b: int, name: str = ""):
        self.spec = spec
        self.name = name
        self.b = b
        self.ops = L.make_ops(spec)
        self.b3_mont = np.asarray(spec.encode(3 * b))
        self.one_mont = np.asarray(spec.one_mont)

    # ---- host <-> device representations ----
    def encode_points(self, pts) -> tuple:
        """List of affine (x, y) | None -> stacked (X, Y, Z) limb arrays."""
        xs, ys, zs = [], [], []
        for p in pts:
            if p is None:
                xs.append(0)
                ys.append(1)
                zs.append(0)
            else:
                xs.append(p[0])
                ys.append(p[1])
                zs.append(1)
        enc = self.spec.encode_batch
        return (enc(xs), enc(ys), enc(zs))

    def decode_points(self, P) -> list:
        """(X, Y, Z) limb arrays -> list of affine (x, y) | None."""
        X, Y, Z = (np.asarray(c) for c in P)
        flat = X.reshape(-1, self.spec.n_limbs)
        n = flat.shape[0]
        xs = self.spec.decode_batch(X)
        ys = self.spec.decode_batch(Y)
        zs = self.spec.decode_batch(Z)
        out = []
        p = self.spec.p
        for x, y, z in zip(xs, ys, zs):
            if z == 0:
                out.append(None)
            else:
                zi = inv_mod(z, p)
                out.append((x * zi % p, y * zi % p))
        return out

    def identity_like(self, batch_shape) -> tuple:
        z = np.zeros(batch_shape + (self.spec.n_limbs,), np.int32)
        o = np.broadcast_to(self.one_mont, batch_shape + (self.spec.n_limbs,))
        return (z.copy(), np.array(o, np.int32), z.copy())

    # ---- core formulas (pure graph fns; compose inside larger jits) ----
    def padd_graph(self, P, Q):
        """Complete addition (RCB Alg 7, a=0)."""
        o = self.ops
        mul, add, sub = o.mont_mul, o.add, functools.partial(o.sub, amplitude=8)
        b3 = jnp.asarray(self.b3_mont)
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
        t2 = mul(b3, t2)
        Z3 = add(t1, t2)
        t1 = sub(t1, t2)
        Y3 = mul(b3, Y3)
        X3_new = sub(mul(t3, t1), mul(t4, Y3))
        Y3_new = add(mul(Y3, X3), mul(t1, Z3))
        Z3_new = add(mul(Z3, t4), mul(X3, t3))
        return (X3_new, Y3_new, Z3_new)

    def pdbl_graph(self, P):
        """Complete doubling (RCB Alg 9, a=0); cheaper than padd(P, P)."""
        o = self.ops
        mul, add, sub = o.mont_mul, o.add, functools.partial(o.sub, amplitude=8)
        b3 = jnp.asarray(self.b3_mont)
        X, Y, Z = P
        t0 = mul(Y, Y)
        two = add(t0, t0)
        four = add(two, two)
        Z3 = add(four, four)
        t1 = mul(Y, Z)
        t2 = mul(b3, mul(Z, Z))
        X3 = mul(t2, Z3)
        Y3 = add(t0, t2)
        Z3 = mul(t1, Z3)
        t1 = add(t2, t2)
        t2 = add(t1, t2)
        t0 = sub(t0, t2)
        Y3 = mul(t0, Y3)
        Y3 = add(X3, Y3)
        t1 = mul(X, Y)
        X3 = mul(t0, t1)
        X3 = add(X3, X3)
        return (X3, Y3, Z3)

    def pneg_graph(self, P):
        X, Y, Z = P
        return (X, self.ops.neg(Y, amplitude=8), Z)

    def pselect_graph(self, c, P, Q):
        """c ? P : Q, per batch element."""
        s = self.ops.select
        return tuple(s(c, a, b) for a, b in zip(P, Q))

    # ---- jitted entry points ----
    @functools.cached_property
    def padd(self):
        return jax.jit(self.padd_graph)

    @functools.cached_property
    def pdbl(self):
        return jax.jit(self.pdbl_graph)

    @functools.cached_property
    def tree_reduce(self):
        """Sum all points along axis 0 -> single point (log-depth)."""

        @jax.jit
        def f(P):
            X, Y, Z = P
            n = X.shape[0]
            while n > 1:
                half = n // 2
                odd = None
                if n % 2 == 1:
                    odd = (X[n - 1:n], Y[n - 1:n], Z[n - 1:n])
                lo = (X[:half], Y[:half], Z[:half])
                hi = (X[half:2 * half], Y[half:2 * half], Z[half:2 * half])
                X, Y, Z = self.padd_graph(lo, hi)
                if odd is not None:
                    X = jnp.concatenate([X, odd[0]])
                    Y = jnp.concatenate([Y, odd[1]])
                    Z = jnp.concatenate([Z, odd[2]])
                n = X.shape[0]
            return (X[0], Y[0], Z[0])

        return f

    def is_on_curve_host(self, pt) -> bool:
        if pt is None:
            return True
        x, y = pt
        p = self.spec.p
        return (y * y - x * x * x - self.b) % p == 0


bn254_g1_ops = CurveOps(L.fq_spec, 3, "bn254_g1")
bls_g1_ops = CurveOps(L.bls_fq_spec, 4, "bls12_381_g1")


class CurveOpsT:
    """Transposed-layout projective curve ops (limbs on axis -2).

    Same RCB complete formulas as CurveOps, over fields/limb_t ops — the
    layout the round-3 MSM/prover migration targets (zero lane padding;
    see ARCHITECTURE.md). Coordinates are (..., NL, n) tensors."""

    def __init__(self, spec: L.FieldSpec, b: int, name: str = ""):
        from ..fields.limb_t import make_ops_t
        self.spec = spec
        self.name = name
        self.b = b
        self.ops = make_ops_t(spec.name)
        self.b3_mont_t = np.asarray(spec.encode(3 * b))[:, None]
        self.one_mont_t = np.asarray(spec.one_mont)[:, None]

    def padd_graph(self, P, Q):
        o = self.ops
        mul, add = o.mont_mul, o.add
        sub = functools.partial(o.sub, amplitude=8)
        b3 = jnp.asarray(self.b3_mont_t)
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
        t2 = mul(b3, t2)
        Z3 = add(t1, t2)
        t1 = sub(t1, t2)
        Y3 = mul(b3, Y3)
        X3_new = sub(mul(t3, t1), mul(t4, Y3))
        Y3_new = add(mul(Y3, X3), mul(t1, Z3))
        Z3_new = add(mul(Z3, t4), mul(X3, t3))
        return (X3_new, Y3_new, Z3_new)

    def pdbl_graph(self, P):
        o = self.ops
        mul, add = o.mont_mul, o.add
        sub = functools.partial(o.sub, amplitude=8)
        b3 = jnp.asarray(self.b3_mont_t)
        X, Y, Z = P
        t0 = mul(Y, Y)
        two = add(t0, t0)
        four = add(two, two)
        Z3 = add(four, four)
        t1 = mul(Y, Z)
        t2 = mul(b3, mul(Z, Z))
        X3 = mul(t2, Z3)
        Y3 = add(t0, t2)
        Z3 = mul(t1, Z3)
        t1 = add(t2, t2)
        t2 = add(t1, t2)
        t0 = sub(t0, t2)
        Y3 = mul(t0, Y3)
        Y3 = add(X3, Y3)
        t1 = mul(X, Y)
        X3 = mul(t0, t1)
        X3 = add(X3, X3)
        return (X3, Y3, Z3)


bn254_g1_ops_t = CurveOpsT(L.fq_spec, 3, "bn254_g1")
bls_g1_ops_t = CurveOpsT(L.bls_fq_spec, 4, "bls12_381_g1")
