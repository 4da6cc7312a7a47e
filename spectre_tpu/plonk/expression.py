"""Gate expressions: a small AST evaluated over whole-column tensors.

The halo2 analog is plonk::Expression (used by the reference through
halo2-base's flex gate); here evaluation is always *columnar* — an expression
evaluates to an (n_rows, n_limbs) limb tensor in one vectorized pass, with
rotations as jnp.roll. That makes the MockProver a single fused device
computation instead of halo2's per-row interpreter loop, and the same
evaluator later drives quotient construction on the extended domain.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import numpy as np
import jax.numpy as jnp

from ..fields import limb as L
from ..fields.params import BN254_FR as FR


class Expr:
    def __add__(self, other):
        return Sum((self, _lift(other)))

    def __radd__(self, other):
        return Sum((_lift(other), self))

    def __mul__(self, other):
        return Prod((self, _lift(other)))

    def __rmul__(self, other):
        return Prod((_lift(other), self))

    def __sub__(self, other):
        return Sum((self, Scaled(_lift(other), FR - 1)))

    def __rsub__(self, other):
        return Sum((_lift(other), Scaled(self, FR - 1)))

    def __neg__(self):
        return Scaled(self, FR - 1)

    def degree(self) -> int:
        raise NotImplementedError

    def max_rotation(self) -> int:
        return 0


def _lift(v) -> "Expr":
    if isinstance(v, Expr):
        return v
    return Const(int(v) % FR)


@dataclass(frozen=True)
class Const(Expr):
    value: int

    def degree(self):
        return 0


@dataclass(frozen=True)
class ColumnRef(Expr):
    """Reference to column `index` (global column order) at `rotation`."""
    index: int
    rotation: int = 0

    def degree(self):
        return 1

    def max_rotation(self):
        return abs(self.rotation)


@dataclass(frozen=True)
class Challenge(Expr):
    """A verifier challenge (multi-phase protocols); bound at eval time."""
    index: int

    def degree(self):
        return 0


@dataclass(frozen=True)
class Sum(Expr):
    terms: Tuple[Expr, ...]

    def degree(self):
        return max(t.degree() for t in self.terms)

    def max_rotation(self):
        return max(t.max_rotation() for t in self.terms)


@dataclass(frozen=True)
class Prod(Expr):
    factors: Tuple[Expr, ...]

    def degree(self):
        return sum(f.degree() for f in self.factors)

    def max_rotation(self):
        return max(f.max_rotation() for f in self.factors)


@dataclass(frozen=True)
class Scaled(Expr):
    inner: Expr
    scalar: int

    def degree(self):
        return self.inner.degree()

    def max_rotation(self):
        return self.inner.max_rotation()


def collect_columns(expr: Expr, out=None) -> set:
    """Set of column indices referenced by an expression."""
    if out is None:
        out = set()
    if isinstance(expr, ColumnRef):
        out.add(expr.index)
    elif isinstance(expr, Sum):
        for t in expr.terms:
            collect_columns(t, out)
    elif isinstance(expr, Prod):
        for f in expr.factors:
            collect_columns(f, out)
    elif isinstance(expr, Scaled):
        collect_columns(expr.inner, out)
    return out


def _signed(s: int) -> int:
    """Map a mod-r scalar to its signed representative."""
    return s - FR if s > FR // 2 else s


def int_bound(expr: Expr, col_bounds) -> int | None:
    """Worst-case |value| for small-integer evaluation, given per-column
    max canonical values. None = unbounded/unsupported (falls back to the
    field evaluator). Every partial (prefix sums/products in eval order)
    is also bounded by the returned value, so a bound < 2^62 guarantees
    overflow-free int64 evaluation."""
    if isinstance(expr, Const):
        return abs(_signed(expr.value))
    if isinstance(expr, ColumnRef):
        b = col_bounds.get(expr.index)
        return None if b is None else int(b)
    if isinstance(expr, Sum):
        acc = 0
        for t in expr.terms:
            b = int_bound(t, col_bounds)
            if b is None:
                return None
            acc += b
        return acc
    if isinstance(expr, Prod):
        # prefix partial products are the values eval_expr_int materializes;
        # bound each (zeros floored to 1 so a 0-bound factor can't hide an
        # overflowing earlier prefix)
        acc = 1
        for f in expr.factors:
            b = int_bound(f, col_bounds)
            if b is None:
                return None
            acc *= max(b, 1)
            if acc > (1 << 62):
                return None
        return acc
    if isinstance(expr, Scaled):
        b = int_bound(expr.inner, col_bounds)
        return None if b is None else b * abs(_signed(expr.scalar))
    return None  # Challenge etc.


def eval_expr_int(expr: Expr, int_cols) -> np.ndarray:
    """Exact small-integer evaluation over int64 row vectors.

    int_cols maps column index -> (n_rows,) int64 canonical values. The
    caller must have verified int_bound(...) < 2^62: then the integer
    result equals the field value's signed representative, and ==0 here
    iff the gate vanishes mod r. This is the MockProver hot path for
    bit-heavy regions (wide SHA-256), whose gate trees would otherwise
    trace thousands of Montgomery multiplies."""
    if isinstance(expr, Const):
        return np.int64(_signed(expr.value))
    if isinstance(expr, ColumnRef):
        col = int_cols[expr.index]
        if expr.rotation:
            col = np.roll(col, -expr.rotation)
        return col
    if isinstance(expr, Sum):
        acc = eval_expr_int(expr.terms[0], int_cols)
        for t in expr.terms[1:]:
            acc = acc + eval_expr_int(t, int_cols)
        return acc
    if isinstance(expr, Prod):
        acc = eval_expr_int(expr.factors[0], int_cols)
        for f in expr.factors[1:]:
            acc = acc * eval_expr_int(f, int_cols)
        return acc
    if isinstance(expr, Scaled):
        return eval_expr_int(expr.inner, int_cols) * _signed(expr.scalar)
    raise TypeError(f"unsupported expr for int eval: {expr!r}")


def eval_expr_t(expr: Expr, columns, spec: L.FieldSpec = L.fr_spec,
                challenges=(), amp_budget: int = 16, rot_unit: int = 1):
    """Transposed-layout evaluator: columns are (NL, n) Montgomery limb
    tensors (limbs on sublanes, rows on lanes — the prover pipeline's
    layout); rotations roll the lane axis. Scalars are (NL, 1). Semantics
    and amplitude discipline identical to eval_expr below."""
    from ..fields.limb_t import make_ops_t, carry_relax_t
    ops = make_ops_t(spec.name)

    def enc1(x: int):
        return jnp.asarray(spec.encode(x))[:, None]

    def batched_sum(terms) -> tuple:
        bases, weights = [], []
        for t in terms:
            if isinstance(t, Scaled):
                v, a = rec(t.inner)
                w = t.scalar
            elif isinstance(t, Const):
                v, a = enc1(1), 1
                w = t.value
            else:
                v, a = rec(t)
                w = 1
            if a > 2:
                v = ops.fold(v)
            bases.append(v)
            weights.append(w)
        # broadcast (NL, 1) scalar entries up to the full column shape
        full = next((b.shape for b in bases if b.shape[-1] > 1), None)
        if full is not None:
            bases = [jnp.broadcast_to(b, full) if b.shape[-1] == 1 else b
                     for b in bases]
        st = jnp.stack(bases)
        wm = jnp.asarray(np.stack([spec.encode(x)[:, None]
                                   for x in weights]))
        wm = wm.reshape((len(terms),) + (1,) * (st.ndim - 3)
                        + (wm.shape[-2], 1))
        prod = ops.mont_mul(st, wm)            # amplitude < 2 per row
        s = prod.sum(axis=0, dtype=jnp.int32)  # amplitude < 2*T (T <= ~128)
        return ops.fold(s), 2

    def rec(e) -> tuple:
        if isinstance(e, Const):
            return enc1(e.value), 1
        if isinstance(e, Challenge):
            return jnp.asarray(challenges[e.index]), 1
        if isinstance(e, ColumnRef):
            col = columns[e.index]
            if e.rotation:
                col = jnp.roll(col, -e.rotation * rot_unit, axis=-1)
            return col, 2
        if isinstance(e, Sum):
            if len(e.terms) >= 6:
                return batched_sum(e.terms)
            acc, amp = rec(e.terms[0])
            for t in e.terms[1:]:
                v, a = rec(t)
                acc = carry_relax_t(spec, acc + v, passes=1)
                amp = amp + a
                if amp > amp_budget:
                    acc = ops.fold(acc)
                    amp = 2
            return acc, amp
        if isinstance(e, Prod):
            acc, amp = rec(e.factors[0])
            for f in e.factors[1:]:
                v, a = rec(f)
                acc = ops.mont_mul(acc, v)
                amp = 2
            return acc, amp
        if isinstance(e, Scaled):
            v, a = rec(e.inner)
            return ops.mont_mul(v, enc1(e.scalar)), 2
        raise TypeError(f"unknown expr {e!r}")

    out, _ = rec(expr)
    return out


def eval_expr(expr: Expr, columns, spec: L.FieldSpec = L.fr_spec,
              challenges=(), amp_budget: int = 16, rot_unit: int = 1):
    # amp_budget capped so products of two folded sums stay inside the REDC
    # headroom: amp_budget^2 < B^n/p (= 2^10 for 24-limb BN254).
    """Evaluate an expression over column tensors.

    columns: (n_cols, n_rows, n_limbs) Montgomery limb tensor (or list of
    per-column (n_rows, n_limbs) arrays). Returns (n_rows, n_limbs) with
    amplitude <= 2 (products) or small (sums are folded when the static
    amplitude budget is exceeded). rot_unit scales rotations (the extension
    factor when evaluating on an extended coset).
    """
    ops = L.make_ops(spec)

    def batched_sum(terms) -> tuple:
        """Wide sums (the zkEVM-style bit-recomposition gates have 30-100
        Scaled terms) as ONE stacked mont_mul + int32 tree-sum + fold —
        collapses the per-term chained graph that otherwise makes XLA
        compile times explode on large gate polys."""
        import numpy as np
        bases, weights = [], []
        for t in terms:
            if isinstance(t, Scaled):
                v, a = rec(t.inner)
                w = t.scalar
            elif isinstance(t, Const):
                v, a = jnp.asarray(spec.encode(1)), 1
                w = t.value
            else:
                v, a = rec(t)
                w = 1
            if a > 2:
                v = ops.fold(v)
            bases.append(v)
            weights.append(w)
        # broadcast bare-scalar entries (NL,) up to the column shape
        full = next((b.shape for b in bases if b.ndim > 1), None)
        if full is not None:
            bases = [jnp.broadcast_to(b, full) if b.ndim == 1 else b
                     for b in bases]
        st = jnp.stack(bases)
        wm = jnp.asarray(np.stack([spec.encode(x) for x in weights]))
        wm = wm.reshape((len(terms),) + (1,) * (st.ndim - 2) + (wm.shape[-1],))
        prod = ops.mont_mul(st, wm)          # amplitude < 2 per row
        s = prod.sum(axis=0, dtype=jnp.int32)  # amplitude < 2*T (T <= ~128)
        return ops.fold(s), 2

    def rec(e) -> tuple:
        # returns (tensor, amplitude)
        if isinstance(e, Const):
            v = jnp.asarray(spec.encode(e.value))
            return v, 1
        if isinstance(e, Challenge):
            v = jnp.asarray(challenges[e.index])
            return v, 1
        if isinstance(e, ColumnRef):
            col = columns[e.index]
            if e.rotation:
                col = jnp.roll(col, -e.rotation * rot_unit, axis=0)
            return col, 2
        if isinstance(e, Sum):
            if len(e.terms) >= 6:
                return batched_sum(e.terms)
            acc, amp = rec(e.terms[0])
            for t in e.terms[1:]:
                v, a = rec(t)
                acc = ops.add(acc, v)
                amp = amp + a
                if amp > amp_budget:
                    acc = ops.fold(acc)
                    amp = 2
            return acc, amp
        if isinstance(e, Prod):
            acc, amp = rec(e.factors[0])
            for f in e.factors[1:]:
                v, a = rec(f)
                acc = ops.mont_mul(acc, v)
                amp = 2
            return acc, amp
        if isinstance(e, Scaled):
            v, a = rec(e.inner)
            s = jnp.asarray(spec.encode(e.scalar))
            return ops.mont_mul(v, s), 2
        raise TypeError(f"unknown expr {e!r}")

    out, _ = rec(expr)
    return out
