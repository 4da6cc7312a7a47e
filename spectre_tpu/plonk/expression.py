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
