"""Shared prover/verifier protocol pieces: query collection, lagrange
helpers, expression evaluation at a point."""
from __future__ import annotations

from typing import Dict, List, Tuple

from ..fields.params import BN254_FR as FR
from ..fields.host import inv_mod, batch_inv_mod
from .cs import ConstraintSystem, FIXED, ADVICE, INSTANCE
from .expression import Expr, Const, ColumnRef, Sum, Prod, Scaled, Challenge


def column_queries(cs: ConstraintSystem) -> List[Tuple[int, int]]:
    """All (global_col, rotation) pairs referenced by gates + rotation-0 for
    every column involved in the permutation or instance exposure."""
    seen = []

    def walk(e: Expr):
        if isinstance(e, ColumnRef):
            q = (e.index, e.rotation)
            if q not in seen:
                seen.append(q)
        elif isinstance(e, Sum):
            for t in e.terms:
                walk(t)
        elif isinstance(e, Prod):
            for f in e.factors:
                walk(f)
        elif isinstance(e, Scaled):
            walk(e.inner)

    for g in cs.gates:
        for p in g.polys:
            walk(p)
    for lk in cs.lookups:
        for e in lk.inputs + lk.tables:
            walk(e)
    for c in cs.permutation_columns:
        if (c, 0) not in seen:
            seen.append((c, 0))
    for col in cs.instance:
        if (col.index, 0) not in seen:
            seen.append((col.index, 0))
    return seen


def eval_expr_at(e: Expr, evals: Dict[Tuple[int, int], int],
                 challenges: Dict[int, int] | None = None) -> int:
    """Evaluate an expression given claimed column evals at (col, rot)."""
    if isinstance(e, Const):
        return e.value % FR
    if isinstance(e, ColumnRef):
        return evals[(e.index, e.rotation)] % FR
    if isinstance(e, Challenge):
        return challenges[e.index] % FR
    if isinstance(e, Sum):
        return sum(eval_expr_at(t, evals, challenges) for t in e.terms) % FR
    if isinstance(e, Prod):
        acc = 1
        for f in e.factors:
            acc = acc * eval_expr_at(f, evals, challenges) % FR
        return acc
    if isinstance(e, Scaled):
        return eval_expr_at(e.inner, evals, challenges) * e.scalar % FR
    raise TypeError(f"unknown expr {e!r}")


def eval_expr_on_vectors(e: Expr, vecs: Dict[int, list], rot_unit: int,
                         n_ext: int) -> list:
    """Evaluate an expression over extended-domain eval vectors (host ints).

    vecs: global_col -> list of n_ext coset evals; rotation r shifts indices
    by r * rot_unit (the extension factor).
    """
    if isinstance(e, Const):
        return [e.value % FR] * n_ext
    if isinstance(e, ColumnRef):
        v = vecs[e.index]
        if e.rotation == 0:
            return v
        s = (e.rotation * rot_unit) % n_ext
        return v[s:] + v[:s]
    if isinstance(e, Sum):
        out = [0] * n_ext
        for t in e.terms:
            tv = eval_expr_on_vectors(t, vecs, rot_unit, n_ext)
            out = [(a + b) % FR for a, b in zip(out, tv)]
        return out
    if isinstance(e, Prod):
        out = None
        for f in e.factors:
            fv = eval_expr_on_vectors(f, vecs, rot_unit, n_ext)
            out = fv if out is None else [a * b % FR for a, b in zip(out, fv)]
        return out
    if isinstance(e, Scaled):
        iv = eval_expr_on_vectors(e.inner, vecs, rot_unit, n_ext)
        return [v * e.scalar % FR for v in iv]
    raise TypeError(f"unknown expr {e!r}")


def lagrange_evals_at(dom, z: int, indices: List[int]) -> List[int]:
    """L_i(z) for the given indices: L_i(z) = w^i (z^n - 1) / (n (z - w^i))."""
    n = dom.n
    zn1 = (pow(z, n, FR) - 1) % FR
    n_inv = inv_mod(n, FR)
    ws = [pow(dom.omega, i, FR) for i in indices]
    denoms = [(z - w) % FR for w in ws]
    dinv = batch_inv_mod(denoms, FR)
    return [zn1 * n_inv % FR * w % FR * d % FR for w, d in zip(ws, dinv)]


def instance_poly_eval(dom, values: List[int], z: int) -> int:
    """Evaluate the instance column polynomial (Lagrange ext of values) at z."""
    nz = [(i, v) for i, v in enumerate(values) if v % FR != 0]
    if not nz:
        return 0
    ls = lagrange_evals_at(dom, z, [i for i, _ in nz])
    return sum(l * v for l, (_, v) in zip(ls, nz)) % FR
