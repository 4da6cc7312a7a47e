"""PLONKish constraint system (halo2-semantics, tensor-first layout).

Mirrors the feature surface the reference consumes from halo2_proofs::plonk
(SURVEY.md §2b): fixed/advice/instance columns, polynomial gates with
rotations, a single global permutation argument over equality-enabled
columns, and lookup arguments. Row/column data lives in flat
(n_rows, n_limbs) tensors; copy constraints are recorded as index pairs and
compiled into permutation cycles at keygen.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

from .expression import Expr, ColumnRef

FIXED = "fixed"
ADVICE = "advice"
INSTANCE = "instance"


@dataclass(frozen=True)
class Column:
    kind: str
    index: int          # global column index (across all kinds)
    phase: int = 0

    def at(self, rotation: int = 0) -> ColumnRef:
        return ColumnRef(self.index, rotation)


@dataclass
class Gate:
    name: str
    polys: List[Expr]


@dataclass
class Lookup:
    name: str
    inputs: List[Expr]   # input expressions
    tables: List[Expr]   # table expressions (same arity)


class ConstraintSystem:
    """Static circuit shape: columns, gates, copies, lookups."""

    def __init__(self):
        self.columns: List[Column] = []
        self.fixed: List[Column] = []
        self.advice: List[Column] = []
        self.instance: List[Column] = []
        self.gates: List[Gate] = []
        self.lookups: List[Lookup] = []
        # copy constraints: ((col_a, row_a), (col_b, row_b)) global col idx
        self.copies: List[Tuple[Tuple[int, int], Tuple[int, int]]] = []
        self.permutation_columns: List[int] = []  # equality-enabled, global idx

    def _new_column(self, kind: str, phase: int = 0) -> Column:
        col = Column(kind, len(self.columns), phase)
        self.columns.append(col)
        getattr(self, kind).append(col)
        return col

    def fixed_column(self) -> Column:
        return self._new_column(FIXED)

    def advice_column(self, phase: int = 0) -> Column:
        return self._new_column(ADVICE, phase)

    def instance_column(self) -> Column:
        return self._new_column(INSTANCE)

    def enable_equality(self, col: Column):
        if col.index not in self.permutation_columns:
            self.permutation_columns.append(col.index)

    def create_gate(self, name: str, polys):
        if isinstance(polys, Expr):
            polys = [polys]
        self.gates.append(Gate(name, list(polys)))

    def add_lookup(self, name: str, inputs, tables):
        self.lookups.append(Lookup(name, list(inputs), list(tables)))

    def copy(self, a: Tuple[int, int], b: Tuple[int, int]):
        """Constrain cell a == cell b ((global_col_idx, row))."""
        self.copies.append((a, b))

    # ---- degree/blinding accounting (halo2-compatible row budget) ----
    def max_gate_degree(self) -> int:
        d = 1
        for g in self.gates:
            for p in g.polys:
                d = max(d, p.degree())
        return d

    def blinding_factors(self) -> int:
        """Unusable rows at the domain tail (halo2: t blinding + 1)."""
        # conservative halo2-style: degree-driven; minimum 5 like halo2
        factors = max(5, self.max_gate_degree() - 1)
        return factors + 1

    def usable_rows(self, n: int) -> int:
        return n - self.blinding_factors() - 1
