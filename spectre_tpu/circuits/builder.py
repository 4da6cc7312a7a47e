"""Circuit-builder DSL — the halo2-base analog (virtual cells + flex gate).

The reference builds circuits through halo2-base's `Context`/`GateChip`
virtual regions (SURVEY.md §2b halo2-base row; used everywhere in
lightclient-circuits). This is our re-design of that model on top of
spectre_tpu.plonk:

* a `Context` holds one virtual advice column: a growing list of witness
  values plus structural records (gate rows, copy pairs, constant pins,
  range-lookup pins);
* the single custom gate is halo2-base's vertical gate
      q[i] * (a[i] + a[i+1]*a[i+2] - a[i+3]) = 0
  over four consecutive cells of the same column;
* `CircuitBuilder.compile(k)` lays the virtual column out into physical
  plonk columns: advice, q selector (fixed), a constants column, lookup
  advice columns feeding the range table, and an instance column.

Circuit code must be witness-independent in *structure* (same cells/gates
for any input) — the same contract halo2-base imposes; keygen runs the
builder on default witnesses exactly like the reference
(util/circuit.rs:119-137 keygen flow).

v1 layout: one advice column (plus one lookup-advice column when the range
table is used). Multi-column break-point layout — halo2-base's
MultiPhaseThreadBreakPoints (config/*.json pinnings) — is the planned
widening for tall circuits.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from ..fields.params import BN254_FR as FR
from ..fields.host import inv_mod
from ..plonk.cs import ConstraintSystem


@dataclass(frozen=True)
class AssignedValue:
    ctx_id: int
    idx: int
    value: int

    def __int__(self):
        return self.value


class Context:
    """One virtual advice region (single-phase)."""

    def __init__(self, ctx_id: int = 0):
        self.ctx_id = ctx_id
        self.cells: List[int] = []
        self.gate_rows: List[int] = []          # q = 1 at these cell offsets
        self.equalities: List[Tuple[int, int]] = []
        self.constant_pins: List[Tuple[int, int]] = []  # (cell_idx, const)
        self.lookup_cells: List[int] = []

    # ---- raw cell assignment ----
    def assign(self, value: int) -> AssignedValue:
        v = value % FR
        self.cells.append(v)
        return AssignedValue(self.ctx_id, len(self.cells) - 1, v)

    def assign_many(self, values) -> List[AssignedValue]:
        return [self.assign(v) for v in values]

    def load_constant(self, c: int) -> AssignedValue:
        av = self.assign(c)
        self.constant_pins.append((av.idx, c % FR))
        return av

    def load_zero(self) -> AssignedValue:
        return self.load_constant(0)

    def constrain_equal(self, a: AssignedValue, b: AssignedValue):
        self.equalities.append((a.idx, b.idx))

    def constrain_constant(self, a: AssignedValue, c: int):
        self.constant_pins.append((a.idx, c % FR))

    # ---- the vertical gate: cells [base..base+3], a + b*c = d ----
    def _gate(self, a, b, c, d):
        base = len(self.cells)
        for v in (a, b, c, d):
            self.cells.append(v % FR)
        self.gate_rows.append(base)
        return base

    def _copy_into(self, av: AssignedValue, pos: int):
        self.equalities.append((av.idx, pos))

    # ---- GateInstructions (halo2-base semantics) ----
    def add(self, a: AssignedValue, b: AssignedValue) -> AssignedValue:
        out = (a.value + b.value) % FR
        base = self._gate(a.value, b.value, 1, out)
        self._copy_into(a, base)
        self._copy_into(b, base + 1)
        self.constant_pins.append((base + 2, 1))
        return AssignedValue(self.ctx_id, base + 3, out)

    def sub(self, a: AssignedValue, b: AssignedValue) -> AssignedValue:
        out = (a.value - b.value) % FR
        base = self._gate(out, b.value, 1, a.value)
        self._copy_into(b, base + 1)
        self.constant_pins.append((base + 2, 1))
        self._copy_into(a, base + 3)
        return AssignedValue(self.ctx_id, base, out)

    def neg(self, a: AssignedValue) -> AssignedValue:
        return self.sub(self.load_zero(), a)

    def mul(self, a: AssignedValue, b: AssignedValue) -> AssignedValue:
        out = a.value * b.value % FR
        base = self._gate(0, a.value, b.value, out)
        self.constant_pins.append((base, 0))
        self._copy_into(a, base + 1)
        self._copy_into(b, base + 2)
        return AssignedValue(self.ctx_id, base + 3, out)

    def mul_add(self, a: AssignedValue, b: AssignedValue,
                c: AssignedValue) -> AssignedValue:
        """c + a*b"""
        out = (c.value + a.value * b.value) % FR
        base = self._gate(c.value, a.value, b.value, out)
        self._copy_into(c, base)
        self._copy_into(a, base + 1)
        self._copy_into(b, base + 2)
        return AssignedValue(self.ctx_id, base + 3, out)

    def mul_const(self, a: AssignedValue, c: int) -> AssignedValue:
        out = a.value * c % FR
        base = self._gate(0, a.value, c % FR, out)
        self.constant_pins.append((base, 0))
        self._copy_into(a, base + 1)
        self.constant_pins.append((base + 2, c % FR))
        return AssignedValue(self.ctx_id, base + 3, out)

    def add_const(self, a: AssignedValue, c: int) -> AssignedValue:
        out = (a.value + c) % FR
        base = self._gate(a.value, c % FR, 1, out)
        self._copy_into(a, base)
        self.constant_pins.append((base + 1, c % FR))
        self.constant_pins.append((base + 2, 1))
        return AssignedValue(self.ctx_id, base + 3, out)

    def inner_product(self, xs, ys) -> AssignedValue:
        """Σ x_i * y_i; ys may be AssignedValue or int constants.

        Packed layout (halo2-base flex-gate style): overlapping vertical
        gates share the running accumulator cell —
        [acc0][x0][y0][acc1][x1][y1][acc2]... at 3 cells per term.
        """
        xs = list(xs)
        ys = list(ys)
        if not xs:
            return self.load_zero()
        base = len(self.cells)
        self.cells.append(0)
        self.constant_pins.append((base, 0))
        acc = 0
        pos = base
        for x, y in zip(xs, ys):
            yv = y.value if isinstance(y, AssignedValue) else int(y) % FR
            acc = (acc + x.value * yv) % FR
            self.cells.append(x.value)
            self._copy_into(x, pos + 1)
            self.cells.append(yv)
            if isinstance(y, AssignedValue):
                self._copy_into(y, pos + 2)
            else:
                self.constant_pins.append((pos + 2, yv))
            self.cells.append(acc)
            self.gate_rows.append(pos)
            pos += 3
        return AssignedValue(self.ctx_id, pos, acc)

    def select(self, a: AssignedValue, b: AssignedValue,
               sel: AssignedValue) -> AssignedValue:
        """sel ? a : b (sel must be boolean-constrained)."""
        d = self.sub(a, b)
        return self.mul_add(sel, d, b)

    def assert_bit(self, a: AssignedValue):
        """a * (a - 1) == 0 : gate [0, a, a-1?]... use: a*a = a."""
        base = self._gate(0, a.value, a.value, a.value)
        self.constant_pins.append((base, 0))
        self._copy_into(a, base + 1)
        self._copy_into(a, base + 2)
        self._copy_into(a, base + 3)

    def is_zero(self, a: AssignedValue) -> AssignedValue:
        """1 if a == 0 else 0, with the standard inverse-witness trick."""
        inv = inv_mod(a.value, FR) if a.value % FR else 0
        inv_av = self.assign(inv)
        # out = 1 - a*inv
        prod = self.mul(a, inv_av)
        out = self.sub(self.load_constant(1), prod)
        # a * out == 0
        z = self.mul(a, out)
        self.constrain_constant(z, 0)
        return out

    def is_equal(self, a: AssignedValue, b: AssignedValue) -> AssignedValue:
        return self.is_zero(self.sub(a, b))

    def bits_to_num(self, bits) -> AssignedValue:
        """Little-endian bits -> number."""
        return self.inner_product(bits, [pow(2, i, FR) for i in range(len(bits))])

    def num_to_bits(self, a: AssignedValue, n_bits: int) -> List[AssignedValue]:
        bits = [(a.value >> i) & 1 for i in range(n_bits)]
        avs = self.assign_many(bits)
        for b in avs:
            self.assert_bit(b)
        s = self.bits_to_num(avs)
        self.constrain_equal(s, a)
        return avs

    # ---- range lookups (pins consumed by RangeChip/compile) ----
    def pin_lookup(self, a: AssignedValue):
        self.lookup_cells.append(a.idx)


class CircuitBuilder:
    """Holds contexts + instance exposure; compiles to (cs, assignments)."""

    def __init__(self, lookup_bits: Optional[int] = None):
        self.ctx = Context(0)
        self.lookup_bits = lookup_bits
        self.exposed: List[AssignedValue] = []

    def main(self) -> Context:
        return self.ctx

    def expose_public(self, av: AssignedValue):
        self.exposed.append(av)

    def instances(self) -> List[List[int]]:
        return [[av.value for av in self.exposed]]

    def compile(self, k: int):
        """Lay out into plonk columns. Returns (cs, fixed_evals,
        advice_evals, instances)."""
        n = 1 << k
        cs = ConstraintSystem()
        ctx = self.ctx

        q_col = cs.fixed_column()
        const_col = cs.fixed_column()
        adv = cs.advice_column()
        cs.enable_equality(adv)
        cs.enable_equality(const_col)
        inst = cs.instance_column()
        cs.enable_equality(inst)

        a0 = adv.at(0)
        cs.create_gate("vertical",
                       q_col.at() * (adv.at(0) + adv.at(1) * adv.at(2)
                                     - adv.at(3)))

        table_col = lookup_col = None
        if self.lookup_bits is not None:
            table_col = cs.fixed_column()
            lookup_col = cs.advice_column()
            cs.enable_equality(lookup_col)
            cs.add_lookup("range", [lookup_col.at()], [table_col.at()])

        usable = cs.usable_rows(n)
        n_cells = len(ctx.cells)
        assert n_cells + 3 <= usable, (
            f"circuit needs {n_cells} cells; k={k} gives {usable} usable rows")

        # advice column values
        adv_vals = list(ctx.cells) + [0] * (n - n_cells)
        q_vals = [0] * n
        for r in ctx.gate_rows:
            q_vals[r] = 1

        # constants column: unique constants, copies from cells
        const_values: List[int] = []
        const_row: dict = {}
        for cell, cval in ctx.constant_pins:
            if cval not in const_row:
                const_row[cval] = len(const_values)
                const_values.append(cval)
        const_vals = const_values + [0] * (n - len(const_values))
        assert len(const_values) <= usable

        for cell, cval in ctx.constant_pins:
            cs.copy((adv.index, cell), (const_col.index, const_row[cval]))
        for a, b in ctx.equalities:
            cs.copy((adv.index, a), (adv.index, b))

        # instance exposure
        for i, av in enumerate(self.exposed):
            cs.copy((adv.index, av.idx), (inst.index, i))

        fixed_evals = [q_vals, const_vals]
        advice_evals = [adv_vals]

        if self.lookup_bits is not None:
            tb = 1 << self.lookup_bits
            assert tb <= usable
            table_vals = list(range(tb)) + [0] * (n - tb)
            lk_vals = [0] * n
            assert len(ctx.lookup_cells) <= usable, "too many lookup cells"
            for r, cell in enumerate(ctx.lookup_cells):
                lk_vals[r] = ctx.cells[cell]
                cs.copy((adv.index, cell), (lookup_col.index, r))
            fixed_evals.append(table_vals)
            advice_evals.append(lk_vals)

        return cs, fixed_evals, advice_evals, self.instances()
