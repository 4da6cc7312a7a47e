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

Layout: MULTI-COLUMN with break points — the virtual column flows down a
physical column of `usable` rows and spills into the next (halo2-base's
MultiPhaseThreadBreakPoints analog); a vertical-gate window never straddles
a break (its shared prefix is duplicated and copy-linked). Lookup pins and
fixed tables get their own column families. The derived layout is frozen
into the pinning JSON (column counts + break points + structural hash) at
keygen and verified in prover mode (`compile(k, pinning=...)`), mirroring
the reference's committed config/*.json round-trip (util/circuit.rs:26-52).
External regions (e.g. the wide SHA-256 engine) contribute their own
columns/gates/witness via `builder.regions`.
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
        self.table_pins: dict = {}              # table name -> [cell tuples]

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

    # ---- custom fixed-table lookups (e.g. the SHA-256 spread table) ----
    def pin_table(self, name: str, cells):
        """Record that the tuple of cells must appear as a row of table
        `name` (registered via CircuitBuilder.add_table)."""
        self.table_pins.setdefault(name, []).append(
            tuple(c.idx for c in cells))


class CircuitBuilder:
    """Holds contexts + instance exposure; compiles to (cs, assignments)."""

    def __init__(self, lookup_bits: Optional[int] = None):
        self.ctx = Context(0)
        self.lookup_bits = lookup_bits
        self.exposed: List[AssignedValue] = []
        self.tables: dict = {}   # name -> list of column value-lists

    def add_table(self, name: str, columns):
        """Register a fixed table (list of equal-length value columns)."""
        assert name not in self.tables
        self.tables[name] = [list(c) for c in columns]

    def main(self) -> Context:
        return self.ctx

    def expose_public(self, av: AssignedValue):
        self.exposed.append(av)

    def instances(self) -> List[List[int]]:
        return [[av.value for av in self.exposed]]

    def _layout(self, usable: int):
        """Place virtual cells into physical columns of height `usable`.

        The analog of halo2-base's break-point assignment: cells flow down a
        column and spill into the next; a vertical-gate window must stay
        contiguous inside one column, so a window that would straddle the
        break is relocated to the next column, duplicating its already-placed
        (chain-shared) prefix cells and linking them with copies.

        Returns (col_vals, q_rows, placements, dup_links):
          col_vals: per column list of values
          q_rows:   per column list of enabled-gate rows
          placements: virtual idx -> (col, row) primary location
          dup_links: [((col,row),(col,row))] extra equality pairs
        """
        ctx = self.ctx
        cells = ctx.cells
        gates = sorted(ctx.gate_rows)
        placements = {}
        dup_links = []
        col_vals: List[List[int]] = [[]]
        q_rows: List[List[int]] = [[]]

        def new_column():
            col_vals.append([])
            q_rows.append([])

        def place(virt, value):
            if len(col_vals[-1]) >= usable:
                new_column()
            c = col_vals[-1]
            r = len(c)
            c.append(value % FR)
            pos = (len(col_vals) - 1, r)
            if virt is not None and virt not in placements:
                placements[virt] = pos
            return pos

        v = 0
        for b in gates:
            while v < b:
                place(v, cells[v])
                v += 1
            shared = min(max(v - b, 0), 4)
            if shared == 0:
                if len(col_vals[-1]) + 4 > usable:
                    new_column()
                qpos = place(b, cells[b])
                for i in range(1, 4):
                    place(b + i, cells[b + i])
                v = b + 4
            elif shared < 4:
                c0, r0 = placements[b]
                cur = len(col_vals) - 1
                tail_ok = (
                    c0 == cur and r0 + shared == len(col_vals[-1])
                    and all(placements.get(b + i) == (c0, r0 + i)
                            for i in range(shared)))
                if tail_ok and r0 + 4 <= usable:
                    qpos = (c0, r0)
                else:
                    new_column()
                    qpos = None
                    for i in range(shared):
                        pos = place(None, cells[b + i])
                        dup_links.append((placements[b + i], pos))
                        if i == 0:
                            qpos = pos
                for i in range(shared, 4):
                    place(b + i, cells[b + i])
                v = b + 4
            else:
                # whole window already placed: must be contiguous (true for
                # all emission patterns in this builder)
                c0, r0 = placements[b]
                assert all(placements[b + i] == (c0, r0 + i)
                           for i in range(4)), "non-contiguous gate window"
                qpos = (c0, r0)
            q_rows[qpos[0]].append(qpos[1])
        while v < len(cells):
            place(v, cells[v])
            v += 1
        return col_vals, q_rows, placements, dup_links

    def compile(self, k: int, pinning=None):
        """Lay out into plonk columns. Returns (cs, fixed_evals,
        advice_evals, instances). External regions (builder.regions, e.g.
        the wide SHA-256 engine) contribute their own columns, gates,
        witness and copy links.

        pinning: optional Pinning recorded at keygen; the derived layout is
        checked against it and PinningMismatch raised on drift (the
        reference reads break points from committed JSON in prover mode,
        util/circuit.rs:26-52 / sync_step_circuit.rs:413-419 — layout here
        is deterministic, so the contract is verify-and-fail-loudly)."""
        n = 1 << k
        cs = ConstraintSystem()
        ctx = self.ctx
        # tentative usable-row count: the vertical gate (degree 3), the
        # range lookup (degree 4 rule) and region gates (degree <= 4)
        # dominate; ConstraintSystem recomputes blinding from the final
        # gate set, which matches this shape.
        usable_probe = n - 7
        col_vals, q_rows, placements, dup_links = self._layout(usable_probe)
        n_adv = len(col_vals)

        const_col = cs.fixed_column()
        cs.enable_equality(const_col)
        q_cols = [cs.fixed_column() for _ in range(n_adv)]
        adv_cols = [cs.advice_column() for _ in range(n_adv)]
        for a in adv_cols:
            cs.enable_equality(a)
        inst = cs.instance_column()
        cs.enable_equality(inst)

        for q, a in zip(q_cols, adv_cols):
            cs.create_gate("vertical",
                           q.at() * (a.at(0) + a.at(1) * a.at(2) - a.at(3)))

        table_col = None
        lookup_cols = []
        usable = cs.usable_rows(n)
        assert usable == usable_probe, "blinding-row probe out of sync"
        if self.lookup_bits is not None:
            table_col = cs.fixed_column()
            n_lk = max(1, -(-len(ctx.lookup_cells) // usable))
            for _ in range(n_lk):
                lc = cs.advice_column()
                cs.enable_equality(lc)
                cs.add_lookup("range", [lc.at()], [table_col.at()])
                lookup_cols.append(lc)

        for c in col_vals:
            assert len(c) <= usable, (
                f"layout used {len(c)} rows > usable {usable} at k={k}")

        def phys(virt):
            c, r = placements[virt]
            return (adv_cols[c].index, r)

        # ---- external regions: columns + gates + witness ----
        regions = getattr(self, "regions", [])
        region_fixed: dict = {}
        region_advice: dict = {}
        region_consts = []
        for rg in regions:
            rg.build(cs, usable)
        assert cs.usable_rows(n) == usable, "region gates changed blinding"
        for rg in regions:
            fv, av, rcopies, links, consts = rg.assign(n, usable)
            region_fixed.update(fv)
            region_advice.update(av)
            for (pa, pb) in rcopies:
                cs.copy(pa, pb)
            for (virt, pos) in links:
                cs.copy(phys(virt), pos)
            region_consts.extend(consts)

        # constants column (may spill into extra fixed columns)
        const_values: List[int] = []
        const_row: dict = {}
        for cell, cval in ctx.constant_pins:
            if cval not in const_row:
                const_row[cval] = len(const_values)
                const_values.append(cval)
        for (cval, _pos) in region_consts:
            cval %= FR
            if cval not in const_row:
                const_row[cval] = len(const_values)
                const_values.append(cval)
        extra_const_cols = []
        while len(const_values) > usable * (1 + len(extra_const_cols)):
            ec = cs.fixed_column()
            cs.enable_equality(ec)
            extra_const_cols.append(ec)
        all_const_cols = [const_col] + extra_const_cols

        def const_pos(cval):
            i = const_row[cval]
            return (all_const_cols[i // usable].index, i % usable)

        for cell, cval in ctx.constant_pins:
            cs.copy(phys(cell), const_pos(cval))
        for (cval, pos) in region_consts:
            cs.copy(pos, const_pos(cval % FR))
        for a, b in ctx.equalities:
            cs.copy(phys(a), phys(b))
        for (pa, pb) in dup_links:
            cs.copy((adv_cols[pa[0]].index, pa[1]),
                    (adv_cols[pb[0]].index, pb[1]))
        for i, av in enumerate(self.exposed):
            cs.copy(phys(av.idx), (inst.index, i))

        # ---- column value tables (keyed by global column index) ----
        fixed_by_idx: dict = dict(region_fixed)
        advice_by_idx: dict = dict(region_advice)

        for ci, col in enumerate(all_const_cols):
            vals = const_values[ci * usable:(ci + 1) * usable]
            fixed_by_idx[col.index] = vals + [0] * (n - len(vals))
        for qcol, rows in zip(q_cols, q_rows):
            qv = [0] * n
            for r in rows:
                qv[r] = 1
            fixed_by_idx[qcol.index] = qv
        for acol, c in zip(adv_cols, col_vals):
            advice_by_idx[acol.index] = c + [0] * (n - len(c))

        if self.lookup_bits is not None:
            tb = 1 << self.lookup_bits
            assert tb <= usable
            fixed_by_idx[table_col.index] = (
                list(range(tb)) + [0] * (n - tb))
            for li, lc in enumerate(lookup_cols):
                lk_vals = [0] * n
                for r, cell in enumerate(
                        ctx.lookup_cells[li * usable:(li + 1) * usable]):
                    lk_vals[r] = ctx.cells[cell]
                    cs.copy(phys(cell), (lc.index, r))
                advice_by_idx[lc.index] = lk_vals

        # ---- custom fixed tables + their pinned lookups ----
        for name, columns in self.tables.items():
            arity = len(columns)
            rows = len(columns[0])
            assert rows <= usable, f"table {name} taller than usable rows"
            # table rows must include the all-zero padding row for the
            # pin-columns' unused rows
            tcols = [cs.fixed_column() for _ in range(arity)]
            for tcol, cvals in zip(tcols, columns):
                fixed_by_idx[tcol.index] = list(cvals) + [0] * (n - rows)
            pins = ctx.table_pins.get(name, [])
            n_pin_cols = max(1, -(-len(pins) // usable))
            for pi in range(n_pin_cols):
                acols = [cs.advice_column() for _ in range(arity)]
                for a in acols:
                    cs.enable_equality(a)
                cs.add_lookup(f"table:{name}:{pi}",
                              [a.at() for a in acols],
                              [t.at() for t in tcols])
                vals = [[0] * n for _ in range(arity)]
                for r, cells in enumerate(
                        pins[pi * usable:(pi + 1) * usable]):
                    for j, cell in enumerate(cells):
                        vals[j][r] = ctx.cells[cell]
                        cs.copy(phys(cell), (acols[j].index, r))
                for acol, v in zip(acols, vals):
                    advice_by_idx[acol.index] = v

        fixed_evals = [fixed_by_idx[col.index] for col in cs.fixed]
        advice_evals = [advice_by_idx[col.index] for col in cs.advice]

        # ---- layout fingerprint (Halo2ConfigPinning round-trip contract,
        # util/circuit.rs:26-52): keygen freezes this in the pinning JSON;
        # prover-mode compile verifies it and fails loudly on drift.
        self.last_layout = {
            "k": k,
            "lookup_bits": self.lookup_bits,
            "n_advice": len(cs.advice),
            "n_fixed": len(cs.fixed),
            "n_lookups": len(cs.lookups),
            "break_points": [len(c) for c in col_vals],
            "layout_hash": _layout_hash(cs),
        }
        if pinning is not None:
            want = {k_: getattr(pinning, k_) for k_ in (
                "k", "lookup_bits", "n_advice", "n_fixed", "n_lookups",
                "break_points", "layout_hash")}
            got = self.last_layout
            bad = {k_ for k_ in want
                   if want[k_] is not None and want[k_] != got[k_]}
            if bad:
                raise PinningMismatch(
                    "circuit layout does not match the pinning: " +
                    ", ".join(f"{k_}: pinned {want[k_]!r} != built "
                              f"{got[k_]!r}" for k_ in sorted(bad)))
        return cs, fixed_evals, advice_evals, self.instances()


class PinningMismatch(AssertionError):
    """Prover-mode layout drifted from the keygen-time pinning."""


def _layout_hash(cs) -> str:
    """Stable structural digest of a compiled constraint system: column
    kinds/order, gate shapes (name, poly count, node count, degree),
    lookup shapes, copy count. Catches layout drift without serializing
    whole expression trees."""
    import hashlib as _hl
    h = _hl.sha256()
    for col in cs.columns:
        h.update(f"{col.kind}:{col.index};".encode())
    for g in cs.gates:
        h.update(f"g:{g.name}:{len(g.polys)}".encode())
        for p in g.polys:
            h.update(f":{_nodes(p)}:{p.degree()}".encode())
        h.update(b";")
    for lk in cs.lookups:
        h.update(f"l:{lk.name}:{len(lk.inputs)}:{len(lk.tables)};".encode())
    h.update(f"c:{len(cs.copies)}".encode())
    return h.hexdigest()[:32]


def _nodes(e) -> int:
    from ..plonk.expression import Sum, Prod, Scaled
    if isinstance(e, Sum):
        return 1 + sum(_nodes(t) for t in e.terms)
    if isinstance(e, Prod):
        return 1 + sum(_nodes(f) for f in e.factors)
    if isinstance(e, Scaled):
        return 1 + _nodes(e.inner)
    return 1
