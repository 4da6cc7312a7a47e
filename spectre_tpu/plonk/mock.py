"""MockProver — the constraint-satisfaction oracle (halo2 MockProver analog,
SURVEY.md §4 layer 1), evaluated as whole-column tensor passes on device.

Checks, given a full assignment:
  * every gate polynomial vanishes on all usable rows,
  * every copy constraint holds,
  * every lookup input row appears in its table,
  * instance columns match the provided instances.
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as L
from ..fields.params import BN254_FR as FR
from .cs import ConstraintSystem, INSTANCE
from .expression import eval_expr


class MockProver:
    def __init__(self, cs: ConstraintSystem, n_rows: int, columns,
                 spec: L.FieldSpec = L.fr_spec):
        """columns: list/array of (n_rows, n_limbs) Montgomery limb arrays in
        global column order (len == len(cs.columns))."""
        self.cs = cs
        self.n = n_rows
        self.spec = spec
        self.columns = [jnp.asarray(c, jnp.int32) for c in columns]
        assert len(self.columns) == len(cs.columns)

    def verify(self, raise_on_failure: bool = True) -> List[str]:
        failures: List[str] = []
        ops = L.make_ops(self.spec)
        usable = self.cs.usable_rows(self.n)

        @jax.jit
        def gate_fail_rows(cols):
            outs = []
            for g in self.cs.gates:
                for p in g.polys:
                    v = eval_expr(p, cols, self.spec)
                    nz = ~ops.is_zero(v, amplitude=32)
                    outs.append(nz)
            return outs

        results = gate_fail_rows(self.columns)
        i = 0
        for g in self.cs.gates:
            for pi, p in enumerate(g.polys):
                nz = np.asarray(results[i])
                i += 1
                bad = np.nonzero(nz[:usable])[0]
                if bad.size:
                    failures.append(
                        f"gate '{g.name}' poly {pi} fails at rows "
                        f"{bad[:8].tolist()}{'...' if bad.size > 8 else ''}")

        # copy constraints
        if self.cs.copies:
            host_cols = [np.asarray(c) for c in self.columns]
            for (ca, ra), (cb, rb) in self.cs.copies:
                va = self.spec.decode(host_cols[ca][ra])
                vb = self.spec.decode(host_cols[cb][rb])
                if va != vb:
                    failures.append(
                        f"copy ({ca},{ra}) != ({cb},{rb}): {va} vs {vb}")

        # lookups (host check: set membership of decoded tuples)
        for lk in self.cs.lookups:
            inp = [np.asarray(eval_expr(e, self.columns, self.spec))
                   for e in lk.inputs]
            tab = [np.asarray(eval_expr(e, self.columns, self.spec))
                   for e in lk.tables]
            inp_vals = [tuple(self.spec.decode(c[r]) for c in inp)
                        for r in range(usable)]
            tab_vals = {tuple(self.spec.decode(c[r]) for c in tab)
                        for r in range(self.n)}
            for r, tupl in enumerate(inp_vals):
                if tupl not in tab_vals:
                    failures.append(
                        f"lookup '{lk.name}' row {r}: {tupl} not in table")
                    break

        if failures and raise_on_failure:
            raise AssertionError("MockProver failures:\n" + "\n".join(failures))
        return failures
