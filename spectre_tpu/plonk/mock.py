"""MockProver — the constraint-satisfaction oracle (halo2 MockProver analog,
SURVEY.md §4 layer 1), evaluated as whole-column tensor passes on device.

Checks, given a full assignment:
  * every gate polynomial vanishes on all usable rows,
  * every copy constraint holds,
  * every lookup input row appears in its table,
  * instance columns match the provided instances.

Copy/lookup checks run on canonical plain-limb numpy views (byte-row set
membership) — no per-row python decoding, so 2^17-row circuits with
hundreds of thousands of copies verify in seconds.
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as L
from .cs import ConstraintSystem
from .expression import (eval_expr, eval_expr_int, int_bound,
                         collect_columns)


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
        self._ops = L.make_ops(spec)

    def _plain_rows(self, arr) -> np.ndarray:
        """Device canonical plain limbs -> (rows, n_limbs) int32 numpy."""
        return np.asarray(self._ops.from_mont(arr))

    def verify(self, raise_on_failure: bool = True) -> List[str]:
        failures: List[str] = []
        ops = self._ops
        usable = self.cs.usable_rows(self.n)

        # canonical plain views (built lazily, per column)
        plain_cache = {}

        def plain(col_idx) -> np.ndarray:
            if col_idx not in plain_cache:
                plain_cache[col_idx] = self._plain_rows(self.columns[col_idx])
            return plain_cache[col_idx]

        # ---- gate checks ----
        # Integer fast path: when every referenced column holds small
        # canonical values and the expression's worst-case magnitude fits
        # int64, evaluate exactly over the integers (==0 iff ==0 mod r).
        # This is what makes bit-decomposed regions (wide SHA-256: tens of
        # thousands of Montgomery multiplies per gate tree) verify in
        # milliseconds instead of minutes of XLA compilation.
        lb = self.spec.limb_bits
        m_small = 62 // lb - 1          # limbs kept in the int64 view
        int_views: dict = {}

        def int_view(ci):
            if ci not in int_views:
                pl = plain(ci)
                if pl[:, m_small:].any():
                    int_views[ci] = None
                else:
                    w = (1 << (lb * np.arange(m_small, dtype=np.int64)))
                    int_views[ci] = pl[:, :m_small].astype(np.int64) @ w
            return int_views[ci]

        slow: List[tuple] = []
        for g in self.cs.gates:
            for pi, p in enumerate(g.polys):
                refs = collect_columns(p)
                views = {ci: int_view(ci) for ci in refs}
                if all(v is not None for v in views.values()):
                    bounds = {ci: int(v.max(initial=0))
                              for ci, v in views.items()}
                    if (b := int_bound(p, bounds)) is not None \
                            and b < (1 << 62):
                        v = eval_expr_int(p, views)
                        bad = np.nonzero(
                            np.atleast_1d(v)[:usable])[0]
                        if bad.size:
                            failures.append(
                                f"gate '{g.name}' poly {pi} fails at rows "
                                f"{bad[:8].tolist()}"
                                f"{'...' if bad.size > 8 else ''}")
                        continue
                slow.append((g, pi, p))

        if slow:
            # group structurally identical polys (e.g. the vertical gate on
            # every advice column) and vmap members through ONE compiled
            # program per shape — a single jit over all polys built a
            # compile-killing graph at step-circuit scale (351 columns,
            # 20.7M cells: the round-2 minimal step mock never finished)
            from .prover import _remap_expr
            groups: dict = {}
            for idx, (_g, _pi, p) in enumerate(slow):
                refs = sorted(collect_columns(p))
                canon = _remap_expr(p, {gi: i for i, gi in enumerate(refs)})
                groups.setdefault(canon, []).append((idx, refs))

            import functools

            @functools.lru_cache(maxsize=None)
            def group_jit(canon):
                @jax.jit
                def f(stacked):
                    def one(cols):
                        v = eval_expr(canon, list(cols), self.spec)
                        return ~ops.is_zero(v, amplitude=32)
                    return jax.vmap(one)(stacked)
                return f

            results = [None] * len(slow)
            for canon, members in groups.items():
                R = max(1, len(members[0][1]))
                # member chunk bounds the stacked transient (~n*96B per col)
                gw = max(1, min(16, (1 << 29) // max(
                    R * self.n * 96, 1)))
                fn = group_jit(canon)
                for off in range(0, len(members), gw):
                    blk = members[off:off + gw]
                    take = len(blk)
                    width = 1 << max(0, (take - 1).bit_length())
                    stacks = [jnp.stack([self.columns[gi] for gi in refs]
                                        or [self.columns[0]])
                              for (_idx, refs) in blk]
                    while len(stacks) < width:
                        stacks.append(jnp.zeros_like(stacks[0]))
                    out = fn(jnp.stack(stacks))
                    for j, (idx, _refs) in enumerate(blk):
                        results[idx] = out[j]
            for (g, pi, _), nzd in zip(slow, results):
                nz = np.asarray(nzd)
                bad = np.nonzero(nz[:usable])[0]
                if bad.size:
                    failures.append(
                        f"gate '{g.name}' poly {pi} fails at rows "
                        f"{bad[:8].tolist()}{'...' if bad.size > 8 else ''}")

        # copy constraints: vectorized gather + compare per column pair
        if self.cs.copies:
            from collections import defaultdict
            by_pair = defaultdict(list)
            for (ca, ra), (cb, rb) in self.cs.copies:
                by_pair[(ca, cb)].append((ra, rb))
            for (ca, cb), pairs in by_pair.items():
                ra = np.array([p[0] for p in pairs])
                rb = np.array([p[1] for p in pairs])
                va = plain(ca)[ra]
                vb = plain(cb)[rb]
                neq = np.nonzero((va != vb).any(axis=1))[0]
                for j in neq[:4]:
                    failures.append(
                        f"copy ({ca},{int(ra[j])}) != ({cb},{int(rb[j])})")

        # lookups: byte-row set membership on canonical plain limbs
        for lk in self.cs.lookups:
            inp = [self._plain_rows(eval_expr(e, self.columns, self.spec))
                   for e in lk.inputs]
            tab = [self._plain_rows(eval_expr(e, self.columns, self.spec))
                   for e in lk.tables]
            inp_rows = np.concatenate(inp, axis=1)[:usable]
            tab_rows = np.concatenate(tab, axis=1)
            row_bytes = inp_rows.astype("<i4").tobytes()
            width = inp_rows.shape[1] * 4
            table_set = set()
            tb = tab_rows.astype("<i4").tobytes()
            for r in range(tab_rows.shape[0]):
                table_set.add(tb[r * width:(r + 1) * width])
            for r in range(inp_rows.shape[0]):
                if row_bytes[r * width:(r + 1) * width] not in table_set:
                    failures.append(
                        f"lookup '{lk.name}' row {r} not in table")
                    break

        if failures and raise_on_failure:
            raise AssertionError("MockProver failures:\n" + "\n".join(failures))
        return failures
