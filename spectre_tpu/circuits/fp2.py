"""In-circuit Fq2 arithmetic (halo2-ecc Fp2Chip analog, u^2 = -1).

Every Fp2 product flattens into TWO Fp-level quad_mod_p calls (one per
output component), so a full complex multiplication costs two quotient/
carry chains — not four (ref dependency: Fp2Chip consumed by
sync_step_circuit.rs:33-41 via the bls12-381 fork of halo2-ecc).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from .builder import AssignedValue
from .bigint import FpChip, CrtInt


@dataclass
class Fp2Int:
    c0: CrtInt
    c1: CrtInt


class Fp2Chip:
    def __init__(self, fp: FpChip):
        self.fp = fp
        self.p = fp.p

    # ---- representation ----
    def load(self, v: Tuple[int, int]) -> Fp2Int:
        return Fp2Int(self.fp.load(v[0]), self.fp.load(v[1]))

    def const(self, v: Tuple[int, int]) -> Fp2Int:
        return Fp2Int(self.fp.const(v[0]), self.fp.const(v[1]))

    def one(self) -> Fp2Int:
        return Fp2Int(self.fp.one(), self.fp.zero())

    def value_of(self, a: Fp2Int) -> Tuple[int, int]:
        return (self.fp.value_of(a.c0) % self.p,
                self.fp.value_of(a.c1) % self.p)

    # ---- free linear ----
    def add_nr(self, a: Fp2Int, b: Fp2Int) -> Fp2Int:
        return Fp2Int(self.fp.add_no_red(a.c0, b.c0),
                      self.fp.add_no_red(a.c1, b.c1))

    def sub_nr(self, a: Fp2Int, b: Fp2Int) -> Fp2Int:
        return Fp2Int(self.fp.sub_no_red(a.c0, b.c0),
                      self.fp.sub_no_red(a.c1, b.c1))

    def neg_nr(self, a: Fp2Int) -> Fp2Int:
        return Fp2Int(self.fp.neg_no_red(a.c0), self.fp.neg_no_red(a.c1))

    def scale_nr(self, a: Fp2Int, c: int) -> Fp2Int:
        return Fp2Int(self.fp.scale_no_red(a.c0, c),
                      self.fp.scale_no_red(a.c1, c))

    def conjugate_nr(self, a: Fp2Int) -> Fp2Int:
        return Fp2Int(a.c0, self.fp.neg_no_red(a.c1))

    def select(self, sel: AssignedValue, a: Fp2Int, b: Fp2Int) -> Fp2Int:
        return Fp2Int(self.fp.select(sel, a.c0, b.c0),
                      self.fp.select(sel, a.c1, b.c1))

    # ---- quadratic forms (flattened per component) ----
    def quad(self, pos: Sequence[Tuple[Fp2Int, Fp2Int]] = (),
             neg: Sequence[Tuple[Fp2Int, Fp2Int]] = (),
             lin: Sequence[Fp2Int] = (),
             expect: Optional[Tuple[int, int]] = None) -> Optional[Fp2Int]:
        """Σ pos x·y − Σ neg u·v + Σ lin ≡ r in Fq2 (u² = −1)."""
        p0_pos, p0_neg = [], []
        p1_pos, p1_neg = [], []
        for (x, y) in pos:
            p0_pos.append((x.c0, y.c0))
            p0_neg.append((x.c1, y.c1))
            p1_pos.append((x.c0, y.c1))
            p1_pos.append((x.c1, y.c0))
        for (x, y) in neg:
            p0_neg.append((x.c0, y.c0))
            p0_pos.append((x.c1, y.c1))
            p1_neg.append((x.c0, y.c1))
            p1_neg.append((x.c1, y.c0))
        l0 = [a.c0 for a in lin]
        l1 = [a.c1 for a in lin]
        if expect is None:
            r0 = self.fp.quad_mod_p(p0_pos, p0_neg, l0)
            r1 = self.fp.quad_mod_p(p1_pos, p1_neg, l1)
            return Fp2Int(r0, r1)
        self.fp.quad_mod_p(p0_pos, p0_neg, l0, expect=expect[0])
        self.fp.quad_mod_p(p1_pos, p1_neg, l1, expect=expect[1])
        return None

    def assert_quad_zero(self, pos=(), neg=(), lin=()):
        self.quad(pos, neg, lin, expect=(0, 0))

    # ---- derived ----
    def mul(self, a: Fp2Int, b: Fp2Int) -> Fp2Int:
        return self.quad(pos=[(a, b)])

    def square(self, a: Fp2Int) -> Fp2Int:
        return self.mul(a, a)

    def reduce(self, a: Fp2Int) -> Fp2Int:
        return self.quad(lin=[a])

    def add(self, a: Fp2Int, b: Fp2Int) -> Fp2Int:
        return self.reduce(self.add_nr(a, b))

    def sub(self, a: Fp2Int, b: Fp2Int) -> Fp2Int:
        return self.reduce(self.sub_nr(a, b))

    def mul_by_fp(self, a: Fp2Int, c: CrtInt) -> Fp2Int:
        z = Fp2Int(c, self.fp.zero())
        return self.mul(a, z)

    def host_inv(self, v: Tuple[int, int]) -> Tuple[int, int]:
        from ..fields.host import inv_mod
        a, b = v[0] % self.p, v[1] % self.p
        d = inv_mod((a * a + b * b) % self.p, self.p)
        return (a * d % self.p, (-b) * d % self.p)

    def inv(self, a: Fp2Int) -> Fp2Int:
        ainv = self.load(self.host_inv(self.value_of(a)))
        self.quad(pos=[(a, ainv)], expect=(1, 0))
        return ainv

    def div(self, a: Fp2Int, b: Fp2Int) -> Fp2Int:
        from ..fields.host import inv_mod
        bv = self.value_of(b)
        av = self.value_of(a)
        biv = self.host_inv(bv)
        qv = ((av[0] * biv[0] - av[1] * biv[1]) % self.p,
              (av[0] * biv[1] + av[1] * biv[0]) % self.p)
        q = self.load(qv)
        self.quad(pos=[(q, b)], lin=[self.neg_nr(a)], expect=(0, 0))
        return q

    def assert_eq(self, a: Fp2Int, b: Fp2Int):
        self.quad(lin=[self.sub_nr(a, b)], expect=(0, 0))

    def assert_zero(self, a: Fp2Int):
        self.quad(lin=[a], expect=(0, 0))
