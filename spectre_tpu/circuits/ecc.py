"""In-circuit short-Weierstrass ECC over a foreign field (halo2-ecc EccChip
analog), generic over the coordinate chip: FpChip (BLS12-381 G1) or Fp2Chip
(G2). Consumed by the step circuit's pubkey aggregation / signature checks
(ref sync_step_circuit.rs:292-364, :279-288).

Affine points; unequal addition with witnessed slope (the degenerate-branch
witness is free but the selected branch's constraints always bind, matching
halo2-ecc's strict unequal-add usage under the aggregation randomness
assumption)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

from .builder import AssignedValue


@dataclass
class EcPoint:
    x: object
    y: object


class EccChip:
    def __init__(self, field, b_coeff):
        """field: FpChip-like (quad/assert_quad_zero/... interface);
        b_coeff: curve constant b in the field's host representation."""
        self.f = field
        self.b_const = (field.const(b_coeff)
                        if not hasattr(b_coeff, "limbs") else b_coeff)

    # ---- loading / checks ----
    def load_point(self, xy) -> EcPoint:
        x, y = xy
        return EcPoint(self.f.load(x), self.f.load(y))

    def const_point(self, xy) -> EcPoint:
        x, y = xy
        return EcPoint(self.f.const(x), self.f.const(y))

    def assert_on_curve(self, P: EcPoint):
        """y² − x³ − b == 0."""
        f = self.f
        x2 = f.mul(P.x, P.x)
        f.assert_quad_zero(pos=[(P.y, P.y)], neg=[(x2, P.x)],
                           lin=[f.neg_nr(self.b_const)])

    # ---- group ops ----
    def add_unequal(self, P: EcPoint, Q: EcPoint) -> EcPoint:
        f = self.f
        lam = f.div(f.sub_nr(Q.y, P.y), f.sub_nr(Q.x, P.x))
        x3 = f.quad(pos=[(lam, lam)], lin=[f.neg_nr(P.x), f.neg_nr(Q.x)])
        y3 = f.quad(pos=[(lam, f.sub_nr(P.x, x3))], lin=[f.neg_nr(P.y)])
        return EcPoint(x3, y3)

    def double(self, P: EcPoint) -> EcPoint:
        f = self.f
        x2 = f.mul(P.x, P.x)
        lam = f.div(f.scale_nr(x2, 3), f.scale_nr(P.y, 2))
        x3 = f.quad(pos=[(lam, lam)], lin=[f.neg_nr(f.scale_nr(P.x, 2))])
        y3 = f.quad(pos=[(lam, f.sub_nr(P.x, x3))], lin=[f.neg_nr(P.y)])
        return EcPoint(x3, y3)

    def negate(self, P: EcPoint) -> EcPoint:
        f = self.f
        return EcPoint(P.x, f.quad(lin=[f.neg_nr(P.y)]))

    def select(self, sel: AssignedValue, P: EcPoint, Q: EcPoint) -> EcPoint:
        f = self.f
        return EcPoint(f.select(sel, P.x, Q.x), f.select(sel, P.y, Q.y))

    def add_conditional(self, acc: EcPoint, P: EcPoint,
                        bit: AssignedValue) -> EcPoint:
        """bit ? acc + P : acc (add always materialized; strict-unequal)."""
        s = self.add_unequal(acc, P)
        return self.select(bit, s, acc)

    def assert_eq(self, P: EcPoint, Q: EcPoint):
        self.f.assert_eq(P.x, Q.x)
        self.f.assert_eq(P.y, Q.y)

    def scalar_mul_const(self, P: EcPoint, k: int) -> EcPoint:
        """[k]P for a fixed positive constant scalar (double-and-add,
        MSB-first; degenerate intermediate equalities are negligible for
        random inputs, as in the reference's usage)."""
        assert k > 0
        bits = bin(k)[2:]
        acc = P
        for b in bits[1:]:
            acc = self.double(acc)
            if b == "1":
                acc = self.add_unequal(acc, P)
        return acc

    def sum_with_selectors(self, points: List[EcPoint],
                           bits: List[AssignedValue],
                           start: EcPoint) -> EcPoint:
        """start + Σ bits_i·points_i (the aggregate-pubkeys shape,
        ref sync_step_circuit.rs:338-355)."""
        acc = start
        for P, b in zip(points, bits):
            acc = self.add_conditional(acc, P, b)
        return acc
