"""In-circuit Fq12 arithmetic for BLS12-381 pairings.

Representation: 6 Fq2 coefficients over w (w^6 = ξ = 1+u) — the sextic
basis makes ξ-folds LINEAR, so every Fq12 product component flattens into a
single Fp-level quadratic form (one quotient/carry chain each, 12 chains
per full product; sparse line products cost the same chains with fewer
pairs). The reference consumes this layer from halo2-ecc's pairing chip
(SURVEY §2b; sync_step_circuit.rs:75-78 Fp12Chip/PairingChip).

Host-side mirrors (tower conversions, inverses, Frobenius constants) use
curves/pairing.Tower — the witness oracle validated against the golden
aggregate signature.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from ..fields.params import BLS12_381_FQ as P
from .builder import AssignedValue
from .bigint import FpChip, CrtInt
from .fp2 import Fp2Chip, Fp2Int

BLS_X = 0xd201000000010000  # |x|; the BLS12-381 parameter is -BLS_X


@dataclass
class Fp12Int:
    c: List[Fp2Int]  # 6 coefficients over w


@functools.lru_cache(maxsize=None)
def _frobenius_gammas(k: int) -> Tuple[Tuple[int, int], ...]:
    """γ_{k,i} = ξ^{i (p^k − 1) / 6} ∈ Fq2 for i in 0..5."""
    from ..curves.host import fq2_pow
    e = (P ** k - 1) // 6
    xi = (1, 1)
    out = []
    for i in range(6):
        out.append(fq2_pow(xi, i * e))
    return tuple(out)


class Fp12Chip:
    def __init__(self, f2: Fp2Chip):
        self.f2 = f2
        self.fp = f2.fp

    # ------------------------- representation -------------------------

    def one(self) -> Fp12Int:
        f2 = self.f2
        return Fp12Int([f2.const((1, 0))] + [f2.const((0, 0))
                                             for _ in range(5)])

    def load(self, v6: Tuple[Tuple[int, int], ...]) -> Fp12Int:
        return Fp12Int([self.f2.load(v) for v in v6])

    def value_of(self, a: Fp12Int) -> Tuple[Tuple[int, int], ...]:
        return tuple(self.f2.value_of(ci) for ci in a.c)

    # host tower (Fq6-pair) <-> sextic-over-Fq2 basis:
    # (a0 + a1 v + a2 v²) + (b0 + b1 v + b2 v²) w, v = w²
    # -> c = [a0, b0, a1, b1, a2, b2]
    @staticmethod
    def tower_to_c6(t) -> Tuple[Tuple[int, int], ...]:
        (a0, a1, a2), (b0, b1, b2) = t
        return (a0, b0, a1, b1, a2, b2)

    @staticmethod
    def c6_to_tower(c6):
        c0, c1, c2, c3, c4, c5 = c6
        return ((c0, c2, c4), (c1, c3, c5))

    # ------------------------- product machinery -------------------------

    def _emit_pairs(self, buckets, sign: int, xi_pow: int,
                    x: Fp2Int, y: Fp2Int):
        """Accumulate the Fp-level pairs of sign·ξ^xi_pow·(x·y) into
        buckets = (pos0, neg0, pos1, neg1)."""
        pos0, neg0, pos1, neg1 = buckets

        def put(plist, nlist, s, a, b):
            (plist if s > 0 else nlist).append((a, b))

        s = sign
        # plain product: comp0 = x0y0 − x1y1 ; comp1 = x0y1 + x1y0
        c0 = [(s, x.c0, y.c0), (-s, x.c1, y.c1)]
        c1 = [(s, x.c0, y.c1), (s, x.c1, y.c0)]
        if xi_pow:
            # ξ(A + Bu) = (A − B) + (A + B)u
            c0, c1 = ([*c0, *[(-t[0], t[1], t[2]) for t in c1]],
                      [*c1, *c0])
        for (ss, a, b) in c0:
            put(pos0, neg0, ss, a, b)
        for (ss, a, b) in c1:
            put(pos1, neg1, ss, a, b)

    def _product(self, terms: List[Tuple[int, Fp2Int]],
                 other: List[Tuple[int, Fp2Int]]) -> Fp12Int:
        """Π of two sparse w-polynomials given as [(w_index, coeff)]."""
        fp = self.fp
        out = []
        for k in range(6):
            buckets = ([], [], [], [])
            for (i, ai) in terms:
                for (j, bj) in other:
                    if (i + j) % 6 == k:
                        self._emit_pairs(buckets, 1, (i + j) // 6, ai, bj)
            pos0, neg0, pos1, neg1 = buckets
            c0 = fp.quad_mod_p(pos0, neg0)
            c1 = fp.quad_mod_p(pos1, neg1)
            out.append(Fp2Int(c0, c1))
        return Fp12Int(out)

    def mul(self, a: Fp12Int, b: Fp12Int) -> Fp12Int:
        return self._product([(i, ci) for i, ci in enumerate(a.c)],
                             [(j, cj) for j, cj in enumerate(b.c)])

    def square(self, a: Fp12Int) -> Fp12Int:
        return self.mul(a, a)

    def mul_sparse(self, a: Fp12Int, line: Dict[int, Fp2Int]) -> Fp12Int:
        return self._product([(i, ci) for i, ci in enumerate(a.c)],
                             sorted(line.items()))

    # ------------------------- cheap unary ops -------------------------

    def conjugate(self, a: Fp12Int) -> Fp12Int:
        """f^{p^6}: negate the odd-w coefficients (= inverse for unitary f)."""
        f2 = self.f2
        out = []
        for i, ci in enumerate(a.c):
            out.append(f2.reduce(f2.neg_nr(ci)) if i % 2 else ci)
        return Fp12Int(out)

    def frobenius(self, a: Fp12Int, k: int) -> Fp12Int:
        """f^{p^k}: conjugate^k per Fq2 coeff, times γ_{k,i} constants."""
        f2 = self.f2
        gammas = _frobenius_gammas(k)
        out = []
        for i, ci in enumerate(a.c):
            base = f2.conjugate_nr(ci) if k % 2 else ci
            g = f2.const(gammas[i])
            out.append(f2.mul(base, g))
        return Fp12Int(out)

    def inv(self, a: Fp12Int) -> Fp12Int:
        """General inverse via host witness + product check."""
        from ..curves.pairing import bls12_381
        T = bls12_381().T
        t = self.c6_to_tower(self.value_of(a))
        ti = T.i12(t)
        ainv = self.load(self.tower_to_c6(ti))
        prod = self.mul(a, ainv)
        self.assert_one(prod)
        return ainv

    def select(self, sel: AssignedValue, a: Fp12Int, b: Fp12Int) -> Fp12Int:
        return Fp12Int([self.f2.select(sel, x, y)
                        for x, y in zip(a.c, b.c)])

    def assert_one(self, a: Fp12Int):
        f2 = self.f2
        f2.quad(lin=[a.c[0]], expect=(1, 0))
        for ci in a.c[1:]:
            f2.assert_zero(ci)

    # ------------------------- exponentiation -------------------------

    def exp_by_neg_x(self, a: Fp12Int) -> Fp12Int:
        """a^x for the (negative) BLS parameter x = −BLS_X; requires a
        unitary (cyclotomic) input so inverse == conjugate."""
        bits = bin(BLS_X)[3:]
        acc = a
        for b in bits:
            acc = self.square(acc)
            if b == "1":
                acc = self.mul(acc, a)
        return self.conjugate(acc)
