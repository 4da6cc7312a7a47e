"""In-circuit BLS12-381 pairing-product check (optimal ate).

The reference gets this from halo2-ecc's PairingChip / BlsSignatureChip
(sync_step_circuit.rs:75-78, :171 assert_valid_signature). Our design:

* Miller loop f_{x,Q}(P) over the 64-bit BLS parameter (|x| =
  0xd201000000010000, x < 0 → final conjugation), with T ∈ G2 kept in
  affine Fq2 coordinates (witnessed slopes) — no Fq12 point arithmetic;
* M-twist line functions are scaled by w³, giving the sparse form
      l·w³ = (λ·x_T − y_T) + (−λ·x_P)·w² + y_P·w³
  with coefficients at w-indices {0, 2, 3}. The per-line scale factor w³
  is NOT in Fp6, but an even number of line factors per squaring step
  makes the aggregate scale a power of w⁶ = ξ ∈ Fp2* — killed by the
  final exponentiation. The gadget therefore requires an EVEN number of
  pairing pairs (our use is exactly 2: e(pk, H(m))·e(−G, sig));
* final exponentiation: easy part conj·inv + p²-Frobenius, hard part via
  the Hayashida et al. decomposition
      (x−1)²·(x+p)·(x²+p²−1) + 3 = 3·(p⁴−p²+1)/r
  (verified numerically in tests) — computes the CUBE of the reduced
  pairing, which preserves the product-is-one predicate since 3 ∤ r.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

from ..fields.params import BLS12_381_FQ as P, BLS12_381_G1_GEN
from .builder import AssignedValue
from .bigint import FpChip, CrtInt
from .fp2 import Fp2Chip, Fp2Int
from .fp12 import Fp12Chip, Fp12Int, BLS_X
from .ecc import EccChip, EcPoint


class PairingChip:
    def __init__(self, fp: FpChip):
        self.fp = fp
        self.f2 = Fp2Chip(fp)
        self.f12 = Fp12Chip(self.f2)

    # ---- line helpers (P is a G1 point with CrtInt coords) ----

    def _line(self, lam: Fp2Int, T: EcPoint, P: EcPoint) -> Dict[int, Fp2Int]:
        f2, fp = self.f2, self.fp
        c0 = f2.quad(pos=[(lam, T.x)], lin=[f2.neg_nr(T.y)])
        # c2 = −λ·x_P (x_P ∈ Fp)
        c2 = Fp2Int(fp.quad_mod_p(neg=[(lam.c0, P.x)]),
                    fp.quad_mod_p(neg=[(lam.c1, P.x)]))
        c3 = Fp2Int(P.y, fp.zero())
        return {0: c0, 2: c2, 3: c3}

    def _dbl_step(self, T: EcPoint, P: EcPoint):
        """Returns (2T, line_{T,T}(P))."""
        f2 = self.f2
        x2 = f2.mul(T.x, T.x)
        lam = f2.div(f2.scale_nr(x2, 3), f2.scale_nr(T.y, 2))
        line = self._line(lam, T, P)
        x3 = f2.quad(pos=[(lam, lam)], lin=[f2.neg_nr(f2.scale_nr(T.x, 2))])
        y3 = f2.quad(pos=[(lam, f2.sub_nr(T.x, x3))], lin=[f2.neg_nr(T.y)])
        return EcPoint(x3, y3), line

    def _add_step(self, T: EcPoint, Q: EcPoint, P: EcPoint):
        """Returns (T+Q, line_{T,Q}(P))."""
        f2 = self.f2
        lam = f2.div(f2.sub_nr(Q.y, T.y), f2.sub_nr(Q.x, T.x))
        line = self._line(lam, T, P)
        x3 = f2.quad(pos=[(lam, lam)],
                     lin=[f2.neg_nr(T.x), f2.neg_nr(Q.x)])
        y3 = f2.quad(pos=[(lam, f2.sub_nr(T.x, x3))], lin=[f2.neg_nr(T.y)])
        return EcPoint(x3, y3), line

    # ---- multi-Miller + final exponentiation ----

    def multi_miller_loop(self, pairs: List[Tuple[EcPoint, EcPoint]]
                          ) -> Fp12Int:
        """f = Π_j f_{x,Q_j}(P_j); pairs = [(P ∈ G1, Q ∈ G2-twist)].
        Requires an even number of pairs (w³ line scaling, see module doc)."""
        assert len(pairs) % 2 == 0, "even pair count required"
        f12 = self.f12
        Ts = [Q for (_P, Q) in pairs]
        f = None
        bits = bin(BLS_X)[3:]
        for b in bits:
            if f is not None:
                f = f12.square(f)
            lines = []
            for j, (Pj, _Q) in enumerate(pairs):
                Ts[j], line = self._dbl_step(Ts[j], Pj)
                lines.append(line)
            if f is None:
                f = f12._product(sorted(lines[0].items()),
                                 sorted(lines[1].items()))
                lines = lines[2:]
            for line in lines:
                f = f12.mul_sparse(f, line)
            if b == "1":
                for j, (Pj, Qj) in enumerate(pairs):
                    Ts[j], line = self._add_step(Ts[j], Qj, Pj)
                    f = f12.mul_sparse(f, line)
        return f12.conjugate(f)  # x < 0

    def final_exp_is_one(self, f: Fp12Int):
        """Assert f^{(p¹²−1)/r} == 1 (via the cube, see module doc)."""
        f12 = self.f12
        # easy part: f ← f^{(p⁶−1)(p²+1)} — now unitary
        fi = f12.inv(f)
        f1 = f12.mul(f12.conjugate(f), fi)
        f = f12.mul(f12.frobenius(f1, 2), f1)
        # hard part (×3): (x−1)² · (x+p) · (x²+p²−1) + 3
        ex = f12.exp_by_neg_x
        t1 = f12.mul(ex(f), f12.conjugate(f))           # f^(x−1)
        t1 = f12.mul(ex(t1), f12.conjugate(t1))         # ^(x−1)
        t2 = f12.mul(ex(t1), f12.frobenius(t1, 1))      # ^(x+p)
        t3 = f12.mul(f12.mul(ex(ex(t2)), f12.frobenius(t2, 2)),
                     f12.conjugate(t2))                 # ^(x²+p²−1)
        res = f12.mul(t3, f12.mul(f12.square(f), f))    # ×f³
        f12.assert_one(res)

    def assert_pairing_product_one(self, pairs):
        self.final_exp_is_one(self.multi_miller_loop(pairs))

    # ---- BLS signature (ref BlsSignatureChip::assert_valid_signature) ----

    def assert_valid_signature(self, g1_ecc: EccChip, g2_ecc: EccChip,
                               agg_pk: EcPoint, msghash_g2: EcPoint,
                               sig_g2: EcPoint):
        """e(agg_pk, H(m)) · e(−G1, sig) == 1."""
        gx, gy = BLS12_381_G1_GEN
        neg_gen = g1_ecc.const_point((gx, (-gy) % P))
        self.assert_pairing_product_one(
            [(agg_pk, msghash_g2), (neg_gen, sig_g2)])
