"""Pairings for BN254 and BLS12-381 (host, python-int).

Generic Fq12 tower (Fq2 = Fq[u]/(u²+1), Fq6 = Fq2[v]/(v³-ξ),
Fq12 = Fq6[w]/(w²-v)) + reduced Tate pairing with a full Miller loop over r
(numerator/denominator accumulation, one final inversion) and final
exponentiation by (p¹²-1)/r. Slow-but-exact — the verification-side oracle:
KZG pairing checks (replacing the test-SRS trapdoor check) and BLS
aggregate-signature verification of witnesses (the blst analog used by the
reference's fixture generator, unit_test_gen.rs:129-134).

G2 points (on the twist over Fq2) are untwisted into E(Fq12):
  D-type (BN254, b' = b/ξ):  ψ(x, y) = (x·w², y·w³)
  M-type (BLS12-381, b' = b·ξ): ψ(x, y) = (x/w², y/w³)
both using w⁶ = ξ.
"""
from __future__ import annotations

import functools

from ..fields import params as PR
from ..fields.host import inv_mod


class Tower:
    """Fq12 arithmetic over prime p with non-residue xi = xi0 + xi1·u."""

    def __init__(self, p: int, xi: tuple):
        self.p = p
        self.xi = (xi[0] % p, xi[1] % p)

    # ---- Fq2 ----
    def e2(self, c0=0, c1=0):
        return (c0 % self.p, c1 % self.p)

    def a2(self, a, b):
        return ((a[0] + b[0]) % self.p, (a[1] + b[1]) % self.p)

    def s2(self, a, b):
        return ((a[0] - b[0]) % self.p, (a[1] - b[1]) % self.p)

    def m2(self, a, b):
        p = self.p
        return ((a[0] * b[0] - a[1] * b[1]) % p,
                (a[0] * b[1] + a[1] * b[0]) % p)

    def i2(self, a):
        p = self.p
        t = inv_mod(a[0] * a[0] + a[1] * a[1], p)
        return (a[0] * t % p, (-a[1]) * t % p)

    def mxi(self, a):
        return self.m2(a, self.xi)

    # ---- Fq6: triples of Fq2 (c0 + c1 v + c2 v²), v³ = ξ ----
    def e6(self, c0=None, c1=None, c2=None):
        z = self.e2()
        return (c0 or z, c1 or z, c2 or z)

    def a6(self, a, b):
        return tuple(self.a2(x, y) for x, y in zip(a, b))

    def s6(self, a, b):
        return tuple(self.s2(x, y) for x, y in zip(a, b))

    def m6(self, a, b):
        m2, a2, mxi = self.m2, self.a2, self.mxi
        t0 = m2(a[0], b[0])
        t1 = m2(a[1], b[1])
        t2 = m2(a[2], b[2])
        c0 = a2(t0, mxi(self.s2(self.s2(m2(a2(a[1], a[2]), a2(b[1], b[2])), t1), t2)))
        c1 = a2(self.s2(self.s2(m2(a2(a[0], a[1]), a2(b[0], b[1])), t0), t1),
                mxi(t2))
        c2 = a2(self.s2(self.s2(m2(a2(a[0], a[2]), a2(b[0], b[2])), t0), t2), t1)
        return (c0, c1, c2)

    def mv6(self, a):
        """Multiply by v: (c0, c1, c2) -> (ξ c2, c0, c1)."""
        return (self.mxi(a[2]), a[0], a[1])

    def i6(self, a):
        m2, s2, mxi = self.m2, self.s2, self.mxi
        c0 = s2(m2(a[0], a[0]), mxi(m2(a[1], a[2])))
        c1 = s2(mxi(m2(a[2], a[2])), m2(a[0], a[1]))
        c2 = s2(m2(a[1], a[1]), m2(a[0], a[2]))
        t = self.a2(self.a2(m2(a[0], c0), mxi(m2(a[2], c1))), mxi(m2(a[1], c2)))
        ti = self.i2(t)
        return (m2(c0, ti), m2(c1, ti), m2(c2, ti))

    # ---- Fq12: pairs of Fq6 (d0 + d1 w), w² = v ----
    def one12(self):
        o = self.e6(self.e2(1))
        return (o, self.e6())

    def a12(self, a, b):
        return (self.a6(a[0], b[0]), self.a6(a[1], b[1]))

    def s12(self, a, b):
        return (self.s6(a[0], b[0]), self.s6(a[1], b[1]))

    def m12(self, a, b):
        t0 = self.m6(a[0], b[0])
        t1 = self.m6(a[1], b[1])
        c0 = self.a6(t0, self.mv6(t1))
        c1 = self.s6(self.s6(self.m6(self.a6(a[0], a[1]),
                                     self.a6(b[0], b[1])), t0), t1)
        return (c0, c1)

    def sq12(self, a):
        return self.m12(a, a)

    def i12(self, a):
        t = self.s6(self.m6(a[0], a[0]), self.mv6(self.m6(a[1], a[1])))
        ti = self.i6(t)
        neg1 = tuple(self.s2(self.e2(), c) for c in a[1])
        return (self.m6(a[0], ti), self.m6(neg1, ti))

    def pow12(self, a, e: int):
        r = self.one12()
        base = a
        while e:
            if e & 1:
                r = self.m12(r, base)
            base = self.sq12(base)
            e >>= 1
        return r

    def is_one(self, a) -> bool:
        return a == self.one12()

    # scalars embed at the Fq2->Fq6->Fq12 base
    def from_fq(self, x: int):
        return (self.e6(self.e2(x)), self.e6())

    def from_fq2(self, x):
        return (self.e6(self.e2(*x)), self.e6())

    def w(self):
        """The element w (= (0, 1) in the Fq6 pair basis)."""
        return (self.e6(), self.e6(self.e2(1)))


class PairingEngine:
    def __init__(self, p: int, r: int, b: int, xi: tuple, twist: str):
        self.T = Tower(p, xi)
        self.p, self.r, self.b = p, r, b
        assert twist in ("D", "M")
        self.twist = twist
        self.final_exp = (p ** 12 - 1) // r

    # points in E(Fq12): (x, y) with x, y Fq12 elems; None = identity
    def untwist(self, q2):
        """G2 point over Fq2 (twist curve) -> E(Fq12)."""
        if q2 is None:
            return None
        T = self.T
        (x, y) = q2
        w = T.w()
        w2 = T.m12(w, w)
        w3 = T.m12(w2, w)
        if self.twist == "D":
            return (T.m12(T.from_fq2(x), w2), T.m12(T.from_fq2(y), w3))
        return (T.m12(T.from_fq2(x), T.i12(w2)),
                T.m12(T.from_fq2(y), T.i12(w3)))

    def embed_g1(self, p1):
        if p1 is None:
            return None
        T = self.T
        return (T.from_fq(p1[0]), T.from_fq(p1[1]))

    def _add(self, A, B):
        """E(Fq12) affine addition."""
        T = self.T
        if A is None:
            return B
        if B is None:
            return A
        if A[0] == B[0]:
            if T.a12(A[1], B[1]) == (T.e6(), T.e6()):
                return None
            three = T.from_fq(3)
            two = T.from_fq(2)
            lam = T.m12(T.m12(three, T.m12(A[0], A[0])),
                        T.i12(T.m12(two, A[1])))
        else:
            lam = T.m12(T.s12(B[1], A[1]), T.i12(T.s12(B[0], A[0])))
        x3 = T.s12(T.s12(T.m12(lam, lam), A[0]), B[0])
        y3 = T.s12(T.m12(lam, T.s12(A[0], x3)), A[1])
        return (x3, y3)

    def _line(self, A, B, Q):
        """(numerator, denominator) of the Miller line step through A,B at Q."""
        T = self.T
        if A[0] == B[0] and T.a12(A[1], B[1]) == (T.e6(), T.e6()):
            # vertical line: x_Q - x_A
            return T.s12(Q[0], A[0]), T.one12()
        if A[0] == B[0]:
            three = T.from_fq(3)
            two = T.from_fq(2)
            lam = T.m12(T.m12(three, T.m12(A[0], A[0])),
                        T.i12(T.m12(two, A[1])))
        else:
            lam = T.m12(T.s12(B[1], A[1]), T.i12(T.s12(B[0], A[0])))
        # l(Q) = y_Q - y_A - λ(x_Q - x_A); v(Q) = x_Q - x_{A+B}
        num = T.s12(T.s12(Q[1], A[1]), T.m12(lam, T.s12(Q[0], A[0])))
        C = self._add(A, B)
        if C is None:
            return num, T.one12()
        den = T.s12(Q[0], C[0])
        return num, den

    def miller(self, P, Q):
        """f_{r,P}(Q) — textbook double-and-add with one final division."""
        T = self.T
        f_num = T.one12()
        f_den = T.one12()
        A = P
        bits = bin(self.r)[3:]  # MSB after the leading 1
        for bit in bits:
            n, d = self._line(A, A, Q)
            f_num = T.m12(T.sq12(f_num), n)
            f_den = T.m12(T.sq12(f_den), d)
            A = self._add(A, A)
            if bit == "1":
                n, d = self._line(A, P, Q)
                f_num = T.m12(f_num, n)
                f_den = T.m12(f_den, d)
                A = self._add(A, P)
        return T.m12(f_num, T.i12(f_den))

    def pairing(self, p1, q2) -> tuple:
        """Reduced Tate pairing e(P∈G1, Q∈G2-on-twist) -> Fq12 (unity-root)."""
        if p1 is None or q2 is None:
            return self.T.one12()
        P = self.embed_g1(p1)
        Q = self.untwist(q2)
        f = self.miller(P, Q)
        return self.T.pow12(f, self.final_exp)

    def pairing_check(self, pairs) -> bool:
        """Π e(P_i, Q_i) == 1 (the product form every verifier uses)."""
        T = self.T
        acc = T.one12()
        for p1, q2 in pairs:
            acc = T.m12(acc, self.pairing(p1, q2))
        return T.is_one(acc)


@functools.lru_cache(maxsize=None)
def bn254() -> PairingEngine:
    return PairingEngine(PR.BN254_FQ, PR.BN254_FR, PR.BN254_B,
                         (9, 1), "D")


@functools.lru_cache(maxsize=None)
def bls12_381() -> PairingEngine:
    return PairingEngine(PR.BLS12_381_FQ, PR.BLS12_381_FR, PR.BLS12_381_B,
                         (1, 1), "M")


# ---------------- BLS signature verification (host oracle) ----------------

def bls_verify_aggregate(pubkeys, signature_g2, message: bytes,
                         dst: bytes) -> bool:
    """e(agg_pk, H2(msg)) == e(G1, sig): the blst oracle for our witnesses."""
    from .host import bls_g1
    from .hash_to_curve import hash_to_g2
    agg = None
    for pk in pubkeys:
        agg = bls_g1.add(agg, pk)
    h = hash_to_g2(message, dst)
    eng = bls12_381()
    neg_gen = bls_g1.neg(bls_g1.gen)
    return eng.pairing_check([(agg, h), (neg_gen, signature_g2)])
