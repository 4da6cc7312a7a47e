"""Host-side elliptic curve arithmetic (python-int oracle).

Short Weierstrass y^2 = x^3 + b over a prime field; affine + jacobian ops,
BLS12-381 G1/G2 point (de)compression matching the ZCash/halo2curves
serialization used by the reference witnesses
(lightclient-circuits/src/poseidon.rs:166-183, witness/step.rs:105-118).
"""
from __future__ import annotations

from dataclasses import dataclass

from ..fields.host import inv_mod, sqrt_mod
from ..fields import params as P


@dataclass(frozen=True)
class CurveHost:
    p: int
    b: int
    gen: tuple
    name: str = ""

    # Points are (x, y) tuples or None for identity.

    def is_on_curve(self, pt) -> bool:
        if pt is None:
            return True
        x, y = pt
        return (y * y - x * x * x - self.b) % self.p == 0

    def add(self, p1, p2):
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        p_, (x1, y1), (x2, y2) = self.p, p1, p2
        if x1 == x2:
            if (y1 + y2) % p_ == 0:
                return None
            lam = (3 * x1 * x1) * inv_mod(2 * y1, p_) % p_
        else:
            lam = (y2 - y1) * inv_mod(x2 - x1, p_) % p_
        x3 = (lam * lam - x1 - x2) % p_
        y3 = (lam * (x1 - x3) - y1) % p_
        return (x3, y3)

    def neg(self, pt):
        if pt is None:
            return None
        x, y = pt
        return (x, (-y) % self.p)

    def mul(self, pt, k: int):
        k %= 1 << 512  # scalars are bounded; callers pass reduced values
        acc = None
        add = pt
        while k:
            if k & 1:
                acc = self.add(acc, add)
            add = self.add(add, add)
            k >>= 1
        return acc

    def msm(self, points, scalars):
        acc = None
        for pt, k in zip(points, scalars):
            acc = self.add(acc, self.mul(pt, k))
        return acc


bn254_g1 = CurveHost(P.BN254_FQ, P.BN254_B, P.BN254_G1_GEN, "bn254_g1")
bls_g1 = CurveHost(P.BLS12_381_FQ, P.BLS12_381_B, P.BLS12_381_G1_GEN, "bls12_381_g1")


# ---------------- BLS12-381 serialization (ZCash format) ----------------
# Compressed G1: 48 bytes BE of x with flag bits in the top byte:
#   bit7 (0x80): compression flag (always 1 for compressed)
#   bit6 (0x40): infinity flag
#   bit5 (0x20): sign flag — set iff y is the lexicographically larger root
# Uncompressed G1: 96 bytes BE: x || y (flags on first byte, zero for finite).

FQ = P.BLS12_381_FQ


def g1_decompress(b: bytes):
    assert len(b) == 48
    flags = b[0]
    assert flags & 0x80, "not a compressed encoding"
    if flags & 0x40:
        return None
    sign = bool(flags & 0x20)
    x = int.from_bytes(bytes([flags & 0x1F]) + b[1:], "big")
    assert x < FQ, "x out of range"
    y = sqrt_mod((x * x % FQ * x + P.BLS12_381_B) % FQ, FQ)
    assert y is not None, "x not on curve"
    # lexicographically larger root <=> y > (p-1)/2 <=> 2y > p
    if (2 * y > FQ) != sign:
        y = FQ - y
    return (x, y)


def g1_compress(pt) -> bytes:
    if pt is None:
        return bytes([0xC0] + [0] * 47)
    x, y = pt
    sign = 0x20 if 2 * y > FQ else 0
    out = bytearray(x.to_bytes(48, "big"))
    out[0] |= 0x80 | sign
    return bytes(out)


def g1_from_uncompressed(b: bytes):
    assert len(b) == 96
    flags = b[0]
    if flags & 0x40:
        return None
    x = int.from_bytes(bytes([flags & 0x1F]) + b[1:48], "big")
    y = int.from_bytes(b[48:], "big")
    assert x < FQ and y < FQ
    return (x, y)


def g1_to_uncompressed(pt) -> bytes:
    if pt is None:
        return bytes([0x40] + [0] * 95)
    x, y = pt
    return x.to_bytes(48, "big") + y.to_bytes(48, "big")


# ---------------- Fq2 / G2 host arithmetic ----------------
# Fq2 = Fq[u] / (u^2 + 1), elements (c0, c1) = c0 + c1*u.

def fq2_add(a, b):
    return ((a[0] + b[0]) % FQ, (a[1] + b[1]) % FQ)


def fq2_sub(a, b):
    return ((a[0] - b[0]) % FQ, (a[1] - b[1]) % FQ)


def fq2_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 - a1 * b1) % FQ, (a0 * b1 + a1 * b0) % FQ)


def fq2_sqr(a):
    a0, a1 = a
    return ((a0 + a1) * (a0 - a1) % FQ, 2 * a0 * a1 % FQ)


def fq2_neg(a):
    return ((-a[0]) % FQ, (-a[1]) % FQ)


def fq2_inv(a):
    a0, a1 = a
    t = inv_mod(a0 * a0 + a1 * a1, FQ)
    return (a0 * t % FQ, (-a1) * t % FQ)


def fq2_is_zero(a):
    return a[0] % FQ == 0 and a[1] % FQ == 0


def fq2_pow(a, e: int):
    r = (1, 0)
    base = a
    while e:
        if e & 1:
            r = fq2_mul(r, base)
        base = fq2_sqr(base)
        e >>= 1
    return r


def fq2_sqrt_impl(a):
    """sqrt in Fq2 for p ≡ 3 (mod 4) via the standard two-candidate method."""
    if fq2_is_zero(a):
        return (0, 0)
    a1 = fq2_pow(a, (FQ - 3) // 4)
    alpha = fq2_mul(fq2_sqr(a1), a)
    x0 = fq2_mul(a1, a)
    if alpha == ((FQ - 1) % FQ, 0):
        return (FQ - x0[1] if x0[1] else 0, x0[0])  # i * x0
    b = fq2_pow(fq2_add(alpha, (1, 0)), (FQ - 1) // 2)
    x = fq2_mul(b, x0)
    if fq2_sqr(x) == (a[0] % FQ, a[1] % FQ):
        return x
    return None


class G2Host:
    """BLS12-381 G2: y^2 = x^3 + 4(1+u) over Fq2. Points ((x0,x1),(y0,y1))."""

    B2 = (4, 4)

    def is_on_curve(self, pt):
        if pt is None:
            return True
        x, y = pt
        rhs = fq2_add(fq2_mul(fq2_sqr(x), x), self.B2)
        return fq2_sqr(y) == rhs

    def add(self, p1, p2):
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        x1, y1 = p1
        x2, y2 = p2
        if x1 == x2:
            if fq2_is_zero(fq2_add(y1, y2)):
                return None
            lam = fq2_mul(fq2_mul((3, 0), fq2_sqr(x1)), fq2_inv(fq2_mul((2, 0), y1)))
        else:
            lam = fq2_mul(fq2_sub(y2, y1), fq2_inv(fq2_sub(x2, x1)))
        x3 = fq2_sub(fq2_sub(fq2_sqr(lam), x1), x2)
        y3 = fq2_sub(fq2_mul(lam, fq2_sub(x1, x3)), y1)
        return (x3, y3)

    def neg(self, pt):
        if pt is None:
            return None
        x, y = pt
        return (x, fq2_neg(y))

    def mul(self, pt, k: int):
        acc = None
        add = pt
        while k:
            if k & 1:
                acc = self.add(acc, add)
            add = self.add(add, add)
            k >>= 1
        return acc


bls_g2_host = G2Host()


def g2_decompress(b: bytes):
    """Decompress a 96-byte BE ZCash-format G2 point.

    Encoding: x_c1 || x_c0 (48 bytes each), flags on byte 0 as in G1; the
    sign flag is set iff y is lexicographically larger, comparing (y_c1, y_c0).
    """
    assert len(b) == 96
    flags = b[0]
    assert flags & 0x80
    if flags & 0x40:
        return None
    sign = bool(flags & 0x20)
    x_c1 = int.from_bytes(bytes([flags & 0x1F]) + b[1:48], "big")
    x_c0 = int.from_bytes(b[48:96], "big")
    x = (x_c0, x_c1)
    rhs = fq2_add(fq2_mul(fq2_sqr(x), x), G2Host.B2)
    y = fq2_sqrt_impl(rhs)
    assert y is not None, "x not on G2 curve"
    if _fq2_lex_larger(y) != sign:
        y = fq2_neg(y)
    return (x, y)


def _fq2_lex_larger(y) -> bool:
    """True iff y > -y lexicographically: compare c1 first, then c0."""
    y0, y1 = y[0] % FQ, y[1] % FQ
    n0, n1 = (-y0) % FQ, (-y1) % FQ
    if y1 != n1:
        return y1 > n1
    return y0 > n0


def g2_compress(pt) -> bytes:
    if pt is None:
        return bytes([0xC0] + [0] * 95)
    x, y = pt
    sign = 0x20 if _fq2_lex_larger(y) else 0
    out = bytearray(x[1].to_bytes(48, "big") + x[0].to_bytes(48, "big"))
    out[0] |= 0x80 | sign
    return bytes(out)
