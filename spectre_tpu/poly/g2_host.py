"""BN254 G2 host arithmetic (twist curve y² = x³ + 3/(9+u) over Fq2)."""
from __future__ import annotations

from ..fields.params import BN254_FQ as P
from ..fields.host import inv_mod


def _m(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)


def _s(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def _inv(a):
    t = inv_mod(a[0] * a[0] + a[1] * a[1], P)
    return (a[0] * t % P, (-a[1]) * t % P)


def bn254_g2_add(A, B):
    if A is None:
        return B
    if B is None:
        return A
    x1, y1 = A
    x2, y2 = B
    if x1 == x2:
        if (y1[0] + y2[0]) % P == 0 and (y1[1] + y2[1]) % P == 0:
            return None
        lam = _m(_m((3, 0), _m(x1, x1)), _inv(_m((2, 0), y1)))
    else:
        lam = _m(_s(y2, y1), _inv(_s(x2, x1)))
    x3 = _s(_s(_m(lam, lam), x1), x2)
    y3 = _s(_m(lam, _s(x1, x3)), y1)
    return (x3, y3)


def bn254_g2_neg(A):
    if A is None:
        return None
    x, y = A
    return (x, ((-y[0]) % P, (-y[1]) % P))


def bn254_g2_mul(A, k: int):
    acc = None
    add = A
    while k:
        if k & 1:
            acc = bn254_g2_add(acc, add)
        add = bn254_g2_add(add, add)
        k >>= 1
    return acc
