"""Host-side (python-int) prime field arithmetic.

This is the exactness oracle for the JAX limb kernels and the implementation
used on branchy/sequential host paths (transcripts, point decompression,
witness preprocessing) where Python ints are simpler and fast enough.
"""
from __future__ import annotations


def inv_mod(a: int, m: int) -> int:
    """Modular inverse for any modulus (extended Euclid via 3-arg pow).

    Raises ValueError if not invertible, ZeroDivisionError on a == 0.
    """
    a %= m
    if a == 0:
        raise ZeroDivisionError("inverse of zero")
    return pow(a, -1, m)


def sqrt_mod(a: int, p: int):
    """Square root mod an odd prime p, or None if a is a non-residue.

    Fast path for p % 4 == 3 (both BLS12-381 Fq and BN254 Fq qualify);
    general Tonelli-Shanks otherwise (BN254/BLS Fr have high 2-adicity).
    """
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # Tonelli-Shanks
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t = t * c % p
        r = r * b % p
    return r


def batch_inv_mod(xs, p: int):
    """Montgomery batch inversion: one inv_mod + 3(n-1) muls."""
    n = len(xs)
    if n == 0:
        return []
    prefix = [1] * (n + 1)
    for i, x in enumerate(xs):
        if x % p == 0:
            raise ZeroDivisionError("inverse of zero in batch")
        prefix[i + 1] = prefix[i] * x % p
    inv_all = inv_mod(prefix[n], p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % p
        inv_all = inv_all * xs[i] % p
    return out


def int_from_bytes_le(b: bytes) -> int:
    return int.from_bytes(b, "little")


def int_from_bytes_be(b: bytes) -> int:
    return int.from_bytes(b, "big")


def int_to_bytes_le(x: int, length: int) -> bytes:
    return x.to_bytes(length, "little")


def int_to_bytes_be(x: int, length: int) -> bytes:
    return x.to_bytes(length, "big")
