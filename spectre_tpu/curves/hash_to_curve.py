"""Hash-to-curve for BLS12-381 G2: BLS12381G2_XMD:SHA-256_SSWU_RO_ (RFC 9380).

Host implementation (the witness-side analog of halo2curves'
hash_to_curve::ExpandMsgXmd used by the reference at witness/step.rs:96-101
and in-circuit at sync_step_circuit.rs:165-169). Pipeline:
expand_message_xmd -> hash_to_field (2 x Fq2) -> simplified SWU on the
3-isogenous curve E' -> isogeny map -> cofactor clearing (h_eff).

Self-checks: every output is on E and in the r-torsion subgroup
(tests assert both); byte-level parity with the reference's vectors is
re-pinned once proofs are cross-verified.
"""
from __future__ import annotations

import hashlib

from ..fields.params import BLS12_381_FQ as P, BLS12_381_FR as R
from . import host as H
from .host import (fq2_add, fq2_sub, fq2_mul, fq2_sqr, fq2_neg, fq2_inv,
                   fq2_pow, fq2_is_zero, fq2_sqrt_impl, bls_g2_host)


# ---------------- expand_message_xmd (SHA-256) ----------------

def expand_message_xmd(msg: bytes, dst: bytes, len_in_bytes: int) -> bytes:
    b_in_bytes = 32
    r_in_bytes = 64
    ell = -(-len_in_bytes // b_in_bytes)
    assert ell <= 255 and len(dst) <= 255
    dst_prime = dst + bytes([len(dst)])
    z_pad = b"\x00" * r_in_bytes
    l_i_b_str = len_in_bytes.to_bytes(2, "big")
    b0 = hashlib.sha256(z_pad + msg + l_i_b_str + b"\x00" + dst_prime).digest()
    b1 = hashlib.sha256(b0 + b"\x01" + dst_prime).digest()
    bs = [b1]
    for i in range(2, ell + 1):
        prev = bs[-1]
        xored = bytes(a ^ b for a, b in zip(b0, prev))
        bs.append(hashlib.sha256(xored + bytes([i]) + dst_prime).digest())
    return b"".join(bs)[:len_in_bytes]


def hash_to_field_fq2(msg: bytes, dst: bytes, count: int = 2):
    L = 64
    uniform = expand_message_xmd(msg, dst, count * 2 * L)
    out = []
    for i in range(count):
        e = []
        for j in range(2):
            off = L * (j + i * 2)
            e.append(int.from_bytes(uniform[off:off + L], "big") % P)
        out.append((e[0], e[1]))
    return out


# ---------------- simplified SWU on E': y^2 = x^3 + A'x + B' ----------------

A_PRIME = (0, 240)
B_PRIME = (1012, 1012)
Z_SSWU = ((-2) % P, (-1) % P)   # -(2 + u)


def _sgn0(x) -> int:
    x0, x1 = x[0] % P, x[1] % P
    sign_0 = x0 & 1
    zero_0 = x0 == 0
    sign_1 = x1 & 1
    return sign_0 or (zero_0 and sign_1)


def _is_square(a) -> bool:
    if fq2_is_zero(a):
        return True
    return fq2_pow(a, (P * P - 1) // 2) == (1, 0)


def _inv0(a):
    if fq2_is_zero(a):
        return (0, 0)
    return fq2_inv(a)


def map_to_curve_sswu(u):
    A, B, Z = A_PRIME, B_PRIME, Z_SSWU
    u2 = fq2_sqr(u)
    tv1 = fq2_mul(Z, u2)                       # Z u^2
    tv2 = fq2_add(fq2_sqr(tv1), tv1)           # Z^2 u^4 + Z u^2
    d = _inv0(tv2)
    neg_b_over_a = fq2_mul(fq2_neg(B), fq2_inv(A))
    if fq2_is_zero(d):
        # x1 = B / (Z A)
        x1 = fq2_mul(B, fq2_inv(fq2_mul(Z, A)))
    else:
        x1 = fq2_mul(neg_b_over_a, fq2_add((1, 0), d))
    gx1 = fq2_add(fq2_add(fq2_mul(fq2_sqr(x1), x1), fq2_mul(A, x1)), B)
    if _is_square(gx1):
        x, y = x1, fq2_sqrt_impl(gx1)
    else:
        x2 = fq2_mul(tv1, x1)                  # Z u^2 x1
        gx2 = fq2_add(fq2_add(fq2_mul(fq2_sqr(x2), x2), fq2_mul(A, x2)), B)
        x, y = x2, fq2_sqrt_impl(gx2)
    assert y is not None
    if _sgn0(u) != _sgn0(y):
        y = fq2_neg(y)
    return (x, y)


# ---------------- 3-isogeny E' -> E (RFC 9380 appendix E.3) ----------------

def _c(c0, c1=0):
    return (c0 % P, c1 % P)

K1 = [
    _c(0x5C759507E8E333EBB5B7A9A47D7ED8532C52D39FD3A042A88B58423C50AE15D5C2638E343D9C71C6238AAAAAAAA97D6,
       0x5C759507E8E333EBB5B7A9A47D7ED8532C52D39FD3A042A88B58423C50AE15D5C2638E343D9C71C6238AAAAAAAA97D6),
    _c(0, 0x11560BF17BAA99BC32126FCED787C88F984F87ADF7AE0C7F9A208C6B4F20A4181472AAA9CB8D555526A9FFFFFFFFC71A),
    _c(0x11560BF17BAA99BC32126FCED787C88F984F87ADF7AE0C7F9A208C6B4F20A4181472AAA9CB8D555526A9FFFFFFFFC71E,
       0x8AB05F8BDD54CDE190937E76BC3E447CC27C3D6FBD7063FCD104635A790520C0A395554E5C6AAAA9354FFFFFFFFE38D),
    _c(0x171D6541FA38CCFAED6DEA691F5FB614CB14B4E7F4E810AA22D6108F142B85757098E38D0F671C7188E2AAAAAAAA5ED1),
]
K2 = [
    _c(0, 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAA63),
    _c(0xC, 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAA9F),
    _c(1),
]
K3 = [
    _c(0x1530477C7AB4113B59A4C18B076D11930F7DA5D4A07F649BF54439D87D27E500FC8C25EBF8C92F6812CFC71C71C6D706,
       0x1530477C7AB4113B59A4C18B076D11930F7DA5D4A07F649BF54439D87D27E500FC8C25EBF8C92F6812CFC71C71C6D706),
    _c(0, 0x5C759507E8E333EBB5B7A9A47D7ED8532C52D39FD3A042A88B58423C50AE15D5C2638E343D9C71C6238AAAAAAAA97BE),
    _c(0x11560BF17BAA99BC32126FCED787C88F984F87ADF7AE0C7F9A208C6B4F20A4181472AAA9CB8D555526A9FFFFFFFFC71C,
       0x8AB05F8BDD54CDE190937E76BC3E447CC27C3D6FBD7063FCD104635A790520C0A395554E5C6AAAA9354FFFFFFFFE38F),
    _c(0x124C9AD43B6CF79BFBF7043DE3811AD0761B0F37A1E26286B0E977C69AA274524E79097A56DC4BD9E1B371C71C718B10),
]
K4 = [
    _c(0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFA8FB,
       0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFA8FB),
    _c(0, 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFA9D3),
    _c(0x12, 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAA99),
    _c(1),
]


def _horner(coeffs, x):
    acc = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = fq2_add(fq2_mul(acc, x), c)
    return acc


def iso_map(pt):
    x, y = pt
    x_num = _horner(K1, x)
    x_den = _horner(K2, x)
    y_num = _horner(K3, x)
    y_den = _horner(K4, x)
    xo = fq2_mul(x_num, fq2_inv(x_den))
    yo = fq2_mul(y, fq2_mul(y_num, fq2_inv(y_den)))
    return (xo, yo)


# cofactor clearing: multiply by h_eff (RFC 9380 §8.8.2)
H_EFF = 0xBC69F08F2EE75B3584C6A0EA91B352888E2A8E9145AD7689986FF031508FFE1329C2F178731DB956D82BF015D1212B02EC0EC69D7477C1AE954CBC06689F6A359894C0ADEBBF6B4E8020005AAA95551


def clear_cofactor(pt):
    return bls_g2_host.mul(pt, H_EFF)


def hash_to_g2(msg: bytes, dst: bytes):
    u0, u1 = hash_to_field_fq2(msg, dst)
    q0 = map_to_curve_sswu(u0)
    q1 = map_to_curve_sswu(u1)
    # addition happens on E' before the isogeny? RFC maps each then adds on E
    p0 = iso_map(q0)
    p1 = iso_map(q1)
    assert bls_g2_host.is_on_curve(p0) and bls_g2_host.is_on_curve(p1), (
        "isogeny output off-curve — sswu/iso constants inconsistent")
    return clear_cofactor(bls_g2_host.add(p0, p1))
