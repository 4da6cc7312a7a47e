"""In-circuit hash-to-G2 (RFC 9380 BLS12381G2_XMD:SHA-256_SSWU_RO_).

The reference consumes HashToCurveChip from the nulltea halo2-ecc fork
(sync_step_circuit.rs:165-169). Pipeline, mirroring the host oracle
curves/hash_to_curve.py (the witness generator):

  expand_message_xmd (in-circuit SHA-256) → hash_to_field (2×Fq2) →
  simplified SWU on E' (witnessed inverse/sqrt/branch bits; the
  non-square-Z argument makes the square-branch bit self-sound) →
  3-isogeny (constant-coefficient Horner) → cofactor clearing via the
  ψ endomorphism (Budroni–Pintore: [x²−x−1]Q + [x−1]ψ(Q) + ψ²(2Q),
  validated against h_eff multiplication on the host).
"""
from __future__ import annotations

from typing import List, Tuple

from ..fields.params import BLS12_381_FQ as P
from ..curves.host import fq2_pow, fq2_inv, fq2_mul, fq2_sqrt_impl
from ..curves import hash_to_curve as HH
from .builder import CircuitBuilder, Context, AssignedValue
from .bigint import FpChip, CrtInt
from .fp2 import Fp2Chip, Fp2Int
from .ecc import EccChip, EcPoint
from .sha256_gadget import Sha256Chip

BLS_X_ABS = 0xd201000000010000

# ψ constants (M-twist untwist-frobenius-twist), host-validated vs h_eff
PSI_CX = fq2_inv(fq2_pow((1, 1), (P - 1) // 3))
PSI_CY = fq2_inv(fq2_pow((1, 1), (P - 1) // 2))


class HashToCurveChip:
    def __init__(self, builder: CircuitBuilder, sha: Sha256Chip,
                 fp: FpChip):
        self.b = builder
        self.ctx = builder.main()
        self.sha = sha
        self.fp = fp
        self.f2 = Fp2Chip(fp)
        self.ecc2 = EccChip(self.f2, (4, 4))

    # ----------------------- byte helpers -----------------------

    def _xor_bytes(self, a: List[AssignedValue],
                   b: List[AssignedValue]) -> List[AssignedValue]:
        ctx = self.ctx
        out = []
        for x, y in zip(a, b):
            bx = ctx.num_to_bits(x, 8)
            by = ctx.num_to_bits(y, 8)
            xbits = []
            for p_, q_ in zip(bx, by):
                # p ⊕ q = p + q − 2pq
                t = ctx.mul(p_, q_)
                s = ctx.add(p_, q_)
                xbits.append(ctx.sub(s, ctx.mul_const(t, 2)))
            out.append(ctx.bits_to_num(xbits))
        return out

    def expand_message_xmd(self, msg_cells: List[AssignedValue],
                           dst: bytes, len_in_bytes: int
                           ) -> List[AssignedValue]:
        ctx = self.ctx
        ell = -(-len_in_bytes // 32)
        dst_prime = dst + bytes([len(dst)])
        const = lambda bs: [ctx.load_constant(v) for v in bs]
        z_pad = const(b"\x00" * 64)
        lib = const(len_in_bytes.to_bytes(2, "big"))
        dstp = const(dst_prime)
        b0 = self.sha.digest_bytes_cells(
            z_pad + msg_cells + lib + const(b"\x00") + dstp)
        b1 = self.sha.digest_bytes_cells(b0 + const(b"\x01") + dstp)
        bs = [b1]
        for i in range(2, ell + 1):
            xored = self._xor_bytes(b0, bs[-1])
            bs.append(self.sha.digest_bytes_cells(
                xored + const(bytes([i])) + dstp))
        out = []
        for blk in bs:
            out.extend(blk)
        return out[:len_in_bytes]

    # ----------------------- hash_to_field -----------------------

    def _bytes_to_fp(self, be_bytes: List[AssignedValue]) -> CrtInt:
        """64 big-endian SHA-output byte cells -> Fq element (mod p)."""
        fp, ctx = self.fp, self.ctx
        le = list(reversed(be_bytes))  # little-endian

        def limbify(cells: List[AssignedValue]) -> CrtInt:
            limbs, lvals = [], []
            for i in range(fp.n_limbs):
                chunk = cells[13 * i:13 * (i + 1)]
                if chunk:
                    limbs.append(ctx.inner_product(
                        chunk, [1 << (8 * j) for j in range(len(chunk))]))
                    lvals.append(sum(int(c.value) << (8 * j)
                                     for j, c in enumerate(chunk)))
                else:
                    limbs.append(ctx.load_zero())
                    lvals.append(0)
            return CrtInt(limbs, lvals,
                          ctx.inner_product(limbs, fp._pow_B[:fp.n_limbs]),
                          fp.B - 1)

        lo = limbify(le[:32])           # bytes 0..31 (LE) -> < 2^256
        hi = limbify(le[32:])           # bytes 32..63    -> < 2^256
        c = fp.const(1 << 256)
        return fp.quad_mod_p(pos=[(hi, c)], lin=[lo])

    def hash_to_field(self, msg_cells: List[AssignedValue], dst: bytes
                      ) -> Tuple[Fp2Int, Fp2Int]:
        uniform = self.expand_message_xmd(msg_cells, dst, 256)
        els = []
        for i in range(2):
            comps = []
            for j in range(2):
                off = 64 * (j + i * 2)
                comps.append(self._bytes_to_fp(uniform[off:off + 64]))
            els.append(Fp2Int(comps[0], comps[1]))
        return els[0], els[1]

    # ----------------------- sgn0 -----------------------

    def _parity(self, a: CrtInt) -> AssignedValue:
        """LSB of a canonical-enforced proper element."""
        fp, ctx = self.fp, self.ctx
        fp.enforce_canonical(a)
        v = a.limb_vals[0]
        bit = ctx.assign(v & 1)
        ctx.assert_bit(bit)
        half = ctx.assign(v >> 1)
        self.fp.range.range_check(ctx, half, fp.limb_bits - 1)
        recomb = ctx.add(ctx.mul_const(half, 2), bit)
        ctx.constrain_equal(recomb, a.limbs[0])
        return bit

    def _sgn0(self, x: Fp2Int) -> AssignedValue:
        """RFC 9380 sgn0 for Fq2: sgn(x0) OR (x0 == 0 AND sgn(x1))."""
        ctx = self.ctx
        s0 = self._parity(x.c0)
        s1 = self._parity(x.c1)
        z0 = self.fp.is_zero(x.c0)
        # s0 + z0·s1 − s0·z0·s1
        t = ctx.mul(z0, s1)
        return ctx.sub(ctx.add(s0, t), ctx.mul(s0, t))

    # ----------------------- SSWU map -----------------------

    def map_to_curve(self, u: Fp2Int) -> EcPoint:
        """Simplified SWU on E' followed by the 3-isogeny to E."""
        f2, ctx = self.f2, self.ctx
        A = f2.const(HH.A_PRIME)
        B = f2.const(HH.B_PRIME)
        Z = f2.const(HH.Z_SSWU)

        u2 = f2.mul(u, u)
        tv1 = f2.mul(Z, u2)
        tv2 = f2.quad(pos=[(tv1, tv1)], lin=[tv1])    # tv1² + tv1
        # generic path (tv2 ≠ 0; the exceptional case has negligible mass
        # and the host oracle asserts it never occurs for real inputs)
        d = f2.inv(tv2)
        nboa = f2.const(fq2_mul(
            ((-HH.B_PRIME[0]) % P, (-HH.B_PRIME[1]) % P),
            fq2_inv(HH.A_PRIME)))
        one = f2.const((1, 0))
        x1 = f2.quad(pos=[(nboa, f2.add_nr(one, d))])
        x12 = f2.mul(x1, x1)
        gx1 = f2.quad(pos=[(x12, x1), (A, x1)], lin=[B])
        x2 = f2.mul(tv1, x1)
        x22 = f2.mul(x2, x2)
        gx2 = f2.quad(pos=[(x22, x2), (A, x2)], lin=[B])

        # witnessed square branch: e2 = 1 iff gx1 is square (self-sound:
        # exactly one of gx1, gx2 = Z³u⁶·gx1 is square since Z is not)
        gx1_v = f2.value_of(gx1)
        is_sq = HH._is_square(gx1_v)
        e2 = ctx.assign(1 if is_sq else 0)
        ctx.assert_bit(e2)
        x = f2.select(e2, x1, x2)
        gx = f2.select(e2, gx1, gx2)
        y_v = fq2_sqrt_impl(gx1_v if is_sq else f2.value_of(gx2))
        assert y_v is not None
        y = f2.load(y_v)
        f2.quad(pos=[(y, y)], lin=[f2.neg_nr(gx)], expect=(0, 0))

        # sgn0(y) must match sgn0(u)
        su = self._sgn0(u)
        sy = self._sgn0(y)
        match = ctx.is_equal(su, sy)
        y = f2.select(match, y, f2.reduce(f2.neg_nr(y)))

        return self._iso_map(EcPoint(x, y))

    def _iso_map(self, pt: EcPoint) -> EcPoint:
        f2 = self.f2
        x, y = pt.x, pt.y

        def horner(coeffs):
            acc = f2.const(coeffs[-1])
            for c in reversed(coeffs[:-1]):
                acc = f2.quad(pos=[(acc, x)], lin=[f2.const(c)])
            return acc

        x_num = horner(HH.K1)
        x_den = horner(HH.K2)
        y_num = horner(HH.K3)
        y_den = horner(HH.K4)
        xo = f2.div(x_num, x_den)
        yo = f2.mul(y, f2.div(y_num, y_den))
        return EcPoint(xo, yo)

    # ----------------------- cofactor clearing -----------------------

    def _psi(self, Q: EcPoint) -> EcPoint:
        f2 = self.f2
        cx = f2.const(PSI_CX)
        cy = f2.const(PSI_CY)
        return EcPoint(f2.mul(cx, f2.conjugate_nr(Q.x)),
                       f2.mul(cy, f2.conjugate_nr(Q.y)))

    def clear_cofactor(self, Q: EcPoint) -> EcPoint:
        """Budroni–Pintore via ψ: [x²−x−1]Q + [x−1]ψ(Q) + ψ²(2Q)."""
        ecc = self.ecc2
        a1 = ecc.scalar_mul_const(Q, BLS_X_ABS)          # [X]Q
        a2 = ecc.scalar_mul_const(a1, BLS_X_ABS)         # [X²]Q
        term1 = ecc.add_unequal(ecc.add_unequal(a2, a1), ecc.negate(Q))
        psiQ = self._psi(Q)
        xpsi = ecc.scalar_mul_const(psiQ, BLS_X_ABS)     # [X]ψ(Q)
        term2 = ecc.negate(ecc.add_unequal(xpsi, psiQ))  # [−X−1]ψ(Q)
        term3 = self._psi(self._psi(ecc.double(Q)))
        return ecc.add_unequal(ecc.add_unequal(term1, term2), term3)

    # ----------------------- top level -----------------------

    def hash_to_g2(self, msg_cells: List[AssignedValue],
                   dst: bytes) -> EcPoint:
        u0, u1 = self.hash_to_field(msg_cells, dst)
        q0 = self.map_to_curve(u0)
        q1 = self.map_to_curve(u1)
        s = self.ecc2.add_unequal(q0, q1)
        return self.clear_cofactor(s)
