"""In-circuit big-integer / foreign-field arithmetic (halo2-ecc CRT analog).

The reference consumes halo2-ecc's `ProperCrtUint` / `FpChip` stack for all
BLS12-381 field work (SURVEY §2b halo2-ecc row; pulled by
sync_step_circuit.rs:33-41). This is our re-design on the spectre_tpu
builder:

* a foreign-field element is `n_limbs` base-2^`limb_bits` limb cells plus a
  "native" cell (the value mod the BN254 scalar field) — the CRT pair;
* limb-wise adds/subs/constant-muls are free (no reduction): limbs are
  SIGNED with statically tracked magnitude bounds (halo2-ecc's
  OverflowInteger), and the exact signed integer per limb is carried on the
  witness side (`limb_vals`);
* the single soundness primitive is `quad_mod_p`: prove
      Σ x_i·y_i − Σ u_j·v_j + Σ extras ≡ r (mod p)
  in ONE shot — limb-product inner products, one witnessed nonnegative
  quotient, one exact signed carry chain (every carry range-checked, final
  position pinned to zero), plus the redundant native-residue equation.
  Flattening whole quadratic forms (Fp2/Fp6/Fp12 product components) into
  one primitive costs one quotient + one carry chain per OUTPUT component
  instead of one per Fq multiplication — the main cell saving.

Soundness of the carry chain: limb magnitudes are statically bounded far
below the native modulus, so each position equation `v_i = c_i·B` over the
native field implies the integer equation; induction over positions with
the final position pinned to zero proves the exact integer identity
Σ t_i B^i = 0, hence the quadratic form ≡ r (mod p). The native prong is
kept as an independent cheap check.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from ..fields.params import BN254_FR as FR
from .builder import CircuitBuilder, Context, AssignedValue
from .range_chip import RangeChip


@dataclass
class CrtInt:
    """Foreign-field element: limb cells + native residue cell.

    limb_vals are the exact SIGNED integers the limb cells encode (the cell
    field value is limb_vals[i] mod r). `value` = Σ limb_vals[i]·B^i.
    `max_limb` statically bounds |limb_vals[i]|. Proper elements have
    0 <= limb < 2^limb_bits."""
    limbs: List[AssignedValue]
    limb_vals: List[int]
    native: AssignedValue
    max_limb: int


class FpChip:
    """Foreign-field arithmetic chip for a prime p (e.g. BLS12-381 Fq)."""

    def __init__(self, builder: CircuitBuilder, range_chip: RangeChip,
                 p: int, limb_bits: int = 104, n_limbs: int = 4):
        assert p < 1 << (limb_bits * n_limbs)
        self.builder = builder
        self.range = range_chip
        self.ctx = builder.main()
        self.p = p
        self.limb_bits = limb_bits
        self.n_limbs = n_limbs
        self.B = 1 << limb_bits
        self._pow_B = [pow(self.B, i, FR) for i in range(2 * n_limbs)]
        self.p_limbs = self._int_limbs(p)
        self._one: Optional[CrtInt] = None

    # ------------------------- representation -------------------------

    def _int_limbs(self, x: int) -> List[int]:
        assert x >= 0
        out = []
        for _ in range(self.n_limbs):
            out.append(x & (self.B - 1))
            x >>= self.limb_bits
        assert x == 0, "value does not fit"
        return out

    @staticmethod
    def int_value(limb_vals: List[int], limb_bits: int) -> int:
        acc = 0
        for v in reversed(limb_vals):
            acc = (acc << limb_bits) + v
        return acc

    def value_of(self, a: CrtInt) -> int:
        return self.int_value(a.limb_vals, self.limb_bits)

    def _native_of(self, limb_avs: List[AssignedValue]) -> AssignedValue:
        return self.ctx.inner_product(limb_avs, self._pow_B[:self.n_limbs])

    def load(self, value: int) -> CrtInt:
        """Witness a (canonical) foreign element; limbs range-checked."""
        value %= self.p
        lv = self._int_limbs(value)
        limbs = self.ctx.assign_many(lv)
        for av in limbs:
            self.range.range_check(self.ctx, av, self.limb_bits)
        return CrtInt(limbs, lv, self._native_of(limbs), self.B - 1)

    def const(self, value: int) -> CrtInt:
        value %= self.p
        lv = self._int_limbs(value)
        limbs = [self.ctx.load_constant(v) for v in lv]
        return CrtInt(limbs, lv, self.ctx.load_constant(value % FR),
                      self.B - 1)

    def one(self) -> CrtInt:
        if self._one is None:
            self._one = self.const(1)
        return self._one

    def zero(self) -> CrtInt:
        return self.const(0)

    # --------------------- free limb-wise linear ops ---------------------

    def add_no_red(self, a: CrtInt, b: CrtInt) -> CrtInt:
        limbs = [self.ctx.add(x, y) for x, y in zip(a.limbs, b.limbs)]
        lv = [x + y for x, y in zip(a.limb_vals, b.limb_vals)]
        return CrtInt(limbs, lv, self.ctx.add(a.native, b.native),
                      a.max_limb + b.max_limb)

    def sub_no_red(self, a: CrtInt, b: CrtInt) -> CrtInt:
        limbs = [self.ctx.sub(x, y) for x, y in zip(a.limbs, b.limbs)]
        lv = [x - y for x, y in zip(a.limb_vals, b.limb_vals)]
        return CrtInt(limbs, lv, self.ctx.sub(a.native, b.native),
                      a.max_limb + b.max_limb)

    def neg_no_red(self, a: CrtInt) -> CrtInt:
        z = self.ctx.load_zero()
        limbs = [self.ctx.sub(z, x) for x in a.limbs]
        lv = [-x for x in a.limb_vals]
        return CrtInt(limbs, lv, self.ctx.sub(z, a.native), a.max_limb)

    def scale_no_red(self, a: CrtInt, c: int) -> CrtInt:
        """Multiply by a small nonnegative integer constant."""
        assert c >= 0
        limbs = [self.ctx.mul_const(x, c) for x in a.limbs]
        lv = [x * c for x in a.limb_vals]
        return CrtInt(limbs, lv, self.ctx.mul_const(a.native, c % FR),
                      a.max_limb * c)

    def select(self, sel: AssignedValue, a: CrtInt, b: CrtInt) -> CrtInt:
        """sel ? a : b (sel boolean-constrained elsewhere)."""
        limbs = [self.ctx.select(x, y, sel)
                 for x, y in zip(a.limbs, b.limbs)]
        native = self.ctx.select(a.native, b.native, sel)
        lv = a.limb_vals if sel.value else b.limb_vals
        return CrtInt(limbs, list(lv), native,
                      max(a.max_limb, b.max_limb))

    # ------------------------- the core primitive -------------------------

    def quad_mod_p(self, pos: Sequence[Tuple[CrtInt, CrtInt]] = (),
                   neg: Sequence[Tuple[CrtInt, CrtInt]] = (),
                   lin: Sequence[CrtInt] = (),
                   expect: Optional[int] = None) -> Optional[CrtInt]:
        """Prove Σ pos x·y − Σ neg u·v + Σ lin ≡ r (mod p).

        Returns r as a fresh proper CrtInt, or None when `expect` pins the
        result to a constant (inverse/curve-equation checks)."""
        ctx = self.ctx
        nl, lb, B, p = self.n_limbs, self.limb_bits, self.B, self.p
        n_pos = 2 * nl - 1

        pairs = list(pos) + list(neg)
        signs = [1] * len(pos) + [-1] * len(neg)
        lin = list(lin)

        # ---- static per-position magnitude bound of the raw form ----
        pos_bound = sum(nl * x.max_limb * y.max_limb for (x, y) in pairs)
        pos_bound += sum(a.max_limb for a in lin)

        # ---- exact integer value ----
        val = 0
        for s, (x, y) in zip(signs, pairs):
            val += s * self.value_of(x) * self.value_of(y)
        for a in lin:
            val += self.value_of(a)

        r_val = val % p
        # shift so the witnessed quotient is nonnegative:
        # max |val| <= pos_bound * B^(2nl-2) * (safety 2nl)
        shift_q = (pos_bound * (2 * nl) * (1 << (lb * (nl - 1))) // p + 2)
        # (pos_bound * 2nl * B^(nl-1) ≈ |val| / B^(nl-1); dividing by p
        #  (~B^(nl-1) * p_top) keeps shift_q * p >= |val|)
        while shift_q * p < abs(val):
            shift_q *= 2
        q_sh = (val + shift_q * p - r_val) // p
        assert q_sh >= 0 and (val + shift_q * p - r_val) % p == 0

        q_limb_vals = []
        qv = q_sh
        for _ in range(nl - 1):
            q_limb_vals.append(qv & (B - 1))
            qv >>= lb
        q_limb_vals.append(qv)
        q_top_bits = max(qv.bit_length() + 1,
                         (2 * shift_q).bit_length() - lb * (nl - 1) + 1, 2)
        q_limbs = ctx.assign_many([v % FR for v in q_limb_vals])
        for av in q_limbs[:-1]:
            self.range.range_check(ctx, av, lb)
        self.range.range_check(ctx, q_limbs[-1], q_top_bits)
        q_native = ctx.inner_product(q_limbs, self._pow_B[:nl])

        if expect is None:
            r_limb_vals = self._int_limbs(r_val)
            r_limbs = ctx.assign_many(r_limb_vals)
            for av in r_limbs:
                self.range.range_check(ctx, av, lb)
            r_native = self._native_of(r_limbs)
        else:
            assert r_val == expect % p, "expected-constant mismatch"
            r_limb_vals = self._int_limbs(expect % p)
            r_limbs = None
            r_native = None

        # ---- native residue prong ----
        acc = ctx.load_zero()
        for s, (x, y) in zip(signs, pairs):
            if s > 0:
                acc = ctx.mul_add(x.native, y.native, acc)
            else:
                acc = ctx.sub(acc, ctx.mul(x.native, y.native))
        for a in lin:
            acc = ctx.add(acc, a.native)
        acc = ctx.add_const(acc, shift_q * p % FR)
        acc = ctx.sub(acc, ctx.mul_const(q_native, p % FR))
        if expect is None:
            acc = ctx.sub(acc, r_native)
            ctx.constrain_constant(acc, 0)
        else:
            ctx.constrain_constant(acc, expect % p % FR)

        # ---- exact position sums (host ints) ----
        shift_val = shift_q * p
        shift_limbs = []
        sv = shift_val
        for _ in range(n_pos - 1):
            shift_limbs.append(sv & (B - 1))
            sv >>= lb
        shift_limbs.append(sv)  # remainder at the last position

        tvals = [0] * n_pos
        for s, (x, y) in zip(signs, pairs):
            for j in range(nl):
                for k_ in range(nl):
                    tvals[j + k_] += s * x.limb_vals[j] * y.limb_vals[k_]
        for a in lin:
            for j in range(nl):
                tvals[j] += a.limb_vals[j]
        for i in range(n_pos):
            tvals[i] += shift_limbs[i]
        for j in range(nl):
            for k_ in range(nl):
                tvals[j + k_] -= q_limb_vals[j] * self.p_limbs[k_]
        for j in range(nl):
            tvals[j] -= r_limb_vals[j]

        # ---- in-circuit position sums + carry chain ----
        qp_wide: List[List[Tuple[AssignedValue, int]]] = [
            [] for _ in range(n_pos)]
        for i, qa in enumerate(q_limbs):
            for j, pl in enumerate(self.p_limbs):
                if pl and i + j < n_pos:
                    qp_wide[i + j].append((qa, pl))

        carry_av: Optional[AssignedValue] = None
        carry_val = 0
        t_bound = (pos_bound + B            # r
                   + nl * B * (1 << max(lb, q_top_bits))  # q*p
                   + max(shift_limbs))
        carry_bits = max(t_bound.bit_length() - lb + 4, 4)

        for i in range(n_pos):
            terms_x, terms_y = [], []
            neg_x, neg_y = [], []
            for s, (x, y) in zip(signs, pairs):
                for j in range(max(0, i - nl + 1), min(nl, i + 1)):
                    if s > 0:
                        terms_x.append(x.limbs[j])
                        terms_y.append(y.limbs[i - j])
                    else:
                        neg_x.append(x.limbs[j])
                        neg_y.append(y.limbs[i - j])
            acc_i = (ctx.inner_product(terms_x, terms_y)
                     if terms_x else ctx.load_zero())
            if neg_x:
                acc_i = ctx.sub(acc_i, ctx.inner_product(neg_x, neg_y))
            for a in lin:
                if i < nl:
                    acc_i = ctx.add(acc_i, a.limbs[i])
            const_i = shift_limbs[i]
            if const_i:
                acc_i = ctx.add_const(acc_i, const_i % FR)
            for (qa, pl) in qp_wide[i]:
                acc_i = ctx.sub(acc_i, ctx.mul_const(qa, pl))
            if expect is None and i < nl:
                acc_i = ctx.sub(acc_i, r_limbs[i])
            elif expect is not None and i < nl and r_limb_vals[i]:
                acc_i = ctx.add_const(acc_i, (-r_limb_vals[i]) % FR)
            if carry_av is not None:
                acc_i = ctx.add(acc_i, carry_av)

            v_int = tvals[i] + carry_val
            if i == n_pos - 1:
                assert v_int == 0, "carry chain: nonzero final position"
                ctx.constrain_constant(acc_i, 0)
                break
            assert v_int % B == 0, "carry chain: indivisible position"
            carry_val = v_int // B
            c = ctx.assign(carry_val % FR)
            ctx.constrain_constant(
                ctx.sub(acc_i, ctx.mul_const(c, B)), 0)
            assert abs(carry_val) < 1 << carry_bits, "carry bound"
            shifted = ctx.add_const(c, 1 << carry_bits)
            self.range.range_check(ctx, shifted, carry_bits + 1)
            carry_av = c

        if expect is not None:
            return None
        return CrtInt(r_limbs, r_limb_vals, r_native, B - 1)

    # ------------------------- derived operations -------------------------

    # uniform field-chip interface (shared with Fp2Chip for generic ECC)
    def quad(self, pos=(), neg=(), lin=()):
        return self.quad_mod_p(pos, neg, lin)

    def assert_quad_zero(self, pos=(), neg=(), lin=()):
        self.quad_mod_p(pos, neg, lin, expect=0)

    add_nr = add_no_red
    sub_nr = sub_no_red
    neg_nr = neg_no_red
    scale_nr = scale_no_red

    def mul(self, a: CrtInt, b: CrtInt) -> CrtInt:
        return self.quad_mod_p(pos=[(a, b)])

    def reduce(self, a: CrtInt) -> CrtInt:
        return self.quad_mod_p(lin=[a])

    def add(self, a: CrtInt, b: CrtInt) -> CrtInt:
        return self.reduce(self.add_no_red(a, b))

    def sub(self, a: CrtInt, b: CrtInt) -> CrtInt:
        return self.reduce(self.sub_no_red(a, b))

    def inv(self, a: CrtInt) -> CrtInt:
        from ..fields.host import inv_mod
        iv = inv_mod(self.value_of(a) % self.p, self.p)
        ainv = self.load(iv)
        self.quad_mod_p(pos=[(a, ainv)], expect=1)
        return ainv

    def div(self, a: CrtInt, b: CrtInt) -> CrtInt:
        """a / b via witnessed quotient q with q·b − a ≡ 0."""
        from ..fields.host import inv_mod
        qv = (self.value_of(a) % self.p
              * inv_mod(self.value_of(b) % self.p, self.p) % self.p)
        q = self.load(qv)
        self.quad_mod_p(pos=[(q, b)], lin=[self.neg_no_red(a)], expect=0)
        return q

    def assert_zero(self, a: CrtInt):
        self.quad_mod_p(lin=[a], expect=0)

    def assert_eq(self, a: CrtInt, b: CrtInt):
        self.quad_mod_p(lin=[self.sub_no_red(a, b)], expect=0)

    def is_zero(self, a: CrtInt) -> AssignedValue:
        """Indicator bit of a ≡ 0 (mod p), for a proper element."""
        r = self.reduce(a) if a.max_limb >= self.B else a
        self.enforce_canonical(r)
        ctx = self.ctx
        flags = [ctx.is_zero(l) for l in r.limbs]
        out = flags[0]
        for f in flags[1:]:
            out = ctx.mul(out, f)
        return out

    def enforce_canonical(self, a: CrtInt):
        """Prove value < p for a proper element: witness d >= 0 (limbs
        range-checked) with a + d = p − 1 exactly."""
        ctx = self.ctx
        assert a.max_limb < self.B
        av = self.value_of(a)
        assert 0 <= av < self.p
        d = self.load(self.p - 1 - av)
        pm1 = self._int_limbs(self.p - 1)
        carry_av = None
        carry_val = 0
        for i in range(self.n_limbs):
            acc = ctx.add(a.limbs[i], d.limbs[i])
            if pm1[i]:
                acc = ctx.add_const(acc, (-pm1[i]) % FR)
            if carry_av is not None:
                acc = ctx.add(acc, carry_av)
            v_int = a.limb_vals[i] + d.limb_vals[i] - pm1[i] + carry_val
            if i == self.n_limbs - 1:
                assert v_int == 0
                ctx.constrain_constant(acc, 0)
                break
            assert v_int % self.B == 0
            carry_val = v_int // self.B
            c = ctx.assign(carry_val % FR)
            ctx.constrain_constant(
                ctx.sub(acc, ctx.mul_const(c, self.B)), 0)
            shifted = ctx.add_const(c, 2)
            self.range.range_check(ctx, shifted, 2)
            carry_av = c
