"""Row-parallel ("wide") SHA-256 region — the committee circuit's hash
engine at scale. The reference uses zkevm-hashes' vanilla SHA-256 circuit
for exactly this reason (sha256_wide.rs:36-112, SURVEY §2a #8): the spread
chip costs ~84k generic builder cells per block — two orders of magnitude
too many for 512 pubkeys.

TPU-first re-design, bit-parallel with one row per round:

  * dedicated narrow columns: 32 bit columns each for the new `a`, new `e`
    and schedule word `w`; older state words (b,c,d,f,g,h and w_{r-k}) are
    read via ROW ROTATIONS of the same columns — nothing else is stored;
  * Σ/σ/ch/maj are degree-≤3 bit identities
    (xor3 = x+y+z−2(xy+yz+zx)+4xyz, ch = e·f+(1−e)·g,
    maj = ab+bc+ca−2abc) folded into one wide integer identity per round
    row for each of the a/e updates, with witnessed carry bits;
  * 72 rows per block (8 staging + 64 rounds) → a 512-pubkey committee
    (~1.5k blocks) fits in ~110k rows: k=17, vs the reference's k=20;
  * witness generation is one numpy pass over all blocks (uint32 round
    functions + bit extraction) — the batched witness path of SURVEY §7
    hard part #5;
  * word-level chaining: merkle-tree parents consume child digest WORD
    cells directly (copy constraints), no byte decomposition between
    levels.

The region plugs into CircuitBuilder via the `regions` hook: the facade
(ShaWideChip below) records hash requests and word-cell links during
circuit building; compile() materializes columns/gates/witness and the
copy constraints between builder cells and region cells.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..fields.params import BN254_FR as FR
from ..plonk.cs import ConstraintSystem, Column
from ..plonk.expression import Expr, Const, Sum, Scaled
from .builder import CircuitBuilder, AssignedValue

K_ROUND = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5,
    0x3956C25B, 0x59F111F1, 0x923F82A4, 0xAB1C5ED5,
    0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174,
    0xE49B69C1, 0xEFBE4786, 0x0FC19DC6, 0x240CA1CC,
    0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7,
    0xC6E00BF3, 0xD5A79147, 0x06CA6351, 0x14292967,
    0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85,
    0xA2BFE8A1, 0xA81A664B, 0xC24B8B70, 0xC76C51A3,
    0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5,
    0x391C0CB3, 0x4ED8AA4A, 0x5B9CCA4F, 0x682E6FF3,
    0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]
H0 = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
      0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]

ROWS_PER_BLOCK = 72
ROUND0 = 8


def _rotr_i(x: int, r: int) -> int:
    x &= 0xFFFFFFFF
    return ((x >> r) | (x << (32 - r))) & 0xFFFFFFFF


def _sha_rounds(state: List[int], sched: List[int]):
    """Host: one compression; returns (out_state, a_per_row, e_per_row,
    carries_e, carries_a)."""
    a, b, c, d, e, f, g, h = state
    a_rows, e_rows, ce, ca = [], [], [], []
    W = list(sched)
    for r in range(16, 64):
        w15, w2 = W[r - 15], W[r - 2]
        s0 = _rotr_i(w15, 7) ^ _rotr_i(w15, 18) ^ (w15 >> 3)
        s1 = _rotr_i(w2, 17) ^ _rotr_i(w2, 19) ^ (w2 >> 10)
        W.append((W[r - 16] + s0 + W[r - 7] + s1) & 0xFFFFFFFF)
    for r in range(64):
        s1 = _rotr_i(e, 6) ^ _rotr_i(e, 11) ^ _rotr_i(e, 25)
        ch = ((e & f) ^ ((~e) & g)) & 0xFFFFFFFF
        t1 = h + s1 + ch + K_ROUND[r] + W[r]
        s0 = _rotr_i(a, 2) ^ _rotr_i(a, 13) ^ _rotr_i(a, 22)
        mj = (a & b) ^ (b & c) ^ (c & a)
        t2 = s0 + mj
        e_full = d + t1
        a_full = t1 + t2
        h, g, f = g, f, e
        d, c, b = c, b, a
        e = e_full & 0xFFFFFFFF
        a = a_full & 0xFFFFFFFF
        ce.append(e_full >> 32)
        ca.append(a_full >> 32)
        a_rows.append(a)
        e_rows.append(e)
    out = [(x + y) & 0xFFFFFFFF
           for x, y in zip(state, [a, b, c, d, e, f, g, h])]
    return out, W, a_rows, e_rows, ce, ca


def _xor3(x: Expr, y: Expr, z: Expr) -> Expr:
    return (x + y + z - 2 * (x * y + y * z + z * x) + 4 * (x * y * z))


def _word(bits: List[Expr]) -> Expr:
    return Sum(tuple(Scaled(b, 1 << i) for i, b in enumerate(bits)))


PAD_BLOCK_512 = [0x80000000] + [0] * 14 + [512]  # padding block, 64B msg


@dataclass
class _BlockReq:
    sched_links: List[Optional[int]]   # 16 builder virt cell ids (or None)
    sched_consts: List[Optional[int]]  # constant words where not linked
    chain_prev: Optional[int]          # block index for chained state
    sched_vals: List[int]              # witness words
    state_in: List[int]                # witness input state
    digest_vals: List[int]
    digest_links: List[Optional[int]] = None  # builder cells for digest


class ShaWideChip:
    """Builder facade for the wide region (the Sha256ChipWide analog)."""

    def __init__(self, builder: CircuitBuilder):
        self.b = builder
        self.ctx = builder.main()
        if not hasattr(builder, "regions"):
            builder.regions = []
        self._region = _ShaWideRegion(self)
        builder.regions.append(self._region)
        self.blocks: List[_BlockReq] = []

    # ---- request API (used while building the circuit) ----

    def _word_cells_to_vals(self, cells):
        return [int(c.value) for c in cells]

    def hash_blocks(self, word_cells_per_block: List[List] ,
                    ) -> List[AssignedValue]:
        """Hash a message given as chained 16-word blocks; each schedule
        word is either an AssignedValue (linked by copy) or an int
        constant. Returns 8 digest word cells (builder side)."""
        prev = None
        state = list(H0)
        for words in word_cells_per_block:
            vals = [int(w.value) if isinstance(w, AssignedValue) else int(w)
                    for w in words]
            out, *_ = _sha_rounds(state, vals)
            req = _BlockReq(
                sched_links=[w.idx if isinstance(w, AssignedValue) else None
                             for w in words],
                sched_consts=[None if isinstance(w, AssignedValue) else int(w)
                              for w in words],
                chain_prev=prev,
                sched_vals=vals,
                state_in=state,
                digest_vals=out,
            )
            self.blocks.append(req)
            prev = len(self.blocks) - 1
            state = out
        # builder-side digest word cells, linked to region digest cells
        dig_cells = self.ctx.assign_many(state)
        self.blocks[prev].digest_links = [c.idx for c in dig_cells]
        return dig_cells

    def digest_words_of_bytes(self, byte_cells: List[AssignedValue]
                              ) -> List[AssignedValue]:
        """SHA-256 of a fixed-length byte-cell message; packs bytes into
        big-endian words (with recomposition constraints) and appends
        standard padding blocks. Returns 8 digest word cells."""
        ctx = self.ctx
        n = len(byte_cells)
        msg = list(byte_cells)
        pad = bytearray([0x80])
        pad += b"\x00" * ((55 - n) % 64)
        pad += (8 * n).to_bytes(8, "big")
        pad_cells = [int(x) for x in pad]
        allm = msg + pad_cells
        assert (len(allm)) % 64 == 0
        blocks = []
        for off in range(0, len(allm), 64):
            words = []
            for wi in range(16):
                quad = allm[off + 4 * wi: off + 4 * wi + 4]
                if all(isinstance(q, int) for q in quad):
                    words.append(sum(q << (8 * (3 - i))
                                     for i, q in enumerate(quad)))
                else:
                    quad_c = [q if isinstance(q, AssignedValue)
                              else ctx.load_constant(q) for q in quad]
                    w = ctx.inner_product(
                        quad_c, [1 << (8 * (3 - i)) for i in range(4)])
                    words.append(w)
            blocks.append(words)
        return self.hash_blocks(blocks)

    def digest_bytes_of_bytes(self, byte_cells, u8_pin=None):
        """Like digest_words_of_bytes but returns 32 BE byte cells (each
        u8-constrained via the supplied pin function)."""
        ctx = self.ctx
        words = self.digest_words_of_bytes(byte_cells)
        out = []
        for w in words:
            v = int(w.value)
            bs = [(v >> (8 * (3 - i))) & 0xFF for i in range(4)]
            cells = ctx.assign_many(bs)
            if u8_pin is not None:
                for c in cells:
                    u8_pin(c)
            recomb = ctx.inner_product(
                cells, [1 << (8 * (3 - i)) for i in range(4)])
            ctx.constrain_equal(recomb, w)
            out.extend(cells)
        return out


class _ShaWideRegion:
    """compile()-side implementation: columns, gates, witness, copies."""

    def __init__(self, chip: ShaWideChip):
        self.chip = chip

    def build(self, cs: ConstraintSystem, usable: int):
        nb = len(self.chip.blocks)
        assert nb * ROWS_PER_BLOCK <= usable, (
            f"sha_wide: {nb} blocks need {nb*ROWS_PER_BLOCK} rows "
            f"> usable {usable}")
        c = {}
        c["a"] = [cs.advice_column() for _ in range(32)]
        c["e"] = [cs.advice_column() for _ in range(32)]
        c["w"] = [cs.advice_column() for _ in range(32)]
        c["ce"] = [cs.advice_column() for _ in range(3)]
        c["ca"] = [cs.advice_column() for _ in range(3)]
        c["cw"] = [cs.advice_column() for _ in range(2)]
        c["dc"] = [cs.advice_column() for _ in range(8)]
        c["w_word"] = cs.advice_column()
        c["st_a"] = cs.advice_column()
        c["st_e"] = cs.advice_column()
        c["digest"] = [cs.advice_column() for _ in range(8)]
        for col in ([c["w_word"], c["st_a"], c["st_e"]] + c["digest"]):
            cs.enable_equality(col)
        c["q_bit"] = cs.fixed_column()
        c["q_round"] = cs.fixed_column()
        c["q_sched"] = cs.fixed_column()
        c["q_w16"] = cs.fixed_column()
        c["q_stage"] = cs.fixed_column()
        c["q_out"] = cs.fixed_column()
        c["k"] = cs.fixed_column()
        self.cols = c
        self._gates(cs)

    def _gates(self, cs: ConstraintSystem):
        c = self.cols
        A = lambda i, r=0: c["a"][i].at(r)
        E = lambda i, r=0: c["e"][i].at(r)
        W = lambda i, r=0: c["w"][i].at(r)
        qb = c["q_bit"].at()
        q = c["q_round"].at()
        qs = c["q_sched"].at()

        bitcols = (c["a"] + c["e"] + c["w"] + c["ce"] + c["ca"] + c["cw"]
                   + c["dc"])
        cs.create_gate("sha_wide_bool",
                       [qb * col.at() * (col.at() - 1) for col in bitcols])

        ep = [E(i, -1) for i in range(32)]
        fp = [E(i, -2) for i in range(32)]
        gp = [E(i, -3) for i in range(32)]
        hp = [E(i, -4) for i in range(32)]
        ap = [A(i, -1) for i in range(32)]
        bp = [A(i, -2) for i in range(32)]
        cp = [A(i, -3) for i in range(32)]
        dp = [A(i, -4) for i in range(32)]
        a_new = [A(i) for i in range(32)]
        e_new = [E(i) for i in range(32)]
        w_cur = [W(i) for i in range(32)]

        def rotr(bits, r):
            return [bits[(i + r) % 32] for i in range(32)]

        def shr(bits, r):
            return [bits[i + r] if i + r < 32 else Const(0)
                    for i in range(32)]

        sig1 = [_xor3(rotr(ep, 6)[i], rotr(ep, 11)[i], rotr(ep, 25)[i])
                for i in range(32)]
        ch = [ep[i] * fp[i] + gp[i] - ep[i] * gp[i] for i in range(32)]
        sig0 = [_xor3(rotr(ap, 2)[i], rotr(ap, 13)[i], rotr(ap, 22)[i])
                for i in range(32)]
        maj = [ap[i] * bp[i] + bp[i] * cp[i] + cp[i] * ap[i]
               - 2 * (ap[i] * bp[i] * cp[i]) for i in range(32)]

        t1 = (_word(hp) + _word(sig1) + _word(ch) + c["k"].at()
              + _word(w_cur))
        ce_val = Sum(tuple(Scaled(cc.at(), 1 << (32 + i))
                           for i, cc in enumerate(c["ce"])))
        ca_val = Sum(tuple(Scaled(cc.at(), 1 << (32 + i))
                           for i, cc in enumerate(c["ca"])))
        cw_val = Sum(tuple(Scaled(cc.at(), 1 << (32 + i))
                           for i, cc in enumerate(c["cw"])))
        cs.create_gate("sha_wide_e",
                       q * (_word(dp) + t1 - _word(e_new) - ce_val))
        cs.create_gate("sha_wide_a",
                       q * (t1 + _word(sig0) + _word(maj) - _word(a_new)
                            - ca_val))

        w2 = [W(i, -2) for i in range(32)]
        w7 = [W(i, -7) for i in range(32)]
        w15 = [W(i, -15) for i in range(32)]
        w16 = [W(i, -16) for i in range(32)]
        s1 = [_xor3(rotr(w2, 17)[i], rotr(w2, 19)[i], shr(w2, 10)[i])
              for i in range(32)]
        s0 = [_xor3(rotr(w15, 7)[i], rotr(w15, 18)[i], shr(w15, 3)[i])
              for i in range(32)]
        cs.create_gate("sha_wide_w",
                       qs * (_word(s1) + _word(w7) + _word(s0) + _word(w16)
                             - _word(w_cur) - cw_val))

        # w-word binding on rounds 0..15
        cs.create_gate("sha_wide_w16",
                       c["q_w16"].at() * (_word(w_cur)
                                          - c["w_word"].at()))
        # staging binds (rows 4..7): word(a bits) = st_a, word(e) = st_e
        cs.create_gate("sha_wide_stage",
                       [c["q_stage"].at() * (_word(a_new) - c["st_a"].at()),
                        c["q_stage"].at() * (_word(e_new) - c["st_e"].at())])
        # digest binding on block row 0
        qo = c["q_out"].at()
        polys = []
        for j in range(4):
            w_in = _word([A(i, 7 - j) for i in range(32)])
            w_out = _word([A(i, 71 - j) for i in range(32)])
            polys.append(qo * (w_in + w_out - c["digest"][j].at()
                               - Scaled(c["dc"][j].at(), 1 << 32)))
        for j in range(4):
            w_in = _word([E(i, 7 - j) for i in range(32)])
            w_out = _word([E(i, 71 - j) for i in range(32)])
            polys.append(qo * (w_in + w_out - c["digest"][4 + j].at()
                               - Scaled(c["dc"][4 + j].at(), 1 << 32)))
        cs.create_gate("sha_wide_digest", polys)

    def assign(self, n: int, usable: int):
        """Returns (fixed_vals, advice_vals, region_copies, link_requests)
        where *_vals map global column index -> full-height value list;
        region_copies are ((gcol,row),(gcol,row)) pairs internal to the
        region; link_requests are (builder_virt_idx, (gcol,row))."""
        chip = self.chip
        c = self.cols
        nb = len(chip.blocks)
        rows = nb * ROWS_PER_BLOCK

        # numpy witness
        Wm = np.zeros((nb, ROWS_PER_BLOCK), np.int64)
        Am = np.zeros((nb, ROWS_PER_BLOCK), np.int64)
        Em = np.zeros((nb, ROWS_PER_BLOCK), np.int64)
        CEm = np.zeros((nb, ROWS_PER_BLOCK, 3), np.int64)
        CAm = np.zeros((nb, ROWS_PER_BLOCK, 3), np.int64)
        CWm = np.zeros((nb, ROWS_PER_BLOCK, 2), np.int64)
        DCm = np.zeros((nb, 8), np.int64)
        for bi, req in enumerate(chip.blocks):
            out, Wfull, a_rows, e_rows, ce, ca = _sha_rounds(
                req.state_in, req.sched_vals)
            assert out == req.digest_vals
            a, b_, cc_, d = req.state_in[0], req.state_in[1], \
                req.state_in[2], req.state_in[3]
            e, f, g, h = req.state_in[4:8]
            Am[bi, 4:8] = [d, cc_, b_, a]
            Em[bi, 4:8] = [h, g, f, e]
            Am[bi, ROUND0:] = a_rows
            Em[bi, ROUND0:] = e_rows
            Wm[bi, ROUND0:] = Wfull
            for r in range(64):
                for t in range(3):
                    CEm[bi, ROUND0 + r, t] = (ce[r] >> t) & 1
                    CAm[bi, ROUND0 + r, t] = (ca[r] >> t) & 1
            for r in range(16, 64):
                w15, w2 = Wfull[r - 15], Wfull[r - 2]
                s0 = _rotr_i(w15, 7) ^ _rotr_i(w15, 18) ^ (w15 >> 3)
                s1 = _rotr_i(w2, 17) ^ _rotr_i(w2, 19) ^ (w2 >> 10)
                full = Wfull[r - 16] + s0 + Wfull[r - 7] + s1
                cwv = (full - Wfull[r]) >> 32
                for t in range(2):
                    CWm[bi, ROUND0 + r, t] = (cwv >> t) & 1
            fin = [a_rows[-1], a_rows[-2], a_rows[-3], a_rows[-4],
                   e_rows[-1], e_rows[-2], e_rows[-3], e_rows[-4]]
            for j in range(8):
                DCm[bi, j] = (req.state_in[j] + fin[j]) >> 32

        def colvals(mat_bits, bit):
            v = np.zeros(n, np.int64)
            flat = ((mat_bits.reshape(-1) >> bit) & 1)
            v[:rows] = flat
            return v.tolist()

        advice_vals: Dict[int, list] = {}
        for i in range(32):
            advice_vals[c["a"][i].index] = colvals(Am, i)
            advice_vals[c["e"][i].index] = colvals(Em, i)
            advice_vals[c["w"][i].index] = colvals(Wm, i)
        for t in range(3):
            advice_vals[c["ce"][t].index] = _pad(CEm[:, :, t].reshape(-1), n)
            advice_vals[c["ca"][t].index] = _pad(CAm[:, :, t].reshape(-1), n)
        for t in range(2):
            advice_vals[c["cw"][t].index] = _pad(CWm[:, :, t].reshape(-1), n)

        w_word = np.zeros(n, np.int64)
        st_a = np.zeros(n, np.int64)
        st_e = np.zeros(n, np.int64)
        dig = np.zeros((8, n), np.int64)
        dc = np.zeros((8, n), np.int64)
        for bi, req in enumerate(chip.blocks):
            base = bi * ROWS_PER_BLOCK
            for r in range(16):
                w_word[base + ROUND0 + r] = req.sched_vals[r]
            st_a[base + 4:base + 8] = Am[bi, 4:8]
            st_e[base + 4:base + 8] = Em[bi, 4:8]
            for j in range(8):
                dig[j, base] = req.digest_vals[j]
                dc[j, base] = DCm[bi, j]
        advice_vals[c["w_word"].index] = w_word.tolist()
        advice_vals[c["st_a"].index] = st_a.tolist()
        advice_vals[c["st_e"].index] = st_e.tolist()
        for j in range(8):
            advice_vals[c["digest"][j].index] = dig[j].tolist()
            advice_vals[c["dc"][j].index] = dc[j].tolist()

        fixed_vals: Dict[int, list] = {}
        qb = np.zeros(n, np.int64)
        qb[:rows] = 1
        q_round = np.zeros(n, np.int64)
        q_sched = np.zeros(n, np.int64)
        q_w16 = np.zeros(n, np.int64)
        q_stage = np.zeros(n, np.int64)
        q_out = np.zeros(n, np.int64)
        kv = np.zeros(n, np.int64)
        for bi in range(nb):
            base = bi * ROWS_PER_BLOCK
            q_round[base + ROUND0:base + ROWS_PER_BLOCK] = 1
            q_sched[base + ROUND0 + 16:base + ROWS_PER_BLOCK] = 1
            q_w16[base + ROUND0:base + ROUND0 + 16] = 1
            q_stage[base + 4:base + 8] = 1
            q_out[base] = 1
            kv[base + ROUND0:base + ROWS_PER_BLOCK] = K_ROUND
        fixed_vals[c["q_bit"].index] = qb.tolist()
        fixed_vals[c["q_round"].index] = q_round.tolist()
        fixed_vals[c["q_sched"].index] = q_sched.tolist()
        fixed_vals[c["q_w16"].index] = q_w16.tolist()
        fixed_vals[c["q_stage"].index] = q_stage.tolist()
        fixed_vals[c["q_out"].index] = q_out.tolist()
        fixed_vals[c["k"].index] = kv.tolist()

        # copies
        region_copies = []
        link_requests = []   # (builder_virt_idx, (gcol, row))
        const_requests = []  # (value, (gcol, row))
        for bi, req in enumerate(chip.blocks):
            base = bi * ROWS_PER_BLOCK
            for r in range(16):
                pos = (c["w_word"].index, base + ROUND0 + r)
                if req.sched_links[r] is not None:
                    link_requests.append((req.sched_links[r], pos))
                else:
                    const_requests.append((req.sched_consts[r], pos))
            if req.chain_prev is not None:
                pb = req.chain_prev * ROWS_PER_BLOCK
                # st rows 4..7 hold (d,c,b,a)/(h,g,f,e) = digest[3-j]...
                for j in range(4):
                    region_copies.append(
                        ((c["st_a"].index, base + 4 + j),
                         (c["digest"][3 - j].index, pb)))
                    region_copies.append(
                        ((c["st_e"].index, base + 4 + j),
                         (c["digest"][7 - j].index, pb)))
            else:
                for j in range(4):
                    const_requests.append(
                        (H0[3 - j], (c["st_a"].index, base + 4 + j)))
                    const_requests.append(
                        (H0[7 - j], (c["st_e"].index, base + 4 + j)))
            if req.digest_links is not None:
                for j in range(8):
                    link_requests.append(
                        (req.digest_links[j],
                         (c["digest"][j].index, base)))
        return fixed_vals, advice_vals, region_copies, link_requests, \
            const_requests


def _pad(arr, n):
    v = np.zeros(n, np.int64)
    v[:arr.shape[0]] = arr
    return v.tolist()
