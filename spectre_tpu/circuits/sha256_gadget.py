"""In-circuit SHA-256 via the spread (interleaved-bits) technique.

The reference uses two SHA-256 chips (SURVEY.md §2a #7/#8); this is our
re-design of the *flex/spread* one (sha256_flex, derived from
zkemail/halo2-dynamic-sha256) on the spectre_tpu builder:

* 32-bit words carry a dense cell, a spread cell (bits interleaved with
  zeros, base-4 digits), and four 8-bit chunk witnesses pinned to a single
  256-row (dense, spread) fixed table;
* XOR/AND/MAJ become field additions of spread forms followed by an
  even/odd base-4 split — the even part is the XOR, the odd part the
  carries (Ch exploits disjointness: (e∧f) + (¬e∧g) has no overlap);
* rotations decompose the dense word at the rotation boundaries (pieces
  ≤ 8 bits, range-checked through the same table with the shift trick) and
  reassemble rotated spread forms as constant-coefficient inner products.

Witness generation is plain int math here; the batched device witness path
(hashing hundreds of blocks at once, SURVEY.md §7 hard part #5) hooks in at
`sha256_many_blocks_witness` later.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

from .builder import CircuitBuilder, Context, AssignedValue

TABLE = "sha_spread"
MASK32 = (1 << 32) - 1

K = [
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


def spread_int(x: int) -> int:
    out = 0
    i = 0
    while x:
        out |= (x & 1) << (2 * i)
        x >>= 1
        i += 1
    return out


SPREAD8 = [spread_int(d) for d in range(256)]
SPREAD_ALL32 = spread_int(MASK32)


def _cuts_to_sizes(cuts: Sequence[int]) -> List[int]:
    """Rotation cuts + byte grid -> LSB-first piece sizes summing to 32."""
    bounds = sorted(set(list(cuts) + [8, 16, 24, 0, 32]))
    return [b - a for a, b in zip(bounds, bounds[1:])]


@dataclass
class Word:
    dense: AssignedValue
    spread: AssignedValue

    @property
    def value(self) -> int:
        return self.dense.value


class Sha256Chip:
    def __init__(self, builder: CircuitBuilder):
        if TABLE not in builder.tables:
            builder.add_table(TABLE, [list(range(256)), SPREAD8])
        self.ctx = builder.main()

    # ---- spread-table plumbing ----
    def _pin_spread(self, d: AssignedValue, s: AssignedValue, size: int):
        """Constrain d < 2^size and s == spread(d)."""
        ctx = self.ctx
        if size == 8:
            ctx.pin_table(TABLE, [d, s])
        else:
            assert size < 8
            sh = 8 - size
            d_sh = ctx.mul_const(d, 1 << sh)
            s_sh = ctx.mul_const(s, 1 << (2 * sh))
            ctx.pin_table(TABLE, [d_sh, s_sh])

    def _witness_pieces(self, value: int, sizes: Sequence[int]):
        """Witness LSB-first pieces + their spreads, all table-pinned."""
        ctx = self.ctx
        ds, ss = [], []
        off = 0
        for sz in sizes:
            p = (value >> off) & ((1 << sz) - 1)
            d = ctx.assign(p)
            s = ctx.assign(spread_int(p))
            self._pin_spread(d, s, sz)
            ds.append(d)
            ss.append(s)
            off += sz
        return ds, ss

    def word_from_value(self, value: int) -> Word:
        """Fresh 32-bit word: chunk witnesses -> dense + spread cells."""
        ctx = self.ctx
        ds, ss = self._witness_pieces(value & MASK32, [8, 8, 8, 8])
        dense = ctx.inner_product(ds, [1 << (8 * i) for i in range(4)])
        spread = ctx.inner_product(ss, [1 << (16 * i) for i in range(4)])
        return Word(dense, spread)

    def word_from_cell(self, cell: AssignedValue) -> Word:
        """Attach spread form to an existing dense cell (range-checks it)."""
        w = self.word_from_value(cell.value)
        self.ctx.constrain_equal(w.dense, cell)
        return w

    def word_const(self, value: int) -> Word:
        ctx = self.ctx
        return Word(ctx.load_constant(value & MASK32),
                    ctx.load_constant(spread_int(value & MASK32)))

    # ---- even/odd split of a spread sum ----
    def _even_odd(self, t: AssignedValue):
        """t = E.spread + 2*O.spread with E, O valid words; returns (E, O)."""
        ctx = self.ctx
        tv = t.value
        e_val = o_val = 0
        for i in range(32):
            e_val |= ((tv >> (2 * i)) & 1) << i
            o_val |= ((tv >> (2 * i + 1)) & 1) << i
        E = self.word_from_value(e_val)
        O = self.word_from_value(o_val)
        two_o = ctx.mul_const(O.spread, 2)
        s = ctx.add(E.spread, two_o)
        ctx.constrain_equal(s, t)
        return E, O

    # ---- rotation machinery ----
    def _sigma(self, w: Word, rots: Sequence[int], shifts: Sequence[int]):
        """XOR of rotations/shifts of w; returns the result Word (even part)."""
        ctx = self.ctx
        cuts = sorted(set(list(rots) + list(shifts)))
        sizes = _cuts_to_sizes(cuts)
        ds, ss = self._witness_pieces(w.value, sizes)
        # bind pieces to the word's dense cell
        offs = []
        off = 0
        for sz in sizes:
            offs.append(off)
            off += sz
        recomb = ctx.inner_product(ds, [1 << o for o in offs])
        ctx.constrain_equal(recomb, w.dense)

        terms = []
        for r in rots:
            coeffs = [1 << (2 * ((o - r) % 32)) for o in offs]
            terms.append(ctx.inner_product(ss, coeffs))
        for r in shifts:
            coeffs = [(1 << (2 * (o - r))) if o >= r else 0 for o in offs]
            terms.append(ctx.inner_product(ss, coeffs))
        t = terms[0]
        for x in terms[1:]:
            t = ctx.add(t, x)
        E, _ = self._even_odd(t)
        return E

    def big_sigma0(self, w: Word) -> Word:
        return self._sigma(w, rots=[2, 13, 22], shifts=[])

    def big_sigma1(self, w: Word) -> Word:
        return self._sigma(w, rots=[6, 11, 25], shifts=[])

    def small_sigma0(self, w: Word) -> Word:
        return self._sigma(w, rots=[7, 18], shifts=[3])

    def small_sigma1(self, w: Word) -> Word:
        return self._sigma(w, rots=[17, 19], shifts=[10])

    # ---- boolean mixers ----
    def ch(self, e: Word, f: Word, g: Word) -> AssignedValue:
        """(e∧f) ⊕ (¬e∧g) — disjoint, so a plain sum of the two odd parts."""
        ctx = self.ctx
        p = ctx.add(e.spread, f.spread)
        _, op = self._even_odd(p)
        all1 = ctx.load_constant(SPREAD_ALL32)
        ne = ctx.sub(all1, e.spread)
        q = ctx.add(ne, g.spread)
        _, oq = self._even_odd(q)
        return ctx.add(op.dense, oq.dense)

    def maj(self, a: Word, b: Word, c: Word) -> AssignedValue:
        ctx = self.ctx
        t = ctx.add(ctx.add(a.spread, b.spread), c.spread)
        _, o = self._even_odd(t)
        return o.dense

    # ---- modular addition ----
    def add_mod32(self, terms) -> Word:
        """Sum of dense cells / int constants, reduced mod 2^32."""
        ctx = self.ctx
        total = 0
        acc = None
        for t in terms:
            if isinstance(t, int):
                total += t
                acc = ctx.add_const(acc, t) if acc is not None else \
                    ctx.load_constant(t)
            else:
                total += t.value
                acc = ctx.add(acc, t) if acc is not None else t
        res = total & MASK32
        carry = total >> 32
        out = self.word_from_value(res)
        c = ctx.assign(carry)
        cs = ctx.assign(spread_int(carry))
        self._pin_spread(c, cs, 4)  # carry < 16 covers up to 16 terms
        # acc == out.dense + carry * 2^32
        shifted = ctx.mul_const(c, 1 << 32)
        rhs = ctx.add(out.dense, shifted)
        ctx.constrain_equal(acc, rhs)
        return out

    # ---- compression + digest ----
    def compress(self, state: List[Word], block_words: List[Word]) -> List[Word]:
        a, b, c, d, e, f, g, h = state
        W = list(block_words)
        for t in range(16, 64):
            s1 = self.small_sigma1(W[t - 2])
            s0 = self.small_sigma0(W[t - 15])
            W.append(self.add_mod32(
                [s1.dense, W[t - 7].dense, s0.dense, W[t - 16].dense]))
        for t in range(64):
            S1 = self.big_sigma1(e)
            ch = self.ch(e, f, g)
            T1 = self.add_mod32([h.dense, S1.dense, ch, K[t], W[t].dense])
            S0 = self.big_sigma0(a)
            mj = self.maj(a, b, c)
            T2 = self.add_mod32([S0.dense, mj])
            h, g, f = g, f, e
            e = self.add_mod32([d.dense, T1.dense])
            d, c, b = c, b, a
            a = self.add_mod32([T1.dense, T2.dense])
        return [self.add_mod32([x.dense, y.dense])
                for x, y in zip([a, b, c, d, e, f, g, h], state)]

    def digest_bytes_cells(self, byte_cells: List[AssignedValue]) -> List[AssignedValue]:
        """SHA-256 of a fixed-length message given as byte cells.

        Returns 32 byte cells of the digest. Padding is appended as
        constants (message length is static — the circuit-shape contract).
        """
        ctx = self.ctx
        n = len(byte_cells)
        pad = [ctx.load_constant(0x80)]
        pad_zeros = (55 - n) % 64
        pad += [ctx.load_constant(0)] * pad_zeros
        bitlen = 8 * n
        pad += [ctx.load_constant((bitlen >> (8 * i)) & 0xFF)
                for i in range(7, -1, -1)]
        msg = byte_cells + pad
        assert len(msg) % 64 == 0

        state = [self.word_const(h) for h in H0]
        for off in range(0, len(msg), 64):
            words = []
            for wi in range(16):
                bs = msg[off + 4 * wi: off + 4 * wi + 4]
                val = sum(int(b) << (8 * (3 - i)) for i, b in enumerate(bs))
                w = self.word_from_value(val)
                recomb = ctx.inner_product(
                    bs, [1 << (8 * (3 - i)) for i in range(4)])
                ctx.constrain_equal(recomb, w.dense)
                words.append(w)
            state = self.compress(state, words)

        out = []
        for w in state:
            # big-endian bytes of each word; chunks already range-checked via
            # word_from_value in compress outputs — re-decompose to bytes
            ds, _ = self._witness_pieces(w.value, [8, 8, 8, 8])
            recomb = ctx.inner_product(ds, [1 << (8 * i) for i in range(4)])
            ctx.constrain_equal(recomb, w.dense)
            out.extend(reversed(ds))
        return out


class ShaFlexWordChip:
    """Word-level SHA interface (the ShaWideChip contract: hash_blocks +
    digest_words_of_bytes) over the spread-lookup Sha256Chip.

    Purpose: THIN circuit layouts. The wide engine pins ~123 dedicated
    columns regardless of k, which makes any circuit that uses it
    column-heavy — fatal for the aggregation stage, whose in-circuit MSM
    pays ~280k cells per inner-VK polynomial (one per column). Building
    the committee circuit on this adapter instead trades rows for columns
    (the reference's sha256_flex choice for the step circuit,
    sha256_flex.rs:44-196), collapsing the inner VK to tens of polys."""

    def __init__(self, builder):
        self.sha = Sha256Chip(builder)
        self.ctx = builder.main()

    def hash_blocks(self, word_cells_per_block):
        """Chained 16-word blocks (cells or int constants) -> 8 digest
        word cells, same contract as ShaWideChip.hash_blocks."""
        sha = self.sha
        state = [sha.word_const(h) for h in H0]
        for words in word_cells_per_block:
            wws = []
            for w in words:
                if isinstance(w, AssignedValue):
                    wws.append(sha.word_from_cell(w))
                else:
                    wws.append(sha.word_const(int(w)))
            state = sha.compress(state, wws)
        return [w.dense for w in state]

    def digest_words_of_bytes(self, byte_cells):
        """Fixed-length byte-cell message -> 8 BE digest word cells (the
        ShaWideChip.digest_words_of_bytes contract: bytes pack into BE
        words with recomposition constraints, standard padding)."""
        ctx = self.ctx
        n = len(byte_cells)
        msg = list(byte_cells)
        pad = bytearray([0x80])
        pad += b"\x00" * ((55 - n) % 64)
        pad += (8 * n).to_bytes(8, "big")
        allm = msg + [int(x) for x in pad]
        assert len(allm) % 64 == 0
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
                    words.append(ctx.inner_product(
                        quad_c, [1 << (8 * (3 - i)) for i in range(4)]))
            blocks.append(words)
        return self.hash_blocks(blocks)
