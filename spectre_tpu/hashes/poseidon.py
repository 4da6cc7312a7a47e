"""Poseidon over BN254 Fr, parameter- and sponge-compatible with pse-poseidon.

The reference commits to sync-committee pubkeys with
`pse_poseidon::Poseidon::<Fr, T=12, RATE=11>::new(R_F=8, R_P=60)`
(lightclient-circuits/src/poseidon.rs:22-30,114) and the matching in-circuit
halo2-base `PoseidonSponge` — both generate parameters with the Grain LFSR
procedure of the Poseidon reference implementation (GrainLFSR §"init_sequence",
80-bit state, self-shrinking output, MSB-first field sampling with rejection
for round constants; Cauchy MDS from non-rejection-sampled xs/ys), and run a
variable-length sponge whose capacity element is initialized to 2^64.

We implement the *standard* Poseidon permutation (add-constants -> sbox ->
MDS each round); pse-poseidon's "optimized" sparse-matrix schedule is an
algebraic refactoring of the same permutation with identical outputs.

Round-count table N_ROUNDS_PC mirrors poseidon.rs:22-24 (Poseidon paper
table-2/8 parameters): R_P = 60 for T = 12.
"""
from __future__ import annotations

import functools

from ..fields.params import BN254_FR as FR
from ..fields.host import inv_mod

# Poseidon commitment geometry (reference poseidon.rs:26-30)
POSEIDON_SIZE = 11         # RATE
T = POSEIDON_SIZE + 1      # 12
R_F = 8
R_P = 60                   # N_ROUNDS_PC[T - 2]
FR_NUM_BITS = 254
FR_CAPACITY = 253


class GrainLFSR:
    """The 80-bit Grain LFSR of the Poseidon reference parameter generator."""

    def __init__(self, field_bits: int, t: int, r_f: int, r_p: int):
        bits = [1] * 80

        def set_bits(offset, length, value):
            for i in range(length):
                bits[offset + length - 1 - i] = (value >> i) & 1

        set_bits(0, 2, 1)          # field type: prime order
        set_bits(2, 4, 0)          # sbox: x^alpha
        set_bits(6, 12, field_bits)
        set_bits(18, 12, t)
        set_bits(30, 10, r_f)
        set_bits(40, 10, r_p)
        # remaining 30 bits stay 1
        self.state = bits
        for _ in range(160):
            self._raw_bit()

    def _raw_bit(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [new]
        return new

    def bit(self) -> int:
        # self-shrinking: evaluate bits in pairs; a 1 emits the next bit,
        # a 0 discards it.
        while True:
            if self._raw_bit() == 1:
                return self._raw_bit()
            self._raw_bit()

    def field_element(self, modulus: int, field_bits: int) -> int:
        """MSB-first sample of field_bits bits, with rejection."""
        while True:
            v = 0
            for _ in range(field_bits):
                v = (v << 1) | self.bit()
            if v < modulus:
                return v

    def field_element_no_rejection(self, modulus: int, field_bits: int) -> int:
        v = 0
        for _ in range(field_bits):
            v = (v << 1) | self.bit()
        return v % modulus


@functools.lru_cache(maxsize=None)
def grain_params(t: int = T, r_f: int = R_F, r_p: int = R_P,
                 modulus: int = FR, field_bits: int = FR_NUM_BITS):
    """(round_constants[(r_f+r_p)][t], mds[t][t]) for Poseidon over `modulus`."""
    g = GrainLFSR(field_bits, t, r_f, r_p)
    constants = [
        [g.field_element(modulus, field_bits) for _ in range(t)]
        for _ in range(r_f + r_p)
    ]
    xs = [g.field_element_no_rejection(modulus, field_bits) for _ in range(t)]
    ys = [g.field_element_no_rejection(modulus, field_bits) for _ in range(t)]
    mds = [[inv_mod(x + y, modulus) for y in ys] for x in xs]
    return constants, mds


def _sbox(x: int, p: int) -> int:
    x2 = x * x % p
    x4 = x2 * x2 % p
    return x4 * x % p


def permute(state, t: int = T, r_f: int = R_F, r_p: int = R_P,
            modulus: int = FR, field_bits: int = FR_NUM_BITS):
    """Standard Poseidon permutation (host ints)."""
    constants, mds = grain_params(t, r_f, r_p, modulus, field_bits)
    p = modulus
    half = r_f // 2
    s = list(state)
    for r in range(r_f + r_p):
        c = constants[r]
        s = [(x + ci) % p for x, ci in zip(s, c)]
        if half <= r < half + r_p:
            s[0] = _sbox(s[0], p)
        else:
            s = [_sbox(x, p) for x in s]
        s = [sum(mds[i][j] * s[j] for j in range(t)) % p for i in range(t)]
    return s


class PoseidonNative:
    """Variable-length sponge matching pse_poseidon::Poseidon semantics.

    - initial state: [2^64, 0, ..., 0] (variable-length domain tag)
    - update(): buffer inputs; for every full RATE chunk, add into
      state[1..] and permute
    - squeeze(): append 1 to the pending buffer, add into state[1..],
      permute once, return state[0]; state is retained across squeezes.
    """

    def __init__(self, t: int = T, rate: int = POSEIDON_SIZE,
                 r_f: int = R_F, r_p: int = R_P, modulus: int = FR,
                 field_bits: int = FR_NUM_BITS):
        assert rate < t
        self.t, self.rate, self.r_f, self.r_p = t, rate, r_f, r_p
        self.p = modulus
        self.field_bits = field_bits
        self.state = [1 << 64] + [0] * (t - 1)
        self.absorbing: list = []

    def _permute(self):
        self.state = permute(self.state, self.t, self.r_f, self.r_p,
                             self.p, self.field_bits)

    def update(self, elements):
        buf = self.absorbing + [e % self.p for e in elements]
        self.absorbing = []
        i = 0
        while len(buf) - i >= self.rate:
            chunk = buf[i:i + self.rate]
            for j, e in enumerate(chunk):
                self.state[j + 1] = (self.state[j + 1] + e) % self.p
            self._permute()
            i += self.rate
        self.absorbing = buf[i:]

    def squeeze(self) -> int:
        last = self.absorbing + [1]
        assert len(last) <= self.rate
        for j, e in enumerate(last):
            self.state[j + 1] = (self.state[j + 1] + e) % self.p
        self._permute()
        self.absorbing = []
        return self.state[0]


# ---------------- committee commitment (reference poseidon.rs) ----------------

from ..fields.params import LIMB_BITS
from ..curves.host import g1_decompress, g1_from_uncompressed, FQ


def _g1_array_poseidon_native(x_coords, y_signs, limb_bits: int = LIMB_BITS) -> int:
    """Onion commitment over folded Fq limbs + packed y-sign bits.

    Mirrors poseidon_hash_g1_array (poseidon.rs:100-144): each x coordinate's
    48 LE bytes split into chunks of (limb_bits/8)*2 bytes (2 field elements
    per pubkey at limb_bits=104); y signs packed little-endian into
    (Fr::CAPACITY - 1)-bit batches; absorbed in chunks of POSEIDON_SIZE-2
    with the previous squeeze chained in.
    """
    limbs = []
    chunk_bytes = (limb_bits // 8) * 2
    for x in x_coords:
        b = int(x).to_bytes(48, "little")
        for off in range(0, 48, chunk_bytes):
            limbs.append(int.from_bytes(b[off:off + chunk_bytes], "little"))
    signs_packed = []
    cap = FR_CAPACITY - 1
    for off in range(0, len(y_signs), cap):
        chunk = y_signs[off:off + cap]
        packed = 0
        for i, bit in enumerate(chunk):
            packed += (1 << i) if bit else 0
        signs_packed.append(packed)

    inputs = limbs + signs_packed
    sponge = PoseidonNative()
    current = None
    step = POSEIDON_SIZE - 2
    for i, off in enumerate(range(0, len(inputs), step)):
        sponge.update(inputs[off:off + step])
        if i != 0:
            sponge.update([current])
        current = sponge.squeeze()
    assert current is not None, "no G1 points to hash"
    return current


def poseidon_committee_commitment_from_uncompressed(pubkeys, limb_bits: int = LIMB_BITS) -> int:
    """poseidon.rs:147-163: y sign = (2y > q) on the decoded uncompressed point."""
    xs, signs = [], []
    for b in pubkeys:
        pt = g1_from_uncompressed(bytes(b))
        x, y = pt
        xs.append(x)
        signs.append(2 * y > FQ)
    return _g1_array_poseidon_native(xs, signs, limb_bits)


def poseidon_committee_commitment_from_compressed(pubkeys, limb_bits: int = LIMB_BITS) -> int:
    """poseidon.rs:166-183: x from cleared bytes, sign = compression flag bit."""
    xs, signs = [], []
    for b in pubkeys:
        b = bytes(b)
        sign = bool(b[0] & 0b0010_0000)
        x = int.from_bytes(bytes([b[0] & 0b0001_1111]) + b[1:], "big")
        assert x < FQ, "bad Fq encoding"
        xs.append(x)
        signs.append(sign)
    return _g1_array_poseidon_native(xs, signs, limb_bits)
