"""Fiat-Shamir transcripts, halo2-compatible framing.

Blake2bTranscript mirrors halo2_proofs' Blake2bWrite/Blake2bRead:
  - blake2b, 64-byte digest, personalization b"Halo2-Transcript"
  - domain prefixes: 0 = challenge, 1 = point, 2 = scalar
  - squeeze: clone state, finalize, reduce 64 LE bytes mod r (from_bytes_wide)
KeccakTranscript (EVM flavor, snark-verifier style) lands with the
aggregation stage; the trait shape here is already split read/write so both
slot in. Byte-exactness against the reference prover is revalidated when the
EVM verifier path is wired (SURVEY.md §7 hard part #4).

BN254 G1 points are absorbed in halo2curves' 32-byte compressed form:
x as 32 LE bytes with the y-sign flag in the top bit (bit 255); identity is
all zeros.
"""
from __future__ import annotations

import hashlib

from ..fields.params import BN254_FR as FR, BN254_FQ as FQ

PREFIX_CHALLENGE = b"\x00"
PREFIX_POINT = b"\x01"
PREFIX_SCALAR = b"\x02"


class ProofError(Exception):
    """Malformed proof encoding (non-canonical scalar, invalid point,
    truncated buffer). Raised during deserialization; verify_proof catches
    it and returns False. Explicit raise (not assert) so the checks survive
    python -O."""


def g1_to_bytes(pt) -> bytes:
    """halo2curves bn256::G1Affine::to_bytes (32-byte compressed LE)."""
    if pt is None:
        return b"\x00" * 32
    x, y = pt
    b = bytearray(int(x).to_bytes(32, "little"))
    if y & 1:  # sign flag = y parity (halo2curves: y.is_odd())
        b[31] |= 0x80
    return bytes(b)


def g1_from_bytes(b: bytes):
    from ..curves.host import bn254_g1 as curve
    from ..fields.host import sqrt_mod
    if b == b"\x00" * 32:
        return None
    arr = bytearray(b)
    sign = (arr[31] & 0x80) != 0
    arr[31] &= 0x7F
    x = int.from_bytes(bytes(arr), "little")
    if x >= FQ:
        raise ProofError("point x-coordinate not canonical")
    y = sqrt_mod((x * x % FQ * x + 3) % FQ, FQ)
    if y is None:
        raise ProofError("x not on curve")
    if (y & 1) != sign:
        y = FQ - y
    return (x, y)


class Blake2bTranscript:
    """Write/read transcript over an in-memory proof byte buffer."""

    def __init__(self, proof: bytes | None = None):
        self.state = hashlib.blake2b(digest_size=64,
                                     person=b"Halo2-Transcript")
        self.buf = bytearray()
        self.read_view = memoryview(bytes(proof)) if proof is not None else None
        self.read_off = 0

    # ---- common (absorb only) ----
    def common_point(self, pt):
        self.state.update(PREFIX_POINT)
        self.state.update(g1_to_bytes(pt))

    def common_scalar(self, v: int):
        self.state.update(PREFIX_SCALAR)
        self.state.update(int(v % FR).to_bytes(32, "little"))

    # ---- prover side (absorb + append to proof) ----
    def write_point(self, pt):
        self.common_point(pt)
        self.buf += g1_to_bytes(pt)

    def write_scalar(self, v: int):
        self.common_scalar(v)
        self.buf += int(v % FR).to_bytes(32, "little")

    # ---- verifier side (read from proof + absorb) ----
    def read_point(self):
        b = bytes(self.read_view[self.read_off:self.read_off + 32])
        if len(b) < 32:
            raise ProofError("truncated proof (point)")
        self.read_off += 32
        pt = g1_from_bytes(b)
        self.common_point(pt)
        return pt

    def read_scalar(self) -> int:
        b = bytes(self.read_view[self.read_off:self.read_off + 32])
        if len(b) < 32:
            raise ProofError("truncated proof (scalar)")
        self.read_off += 32
        v = int.from_bytes(b, "little")
        if v >= FR:
            raise ProofError("scalar not canonical")
        self.common_scalar(v)
        return v

    def squeeze_challenge(self) -> int:
        # halo2 Blake2bWrite::squeeze_challenge: absorb the prefix, finalize a
        # clone; the running state is NOT re-seeded with the digest.
        self.state.update(PREFIX_CHALLENGE)
        digest = self.state.copy().digest()
        return int.from_bytes(digest, "little") % FR

    def proof(self) -> bytes:
        return bytes(self.buf)


class KeccakTranscript(Blake2bTranscript):
    """EVM-flavor transcript (snark-verifier ChallengeEvm style):
    Keccak-256 state, BE framing, uncompressed points.

    Points/scalars are absorbed as raw BE bytes into a running buffer; each
    challenge hashes the buffer and reseeds it with the digest. The proof
    framing (64-byte uncompressed points, 32-byte BE scalars) is exactly
    what the generated EVM verifier (evm/verifier_gen.py) calldataloads —
    byte-parity is pinned by executing generated verifiers over real proofs
    in the EVM interpreter (tests/test_evm_verifier.py).
    """

    def __init__(self, proof: bytes | None = None):
        self.buf = bytearray()
        self.absorbed = bytearray()
        self.read_view = memoryview(bytes(proof)) if proof is not None else None
        self.read_off = 0

    def common_point(self, pt):
        from ..fields.params import BN254_FQ as FQ
        if pt is None:
            self.absorbed += b"\x00" * 64
        else:
            x, y = pt
            self.absorbed += int(x).to_bytes(32, "big")
            self.absorbed += int(y).to_bytes(32, "big")

    def common_scalar(self, v: int):
        self.absorbed += int(v % FR).to_bytes(32, "big")

    def squeeze_challenge(self) -> int:
        from ..hashes.keccak import keccak256
        # domain-separate consecutive squeezes with a 0x01 byte
        if not self.absorbed:
            self.absorbed += b"\x01"
        digest = keccak256(bytes(self.absorbed))
        self.absorbed = bytearray(digest)
        return int.from_bytes(digest, "big") % FR

    # EVM proof framing: points as uncompressed (x ‖ y) 32-byte BE words,
    # scalars as 32-byte BE — what the generated verifier calldataloads.
    def write_point(self, pt):
        self.common_point(pt)
        if pt is None:
            self.buf += b"\x00" * 64
        else:
            self.buf += int(pt[0]).to_bytes(32, "big")
            self.buf += int(pt[1]).to_bytes(32, "big")

    def write_scalar(self, v: int):
        self.common_scalar(v)
        self.buf += int(v % FR).to_bytes(32, "big")

    def read_point(self):
        b = bytes(self.read_view[self.read_off:self.read_off + 64])
        if len(b) < 64:
            raise ProofError("truncated proof (point)")
        self.read_off += 64
        x = int.from_bytes(b[:32], "big")
        y = int.from_bytes(b[32:], "big")
        if x >= FQ or y >= FQ:
            raise ProofError("point coordinate not canonical")
        if x == 0 and y == 0:
            pt = None
        else:
            if (y * y - (x * x % FQ * x + 3)) % FQ != 0:
                raise ProofError("point not on curve")
            pt = (x, y)
        self.common_point(pt)
        return pt

    def read_scalar(self) -> int:
        b = bytes(self.read_view[self.read_off:self.read_off + 32])
        if len(b) < 32:
            raise ProofError("truncated proof (scalar)")
        self.read_off += 32
        v = int.from_bytes(b, "big")
        if v >= FR:
            raise ProofError("scalar not canonical")
        self.common_scalar(v)
        return v


AGG_LIMB_BITS = 88      # aggregation-side non-native limb width
AGG_N_LIMBS = 3


class PoseidonTranscript(KeccakTranscript):
    """Aggregation-flavor transcript (snark-verifier PoseidonTranscript
    analog): challenges come from the native Poseidon duplex sponge so the
    aggregation circuit can recompute them with ~10 permutations instead of
    re-hashing byte streams in-circuit.

    Absorb schedule (mirrored cell-for-cell by circuits/aggregation.py):
      - scalar v: update([v])
      - point (x, y): update([x mod r, x mod 2^88, y mod r, y mod 2^88]) —
        the (native residue, low limb) CRT pair determines the coordinate
        integer uniquely below 2^264, so the sponge binds the full witness
        coordinates the circuit range-checks; identity absorbs four zeros
      - challenge: sponge.squeeze()
    Proof BYTE framing reuses the EVM layout (uncompressed BE points, BE
    scalars) so witness parsing stays trivial on both sides.
    """

    def __init__(self, proof: bytes | None = None):
        from ..hashes.poseidon import PoseidonNative
        self.sponge = PoseidonNative()
        self.buf = bytearray()
        self.read_view = memoryview(bytes(proof)) if proof is not None else None
        self.read_off = 0

    def common_point(self, pt):
        if pt is None:
            self.sponge.update([0, 0, 0, 0])
        else:
            x, y = int(pt[0]), int(pt[1])
            m = (1 << AGG_LIMB_BITS) - 1
            self.sponge.update([x % FR, x & m, y % FR, y & m])

    def common_scalar(self, v: int):
        self.sponge.update([v % FR])

    def squeeze_challenge(self) -> int:
        return self.sponge.squeeze()
