"""In-circuit SHA-256 vs hashlib, mock-verified."""
import hashlib

from spectre_tpu.circuits import CircuitBuilder
from spectre_tpu.circuits.sha256_gadget import Sha256Chip, spread_int
from spectre_tpu.fields import limb as L
from spectre_tpu.plonk.mock import MockProver


def _mock(builder, k):
    cs, fixed, advice, instances = builder.compile(k)
    spec = L.fr_spec
    n = 1 << k
    cols = []
    fi = ai = ii = 0
    inst_cols = [list(v) + [0] * (n - len(v)) for v in instances]
    for col in cs.columns:
        if col.kind == "fixed":
            cols.append(spec.encode_batch(fixed[fi])); fi += 1
        elif col.kind == "advice":
            cols.append(spec.encode_batch(advice[ai])); ai += 1
        else:
            cols.append(spec.encode_batch(inst_cols[ii])); ii += 1
    return MockProver(cs, n, cols), cs


def test_spread_int():
    assert spread_int(0b101) == 0b10001
    assert spread_int(0xFF) == 0x5555


def test_sha256_single_block_matches_hashlib():
    b = CircuitBuilder()
    chip = Sha256Chip(b)
    ctx = b.main()
    msg = b"abc"
    cells = ctx.assign_many(list(msg))
    out = chip.digest_bytes_cells(cells)
    got = bytes(c.value for c in out)
    assert got == hashlib.sha256(msg).digest()


def test_sha256_two_blocks_matches_hashlib():
    b = CircuitBuilder()
    chip = Sha256Chip(b)
    ctx = b.main()
    msg = bytes(range(64))  # 64-byte message -> 2 compressions (padding)
    cells = ctx.assign_many(list(msg))
    out = chip.digest_bytes_cells(cells)
    assert bytes(c.value for c in out) == hashlib.sha256(msg).digest()


def test_sha256_circuit_mock_verifies():
    b = CircuitBuilder()
    chip = Sha256Chip(b)
    ctx = b.main()
    msg = b"spectre-tpu"
    cells = ctx.assign_many(list(msg))
    out = chip.digest_bytes_cells(cells)
    for c in out[:4]:
        b.expose_public(c)
    prover, cs = _mock(b, 14)
    assert prover.verify() == []


def test_sha256_circuit_mock_catches_tamper():
    b = CircuitBuilder()
    chip = Sha256Chip(b)
    ctx = b.main()
    msg = b"spectre-tpu"
    cells = ctx.assign_many(list(msg))
    out = chip.digest_bytes_cells(cells)
    # tamper with one digest chunk cell value post-hoc
    ctx.cells[out[0].idx] = (ctx.cells[out[0].idx] + 1) % L.fr_spec.p
    prover, cs = _mock(b, 14)
    fails = prover.verify(raise_on_failure=False)
    assert fails


def test_flex_word_chip_matches_hashlib():
    """ShaFlexWordChip (thin-layout word-level adapter) produces the same
    digests as hashlib through both entry points."""
    import hashlib
    from spectre_tpu.circuits.builder import CircuitBuilder
    from spectre_tpu.circuits.sha256_gadget import ShaFlexWordChip
    from spectre_tpu.circuits.ssz_merkle import sha_pair_words

    b = CircuitBuilder()
    chip = ShaFlexWordChip(b)
    ctx = b.main()
    msg = bytes(range(64))
    cells = ctx.assign_many(list(msg))
    words = chip.digest_words_of_bytes(cells)
    got = b"".join(int(w.value).to_bytes(4, "big") for w in words)
    assert got == hashlib.sha256(msg).digest()

    left = ctx.assign_many([int.from_bytes(msg[4 * i:4 * i + 4], "big")
                            for i in range(8)])
    right = [0] * 8
    pw = sha_pair_words(chip, left, right)
    got2 = b"".join(int(w.value).to_bytes(4, "big") for w in pw)
    assert got2 == hashlib.sha256(msg[:32] + b"\x00" * 32).digest()
