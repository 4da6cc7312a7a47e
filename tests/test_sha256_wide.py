"""Wide (row-parallel) SHA-256 region vs hashlib + MockProver."""
import hashlib
import random

from spectre_tpu.fields import limb as L
from spectre_tpu.circuits.builder import CircuitBuilder
from spectre_tpu.circuits.sha256_wide import ShaWideChip


def _mock(builder, k):
    from spectre_tpu.plonk.mock import MockProver
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


def test_wide_digest_matches_hashlib_and_mocks():
    rng = random.Random(77)
    b = CircuitBuilder()
    chip = ShaWideChip(b)
    ctx = b.main()

    # message 1: a 64-byte message (pubkey-leaf shape: 2 chained blocks)
    msg1 = bytes(rng.randrange(256) for _ in range(64))
    cells1 = ctx.assign_many(list(msg1))
    d1 = chip.digest_words_of_bytes(cells1)
    want1 = hashlib.sha256(msg1).digest()
    got1 = b"".join(int(w.value).to_bytes(4, "big") for w in d1)
    assert got1 == want1

    # message 2: word-level chaining — hash of (d1 || d1) like a merkle
    # parent, digest words copied directly into the schedule
    words16 = list(d1) + list(d1)
    out = chip.hash_blocks([
        words16,
        [0x80000000] + [0] * 14 + [512],
    ])
    want2 = hashlib.sha256(want1 + want1).digest()
    got2 = b"".join(int(w.value).to_bytes(4, "big") for w in out)
    assert got2 == want2

    # message 3: byte digest output path
    msg3 = bytes(range(32))
    cells3 = ctx.assign_many(list(msg3))
    d3 = chip.digest_bytes_of_bytes(cells3)
    want3 = hashlib.sha256(msg3).digest()
    assert bytes(int(c.value) for c in d3) == want3

    mp, cs = _mock(b, 11)
    assert mp.verify() == []
    n_bits_cols = sum(1 for _ in cs.advice)
    print(f"advice cols: {n_bits_cols}, builder cells: {len(ctx.cells)}")


def test_wide_tampered_digest_fails():
    rng = random.Random(78)
    b = CircuitBuilder()
    chip = ShaWideChip(b)
    ctx = b.main()
    msg = bytes(rng.randrange(256) for _ in range(64))
    cells = ctx.assign_many(list(msg))
    d = chip.digest_words_of_bytes(cells)
    # tamper the builder-side digest word cell
    ctx.cells[d[0].idx] = (ctx.cells[d[0].idx] + 1) % (1 << 32)
    mp, _ = _mock(b, 11)
    assert mp.verify(raise_on_failure=False) != []
