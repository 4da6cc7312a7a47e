"""In-circuit hash-to-G2 against the host RFC 9380 oracle.

The SSWU/iso/cofactor stages are validated per-stage (cheap); the full
expand+hash pipeline (19 SHA blocks) is marked slow."""
import random

import pytest

from spectre_tpu.fields.params import BLS12_381_FQ as P
from spectre_tpu.fields import limb as L
from spectre_tpu.curves import hash_to_curve as HH
from spectre_tpu.curves.host import bls_g2_host
from spectre_tpu.circuits.builder import CircuitBuilder
from spectre_tpu.circuits.range_chip import RangeChip
from spectre_tpu.circuits.bigint import FpChip
from spectre_tpu.circuits.sha256_gadget import Sha256Chip
from spectre_tpu.circuits.h2c_gadget import HashToCurveChip


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
    return MockProver(cs, n, cols)


def _chips():
    b = CircuitBuilder(lookup_bits=13)
    fp = FpChip(b, RangeChip(b, 13), P)
    sha = Sha256Chip(b)
    return b, HashToCurveChip(b, sha, fp)


def test_sswu_iso_mock():
    rng = random.Random(31)
    b, chip = _chips()
    u_v = (rng.randrange(P), rng.randrange(P))
    u = chip.f2.load(u_v)
    pt = chip.map_to_curve(u)
    want = HH.iso_map(HH.map_to_curve_sswu(u_v))
    got = (chip.f2.value_of(pt.x), chip.f2.value_of(pt.y))
    assert got == want
    assert bls_g2_host.is_on_curve(got)
    assert _mock(b, 16).verify() == []


@pytest.mark.heavy
def test_clear_cofactor_mock():
    rng = random.Random(32)
    b, chip = _chips()
    from spectre_tpu.fields.params import BLS12_381_G2_GEN
    Q = bls_g2_host.mul(BLS12_381_G2_GEN, rng.randrange(1, 1 << 120))
    aq = chip.ecc2.load_point(Q)
    out = chip.clear_cofactor(aq)
    want = HH.clear_cofactor(Q)
    got = (chip.f2.value_of(out.x), chip.f2.value_of(out.y))
    assert got == want
    assert _mock(b, 17).verify() == []


@pytest.mark.slow
def test_hash_to_g2_full_mock():
    b, chip = _chips()
    ctx = b.main()
    msg = bytes(range(32))
    dst = b"BLS_SIG_BLS12381G2_XMD:SHA-256_SSWU_RO_POP_"
    cells = ctx.assign_many(list(msg))
    from spectre_tpu.circuits.committee_update import _register_u8, U8_TABLE
    _register_u8(b)
    for c in cells:
        ctx.pin_table(U8_TABLE, [c])
    pt = chip.hash_to_g2(cells, dst)
    want = HH.hash_to_g2(msg, dst)
    got = (chip.f2.value_of(pt.x), chip.f2.value_of(pt.y))
    assert got == want
    assert _mock(b, 18).verify() == []
