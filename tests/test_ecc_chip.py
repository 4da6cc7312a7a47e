"""In-circuit ECC (G1 over Fp, G2 over Fp2) against host curve oracles."""
import random

from spectre_tpu.fields.params import BLS12_381_FQ as P
from spectre_tpu.fields import limb as L
from spectre_tpu.curves import host as H
from spectre_tpu.circuits.builder import CircuitBuilder
from spectre_tpu.circuits.range_chip import RangeChip
from spectre_tpu.circuits.bigint import FpChip
from spectre_tpu.circuits.fp2 import Fp2Chip
from spectre_tpu.circuits.ecc import EccChip
from spectre_tpu.plonk.mock import MockProver

K = 15


def _mock(builder, k=K):
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


def test_g1_ops_mock():
    rng = random.Random(3)
    b = CircuitBuilder(lookup_bits=13)
    fp = FpChip(b, RangeChip(b, 13), P)
    ecc = EccChip(fp, 4)
    g = H.bls_g1
    A = g.mul(g.gen, rng.randrange(1, 1 << 120))
    Bp = g.mul(g.gen, rng.randrange(1, 1 << 120))

    pa = ecc.load_point(A)
    pb = ecc.load_point(Bp)
    ecc.assert_on_curve(pa)
    ecc.assert_on_curve(pb)

    s = ecc.add_unequal(pa, pb)
    want = g.add(A, Bp)
    assert (fp.value_of(s.x) % P, fp.value_of(s.y) % P) == want

    d = ecc.double(pa)
    want_d = g.add(A, A)
    assert (fp.value_of(d.x) % P, fp.value_of(d.y) % P) == want_d

    m = ecc.scalar_mul_const(pa, 0b110101)
    want_m = g.mul(A, 0b110101)
    assert (fp.value_of(m.x) % P, fp.value_of(m.y) % P) == want_m

    # conditional aggregation: start + bit-selected adds
    ctx = b.main()
    bits_v = [1, 0, 1]
    pts = [g.mul(g.gen, rng.randrange(1, 1 << 120)) for _ in range(3)]
    bits = ctx.assign_many(bits_v)
    for x in bits:
        ctx.assert_bit(x)
    loaded = [ecc.load_point(p) for p in pts]
    agg = ecc.sum_with_selectors(loaded, bits, pa)
    want_agg = A
    for p, bit in zip(pts, bits_v):
        if bit:
            want_agg = g.add(want_agg, p)
    assert (fp.value_of(agg.x) % P, fp.value_of(agg.y) % P) == want_agg

    assert _mock(b).verify() == []


def test_g2_ops_mock():
    rng = random.Random(4)
    b = CircuitBuilder(lookup_bits=13)
    fp = FpChip(b, RangeChip(b, 13), P)
    f2 = Fp2Chip(fp)
    ecc = EccChip(f2, (4, 4))
    from spectre_tpu.fields.params import BLS12_381_G2_GEN
    g2 = H.bls_g2_host
    A = g2.mul(BLS12_381_G2_GEN, rng.randrange(1, 1 << 100))
    Bp = g2.mul(BLS12_381_G2_GEN, rng.randrange(1, 1 << 100))

    pa = ecc.load_point(A)
    pb = ecc.load_point(Bp)
    ecc.assert_on_curve(pa)

    s = ecc.add_unequal(pa, pb)
    want = g2.add(A, Bp)
    assert (f2.value_of(s.x), f2.value_of(s.y)) == want

    d = ecc.double(pa)
    want_d = g2.add(A, A)
    assert (f2.value_of(d.x), f2.value_of(d.y)) == want_d

    assert _mock(b).verify() == []


def test_g1_wrong_sum_fails():
    rng = random.Random(5)
    b = CircuitBuilder(lookup_bits=13)
    fp = FpChip(b, RangeChip(b, 13), P)
    ecc = EccChip(fp, 4)
    g = H.bls_g1
    A = g.mul(g.gen, 7)
    Bp = g.mul(g.gen, 11)
    pa = ecc.load_point(A)
    pb = ecc.load_point(Bp)
    s = ecc.add_unequal(pa, pb)
    # tamper the x3 low limb
    ctx = b.main()
    ctx.cells[s.x.limbs[0].idx] = (ctx.cells[s.x.limbs[0].idx] + 1) % (1 << 104)
    assert _mock(b).verify(raise_on_failure=False) != []
