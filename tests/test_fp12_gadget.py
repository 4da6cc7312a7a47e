import pytest
"""Fp12 chip vs the host Tower oracle (curves/pairing.py)."""
import random

from spectre_tpu.fields.params import BLS12_381_FQ as P
from spectre_tpu.fields import limb as L
from spectre_tpu.circuits.builder import CircuitBuilder
from spectre_tpu.circuits.range_chip import RangeChip
from spectre_tpu.circuits.bigint import FpChip
from spectre_tpu.circuits.fp2 import Fp2Chip
from spectre_tpu.circuits.fp12 import Fp12Chip
from spectre_tpu.curves.pairing import bls12_381
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


def _rand_tower(T, rng):
    return (tuple((rng.randrange(P), rng.randrange(P)) for _ in range(3)),
            tuple((rng.randrange(P), rng.randrange(P)) for _ in range(3)))


def test_fp12_mul_inv_frobenius_mock():
    rng = random.Random(11)
    T = bls12_381().T
    b = CircuitBuilder(lookup_bits=13)
    fp = FpChip(b, RangeChip(b, 13), P)
    chip = Fp12Chip(Fp2Chip(fp))

    ta = _rand_tower(T, rng)
    tb = _rand_tower(T, rng)
    a = chip.load(chip.tower_to_c6(ta))
    bb = chip.load(chip.tower_to_c6(tb))

    # mul
    m = chip.mul(a, bb)
    want = chip.tower_to_c6(T.m12(ta, tb))
    assert chip.value_of(m) == want

    # square
    s = chip.square(a)
    assert chip.value_of(s) == chip.tower_to_c6(T.sq12(ta))

    # inverse (mul check inside)
    iv = chip.inv(a)
    assert chip.value_of(iv) == chip.tower_to_c6(T.i12(ta))

    # conjugate == p^6 frobenius
    cj = chip.conjugate(a)
    want_cj = chip.tower_to_c6((ta[0],
                                tuple(T.s2(T.e2(), x) for x in ta[1])))
    assert chip.value_of(cj) == want_cj

    # frobenius p^1 and p^2 against host pow
    for k in (1, 2):
        fr = chip.frobenius(a, k)
        got = fr
        # host: map through integer exponentiation
        want_t = T.pow12(ta, P ** k)
        assert chip.value_of(got) == chip.tower_to_c6(want_t)

    assert _mock(b).verify() == []


@pytest.mark.heavy
def test_fp12_exp_by_neg_x():
    """Unitary element: exp_by_neg_x matches host pow by -x (mod inverse)."""
    rng = random.Random(12)
    T = bls12_381().T
    from spectre_tpu.circuits.fp12 import BLS_X
    # build a unitary (cyclotomic) element: g = h^(p^6-1)
    h = _rand_tower(T, rng)
    hi = T.i12(h)
    hconj = (h[0], tuple(T.s2(T.e2(), x) for x in h[1]))
    g = T.m12(hconj, hi)  # g^(p^6+1)... g is unitary: conj(g) = g^{-1}

    b = CircuitBuilder(lookup_bits=13)
    fp = FpChip(b, RangeChip(b, 13), P)
    chip = Fp12Chip(Fp2Chip(fp))
    a = chip.load(chip.tower_to_c6(g))
    e = chip.exp_by_neg_x(a)
    want = T.i12(T.pow12(g, BLS_X))
    assert chip.value_of(e) == chip.tower_to_c6(want)
    assert _mock(b).verify() == []
