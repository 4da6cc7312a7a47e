"""In-circuit BLS signature verification (pairing product check).

Heavy (~9M cells): marked slow; run explicitly or via the full suite.
"""
import random

import pytest

from spectre_tpu.fields.params import BLS12_381_FQ as P, BLS12_381_G2_GEN
from spectre_tpu.fields import limb as L
from spectre_tpu.curves import host as H
from spectre_tpu.circuits.builder import CircuitBuilder
from spectre_tpu.circuits.range_chip import RangeChip
from spectre_tpu.circuits.bigint import FpChip
from spectre_tpu.circuits.fp2 import Fp2Chip
from spectre_tpu.circuits.ecc import EccChip
from spectre_tpu.circuits.pairing_gadget import PairingChip

K = 17


def _mock(builder, k=K):
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


@pytest.mark.slow
def test_bls_signature_gadget_mock():
    rng = random.Random(21)
    g1 = H.bls_g1
    g2 = H.bls_g2_host
    sk = rng.randrange(1, 1 << 200)
    pk = g1.mul(g1.gen, sk)
    # message point: any G2 point (use a scalar mult of the G2 generator;
    # hash-to-curve is exercised separately)
    hmsg = g2.mul(BLS12_381_G2_GEN, rng.randrange(1, 1 << 100))
    sig = g2.mul(hmsg, sk)

    # host sanity: e(pk, H) == e(G, sig)
    from spectre_tpu.curves.pairing import bls12_381
    eng = bls12_381()
    assert eng.pairing_check([(pk, hmsg), (g1.neg(g1.gen), sig)])

    b = CircuitBuilder(lookup_bits=13)
    fp = FpChip(b, RangeChip(b, 13), P)
    f2 = Fp2Chip(fp)
    ecc1 = EccChip(fp, 4)
    ecc2 = EccChip(f2, (4, 4))
    chip = PairingChip(fp)

    apk = ecc1.load_point(pk)
    ah = ecc2.load_point(hmsg)
    asig = ecc2.load_point(sig)
    ecc1.assert_on_curve(apk)
    ecc2.assert_on_curve(ah)
    ecc2.assert_on_curve(asig)
    chip.assert_valid_signature(ecc1, ecc2, apk, ah, asig)

    print("cells:", len(b.main().cells))
    assert _mock(b).verify() == []
