"""FpChip (in-circuit BLS12-381 Fq CRT arithmetic) against host oracles.

The halo2-ecc ProperCrtUint/FpChip analog (ref sync_step_circuit.rs:33-41
dependency stack). Mock-verified at k=14 with a 13-bit range table."""
import random

import pytest

from spectre_tpu.fields.params import BLS12_381_FQ as P
from spectre_tpu.fields import limb as L
from spectre_tpu.fields.host import inv_mod
from spectre_tpu.circuits.builder import CircuitBuilder
from spectre_tpu.circuits.range_chip import RangeChip
from spectre_tpu.circuits.bigint import FpChip
from spectre_tpu.plonk.mock import MockProver

K = 14


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
    return MockProver(cs, n, cols), cs


def test_fp_ops_mock():
    rng = random.Random(9)
    b = CircuitBuilder(lookup_bits=13)
    rc = RangeChip(b, 13)
    fp = FpChip(b, rc, P)

    x = rng.randrange(P)
    y = rng.randrange(P)
    ax = fp.load(x)
    ay = fp.load(y)

    m = fp.mul(ax, ay)
    assert fp.value_of(m) == x * y % P
    s = fp.add(ax, ay)
    assert fp.value_of(s) == (x + y) % P
    d = fp.sub(ax, ay)
    assert fp.value_of(d) == (x - y) % P
    iv = fp.inv(ax)
    assert fp.value_of(iv) == inv_mod(x, P)
    q = fp.div(ax, ay)
    assert fp.value_of(q) == x * inv_mod(y, P) % P
    fp.assert_eq(fp.mul(q, ay), ax.__class__(
        ax.limbs, ax.limb_vals, ax.native, ax.max_limb))
    fp.enforce_canonical(ax)

    # flattened quadratic form: x*y - y*x + x == x (mod p)
    r = fp.quad_mod_p(pos=[(ax, ay)], neg=[(ay, ax)], lin=[ax])
    assert fp.value_of(r) == x % P

    # expected-constant form: x * x^{-1} == 1 handled inside inv above;
    # also pin a curve-style equation y^2 - x^3 = c
    c = (y * y - x * x * x) % P
    x2 = fp.mul(ax, ax)
    fp.quad_mod_p(pos=[(ay, ay)], neg=[(x2, ax)], expect=c)

    # deep chain: repeated mul matches host pow
    acc = ax
    want = x
    for _ in range(5):
        acc = fp.mul(acc, acc)
        want = want * want % P
    assert fp.value_of(acc) == want

    # no-reduce combinations feeding a single reduce
    t = fp.sub_no_red(fp.add_no_red(ax, ay), fp.scale_no_red(ax, 3))
    red = fp.reduce(t)
    assert fp.value_of(red) == (x + y - 3 * x) % P

    mp, cs = _mock(b)
    assert mp.verify() == []


def test_fp_tampered_mul_fails():
    rng = random.Random(10)
    b = CircuitBuilder(lookup_bits=13)
    rc = RangeChip(b, 13)
    fp = FpChip(b, rc, P)
    ax = fp.load(rng.randrange(P))
    ay = fp.load(rng.randrange(P))
    m = fp.mul(ax, ay)
    # tamper: bump the low result limb cell after the fact
    ctx = b.main()
    ctx.cells[m.limbs[0].idx] = (ctx.cells[m.limbs[0].idx] + 1) % (1 << 104)
    mp, cs = _mock(b)
    assert mp.verify(raise_on_failure=False) != []
