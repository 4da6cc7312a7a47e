"""Limb-tensor field arithmetic vs the python-int oracle."""
import numpy as np
import pytest

from spectre_tpu.fields import limb
from spectre_tpu.fields.host import inv_mod

SPECS = [limb.fr_spec, limb.fq_spec, limb.bls_fq_spec, limb.bls_fr_spec]
OPS = {s.name: limb.make_ops(s) for s in SPECS}


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_roundtrip(spec, rng):
    for _ in range(10):
        x = rng.randrange(spec.p)
        assert spec.decode(spec.encode(x)) == x


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_mul_batch(spec, rng):
    ops = OPS[spec.name]
    n = 64
    xs = [rng.randrange(spec.p) for _ in range(n)]
    ys = [rng.randrange(spec.p) for _ in range(n)]
    a = spec.encode_batch(xs)
    b = spec.encode_batch(ys)
    c = np.asarray(ops.mont_mul(a, b))
    got = spec.decode_batch(c)
    want = [x * y % spec.p for x, y in zip(xs, ys)]
    assert got == want


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec, rng):
    ops = OPS[spec.name]
    xs = [rng.randrange(spec.p) for _ in range(32)]
    ys = [rng.randrange(spec.p) for _ in range(32)]
    a, b = spec.encode_batch(xs), spec.encode_batch(ys)
    s = np.asarray(ops.add(a, b))
    assert spec.decode_batch(s) == [(x + y) % spec.p for x, y in zip(xs, ys)]
    d = np.asarray(ops.sub(a, b))
    assert spec.decode_batch(d) == [(x - y) % spec.p for x, y in zip(xs, ys)]
    m = np.asarray(ops.neg(a))
    assert spec.decode_batch(m) == [(-x) % spec.p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_lazy_amplitude_chain(spec, rng):
    """Long add chains with late canonicalization stay exact."""
    ops = OPS[spec.name]
    xs = [rng.randrange(spec.p) for _ in range(16)]
    a = spec.encode_batch(xs)
    acc = a
    want = list(xs)
    # amplitude grows to ~64p: still far below B^n/p headroom
    for _ in range(6):
        acc = ops.add(acc, acc)
        want = [2 * w for w in want]
    c = np.asarray(ops.canon(acc, amplitude=128))
    assert spec.decode_batch(c) == [w % spec.p for w in want]
    # multiply high-amplitude values: REDC must stay exact
    m = np.asarray(ops.mont_mul(acc, acc))
    assert spec.decode_batch(m) == [w * w % spec.p for w in want]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_canon_and_from_mont(spec, rng):
    ops = OPS[spec.name]
    xs = [0, 1, spec.p - 1] + [rng.randrange(spec.p) for _ in range(5)]
    a = spec.encode_batch(xs)
    c = np.asarray(ops.canon(a, 2))
    assert spec.decode_batch(c) == xs
    plain = np.asarray(ops.from_mont(a))
    got = [limb.limbs_to_int(v, spec.limb_bits) for v in plain]
    assert got == xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_eq_is_zero(spec, rng):
    ops = OPS[spec.name]
    x = rng.randrange(1, spec.p)
    a = spec.encode_batch([x, 0, x])
    b = spec.encode_batch([x, 0, (x + 1) % spec.p])
    assert np.asarray(ops.eq(a, b)).tolist() == [True, True, False]
    assert np.asarray(ops.is_zero(a)).tolist() == [False, True, False]


def test_fold_reduces_amplitude(rng):
    spec = limb.fr_spec
    ops = OPS[spec.name]
    x = rng.randrange(spec.p)
    a = spec.encode_batch([x])
    for _ in range(5):
        a = ops.add(a, a)
        x = 2 * x
    f = np.asarray(ops.fold(a))
    # still correct mod p
    assert spec.decode(f[0]) == x % spec.p
    # amplitude back under 2p: canon at amplitude 2 must already be exact
    assert spec.decode(np.asarray(ops.canon(f, 2))[0]) == x % spec.p
