"""Circuit-builder DSL -> compile -> MockProver + real prove/verify."""
import pytest

from spectre_tpu.fields.params import BN254_FR as FR
from spectre_tpu.circuits import CircuitBuilder, RangeChip
from spectre_tpu.plonk.mock import MockProver
from spectre_tpu.plonk.keygen import keygen
from spectre_tpu.plonk.prover import create_proof
from spectre_tpu.plonk.verifier import verify_proof
from spectre_tpu.poly import kzg as _kzg
from spectre_tpu.fields import limb as L


def _mock_check(cs, k, fixed_evals, advice_evals, instances):
    spec = L.fr_spec
    n = 1 << k
    cols = []
    fi = ai = ii = 0
    inst_cols = [list(v) + [0] * (n - len(v)) for v in instances]
    for col in cs.columns:
        if col.kind == "fixed":
            cols.append(spec.encode_batch(fixed_evals[fi]))
            fi += 1
        elif col.kind == "advice":
            cols.append(spec.encode_batch(advice_evals[ai]))
            ai += 1
        else:
            cols.append(spec.encode_batch(inst_cols[ii]))
            ii += 1
    return MockProver(cs, n, cols)


def test_gate_ops_values():
    b = CircuitBuilder()
    ctx = b.main()
    x = ctx.assign(7)
    y = ctx.assign(5)
    assert ctx.add(x, y).value == 12
    assert ctx.sub(x, y).value == 2
    assert ctx.mul(x, y).value == 35
    assert ctx.mul_add(x, y, ctx.load_constant(1)).value == 36
    assert ctx.select(x, y, ctx.load_constant(1)).value == 7
    assert ctx.select(x, y, ctx.load_constant(0)).value == 5
    assert ctx.is_zero(ctx.load_zero()).value == 1
    assert ctx.is_zero(x).value == 0
    assert ctx.bits_to_num(ctx.assign_many([1, 0, 1])).value == 5
    bits = ctx.num_to_bits(ctx.assign(11), 4)
    assert [v.value for v in bits] == [1, 1, 0, 1]


@pytest.mark.heavy
def test_builder_mock_and_prove():
    b = CircuitBuilder()
    ctx = b.main()
    x = ctx.assign(3)
    y = ctx.assign(4)
    z = ctx.mul_add(x, x, ctx.mul(y, y))  # x^2 + y^2
    b.expose_public(z)
    k = 7
    cs, fixed, advice, instances = b.compile(k)
    assert instances == [[25]]
    assert _mock_check(cs, k, fixed, advice, instances).verify() == []

    srs = _kzg.test_srs(k)
    pk = keygen(cs, k, fixed, srs)
    proof = create_proof(pk, srs, advice, instances)
    assert verify_proof(pk.vk, srs, proof, instances)
    assert not verify_proof(pk.vk, srs, proof, [[26]])


def test_range_chip_mock():
    b = CircuitBuilder()
    chip = RangeChip(b, 4)
    ctx = b.main()
    a = ctx.assign(1000)          # < 2^10
    chip.range_check(ctx, a, 10)
    c = ctx.assign(3)
    d = ctx.assign(9)
    chip.check_less_than(ctx, c, d, 4)
    lt = chip.is_less_than(ctx, c, d, 4)
    assert lt.value == 1
    ge = chip.is_less_than(ctx, d, c, 4)
    assert ge.value == 0
    k = 8
    cs, fixed, advice, instances = b.compile(k)
    assert _mock_check(cs, k, fixed, advice, instances).verify() == []


def test_range_chip_catches_overflow():
    b = CircuitBuilder()
    chip = RangeChip(b, 4)
    ctx = b.main()
    a = ctx.assign(1 << 11)      # NOT < 2^10
    chip.range_check(ctx, a, 10)
    k = 7
    cs, fixed, advice, instances = b.compile(k)
    fails = _mock_check(cs, k, fixed, advice, instances).verify(
        raise_on_failure=False)
    assert fails


def test_range_chip_prove_verify():
    b = CircuitBuilder()
    chip = RangeChip(b, 4)
    ctx = b.main()
    a = ctx.assign(777)
    chip.range_check(ctx, a, 10)
    b.expose_public(a)
    k = 7
    cs, fixed, advice, instances = b.compile(k)
    srs = _kzg.test_srs(k)
    pk = keygen(cs, k, fixed, srs)
    proof = create_proof(pk, srs, advice, instances)
    assert verify_proof(pk.vk, srs, proof, instances)
