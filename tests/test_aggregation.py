"""Aggregation stage: inner snark (Poseidon transcript) -> in-circuit
SHPLONK verification -> accumulator instances -> MockProver.

The reference's shape: gen_snark_shplonk on the app circuit, then
AggregationCircuit verifies it in-circuit and exposes the KZG accumulator
(aggregation_circuit.rs:77-124). Real-prove + EVM-verify of the
aggregation proof runs in the slow/scripted tier."""
import pytest

from spectre_tpu.fields.params import BN254_FR as FR
from spectre_tpu.fields import limb as L
from spectre_tpu.curves import host as H
from spectre_tpu.curves.pairing import bn254


def _inner_snark(k=5):
    from spectre_tpu.circuits.builder import CircuitBuilder
    from spectre_tpu.circuits.range_chip import RangeChip
    from spectre_tpu.plonk.keygen import keygen
    from spectre_tpu.plonk.prover import create_proof
    from spectre_tpu.poly import kzg

    b = CircuitBuilder()
    rc = RangeChip(b, 3)
    ctx = b.main()
    x = ctx.assign(5)
    y = ctx.assign(7)
    s = ctx.add(x, y)
    p = ctx.mul(s, s)
    rc.range_check(ctx, x, 3)
    b.expose_public(p)
    cs, fixed, advice, instances = b.compile(k)
    srs = kzg.test_srs(k)
    pk = keygen(cs, k, fixed, srs)
    proof = create_proof(pk, srs, advice, instances, seed=b"agg-inner",
                         transcript="poseidon")
    return pk, srs, proof, instances


@pytest.fixture(scope="module")
def inner():
    return _inner_snark()


def test_inner_poseidon_proof_verifies_native(inner):
    from spectre_tpu.plonk.verifier import verify_proof
    pk, srs, proof, instances = inner
    assert verify_proof(pk.vk, srs, proof, instances,
                        transcript="poseidon")


def test_native_accumulator_pairing_holds(inner):
    """The (lhs, rhs) accumulator satisfies the KZG pairing identity."""
    from spectre_tpu.plonk.verifier import build_claims, shplonk_accumulator
    pk, srs, proof, instances = inner
    t, claims = build_claims(pk.vk, proof, instances,
                             transcript="poseidon")
    lhs, rhs = shplonk_accumulator(t, claims)
    assert bn254().pairing_check([(lhs, srs.g2), (rhs, srs.s_g2)])


@pytest.fixture(scope="module")
def agg_built(inner):
    from spectre_tpu.circuits.aggregation import (
        build_aggregation, aggregation_instances, AggregationWitness)
    pk, srs, proof, instances = inner
    builder = build_aggregation(pk.vk,
                                AggregationWitness(proof.data, instances))
    want = aggregation_instances(pk.vk, proof.data, instances)
    return builder, want


@pytest.mark.slow
def test_aggregation_instances_match_native(agg_built):
    builder, want = agg_built
    assert builder.instances() == want


@pytest.mark.slow
def test_aggregation_accumulator_is_valid_pair(inner, agg_built):
    """Reconstruct the exposed accumulator and pairing-check it."""
    from spectre_tpu.plonk.verifier import accumulator_from_instances
    from spectre_tpu.circuits.aggregation import ACC_INDICES
    pk, srs, proof, instances = inner
    builder, want = agg_built
    lhs, rhs = accumulator_from_instances(want, ACC_INDICES)
    assert bn254().pairing_check([(lhs, srs.g2), (rhs, srs.s_g2)])


@pytest.mark.slow
def test_aggregation_circuit_mock_verifies(agg_built):
    from spectre_tpu.plonk.mock import MockProver
    builder, want = agg_built
    k = 17
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
    assert MockProver(cs, n, cols).verify() == []


def test_app_circuit_adapter(tmp_path):
    """AggregationCircuit AppCircuit adapter: dummy_input (gen_dummy_snark
    flow, cli.rs:164-183) -> build -> instance parity with the native
    accumulator mirror. Mock-level (real proves run on the TPU queue)."""
    from spectre_tpu.circuits.aggregation import (
        AggregationCircuit, AggregationInput, aggregation_instances)
    from spectre_tpu.poly import kzg
    from tests.test_app_lifecycle import ToyCircuit, K

    srs = kzg.test_srs(K)
    dummy = AggregationCircuit.dummy_input(ToyCircuit, None, K, srs)
    assert isinstance(dummy, AggregationInput)
    b = AggregationCircuit.build(dummy, None)
    want = aggregation_instances(dummy.vk_inner, dummy.proof,
                                 dummy.instances)
    assert b.instances() == want
