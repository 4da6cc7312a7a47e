"""StepCircuit end-to-end at a tiny spec: witness -> circuit -> instance
parity with the native oracle (sync_step_circuit.rs:228-276 analog), plus a
slow full MockProver pass."""
import pytest

from spectre_tpu.specs import Spec
from spectre_tpu.fields import limb as L
from spectre_tpu.witness.step import default_sync_step_args, sync_step_instances
from spectre_tpu.circuits.sync_step import StepCircuit

NANO = Spec(name="nano", sync_committee_size=4)


@pytest.fixture(scope="module")
def built():
    args = default_sync_step_args(NANO)
    builder = StepCircuit.build(args, NANO)
    return args, builder


def test_instances_match_native(built):
    args, builder = built
    want = sync_step_instances(args)
    got = builder.instances()
    assert got == want


def test_tampered_participation_changes_commitment():
    args = default_sync_step_args(NANO)
    base = sync_step_instances(args)
    args.pariticipation_bits = [True, True, True, False]
    # re-sign not needed: the commitment only hashes the count
    changed = sync_step_instances(args)
    assert base[0][0] != changed[0][0]


@pytest.mark.slow
def test_step_circuit_mock_verifies(built):
    from spectre_tpu.plonk.mock import MockProver
    args, builder = built
    k = 19
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
