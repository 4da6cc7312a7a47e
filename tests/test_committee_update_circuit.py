"""CommitteeUpdateCircuit end-to-end at a tiny test spec: witness ->
circuit -> MockProver, with instance parity against the native
get_instances implementation (the reference's core oracle,
committee_update_circuit.rs:313-333 analog)."""
import pytest

from spectre_tpu.specs import Spec
from spectre_tpu import ssz
from spectre_tpu.curves import host as H
from spectre_tpu.witness.rotation import CommitteeUpdateArgs, committee_update_instances
from spectre_tpu.circuits.committee_update import CommitteeUpdateCircuit
from spectre_tpu.fields import limb as L
from spectre_tpu.plonk.mock import MockProver

# Test-only spec: 4 validators (committee size must be a power of two);
# merkle geometry matches Minimal otherwise.
NANO = Spec(name="nano", sync_committee_size=4)


def _synthetic_args(rng, spec=NANO) -> CommitteeUpdateArgs:
    pts = [H.bls_g1.mul(H.bls_g1.gen, rng.randrange(1, 1 << 64))
           for _ in range(spec.sync_committee_size)]
    pubkeys = [H.g1_compress(p) for p in pts]
    pk_root = ssz.sync_committee_pubkeys_root(pubkeys)
    branch = [bytes([rng.randrange(256) for _ in range(32)])
              for _ in range(spec.sync_committee_pubkeys_depth)]
    state_root = ssz.mock_root(pk_root, branch,
                               spec.sync_committee_pubkeys_root_index)
    header = ssz.BeaconBlockHeader(slot=1234, state_root=state_root)
    return CommitteeUpdateArgs(
        pubkeys_compressed=pubkeys,
        finalized_header=header,
        sync_committee_branch=branch,
        spec=spec,
    )


@pytest.fixture(scope="module")
def built(rng=None):
    import random
    rng = random.Random(42)
    args = _synthetic_args(rng)
    builder = CommitteeUpdateCircuit.build(args, NANO)
    return args, builder


def test_instances_match_native(built):
    args, builder = built
    want = committee_update_instances(args)
    got = builder.instances()
    assert got == want


def test_circuit_mock_verifies(built):
    args, builder = built
    # the wide SHA-256 region collapses the hash cost (72 rows/block):
    # NANO fits at k=13 vs k=17 on the spread chip
    k = 13
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


def test_tampered_pubkey_changes_instances(built):
    """Flipping a pubkey's sign bit must change the poseidon commitment."""
    import random
    rng = random.Random(42)
    args = _synthetic_args(rng)
    bad = bytearray(args.pubkeys_compressed[0])
    bad[0] ^= 0x20
    args2 = CommitteeUpdateArgs(
        pubkeys_compressed=[bytes(bad)] + args.pubkeys_compressed[1:],
        finalized_header=args.finalized_header,
        sync_committee_branch=args.sync_committee_branch,
        spec=args.spec,
    )
    assert (committee_update_instances(args2)[0][0]
            != committee_update_instances(args)[0][0])


def test_thin_wide_instance_parity_and_mock(built):
    """The thin circuit (the production aggregation inner since r4) must
    produce IDENTICAL instances to the wide one from the same witness,
    and be constraint-clean (VERDICT r4 next #9)."""
    from spectre_tpu.circuits.committee_update import (
        CommitteeUpdateCircuitThin)
    args, wide_builder = built
    thin_builder = CommitteeUpdateCircuitThin.build(args, NANO)
    assert thin_builder.instances() == wide_builder.instances()
    assert thin_builder.instances() == committee_update_instances(args)
    cs, fixed, advice, instances = thin_builder.compile(15)
    n = 1 << 15
    inst_cols = [list(v) + [0] * (n - len(v)) for v in instances]
    cols, fi, ai, ii = [], 0, 0, 0
    for col in cs.columns:
        if col.kind == "fixed":
            cols.append(L.fr_spec.encode_batch(fixed[fi])); fi += 1
        elif col.kind == "advice":
            cols.append(L.fr_spec.encode_batch(advice[ai])); ai += 1
        else:
            cols.append(L.fr_spec.encode_batch(inst_cols[ii])); ii += 1
    assert MockProver(cs, n, cols).verify() == []
