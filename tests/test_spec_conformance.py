"""Consensus-spec conformance harness — lightclient-circuits/tests/step.rs
analog. No network access, so fixtures come from
generate_spec_test_fixture (the unit_test_gen.rs role) in the exact
pyspec directory layout; the loader path is identical to what real
consensus-spec-tests files would take.

Asserts: snappy+SSZ round-trip, witness conversion, off-circuit instance
computation, the BLS aggregate signature actually verifying, merkle
pre-checks, and the step.rs:113-116 CROSS-CIRCUIT check — the step
witness's poseidon instance equals the committee-update witness's."""
import pytest

from spectre_tpu.specs import MINIMAL
from spectre_tpu.test_utils import (
    generate_spec_test_fixture, get_initial_sync_committee_poseidon,
    read_test_files_and_gen_witness, valid_updates_from_test_path,
    validators_root_from_test_path)
from spectre_tpu.witness.step import sync_step_instances
from spectre_tpu.witness.rotation import committee_update_instances


# scenario sweep — the step.rs rstest #[files] analog: the reference
# parameterizes over dozens of pyspec cases; with no network access the
# cases are generated (unit_test_gen.rs role) across the participation /
# key-material space the pyspec suite varies
N = MINIMAL.sync_committee_size
SCENARIOS = {
    "full": dict(seed=b"spectre-tpu-spec-test", participation=None),
    "supermajority": dict(seed=b"case-supermajority",
                          participation=[i % 3 != 2 for i in range(N)]),
    "two_thirds_exact": dict(
        seed=b"case-two-thirds",
        participation=[i < (2 * N + 2) // 3 for i in range(N)]),
    "single_absent": dict(seed=b"case-one-out",
                          participation=[i != 7 for i in range(N)]),
    "alt_keys": dict(seed=b"case-alt-keys-xyz", participation=None),
}


@pytest.fixture(scope="module", params=sorted(SCENARIOS))
def fixture_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp("pyspec") / request.param
    return generate_spec_test_fixture(str(d), MINIMAL,
                                      **SCENARIOS[request.param])


def test_snappy_roundtrip():
    from spectre_tpu.snappy_codec import (compress_block, compress_frame,
                                          decompress_block,
                                          decompress_frame)
    for payload in (b"", b"a", b"hello world " * 400,
                    bytes(range(256)) * 77):
        assert decompress_block(compress_block(payload)) == payload
        assert decompress_frame(compress_frame(payload)) == payload


def test_fixture_loads_and_parses(fixture_dir):
    gvr = validators_root_from_test_path(fixture_dir)
    assert len(gvr) == 32
    updates = valid_updates_from_test_path(fixture_dir)
    assert len(updates) == 1
    upd = updates[0]
    assert len(upd.next_sync_committee.pubkeys) == 32
    assert upd.signature_slot == int(upd.attested_header.beacon.slot) + 1


def test_witness_conversion_and_merkle_checks(fixture_dir):
    from spectre_tpu import ssz
    step_wit, rot_wit = read_test_files_and_gen_witness(
        fixture_dir, MINIMAL)
    # finality proof against attested state root
    assert ssz.verify_merkle_branch(
        step_wit.finalized_header.hash_tree_root(),
        step_wit.finality_branch,
        MINIMAL.finalized_header_index,
        step_wit.attested_header.state_root)
    # execution payload proof against finalized body root
    assert ssz.verify_merkle_branch(
        bytes(step_wit.execution_payload_root),
        step_wit.execution_payload_branch,
        MINIMAL.execution_state_root_index,
        step_wit.finalized_header.body_root)
    # rotation: pubkeys root proof against (step-attested) state root
    assert ssz.verify_merkle_branch(
        ssz.sync_committee_pubkeys_root(rot_wit.pubkeys_compressed),
        rot_wit.sync_committee_branch,
        MINIMAL.sync_committee_pubkeys_root_index,
        rot_wit.finalized_header.state_root)


def test_aggregate_signature_verifies(fixture_dir):
    """The generated fixture's BLS aggregate signature is REAL: it
    verifies through the from-scratch pairing stack."""
    from spectre_tpu.curves.host import g1_from_uncompressed, g2_decompress
    from spectre_tpu.curves.pairing import bls_verify_aggregate
    from spectre_tpu.ssz import compute_signing_root
    step_wit, _ = read_test_files_and_gen_witness(fixture_dir, MINIMAL)
    signing_root = compute_signing_root(
        step_wit.attested_header.hash_tree_root(), step_wit.domain)
    pubkeys = [g1_from_uncompressed(pk) for pk, bit
               in zip(step_wit.pubkeys_uncompressed,
                      step_wit.pariticipation_bits) if bit]
    sig = g2_decompress(step_wit.signature_compressed)
    assert bls_verify_aggregate(pubkeys, sig, signing_root,
                                MINIMAL.dst)


def test_cross_circuit_poseidon_equality(fixture_dir):
    """step.rs:113-116: step's poseidon instance == committee-update's
    poseidon instance for the same committee."""
    step_wit, rot_wit = read_test_files_and_gen_witness(
        fixture_dir, MINIMAL)
    step_inst = sync_step_instances(step_wit)
    rot_inst = committee_update_instances(rot_wit)
    assert step_inst[0][1] == rot_inst[0][0]


def test_initial_committee_poseidon(fixture_dir):
    period, poseidon = get_initial_sync_committee_poseidon(
        fixture_dir, MINIMAL.slots_per_period)
    step_wit, _ = read_test_files_and_gen_witness(fixture_dir, MINIMAL)
    assert period == int(
        step_wit.attested_header.slot) // MINIMAL.slots_per_period
    assert poseidon == sync_step_instances(step_wit)[0][1]


def test_committed_fixture_loads():
    """The repo-committed fixture (tests/fixtures/) loads byte-stable —
    the test_data-in-git role of the reference's golden files."""
    import os
    d = os.path.join(os.path.dirname(__file__),
                     "fixtures", "light_client_sync")
    step_wit, rot_wit = read_test_files_and_gen_witness(d, MINIMAL)
    assert sync_step_instances(step_wit)[0][1] == \
        committee_update_instances(rot_wit)[0][0]
