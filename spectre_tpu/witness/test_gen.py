"""Synthetic fixture generator — the unit_test_gen analog
(preprocessor/src/unit_test_gen.rs): builds a committee from deterministic
private keys, signs the attested header with host BLS, and emits
sync_step / rotation witness JSONs plus the private keys and compressed
committee file (test_data format parity)."""
from __future__ import annotations

import hashlib
import json
import os

from ..specs import Spec, TESTNET
from .. import ssz
from ..curves import host as CH
from ..curves.hash_to_curve import hash_to_g2
from ..curves.host import (bls_g1, bls_g2_host, g1_compress,
                           g1_to_uncompressed, g2_compress)
from ..fields.params import BLS12_381_FR
from .step import SyncStepArgs
from .rotation import CommitteeUpdateArgs


def deterministic_keys(n: int, seed: bytes = b"spectre-tpu-fixture"):
    return [int.from_bytes(hashlib.sha256(seed + b"-%d" % i).digest(),
                           "little") % BLS12_381_FR for i in range(n)]


def generate_fixtures(out_dir: str, spec: Spec = TESTNET,
                      seed: bytes = b"spectre-tpu-fixture"):
    n = spec.sync_committee_size
    sks = deterministic_keys(n, seed)
    pts = [bls_g1.mul(bls_g1.gen, sk) for sk in sks]
    pubkeys_compressed = [g1_compress(p) for p in pts]
    pubkeys_uncompressed = [g1_to_uncompressed(p) for p in pts]

    # ---- rotation witness: committee proven into a forged state root ----
    pk_root = ssz.sync_committee_pubkeys_root(pubkeys_compressed)
    branch = [hashlib.sha256(seed + b"-branch-%d" % i).digest()
              for i in range(spec.sync_committee_pubkeys_depth)]
    state_root = ssz.mock_root(pk_root, branch,
                               spec.sync_committee_pubkeys_root_index)
    finalized_rot = ssz.BeaconBlockHeader(slot=32, state_root=state_root)
    rotation = CommitteeUpdateArgs(
        pubkeys_compressed=pubkeys_compressed,
        finalized_header=finalized_rot,
        sync_committee_branch=branch,
        spec=spec,
    )

    # ---- step witness: signed attested header over mock branches ----
    domain = bytes([7, 0, 0, 0]) + hashlib.sha256(seed + b"-domain").digest()[:28]
    execution_root = hashlib.sha256(seed + b"-exec").digest()
    execution_branch = [hashlib.sha256(seed + b"-eb-%d" % i).digest()
                        for i in range(spec.execution_state_root_depth)]
    body_root = ssz.mock_root(execution_root, execution_branch,
                              spec.execution_state_root_index)
    finalized = ssz.BeaconBlockHeader(slot=32, body_root=body_root)
    finality_branch = [hashlib.sha256(seed + b"-fb-%d" % i).digest()
                       for i in range(spec.finalized_header_depth)]
    attested_state = ssz.mock_root(finalized.hash_tree_root(),
                                   finality_branch,
                                   spec.finalized_header_index)
    attested = ssz.BeaconBlockHeader(slot=64, state_root=attested_state)
    signing_root = ssz.compute_signing_root(attested.hash_tree_root(), domain)
    msg = hash_to_g2(signing_root, spec.dst)
    agg = None
    for sk in sks:
        agg = bls_g2_host.add(agg, bls_g2_host.mul(msg, sk))
    step = SyncStepArgs(
        signature_compressed=g2_compress(agg),
        pubkeys_uncompressed=pubkeys_uncompressed,
        pariticipation_bits=[True] * n,
        attested_header=attested,
        finalized_header=finalized,
        finality_branch=finality_branch,
        execution_payload_root=execution_root,
        execution_payload_branch=execution_branch,
        domain=domain,
        spec=spec,
    )

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"sync_step_{n}.json"), "w") as f:
        json.dump(step.to_json(), f)
    with open(os.path.join(out_dir, f"rotation_{n}.json"), "w") as f:
        json.dump(rotation.to_json(), f)
    with open(os.path.join(out_dir, f"committee_pubkeys_{n}.json"), "w") as f:
        json.dump([list(pk) for pk in pubkeys_compressed], f)
    with open(os.path.join(out_dir, "private_keys.json"), "w") as f:
        json.dump([hex(sk) for sk in sks], f)
    return step, rotation


def regen_goldens_from_snapshot(test_data_dir: str):
    """Rebuild the 512-validator golden witnesses from the committed
    beacon-state snapshot + private keys — the reference's unit_test_gen
    binary, step for step (preprocessor/src/unit_test_gen.rs:21-210):

      * replace the snapshot state's validators / sync-committee pubkeys
        with keys derived from test_data/private_keys.json;
      * default Capella block body (eth1_data from the state) -> execution
        payload proof; finalized header over its root; attested header over
        the mutated state root;
      * sign the attested header with every key (SyncCommittee domain over
        the genesis fork) and aggregate;
      * state-leaf multiproofs for the finality and committee branches
        (multiproof.rs analog: helper indices of parent(gindex), with the
        sibling epoch / aggregate-pubkey root inserted at position 0).

    Returns (SyncStepArgs, CommitteeUpdateArgs) for parity-checking against
    the committed test_data/sync_step_512.json / rotation_512.json.
    """
    import copy

    from .. import capella as C
    from ..specs import MAINNET
    from ..preprocessor.domain import DOMAIN_SYNC_COMMITTEE, compute_domain
    from .multiproof import get_helper_indices, merkle_tree

    def parent(i: int) -> int:
        return i // 2

    def padded_tree(leaves):
        # merkle_tree over the zero-padded power-of-two bottom layer
        # (multiproof.rs:166-179 pads with default nodes)
        n = 1
        while n < len(leaves):
            n *= 2
        return merkle_tree(list(leaves) + [bytes(32)] * (n - len(leaves)))

    spec = MAINNET
    with open(os.path.join(test_data_dir, "private_keys.json")) as f:
        sks = [int(h.replace("0x", ""), 16) for h in json.load(f)]
    assert len(sks) >= spec.sync_committee_size
    sks = sks[:spec.sync_committee_size]
    pts = [bls_g1.mul(bls_g1.gen, sk) for sk in sks]
    pubkeys_compressed = [g1_compress(p) for p in pts]
    pubkeys_uncompressed = [g1_to_uncompressed(p) for p in pts]

    with open(os.path.join(test_data_dir, "beacon_state_2915750"), "rb") as f:
        state = C.BeaconState.deserialize(f.read())

    # validators / committees (unit_test_gen.rs:51-81)
    validators = []
    for i, pk in enumerate(pubkeys_compressed):
        v = C.Validator.default()
        v.public_key = bytes(pk)
        v.effective_balance = 32_000_000
        v.activation_eligibility_epoch = i
        v.activation_epoch = i + 1
        v.exit_epoch = 100
        validators.append(v)
    state.validators = validators
    state.current_sync_committee.public_keys = [bytes(pk) for pk in
                                                pubkeys_compressed]
    state.next_sync_committee.public_keys = [bytes(pk) for pk in
                                             pubkeys_compressed]
    agg_pk = None
    for p in pts:
        agg_pk = bls_g1.add(agg_pk, p)
    state.current_sync_committee.aggregate_public_key = bytes(
        g1_compress(agg_pk))

    # default body with the state's eth1_data (unit_test_gen.rs:83-100)
    body = C.BeaconBlockBody.default()
    body.eth1_data = state.eth1_data
    body_leaves = C.BeaconBlockBody.field_roots(body)
    body_tree = padded_tree(body_leaves)
    helper = get_helper_indices([spec.execution_state_root_index])
    execution_branch = [body_tree[i] for i in helper]
    execution_root = C.ExecutionPayload.hash_tree_root(
        body.execution_payload)

    finalized_block = C.BeaconBlockHeader.default()
    finalized_block.body_root = C.BeaconBlockBody.hash_tree_root(body)
    state.finalized_checkpoint.root = C.BeaconBlockHeader.hash_tree_root(
        finalized_block)

    state_root = C.BeaconState.hash_tree_root(state)
    attested_block = ssz.BeaconBlockHeader(
        slot=32, proposer_index=0, parent_root=bytes(32),
        state_root=state_root, body_root=state.finalized_checkpoint.root)

    domain = compute_domain(DOMAIN_SYNC_COMMITTEE, C.GENESIS_FORK_VERSION,
                            bytes(state.genesis_validators_root))
    data_root = ssz.compute_signing_root(
        attested_block.hash_tree_root(), domain)
    msg = hash_to_g2(data_root, spec.dst)
    agg_sig = None
    for sk in sks:
        agg_sig = bls_g2_host.add(agg_sig, bls_g2_host.mul(msg, sk))

    # state-leaf multiproofs (unit_test_gen.rs:212-265)
    state_leaves = C.BeaconState.field_roots(state)
    state_tree = padded_tree(state_leaves)
    fin_helper = get_helper_indices([parent(spec.finalized_header_index)])
    finality_branch = [state_tree[i] for i in fin_helper]
    finality_branch.insert(
        0, C.uint64.hash_tree_root(state.finalized_checkpoint.epoch))
    assert len(finality_branch) == spec.finalized_header_depth

    com_helper = get_helper_indices(
        [parent(spec.sync_committee_pubkeys_root_index)])
    committee_branch = [state_tree[i] for i in com_helper]
    committee_branch.insert(0, C.Bytes48.hash_tree_root(
        state.next_sync_committee.aggregate_public_key))
    assert len(committee_branch) == spec.sync_committee_pubkeys_depth

    finalized_header = ssz.BeaconBlockHeader(
        slot=finalized_block.slot,
        proposer_index=finalized_block.proposer_index,
        parent_root=bytes(finalized_block.parent_root),
        state_root=bytes(finalized_block.state_root),
        body_root=bytes(finalized_block.body_root))

    step = SyncStepArgs(
        signature_compressed=g2_compress(agg_sig),
        pubkeys_uncompressed=pubkeys_uncompressed,
        pariticipation_bits=[True] * spec.sync_committee_size,
        attested_header=attested_block,
        finalized_header=finalized_header,
        finality_branch=finality_branch,
        execution_payload_root=execution_root,
        execution_payload_branch=execution_branch,
        domain=domain,
        spec=spec,
    )
    rotation = CommitteeUpdateArgs(
        pubkeys_compressed=pubkeys_compressed,
        finalized_header=attested_block,
        sync_committee_branch=committee_branch,
        spec=spec,
    )
    return step, rotation
