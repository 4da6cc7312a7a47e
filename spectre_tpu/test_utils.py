"""Consensus-spec-tests harness — the test-utils crate analog
(test-utils/src/lib.rs:32-131).

Loads ethereum/consensus-spec-tests light-client sync fixtures
(`meta.yaml`, `steps.yaml`, `bootstrap.ssz_snappy`, `update_*.ssz_snappy`,
Minimal/Capella layout) and converts them to circuit witnesses. The
environment has no network access, so `generate_spec_test_fixture` also
synthesizes a fixture directory in the exact pyspec layout from seeded BLS
keys (the unit_test_gen.rs role): the loader is exercised end-to-end
against files that any conforming reader accepts.
"""
from __future__ import annotations

import hashlib
import os
from typing import Dict, List, Tuple

import yaml

from .consensus_types import (
    LightClientBootstrap, LightClientHeader, LightClientUpdate,
    SyncAggregate, SyncCommittee, SYNC_COMMITTEE_SIZE)
from .snappy_codec import compress_frame, decompress_frame
from .specs import MINIMAL, Spec
from .ssz import (BeaconBlockHeader, ExecutionPayloadHeader, _hex,
                  bls_pubkey_root, compute_signing_root, sha256)
from .preprocessor.domain import DOMAIN_SYNC_COMMITTEE, compute_domain
from .witness.step import SyncStepArgs
from .witness.rotation import CommitteeUpdateArgs

CAPELLA_FORK_VERSION = bytes([3, 0, 0, 1])   # test-utils/src/lib.rs:216


# ------------------------------------------------------------- loaders

def load_snappy_ssz(path: str, cls):
    with open(path, "rb") as f:
        return cls.decode(decompress_frame(f.read()))


def load_yaml(path: str):
    with open(path) as f:
        return yaml.safe_load(f)


def validators_root_from_test_path(path: str) -> bytes:
    meta = load_yaml(os.path.join(path, "meta.yaml"))
    return _hex(meta["genesis_validators_root"])


def valid_updates_from_test_path(path: str) -> List[LightClientUpdate]:
    """ProcessUpdate steps up to the first ForceUpdate
    (test-utils/src/lib.rs:64-85)."""
    steps = load_yaml(os.path.join(path, "steps.yaml"))
    updates = []
    for step in steps:
        if "process_update" not in step:
            break
        name = step["process_update"]["update"]
        updates.append(load_snappy_ssz(
            os.path.join(path, f"{name}.ssz_snappy"), LightClientUpdate))
    return updates


def get_initial_sync_committee_poseidon(path: str,
                                        slots_per_period: int
                                        ) -> Tuple[int, int]:
    """(sync period, poseidon commitment) from bootstrap.ssz_snappy
    (test-utils/src/lib.rs:32-50)."""
    from .curves.host import g1_decompress, g1_to_uncompressed
    from .hashes.poseidon import (
        poseidon_committee_commitment_from_uncompressed)
    bootstrap = load_snappy_ssz(
        os.path.join(path, "bootstrap.ssz_snappy"), LightClientBootstrap)
    unc = [g1_to_uncompressed(g1_decompress(pk))
           for pk in bootstrap.current_sync_committee.pubkeys]
    commitment = poseidon_committee_commitment_from_uncompressed(unc)
    period = int(bootstrap.header.beacon.slot) // slots_per_period
    return period, commitment


def read_test_files_and_gen_witness(
        path: str, spec: Spec = MINIMAL
) -> Tuple[SyncStepArgs, CommitteeUpdateArgs]:
    """Fixture dir -> (step witness, rotation witness)
    (test-utils/src/lib.rs:87-131)."""
    from .curves.host import g1_decompress, g1_to_uncompressed
    bootstrap = load_snappy_ssz(
        os.path.join(path, "bootstrap.ssz_snappy"), LightClientBootstrap)
    genesis_validators_root = validators_root_from_test_path(path)
    updates = valid_updates_from_test_path(path)
    upd = updates[0]

    domain = compute_domain(DOMAIN_SYNC_COMMITTEE, CAPELLA_FORK_VERSION,
                            genesis_validators_root)
    sync_wit = SyncStepArgs(
        signature_compressed=upd.sync_aggregate.sync_committee_signature,
        pubkeys_uncompressed=[
            g1_to_uncompressed(g1_decompress(pk))
            for pk in bootstrap.current_sync_committee.pubkeys],
        pariticipation_bits=list(upd.sync_aggregate.sync_committee_bits),
        attested_header=upd.attested_header.beacon,
        finalized_header=upd.finalized_header.beacon,
        finality_branch=[bytes(x) for x in upd.finality_branch],
        execution_payload_branch=[
            bytes(x) for x in upd.finalized_header.execution_branch],
        execution_payload_root=upd.finalized_header.execution
        .hash_tree_root(),
        domain=domain,
        spec=spec,
    )

    # rotation: committee-root proof -> pubkeys-root proof by inserting the
    # aggregate-pubkey root as branch element 0 (lib.rs:102-116)
    branch = [bls_pubkey_root(upd.next_sync_committee.aggregate_pubkey)]
    branch += [bytes(x) for x in upd.next_sync_committee_branch]
    rotation_wit = CommitteeUpdateArgs(
        pubkeys_compressed=list(upd.next_sync_committee.pubkeys),
        finalized_header=upd.attested_header.beacon,
        sync_committee_branch=branch,
        spec=spec,
    )
    return sync_wit, rotation_wit


# ------------------------------------------------- fixture generation

def _sparse_tree(leaves: Dict[int, bytes]) -> Dict[int, bytes]:
    """Merkle nodes for a sparse tree given {generalized index: leaf};
    absent subtrees are zero-valued leaves at each depth."""
    nodes = dict(leaves)
    pending = sorted(leaves, reverse=True)
    zeros: Dict[int, bytes] = {}

    def zero_at(gi: int) -> bytes:
        d = gi.bit_length() - 1
        if d not in zeros:
            # depth-uniform zero subtree of the node's height is unknown in
            # general; a plain zero chunk keeps proofs consistent since we
            # only ever read siblings we also write or default here
            zeros[d] = b"\x00" * 32
        return zeros[d]

    while pending:
        nxt = set()
        for gi in pending:
            if gi == 1:
                continue
            parent = gi >> 1
            left = nodes.get(parent * 2, None)
            right = nodes.get(parent * 2 + 1, None)
            left = left if left is not None else zero_at(parent * 2)
            right = right if right is not None else zero_at(parent * 2 + 1)
            nodes[parent] = sha256(left + right)
            nxt.add(parent)
        pending = sorted(nxt, reverse=True)
    return nodes


def _branch(nodes: Dict[int, bytes], gindex: int) -> List[bytes]:
    out = []
    gi = gindex
    while gi > 1:
        out.append(nodes.get(gi ^ 1, b"\x00" * 32))
        gi >>= 1
    return out


def generate_spec_test_fixture(out_dir: str, spec: Spec = MINIMAL,
                               seed: bytes = b"spectre-tpu-spec-test",
                               participation: List[bool] | None = None):
    """Write a pyspec-layout light-client sync fixture with real BLS
    signatures and internally-consistent merkle proofs.

    participation: per-validator sync-aggregate bits (default all True) —
    the signature aggregates only participating keys, matching the
    pyspec scenarios the reference sweeps (varying supermajorities)."""
    from .curves import host as CH
    from .curves.hash_to_curve import hash_to_g2
    from .curves.host import bls_g2_host, g2_compress, g1_compress
    from .fields.params import BLS12_381_FR
    from . import ssz as S

    os.makedirs(out_dir, exist_ok=True)
    n = spec.sync_committee_size
    sks = [int.from_bytes(hashlib.sha256(seed + b"-sk-%d" % i).digest(),
                          "little") % BLS12_381_FR for i in range(n)]
    pts = [CH.bls_g1.mul(CH.bls_g1.gen, sk) for sk in sks]
    pubkeys = [g1_compress(p) for p in pts]
    agg_pt = None
    for p in pts:
        agg_pt = CH.bls_g1.add(agg_pt, p)
    committee = SyncCommittee(pubkeys=pubkeys,
                              aggregate_pubkey=g1_compress(agg_pt))
    committee_pubkeys_root = S.sync_committee_pubkeys_root(pubkeys)
    committee_root = S.sha256(
        committee_pubkeys_root + bls_pubkey_root(committee.aggregate_pubkey))

    genesis_validators_root = hashlib.sha256(seed + b"-gvr").digest()
    domain = compute_domain(DOMAIN_SYNC_COMMITTEE, CAPELLA_FORK_VERSION,
                            genesis_validators_root)

    def true_gindex(index: int, depth: int) -> int:
        """The reference's (INDEX, DEPTH) pairs walk `depth` sibling levels
        by the low bits of INDEX (ssz_merkle.rs:85-99); the equivalent true
        generalized index is 2^depth | (index mod 2^depth)."""
        return (1 << depth) | (index & ((1 << depth) - 1))

    # finalized header committing an execution payload
    execution = ExecutionPayloadHeader(
        block_number=777, extra_data=b"spectre-tpu",
        block_hash=hashlib.sha256(seed + b"-bh").digest())
    exec_root = execution.hash_tree_root()
    exec_gi = true_gindex(spec.execution_state_root_index,
                          spec.execution_state_root_depth)
    exec_nodes = _sparse_tree({exec_gi: exec_root})
    finalized = BeaconBlockHeader(
        slot=spec.slots_per_period * 2 + 8,
        body_root=exec_nodes[1])
    execution_branch = _branch(exec_nodes, exec_gi)

    # attested state commits BOTH the finalized header (finality branch)
    # and the next sync committee — two leaves in one sparse state tree
    fin_gi = true_gindex(spec.finalized_header_index,
                         spec.finalized_header_depth)
    nsc_gi = true_gindex(spec.sync_committee_root_index,
                         spec.sync_committee_depth)
    state_nodes = _sparse_tree({
        fin_gi: finalized.hash_tree_root(),
        nsc_gi: committee_root,
    })
    attested = BeaconBlockHeader(
        slot=spec.slots_per_period * 2 + 17,
        state_root=state_nodes[1])
    finality_branch = _branch(state_nodes, fin_gi)
    nsc_branch = _branch(state_nodes, nsc_gi)

    # real aggregate signature over the attested header (participating
    # keys only)
    if participation is None:
        participation = [True] * n
    assert len(participation) == n and any(participation)
    signing_root = compute_signing_root(attested.hash_tree_root(), domain)
    msg = hash_to_g2(signing_root, spec.dst)
    agg_sig = None
    for sk, bit in zip(sks, participation):
        if bit:
            agg_sig = bls_g2_host.add(agg_sig, bls_g2_host.mul(msg, sk))
    signature = g2_compress(agg_sig)

    bootstrap_header = LightClientHeader(
        beacon=attested, execution=execution,
        execution_branch=execution_branch)
    bootstrap = LightClientBootstrap(
        header=bootstrap_header,
        current_sync_committee=committee,
        current_sync_committee_branch=nsc_branch)
    update = LightClientUpdate(
        attested_header=LightClientHeader(
            beacon=attested, execution=execution,
            execution_branch=execution_branch),
        next_sync_committee=committee,
        next_sync_committee_branch=nsc_branch,
        finalized_header=LightClientHeader(
            beacon=finalized, execution=execution,
            execution_branch=execution_branch),
        finality_branch=finality_branch,
        sync_aggregate=SyncAggregate(
            sync_committee_bits=list(participation),
            sync_committee_signature=signature),
        signature_slot=int(attested.slot) + 1)

    with open(os.path.join(out_dir, "bootstrap.ssz_snappy"), "wb") as f:
        f.write(compress_frame(bootstrap.encode()))
    with open(os.path.join(out_dir, "update_0.ssz_snappy"), "wb") as f:
        f.write(compress_frame(update.encode()))
    with open(os.path.join(out_dir, "meta.yaml"), "w") as f:
        yaml.safe_dump({
            "genesis_validators_root":
                "0x" + genesis_validators_root.hex(),
            "trusted_block_root":
                "0x" + attested.hash_tree_root().hex(),
            "bootstrap_fork_digest": "capella",
            "store_fork_digest": "capella",
        }, f)
    with open(os.path.join(out_dir, "steps.yaml"), "w") as f:
        yaml.safe_dump([{
            "process_update": {
                "update_fork_digest": "capella",
                "update": "update_0",
                "current_slot": int(attested.slot) + 2,
                "checks": {
                    "finalized_header": {
                        "slot": int(finalized.slot),
                        "beacon_root":
                            "0x" + finalized.hash_tree_root().hex(),
                        "execution_root": "0x" + exec_root.hex(),
                    },
                    "optimistic_header": {
                        "slot": int(attested.slot),
                        "beacon_root":
                            "0x" + attested.hash_tree_root().hex(),
                        "execution_root": "0x" + exec_root.hex(),
                    },
                },
            }}], f)
    return out_dir
