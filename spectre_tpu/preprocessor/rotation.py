"""LightClientUpdate -> CommitteeUpdateArgs (preprocessor/src/rotation.rs)."""
from __future__ import annotations

from ..specs import Spec, TESTNET
from ..ssz import (BeaconBlockHeader, _hex, verify_merkle_branch,
                   sync_committee_pubkeys_root, bls_pubkey_root)
from ..witness.rotation import CommitteeUpdateArgs


def rotation_args_from_update(update: dict,
                              spec: Spec = TESTNET) -> CommitteeUpdateArgs:
    """Mirrors rotation_args_from_update (rotation.rs:43-106): inserts the
    aggregate-pubkey leaf hash as branch element 0 so the committee-root
    proof becomes a pubkeys-root proof, then fail-fast-verifies it against
    the attested state root (as the reference does)."""
    committee = update["next_sync_committee"]
    pubkeys = [_hex(pk) for pk in committee["pubkeys"]]
    branch = [_hex(b) for b in update["next_sync_committee_branch"]]
    branch.insert(0, bls_pubkey_root(_hex(committee["aggregate_pubkey"])))

    attested = BeaconBlockHeader.from_json(update["attested_header"]["beacon"])
    finalized = BeaconBlockHeader.from_json(
        update["finalized_header"]["beacon"])

    assert verify_merkle_branch(
        sync_committee_pubkeys_root(pubkeys), branch,
        spec.sync_committee_pubkeys_root_index, attested.state_root), (
        "Sync committee branch verification failed")

    return CommitteeUpdateArgs(
        pubkeys_compressed=pubkeys,
        finalized_header=finalized,
        sync_committee_branch=branch,
        spec=spec,
    )


def fetch_rotation_args(client, spec: Spec = TESTNET) -> CommitteeUpdateArgs:
    head = client.beacon_header("head")
    slot = int(head["header"]["message"]["slot"])
    period = slot // (32 * 256)
    update = client.light_client_update_at_period(period)
    return rotation_args_from_update(update, spec)
