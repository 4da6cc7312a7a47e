"""Capella (mainnet preset) consensus containers over the generic SSZ engine.

Mirrors the subset of `ethereum_consensus::capella::mainnet` the reference
consumes in its unit-test generator (preprocessor/src/unit_test_gen.rs:3-5):
the full BeaconState (28 fields, deserializable from the committed raw
snapshots in test_data/) and the BeaconBlockBody shape needed for default
body roots + the execution-payload merkle proof.
"""
from __future__ import annotations

from .ssz_types import (Bitlist, Bitvector, ByteList, Bytes4, Bytes20,
                        Bytes32, Bytes48, Bytes96, ByteVector, Container,
                        List, Opaque, Uint, Vector, boolean, uint8, uint64,
                        uint256)

# mainnet preset
SLOTS_PER_EPOCH = 32
SLOTS_PER_HISTORICAL_ROOT = 8192
HISTORICAL_ROOTS_LIMIT = 1 << 24
EPOCHS_PER_ETH1_VOTING_PERIOD = 64
VALIDATOR_REGISTRY_LIMIT = 1 << 40
EPOCHS_PER_HISTORICAL_VECTOR = 1 << 16
EPOCHS_PER_SLASHINGS_VECTOR = 1 << 13
SYNC_COMMITTEE_SIZE = 512
BYTES_PER_LOGS_BLOOM = 256
MAX_EXTRA_DATA_BYTES = 32
MAX_BYTES_PER_TRANSACTION = 1 << 30
MAX_TRANSACTIONS_PER_PAYLOAD = 1 << 20
MAX_WITHDRAWALS_PER_PAYLOAD = 16
MAX_PROPOSER_SLASHINGS = 16
MAX_ATTESTER_SLASHINGS = 2
MAX_ATTESTATIONS = 128
MAX_DEPOSITS = 16
MAX_VOLUNTARY_EXITS = 16
MAX_BLS_TO_EXECUTION_CHANGES = 16

GENESIS_FORK_VERSION = bytes(4)         # mainnet Context (for_mainnet)

Fork = Container("Fork", [
    ("previous_version", Bytes4),
    ("current_version", Bytes4),
    ("epoch", uint64),
])

BeaconBlockHeader = Container("BeaconBlockHeader", [
    ("slot", uint64),
    ("proposer_index", uint64),
    ("parent_root", Bytes32),
    ("state_root", Bytes32),
    ("body_root", Bytes32),
])

Eth1Data = Container("Eth1Data", [
    ("deposit_root", Bytes32),
    ("deposit_count", uint64),
    ("block_hash", Bytes32),
])

Validator = Container("Validator", [
    ("public_key", Bytes48),
    ("withdrawal_credentials", Bytes32),
    ("effective_balance", uint64),
    ("slashed", boolean),
    ("activation_eligibility_epoch", uint64),
    ("activation_epoch", uint64),
    ("exit_epoch", uint64),
    ("withdrawable_epoch", uint64),
])

Checkpoint = Container("Checkpoint", [
    ("epoch", uint64),
    ("root", Bytes32),
])

SyncCommittee = Container("SyncCommittee", [
    ("public_keys", Vector(Bytes48, SYNC_COMMITTEE_SIZE)),
    ("aggregate_public_key", Bytes48),
])

SyncAggregate = Container("SyncAggregate", [
    ("sync_committee_bits", Bitvector(SYNC_COMMITTEE_SIZE)),
    ("sync_committee_signature", Bytes96),
])

ExecutionPayloadHeader = Container("ExecutionPayloadHeader", [
    ("parent_hash", Bytes32),
    ("fee_recipient", Bytes20),
    ("state_root", Bytes32),
    ("receipts_root", Bytes32),
    ("logs_bloom", ByteVector(BYTES_PER_LOGS_BLOOM)),
    ("prev_randao", Bytes32),
    ("block_number", uint64),
    ("gas_limit", uint64),
    ("gas_used", uint64),
    ("timestamp", uint64),
    ("extra_data", ByteList(MAX_EXTRA_DATA_BYTES)),
    ("base_fee_per_gas", uint256),
    ("block_hash", Bytes32),
    ("transactions_root", Bytes32),
    ("withdrawals_root", Bytes32),
])

Withdrawal = Container("Withdrawal", [
    ("index", uint64),
    ("validator_index", uint64),
    ("address", Bytes20),
    ("amount", uint64),
])

ExecutionPayload = Container("ExecutionPayload", [
    ("parent_hash", Bytes32),
    ("fee_recipient", Bytes20),
    ("state_root", Bytes32),
    ("receipts_root", Bytes32),
    ("logs_bloom", ByteVector(BYTES_PER_LOGS_BLOOM)),
    ("prev_randao", Bytes32),
    ("block_number", uint64),
    ("gas_limit", uint64),
    ("gas_used", uint64),
    ("timestamp", uint64),
    ("extra_data", ByteList(MAX_EXTRA_DATA_BYTES)),
    ("base_fee_per_gas", uint256),
    ("block_hash", Bytes32),
    ("transactions", List(ByteList(MAX_BYTES_PER_TRANSACTION),
                          MAX_TRANSACTIONS_PER_PAYLOAD)),
    ("withdrawals", List(Withdrawal, MAX_WITHDRAWALS_PER_PAYLOAD)),
])

HistoricalSummary = Container("HistoricalSummary", [
    ("block_summary_root", Bytes32),
    ("state_summary_root", Bytes32),
])

# Operation lists in the block body are only ever default-empty in the
# generator path; their element schemas stay opaque (ssz_types.Opaque).
BeaconBlockBody = Container("BeaconBlockBody", [
    ("randao_reveal", Bytes96),
    ("eth1_data", Eth1Data),
    ("graffiti", Bytes32),
    ("proposer_slashings", List(Opaque(), MAX_PROPOSER_SLASHINGS)),
    ("attester_slashings", List(Opaque(), MAX_ATTESTER_SLASHINGS)),
    ("attestations", List(Opaque(), MAX_ATTESTATIONS)),
    ("deposits", List(Opaque(), MAX_DEPOSITS)),
    ("voluntary_exits", List(Opaque(), MAX_VOLUNTARY_EXITS)),
    ("sync_aggregate", SyncAggregate),
    ("execution_payload", ExecutionPayload),
    ("bls_to_execution_changes",
     List(Opaque(), MAX_BLS_TO_EXECUTION_CHANGES)),
])

BeaconState = Container("BeaconState", [
    ("genesis_time", uint64),
    ("genesis_validators_root", Bytes32),
    ("slot", uint64),
    ("fork", Fork),
    ("latest_block_header", BeaconBlockHeader),
    ("block_roots", Vector(Bytes32, SLOTS_PER_HISTORICAL_ROOT)),
    ("state_roots", Vector(Bytes32, SLOTS_PER_HISTORICAL_ROOT)),
    ("historical_roots", List(Bytes32, HISTORICAL_ROOTS_LIMIT)),
    ("eth1_data", Eth1Data),
    ("eth1_data_votes",
     List(Eth1Data, EPOCHS_PER_ETH1_VOTING_PERIOD * SLOTS_PER_EPOCH)),
    ("eth1_deposit_index", uint64),
    ("validators", List(Validator, VALIDATOR_REGISTRY_LIMIT)),
    ("balances", List(uint64, VALIDATOR_REGISTRY_LIMIT)),
    ("randao_mixes", Vector(Bytes32, EPOCHS_PER_HISTORICAL_VECTOR)),
    ("slashings", Vector(uint64, EPOCHS_PER_SLASHINGS_VECTOR)),
    ("previous_epoch_participation",
     List(uint8, VALIDATOR_REGISTRY_LIMIT)),
    ("current_epoch_participation",
     List(uint8, VALIDATOR_REGISTRY_LIMIT)),
    ("justification_bits", Bitvector(4)),
    ("previous_justified_checkpoint", Checkpoint),
    ("current_justified_checkpoint", Checkpoint),
    ("finalized_checkpoint", Checkpoint),
    ("inactivity_scores", List(uint64, VALIDATOR_REGISTRY_LIMIT)),
    ("current_sync_committee", SyncCommittee),
    ("next_sync_committee", SyncCommittee),
    ("latest_execution_payload_header", ExecutionPayloadHeader),
    ("next_withdrawal_index", uint64),
    ("next_withdrawal_validator_index", uint64),
    ("historical_summaries", List(HistoricalSummary,
                                  HISTORICAL_ROOTS_LIMIT)),
])
