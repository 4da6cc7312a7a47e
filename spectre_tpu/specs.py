"""Beacon chain spec constants — mirrors eth-types/src/spec.rs."""
from dataclasses import dataclass


@dataclass(frozen=True)
class Spec:
    name: str
    sync_committee_size: int
    sync_committee_depth: int = 5
    sync_committee_root_index: int = 55
    execution_state_root_index: int = 9
    execution_state_root_depth: int = 4
    finalized_header_index: int = 105
    finalized_header_depth: int = 6
    bytes_per_logs_bloom: int = 256
    max_extra_data_bytes: int = 32
    # SLOTS_PER_EPOCH * EPOCHS_PER_SYNC_COMMITTEE_PERIOD (minimal: 8*8)
    slots_per_period: int = 8192
    dst: bytes = b"BLS_SIG_BLS12381G2_XMD:SHA-256_SSWU_RO_POP_"

    @property
    def sync_committee_pubkeys_root_index(self) -> int:
        return self.sync_committee_root_index * 2

    @property
    def sync_committee_pubkeys_depth(self) -> int:
        return self.sync_committee_depth + 1


MINIMAL = Spec(name="minimal", sync_committee_size=32,
               execution_state_root_index=9, slots_per_period=64)
TESTNET = Spec(name="testnet", sync_committee_size=512,
               execution_state_root_index=25)
MAINNET = Spec(name="mainnet", sync_committee_size=512,
               execution_state_root_index=25)
# dev-only 4-validator spec (no reference analog): the smallest committee
# the circuits accept — used by the on-TPU iteration scripts and the
# unstubbed RPC e2e so keygen fits in minutes
NANO = Spec(name="nano", sync_committee_size=4, slots_per_period=64)

BY_NAME = {"minimal": MINIMAL, "testnet": TESTNET, "mainnet": MAINNET,
           "nano": NANO}
