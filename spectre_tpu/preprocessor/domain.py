"""Beacon-chain signing-domain computation (compute_domain semantics used by
the reference preprocessor at step.rs:47-56)."""
from ..hashes.sha256 import sha256

DOMAIN_SYNC_COMMITTEE = bytes([7, 0, 0, 0])


def compute_fork_data_root(current_version: bytes,
                           genesis_validators_root: bytes) -> bytes:
    """hash_tree_root(ForkData{current_version: bytes4, gvr: bytes32})."""
    leaf_version = bytes(current_version) + b"\x00" * 28
    return sha256(leaf_version + bytes(genesis_validators_root))


def compute_domain(domain_type: bytes, fork_version: bytes,
                   genesis_validators_root: bytes) -> bytes:
    root = compute_fork_data_root(fork_version, genesis_validators_root)
    return bytes(domain_type) + root[:28]
