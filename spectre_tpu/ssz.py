"""Minimal SSZ merkleization — hash_tree_root semantics identical to ssz_rs
as consumed by the reference (witness/step.rs, preprocessor/src/*).

Only the pieces the light-client stack needs: uint64 leaves, 32-byte roots,
fixed containers (BeaconBlockHeader, SigningData), vector merkleization with
zero-hash padding, and merkle branch verification by generalized index.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from .hashes.sha256 import sha256

ZERO_CHUNK = b"\x00" * 32


@lru_cache(maxsize=64)
def zero_hash(depth: int) -> bytes:
    """Root of a depth-`depth` all-zero subtree."""
    if depth == 0:
        return ZERO_CHUNK
    h = zero_hash(depth - 1)
    return sha256(h + h)


def uint64_chunk(v: int) -> bytes:
    return int(v).to_bytes(8, "little") + b"\x00" * 24


def merkleize_chunks(chunks, limit: int | None = None) -> bytes:
    """Merkleize a chunk list, padding with zero subtrees up to `limit`."""
    n = len(chunks)
    if limit is None:
        limit = max(1, n)
    size = 1
    depth = 0
    while size < limit:
        size *= 2
        depth += 1
    layer = list(chunks)
    if not layer and depth == 0:
        return zero_hash(0)
    for d in range(depth):
        nxt = []
        for i in range(0, len(layer), 2):
            left = layer[i]
            right = layer[i + 1] if i + 1 < len(layer) else zero_hash(d)
            nxt.append(sha256(left + right))
        if not nxt:
            nxt = [zero_hash(d + 1)]
        layer = nxt
    return layer[0]


@dataclass
class BeaconBlockHeader:
    """phase0 BeaconBlockHeader (5 fields, hash_tree_root over 8 leaves)."""

    slot: int = 0
    proposer_index: int = 0
    parent_root: bytes = ZERO_CHUNK
    state_root: bytes = ZERO_CHUNK
    body_root: bytes = ZERO_CHUNK

    def hash_tree_root(self) -> bytes:
        chunks = [
            uint64_chunk(self.slot),
            uint64_chunk(self.proposer_index),
            bytes(self.parent_root),
            bytes(self.state_root),
            bytes(self.body_root),
        ]
        return merkleize_chunks(chunks, 8)

    @classmethod
    def from_json(cls, d: dict) -> "BeaconBlockHeader":
        def root(v):
            if isinstance(v, str):
                return bytes.fromhex(v[2:] if v.startswith("0x") else v)
            return bytes(v)

        return cls(
            slot=int(d["slot"]),
            proposer_index=int(d["proposer_index"]),
            parent_root=root(d["parent_root"]),
            state_root=root(d["state_root"]),
            body_root=root(d["body_root"]),
        )

    def to_json(self) -> dict:
        return {
            "slot": str(self.slot),
            "proposer_index": str(self.proposer_index),
            "parent_root": "0x" + bytes(self.parent_root).hex(),
            "state_root": "0x" + bytes(self.state_root).hex(),
            "body_root": "0x" + bytes(self.body_root).hex(),
        }


def _hex(v) -> bytes:
    if isinstance(v, str):
        return bytes.fromhex(v[2:] if v.startswith("0x") else v)
    return bytes(v)


@dataclass
class ExecutionPayloadHeader:
    """Capella ExecutionPayloadHeader (15 fields, merkleized over 16 leaves);
    mirrors test-utils/src/execution_payload_header.rs:11-33."""

    parent_hash: bytes = ZERO_CHUNK
    fee_recipient: bytes = b"\x00" * 20
    state_root: bytes = ZERO_CHUNK
    receipts_root: bytes = ZERO_CHUNK
    logs_bloom: bytes = b"\x00" * 256
    prev_randao: bytes = ZERO_CHUNK
    block_number: int = 0
    gas_limit: int = 0
    gas_used: int = 0
    timestamp: int = 0
    extra_data: bytes = b""
    base_fee_per_gas: int = 0
    block_hash: bytes = ZERO_CHUNK
    transactions_root: bytes = ZERO_CHUNK
    withdrawals_root: bytes = ZERO_CHUNK

    def hash_tree_root(self) -> bytes:
        bloom_chunks = [self.logs_bloom[i:i + 32] for i in range(0, 256, 32)]
        bloom_root = merkleize_chunks(bloom_chunks, 8)
        # extra_data: ByteList[32] -> mix_in_length(merkleize(chunks, 1), len)
        ed = bytes(self.extra_data)
        ed_chunks = [ed[i:i + 32].ljust(32, b"\x00")
                     for i in range(0, max(1, len(ed)), 32)] or [ZERO_CHUNK]
        ed_root = sha256(merkleize_chunks(ed_chunks, 1)
                         + len(ed).to_bytes(32, "little"))
        chunks = [
            bytes(self.parent_hash),
            bytes(self.fee_recipient).ljust(32, b"\x00"),
            bytes(self.state_root),
            bytes(self.receipts_root),
            bloom_root,
            bytes(self.prev_randao),
            uint64_chunk(self.block_number),
            uint64_chunk(self.gas_limit),
            uint64_chunk(self.gas_used),
            uint64_chunk(self.timestamp),
            ed_root,
            int(self.base_fee_per_gas).to_bytes(32, "little"),
            bytes(self.block_hash),
            bytes(self.transactions_root),
            bytes(self.withdrawals_root),
        ]
        return merkleize_chunks(chunks, 16)

    @classmethod
    def from_json(cls, d: dict) -> "ExecutionPayloadHeader":
        return cls(
            parent_hash=_hex(d["parent_hash"]),
            fee_recipient=_hex(d["fee_recipient"]),
            state_root=_hex(d["state_root"]),
            receipts_root=_hex(d["receipts_root"]),
            logs_bloom=_hex(d["logs_bloom"]),
            prev_randao=_hex(d["prev_randao"]),
            block_number=int(d["block_number"]),
            gas_limit=int(d["gas_limit"]),
            gas_used=int(d["gas_used"]),
            timestamp=int(d["timestamp"]),
            extra_data=_hex(d.get("extra_data", "0x")),
            base_fee_per_gas=int(d["base_fee_per_gas"]),
            block_hash=_hex(d["block_hash"]),
            transactions_root=_hex(d["transactions_root"]),
            withdrawals_root=_hex(d["withdrawals_root"]),
        )


def sync_committee_pubkeys_root(pubkeys_compressed) -> bytes:
    """hash_tree_root of Vector[BLSPubkey, N]: H(pk ‖ 0^16) leaves merkleized."""
    chunks = [sha256(bytes(pk) + b"\x00" * 16) for pk in pubkeys_compressed]
    return merkleize_chunks(chunks, len(chunks))


def bls_pubkey_root(pubkey_compressed: bytes) -> bytes:
    return sha256(bytes(pubkey_compressed) + b"\x00" * 16)


def compute_signing_root(object_root: bytes, domain: bytes) -> bytes:
    """hash_tree_root(SigningData{object_root, domain}) = H(root ‖ domain)."""
    return sha256(bytes(object_root) + bytes(domain))


def verify_merkle_branch(leaf: bytes, branch, gindex: int, root: bytes) -> bool:
    """ssz_rs::is_valid_merkle_branch semantics, branch indexed from leaf up."""
    h = bytes(leaf)
    g = gindex
    for sib in branch:
        if g % 2 == 0:
            h = sha256(h + bytes(sib))
        else:
            h = sha256(bytes(sib) + h)
        g //= 2
    return h == bytes(root)


def mock_root(leaf: bytes, branch, gindex: int) -> bytes:
    """Forge the root implied by (leaf, branch, gindex) — witness/rotation.rs:78-95."""
    h = bytes(leaf)
    g = gindex
    for sib in branch:
        if g % 2 == 0:
            h = sha256(h + bytes(sib))
        else:
            h = sha256(bytes(sib) + h)
        g //= 2
    return h
