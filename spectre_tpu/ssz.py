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
