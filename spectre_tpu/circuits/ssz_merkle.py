"""In-circuit SSZ merkleization (the reference's ssz_merkle.rs:27-112 analog).

Chunks are 32-byte values as lists of byte cells; hashing goes through the
spread SHA-256 chip.
"""
from __future__ import annotations

from typing import List, Sequence

from .builder import Context, AssignedValue
from .sha256_gadget import Sha256Chip
from ..ssz import zero_hash


def sha_pair(chip: Sha256Chip, left: Sequence[AssignedValue],
             right: Sequence[AssignedValue]) -> List[AssignedValue]:
    return chip.digest_bytes_cells(list(left) + list(right))


def ssz_merkleize_chunks(chip: Sha256Chip, ctx: Context,
                         chunks: List[Sequence[AssignedValue]]) -> List[AssignedValue]:
    """Merkleize byte-cell chunks, padding with precomputed zero-subtree
    roots for non-power-of-two counts (ssz_merkle.rs:27-73)."""
    depth = 0
    size = 1
    while size < len(chunks):
        size *= 2
        depth += 1
    layer = list(chunks)
    for d in range(depth):
        nxt = []
        for i in range(0, len(layer), 2):
            left = layer[i]
            if i + 1 < len(layer):
                right = layer[i + 1]
            else:
                right = [ctx.load_constant(b) for b in zero_hash(d)]
            nxt.append(sha_pair(chip, left, right))
        layer = nxt
    return layer[0]


def verify_merkle_proof(chip: Sha256Chip, ctx: Context,
                        leaf: Sequence[AssignedValue],
                        branch: List[Sequence[AssignedValue]],
                        gindex: int,
                        root: Sequence[AssignedValue]):
    """Recompute the root from (leaf, branch, gindex) and constrain equality
    with `root` (ssz_merkle.rs:78-112)."""
    h = list(leaf)
    g = gindex
    for sib in branch:
        if g % 2 == 0:
            h = sha_pair(chip, h, sib)
        else:
            h = sha_pair(chip, sib, h)
        g //= 2
    for a, b in zip(h, root):
        ctx.constrain_equal(a, b)
