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


# ---- word-level variants, for the wide (row-parallel) SHA engine ----
#
# Digests stay as 8 big-endian u32 word cells between tree levels: a merkle
# parent consumes its children's word cells directly via copy constraints
# into the next block's schedule (sha256_wide.py), with no byte
# decomposition between levels — the whole point of the reference's
# Sha256ChipWide for the committee circuit (sha256_wide.rs:36-112).

def chunk_words_const(data: bytes) -> List[int]:
    """32-byte constant chunk -> 8 BE u32 int words."""
    return [int.from_bytes(data[4 * i:4 * i + 4], "big") for i in range(8)]


def words_of_chunk_bytes(ctx: Context, byte_cells) -> List:
    """32 byte cells (or int constants) -> 8 BE word cells/ints with
    recomposition constraints."""
    out = []
    for wi in range(8):
        quad = list(byte_cells[4 * wi:4 * wi + 4])
        if all(isinstance(q, int) for q in quad):
            out.append(sum(q << (8 * (3 - i)) for i, q in enumerate(quad)))
        else:
            quad_c = [q if isinstance(q, AssignedValue)
                      else ctx.load_constant(q) for q in quad]
            out.append(ctx.inner_product(
                quad_c, [1 << (8 * (3 - i)) for i in range(4)]))
    return out


def sha_pair_words(chip, left: Sequence, right: Sequence) -> List:
    """parent = SHA-256(left32 ‖ right32) at word level (one 64-byte
    message: data block + constant padding block)."""
    from .sha256_wide import PAD_BLOCK_512
    return chip.hash_blocks([list(left) + list(right), PAD_BLOCK_512])


def ssz_merkleize_words(chip, chunks: List[Sequence]) -> List:
    """Merkleize word-level chunks (each 8 words: cells or int constants),
    zero-subtree padding as in ssz_merkle.rs:27-73."""
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
            right = (layer[i + 1] if i + 1 < len(layer)
                     else chunk_words_const(zero_hash(d)))
            nxt.append(sha_pair_words(chip, left, right))
        layer = nxt
    return layer[0]


def verify_merkle_proof_words(chip, ctx: Context, leaf: Sequence,
                              branch: List[Sequence], gindex: int,
                              root: Sequence):
    """Word-level branch verification by gindex (ssz_merkle.rs:78-112)."""
    h = list(leaf)
    g = gindex
    for sib in branch:
        if g % 2 == 0:
            h = sha_pair_words(chip, h, sib)
        else:
            h = sha_pair_words(chip, sib, h)
        g //= 2
    for a, b in zip(h, root):
        ctx.constrain_equal(a, b)
