"""SSZ multiproof: generalized-index math + multi-merkle proofs.

Mirrors witness/multiproof.rs (vendored ssz-rs PR#118 in the reference):
helper-index computation, multi-merkle root reconstruction, and proof
creation from a full tree. Used by the fixture generator.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

from ..hashes.sha256 import sha256


def get_branch_indices(tree_index: int) -> List[int]:
    """Sibling indices on the path from a leaf to the root (exclusive)."""
    out = []
    while tree_index > 1:
        out.append(tree_index ^ 1)
        tree_index //= 2
    return out


def get_path_indices(tree_index: int) -> List[int]:
    out = []
    while tree_index > 1:
        out.append(tree_index)
        tree_index //= 2
    return out


def get_helper_indices(indices: Sequence[int]) -> List[int]:
    """All sibling indices needed to prove `indices`, none redundant
    (multiproof.rs:79-94)."""
    all_helper = set()
    all_path = set()
    for i in indices:
        all_helper.update(get_branch_indices(i))
        all_path.update(get_path_indices(i))
    out = sorted(all_helper - all_path, reverse=True)
    return out


def merkle_tree(leaves: Sequence[bytes]) -> Dict[int, bytes]:
    """Full tree as {generalized_index: node}; len(leaves) power of two."""
    n = len(leaves)
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    tree: Dict[int, bytes] = {}
    for i, leaf in enumerate(leaves):
        tree[n + i] = bytes(leaf)
    for i in range(n - 1, 0, -1):
        tree[i] = sha256(tree[2 * i] + tree[2 * i + 1])
    return tree


def create_multiproof(tree: Dict[int, bytes],
                      indices: Sequence[int]) -> List[bytes]:
    """Proof nodes for `indices` (generalized), in helper-index order."""
    return [tree[i] for i in get_helper_indices(indices)]


def calculate_multi_merkle_root(leaves: Sequence[bytes],
                                proof: Sequence[bytes],
                                indices: Sequence[int]) -> bytes:
    """Reconstruct the root from leaves at `indices` + proof nodes
    (multiproof.rs:116-160)."""
    assert len(leaves) == len(indices)
    helper_indices = get_helper_indices(indices)
    assert len(proof) == len(helper_indices)
    objects: Dict[int, bytes] = {}
    for idx, leaf in zip(indices, leaves):
        objects[idx] = bytes(leaf)
    for idx, node in zip(helper_indices, proof):
        objects[idx] = bytes(node)
    while 1 not in objects:
        progressed = False
        for key in sorted(objects, reverse=True):
            parent = key // 2
            if parent >= 1 and parent not in objects and (key ^ 1) in objects:
                objects[parent] = sha256(objects[2 * parent]
                                         + objects[2 * parent + 1])
                progressed = True
        assert progressed, "incomplete multiproof"
    return objects[1]
