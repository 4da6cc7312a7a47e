"""CommitteeUpdateArgs — serde-JSON compatible with the reference
(witness/rotation.rs:16-25) — plus the native public-input computation
(committee_update_circuit.rs:198-222) and the Default dummy witness
(rotation.rs:28-76) used for keygen."""
from __future__ import annotations

import json
from dataclasses import dataclass, field as dfield

from ..specs import Spec, TESTNET
from ..ssz import BeaconBlockHeader, mock_root
from ..hashes.sha256 import sha256
from ..hashes.poseidon import poseidon_committee_commitment_from_compressed
from ..fields.params import LIMB_BITS


@dataclass
class CommitteeUpdateArgs:
    pubkeys_compressed: list            # list[bytes], 48 each
    finalized_header: BeaconBlockHeader
    sync_committee_branch: list         # list[bytes32]
    spec: Spec = dfield(default=TESTNET)

    @classmethod
    def from_json(cls, d: dict, spec: Spec = TESTNET) -> "CommitteeUpdateArgs":
        return cls(
            pubkeys_compressed=[bytes(b) for b in d["pubkeys_compressed"]],
            finalized_header=BeaconBlockHeader.from_json(d["finalized_header"]),
            sync_committee_branch=[bytes(b) for b in d["sync_committee_branch"]],
            spec=spec,
        )

    @classmethod
    def from_file(cls, path: str, spec: Spec = TESTNET) -> "CommitteeUpdateArgs":
        with open(path) as f:
            return cls.from_json(json.load(f), spec)

    def to_json(self) -> dict:
        return {
            "pubkeys_compressed": [list(b) for b in self.pubkeys_compressed],
            "finalized_header": self.finalized_header.to_json(),
            "sync_committee_branch": [list(b) for b in self.sync_committee_branch],
        }

    @classmethod
    def default(cls, spec: Spec = TESTNET) -> "CommitteeUpdateArgs":
        """Dummy witness for keygen/tests (witness/rotation.rs:28-76)."""
        # iter::once(192).pad_using(48, 0).rev() -> 47 zero bytes then 192
        dummy_x = bytes([0] * 47 + [192])
        branch = [b"\x00" * 32] * spec.sync_committee_pubkeys_depth
        hashed_pk = sha256(dummy_x + b"\x00" * 16)
        chunks = [hashed_pk] * spec.sync_committee_size
        while len(chunks) > 1:
            chunks = [sha256(chunks[i] + chunks[i + 1])
                      for i in range(0, len(chunks), 2)]
        state_root = mock_root(chunks[0], branch,
                               spec.sync_committee_pubkeys_root_index)
        return cls(
            pubkeys_compressed=[dummy_x] * spec.sync_committee_size,
            finalized_header=BeaconBlockHeader(state_root=state_root),
            sync_committee_branch=branch,
            spec=spec,
        )


def committee_update_instances(args: CommitteeUpdateArgs,
                               limb_bits: int = LIMB_BITS) -> list:
    """Native mirror of CommitteeUpdateCircuit::get_instances
    (committee_update_circuit.rs:198-222).

    One instance column: [poseidon_commitment, root_lo_u128, root_hi_u128].
    """
    poseidon_commitment = poseidon_committee_commitment_from_compressed(
        args.pubkeys_compressed, limb_bits)
    root = args.finalized_header.hash_tree_root()
    hash_lo = int.from_bytes(root[16:], "big")
    hash_hi = int.from_bytes(root[:16], "big")
    return [[poseidon_commitment, hash_lo, hash_hi]]
