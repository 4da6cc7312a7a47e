"""SyncStepArgs — serde-JSON compatible with the reference
(lightclient-circuits/src/witness/step.rs:28-50) — plus the native
public-input computation (sync_step_circuit.rs:228-276)."""
from __future__ import annotations

import json
from dataclasses import dataclass, field as dfield

from ..specs import Spec, TESTNET
from ..ssz import BeaconBlockHeader
from ..hashes.sha256 import sha256
from ..hashes.poseidon import poseidon_committee_commitment_from_uncompressed
from ..fields.params import LIMB_BITS


@dataclass
class SyncStepArgs:
    signature_compressed: bytes
    pubkeys_uncompressed: list          # list[bytes], 96 each
    pariticipation_bits: list           # list[bool] (sic — reference typo kept)
    attested_header: BeaconBlockHeader
    finalized_header: BeaconBlockHeader
    finality_branch: list               # list[bytes32]
    execution_payload_root: bytes
    execution_payload_branch: list      # list[bytes32]
    domain: bytes
    spec: Spec = dfield(default=TESTNET)

    @classmethod
    def from_json(cls, d: dict, spec: Spec = TESTNET) -> "SyncStepArgs":
        return cls(
            signature_compressed=bytes(d["signature_compressed"]),
            pubkeys_uncompressed=[bytes(b) for b in d["pubkeys_uncompressed"]],
            pariticipation_bits=[bool(b) for b in d["pariticipation_bits"]],
            attested_header=BeaconBlockHeader.from_json(d["attested_header"]),
            finalized_header=BeaconBlockHeader.from_json(d["finalized_header"]),
            finality_branch=[bytes(b) for b in d["finality_branch"]],
            execution_payload_root=bytes(d["execution_payload_root"]),
            execution_payload_branch=[bytes(b) for b in d["execution_payload_branch"]],
            domain=bytes(d["domain"]),
            spec=spec,
        )

    @classmethod
    def from_file(cls, path: str, spec: Spec = TESTNET) -> "SyncStepArgs":
        with open(path) as f:
            return cls.from_json(json.load(f), spec)

    def to_json(self) -> dict:
        return {
            "signature_compressed": list(self.signature_compressed),
            "pubkeys_uncompressed": [list(b) for b in self.pubkeys_uncompressed],
            "pariticipation_bits": [bool(b) for b in self.pariticipation_bits],
            "attested_header": self.attested_header.to_json(),
            "finalized_header": self.finalized_header.to_json(),
            "finality_branch": [list(b) for b in self.finality_branch],
            "execution_payload_root": list(self.execution_payload_root),
            "execution_payload_branch": [list(b) for b in self.execution_payload_branch],
            "domain": list(self.domain),
        }


def default_sync_step_args(spec: Spec = TESTNET) -> SyncStepArgs:
    """Deterministic dummy witness for keygen/tests (witness/step.rs:53-137):
    mock merkle branches + a real aggregate BLS signature over the forged
    attested header from seeded keys."""
    import hashlib as _hl
    from ..ssz import mock_root, compute_signing_root
    from ..curves import host as CH
    from ..curves.hash_to_curve import hash_to_g2
    from ..curves.host import bls_g2_host, g2_compress, g1_to_uncompressed
    from ..fields.params import BLS12_381_FR

    domain = bytes([7, 0, 0, 0, 48, 83, 175, 74, 95, 250, 246, 166, 104, 40,
                    151, 228, 42, 212, 194, 8, 48, 56, 232, 147, 61, 9, 41,
                    204, 88, 234, 56, 134])
    execution_root = b"\x00" * 32
    execution_branch = [b"\x00" * 32] * spec.execution_state_root_depth
    body_root = mock_root(execution_root, execution_branch,
                          spec.execution_state_root_index)
    finalized = BeaconBlockHeader(body_root=body_root)
    finality_branch = [b"\x00" * 32] * spec.finalized_header_depth
    attested_state = mock_root(finalized.hash_tree_root(), finality_branch,
                               spec.finalized_header_index)
    attested = BeaconBlockHeader(state_root=attested_state)
    signing_root = compute_signing_root(attested.hash_tree_root(), domain)

    sks = [int.from_bytes(_hl.sha256(b"spectre-tpu-sk-%d" % i).digest(),
                          "little") % BLS12_381_FR
           for i in range(spec.sync_committee_size)]
    msg = hash_to_g2(signing_root, spec.dst)
    agg_sig = None
    for sk in sks:
        agg_sig = bls_g2_host.add(agg_sig, bls_g2_host.mul(msg, sk))
    pubkeys = [g1_to_uncompressed(CH.bls_g1.mul(CH.bls_g1.gen, sk))
               for sk in sks]

    return SyncStepArgs(
        signature_compressed=g2_compress(agg_sig),
        pubkeys_uncompressed=pubkeys,
        pariticipation_bits=[True] * spec.sync_committee_size,
        attested_header=attested,
        finalized_header=finalized,
        finality_branch=finality_branch,
        execution_payload_root=execution_root,
        execution_payload_branch=execution_branch,
        domain=domain,
        spec=spec,
    )


def sync_step_instances(args: SyncStepArgs, limb_bits: int = LIMB_BITS) -> list:
    """Native mirror of StepCircuit::get_instances (sync_step_circuit.rs:228-276).

    Returns one instance column: [sha256-commitment truncated to 253 bits,
    poseidon committee commitment], as python ints (BN254 Fr canonical).
    """
    inp = bytearray(8 * 3 + 32 * 2)
    inp[0:8] = int(args.attested_header.slot).to_bytes(8, "little")
    inp[8:16] = int(args.finalized_header.slot).to_bytes(8, "little")
    participation = sum(1 for b in args.pariticipation_bits if b)
    inp[16:24] = participation.to_bytes(8, "little")
    inp[24:56] = args.finalized_header.hash_tree_root()
    inp[56:88] = bytes(args.execution_payload_root)

    commitment = bytearray(sha256(bytes(inp)))
    commitment[31] &= 0b0001_1111  # truncate to 253 bits

    poseidon_commitment = poseidon_committee_commitment_from_uncompressed(
        args.pubkeys_uncompressed, limb_bits)

    return [[int.from_bytes(bytes(commitment), "little"), poseidon_commitment]]
