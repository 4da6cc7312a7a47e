"""Synthetic fixture generator — the unit_test_gen analog
(preprocessor/src/unit_test_gen.rs): builds a committee from deterministic
private keys, signs the attested header with host BLS, and emits
sync_step / rotation witness JSONs plus the private keys and compressed
committee file (test_data format parity)."""
from __future__ import annotations

import hashlib
import json
import os

from ..specs import Spec, TESTNET
from .. import ssz
from ..curves import host as CH
from ..curves.hash_to_curve import hash_to_g2
from ..curves.host import (bls_g1, bls_g2_host, g1_compress,
                           g1_to_uncompressed, g2_compress)
from ..fields.params import BLS12_381_FR
from .step import SyncStepArgs
from .rotation import CommitteeUpdateArgs


def deterministic_keys(n: int, seed: bytes = b"spectre-tpu-fixture"):
    return [int.from_bytes(hashlib.sha256(seed + b"-%d" % i).digest(),
                           "little") % BLS12_381_FR for i in range(n)]


def generate_fixtures(out_dir: str, spec: Spec = TESTNET,
                      seed: bytes = b"spectre-tpu-fixture"):
    n = spec.sync_committee_size
    sks = deterministic_keys(n, seed)
    pts = [bls_g1.mul(bls_g1.gen, sk) for sk in sks]
    pubkeys_compressed = [g1_compress(p) for p in pts]
    pubkeys_uncompressed = [g1_to_uncompressed(p) for p in pts]

    # ---- rotation witness: committee proven into a forged state root ----
    pk_root = ssz.sync_committee_pubkeys_root(pubkeys_compressed)
    branch = [hashlib.sha256(seed + b"-branch-%d" % i).digest()
              for i in range(spec.sync_committee_pubkeys_depth)]
    state_root = ssz.mock_root(pk_root, branch,
                               spec.sync_committee_pubkeys_root_index)
    finalized_rot = ssz.BeaconBlockHeader(slot=32, state_root=state_root)
    rotation = CommitteeUpdateArgs(
        pubkeys_compressed=pubkeys_compressed,
        finalized_header=finalized_rot,
        sync_committee_branch=branch,
        spec=spec,
    )

    # ---- step witness: signed attested header over mock branches ----
    domain = bytes([7, 0, 0, 0]) + hashlib.sha256(seed + b"-domain").digest()[:28]
    execution_root = hashlib.sha256(seed + b"-exec").digest()
    execution_branch = [hashlib.sha256(seed + b"-eb-%d" % i).digest()
                        for i in range(spec.execution_state_root_depth)]
    body_root = ssz.mock_root(execution_root, execution_branch,
                              spec.execution_state_root_index)
    finalized = ssz.BeaconBlockHeader(slot=32, body_root=body_root)
    finality_branch = [hashlib.sha256(seed + b"-fb-%d" % i).digest()
                       for i in range(spec.finalized_header_depth)]
    attested_state = ssz.mock_root(finalized.hash_tree_root(),
                                   finality_branch,
                                   spec.finalized_header_index)
    attested = ssz.BeaconBlockHeader(slot=64, state_root=attested_state)
    signing_root = ssz.compute_signing_root(attested.hash_tree_root(), domain)
    msg = hash_to_g2(signing_root, spec.dst)
    agg = None
    for sk in sks:
        agg = bls_g2_host.add(agg, bls_g2_host.mul(msg, sk))
    step = SyncStepArgs(
        signature_compressed=g2_compress(agg),
        pubkeys_uncompressed=pubkeys_uncompressed,
        pariticipation_bits=[True] * n,
        attested_header=attested,
        finalized_header=finalized,
        finality_branch=finality_branch,
        execution_payload_root=execution_root,
        execution_payload_branch=execution_branch,
        domain=domain,
        spec=spec,
    )

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"sync_step_{n}.json"), "w") as f:
        json.dump(step.to_json(), f)
    with open(os.path.join(out_dir, f"rotation_{n}.json"), "w") as f:
        json.dump(rotation.to_json(), f)
    with open(os.path.join(out_dir, f"committee_pubkeys_{n}.json"), "w") as f:
        json.dump([list(pk) for pk in pubkeys_compressed], f)
    with open(os.path.join(out_dir, "private_keys.json"), "w") as f:
        json.dump([hex(sk) for sk in sks], f)
    return step, rotation
