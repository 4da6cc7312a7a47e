"""CommitteeUpdateCircuit — the application circuit mapping a sync
committee's SSZ root (proven into the finalized state root) to the Poseidon
commitment of its pubkeys.

Re-designs committee_update_circuit.rs:50-124 on the spectre_tpu stack:
  * decode_pubkeys_x (:129-174): byte-reverse, clear the 3 flag bits,
    fold the X coordinate directly into two field limbs (26+22 LE bytes),
    extract the y-sign bit;
  * sync_committee_root_ssz (:176-194): hash each 64-byte-padded pubkey,
    merkleize;
  * in-circuit finalized-header hash_tree_root + merkle branch check;
  * instances [poseidon_commitment, root_lo, root_hi] matching
    get_instances (:198-222) — parity asserted against
    witness.rotation.committee_update_instances.
"""
from __future__ import annotations

from typing import List

from ..specs import Spec, TESTNET
from ..witness.rotation import CommitteeUpdateArgs
from .builder import CircuitBuilder, Context, AssignedValue
from .app import AppCircuit
from .sha256_gadget import Sha256Chip
from .ssz_merkle import ssz_merkleize_chunks, verify_merkle_proof
from .poseidon_gadget import g1_array_poseidon_gadget

FOLD_LO_BYTES = 26  # (LIMB_BITS/8)*2 with LIMB_BITS=104
SIGN_PACK = 252     # Fr::CAPACITY - 1

U8_TABLE = "u8"


def _register_u8(b: CircuitBuilder):
    if U8_TABLE not in b.tables:
        b.add_table(U8_TABLE, [list(range(256))])


def _bytes_to_cells(b: CircuitBuilder, data: bytes) -> List[AssignedValue]:
    """Assign input bytes AND range-constrain each to [0, 256).

    Without the per-byte constraint a malicious witness can shift value
    between adjacent bytes inside a SHA word (digest_bytes_cells only binds
    the mod-r 4-byte recombination) while the Poseidon 26/22-byte fold
    regroups the same cells differently — breaking the root↔commitment
    binding (round-1 advisor finding; ref SHA chips byte-constrain inputs)."""
    ctx = b.main()
    cells = ctx.assign_many(list(data))
    for c in cells:
        ctx.pin_table(U8_TABLE, [c])
    return cells


def _u64_chunk_cells(b: CircuitBuilder, value: int) -> List[AssignedValue]:
    ctx = b.main()
    le = int(value).to_bytes(8, "little")
    return _bytes_to_cells(b, le) + [ctx.load_constant(0)] * 24


class CommitteeUpdateCircuit(AppCircuit):
    @classmethod
    def default_witness(cls, spec: Spec):
        return CommitteeUpdateArgs.default(spec)

    @classmethod
    def build(cls, witness: CommitteeUpdateArgs, spec: Spec) -> CircuitBuilder:
        b = CircuitBuilder()
        chip = Sha256Chip(b)
        _register_u8(b)
        ctx = b.main()

        # ---- assign pubkeys, decode X + y sign ----
        pk_cells: List[List[AssignedValue]] = []
        x_pairs: List[List[AssignedValue]] = []
        y_signs: List[AssignedValue] = []
        for pk in witness.pubkeys_compressed:
            cells = _bytes_to_cells(b, bytes(pk))  # BE bytes
            pk_cells.append(cells)
            le = list(reversed(cells))
            masked = le[47]
            bits = ctx.num_to_bits(masked, 8)
            cleared = ctx.bits_to_num(bits[:5])
            y_signs.append(bits[5])
            le_cleared = le[:47] + [cleared]
            lo = ctx.inner_product(
                le_cleared[:FOLD_LO_BYTES],
                [1 << (8 * i) for i in range(FOLD_LO_BYTES)])
            hi = ctx.inner_product(
                le_cleared[FOLD_LO_BYTES:],
                [1 << (8 * i) for i in range(48 - FOLD_LO_BYTES)])
            x_pairs.append([lo, hi])

        # ---- poseidon commitment ----
        packed = []
        for off in range(0, len(y_signs), SIGN_PACK):
            chunk = y_signs[off:off + SIGN_PACK]
            packed.append(ctx.bits_to_num(chunk))
        poseidon_commit = g1_array_poseidon_gadget(ctx, x_pairs, packed)

        # ---- committee SSZ root ----
        zero = ctx.load_constant(0)
        leaves = []
        for cells in pk_cells:
            padded = cells + [zero] * 16
            leaves.append(chip.digest_bytes_cells(padded))
        committee_root = ssz_merkleize_chunks(chip, ctx, leaves)

        # ---- finalized header root ----
        h = witness.finalized_header
        state_root_cells = _bytes_to_cells(b, bytes(h.state_root))
        header_chunks = [
            _u64_chunk_cells(b, h.slot),
            _u64_chunk_cells(b, h.proposer_index),
            _bytes_to_cells(b, bytes(h.parent_root)),
            state_root_cells,
            _bytes_to_cells(b, bytes(h.body_root)),
        ]
        header_root = ssz_merkleize_chunks(chip, ctx, header_chunks)

        # ---- committee root proven into the finalized state root ----
        branch = [_bytes_to_cells(b, bytes(n))
                  for n in witness.sync_committee_branch]
        verify_merkle_proof(chip, ctx, committee_root, branch,
                            spec.sync_committee_pubkeys_root_index,
                            state_root_cells)

        # ---- public inputs: [poseidon, root_lo(u128), root_hi(u128)] ----
        root_lo = ctx.inner_product(
            list(reversed(header_root[16:32])),
            [1 << (8 * i) for i in range(16)])
        root_hi = ctx.inner_product(
            list(reversed(header_root[0:16])),
            [1 << (8 * i) for i in range(16)])
        b.expose_public(poseidon_commit)
        b.expose_public(root_lo)
        b.expose_public(root_hi)
        return b
