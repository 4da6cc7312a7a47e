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

All hashing runs on the wide (row-parallel) SHA-256 region — the
reference's Sha256ChipWide choice for exactly this circuit
(committee_update_circuit.rs:59, sha256_wide.rs:36-112): digests chain
between merkle levels as u32 WORD cells, so the ~1.5k compression blocks
cost 72 rows each instead of ~84k generic builder cells.
"""
from __future__ import annotations

from typing import List

from ..specs import Spec, TESTNET
from ..witness.rotation import CommitteeUpdateArgs
from .builder import CircuitBuilder, Context, AssignedValue
from .app import AppCircuit
from .sha256_wide import ShaWideChip
from .ssz_merkle import ssz_merkleize_words, verify_merkle_proof_words
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


def _chunk_words(ctx: Context, data: bytes) -> List:
    """32-byte witness chunk -> 8 BE u32 word cells (trailing all-zero
    words stay int constants). Word cells need no standalone range check:
    every use copies them into the wide region's schedule, whose w16 gate
    binds them to a boolean-constrained 32-bit decomposition."""
    words = [int.from_bytes(data[4 * i:4 * i + 4], "big") for i in range(8)]
    nz = 8
    while nz > 0 and words[nz - 1] == 0:
        nz -= 1
    return ctx.assign_many(words[:nz]) + [0] * (8 - nz)


def _u64_chunk_words(ctx: Context, value: int) -> List:
    return _chunk_words(ctx, int(value).to_bytes(8, "little") + b"\x00" * 24)


class CommitteeUpdateCircuit(AppCircuit):
    @classmethod
    def default_witness(cls, spec: Spec):
        return CommitteeUpdateArgs.default(spec)

    # SHA backend: "wide" (row-parallel dedicated region, ~123 columns —
    # fastest direct prove) or "flex" (spread-lookup in the main gate —
    # trades rows for columns; see CommitteeUpdateCircuitThin)
    SHA_BACKEND = "wide"

    @classmethod
    def build(cls, witness: CommitteeUpdateArgs, spec: Spec) -> CircuitBuilder:
        b = CircuitBuilder()
        if cls.SHA_BACKEND == "flex":
            from .sha256_gadget import ShaFlexWordChip
            chip = ShaFlexWordChip(b)
        else:
            chip = ShaWideChip(b)
        _register_u8(b)
        ctx = b.main()

        # ---- assign pubkeys, decode X + y sign ----
        # Pubkey BYTE cells are u8-pinned because the same cells are
        # regrouped two ways (SHA 4-byte words vs the Poseidon 26/22-byte
        # fold) — without the range pin value could shift between bytes
        # (round-1 advisor finding).
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

        # ---- committee SSZ root (wide engine, word-level chaining) ----
        leaves = [chip.digest_words_of_bytes(cells + [0] * 16)
                  for cells in pk_cells]
        committee_root = ssz_merkleize_words(chip, leaves)

        # ---- finalized header root ----
        h = witness.finalized_header
        # state_root words all as cells: they double as the merkle-proof
        # target, which equality-constrains each word cell.
        state_words = ctx.assign_many(
            [int.from_bytes(bytes(h.state_root)[4 * i:4 * i + 4], "big")
             for i in range(8)])
        header_chunks = [
            _u64_chunk_words(ctx, h.slot),
            _u64_chunk_words(ctx, h.proposer_index),
            _chunk_words(ctx, bytes(h.parent_root)),
            state_words,
            _chunk_words(ctx, bytes(h.body_root)),
        ]
        header_root = ssz_merkleize_words(chip, header_chunks)

        # ---- committee root proven into the finalized state root ----
        branch = [_chunk_words(ctx, bytes(n))
                  for n in witness.sync_committee_branch]
        verify_merkle_proof_words(chip, ctx, committee_root, branch,
                                  spec.sync_committee_pubkeys_root_index,
                                  state_words)

        # ---- public inputs: [poseidon, root_lo(u128), root_hi(u128)] ----
        w128 = [1 << 96, 1 << 64, 1 << 32, 1]
        root_lo = ctx.inner_product(list(header_root[4:8]), w128)
        root_hi = ctx.inner_product(list(header_root[0:4]), w128)
        b.expose_public(poseidon_commit)
        b.expose_public(root_lo)
        b.expose_public(root_hi)
        return b


class CommitteeUpdateCircuitThin(CommitteeUpdateCircuit):
    """Thin-layout committee circuit: identical statement and instances,
    but all hashing runs on the spread-lookup SHA chip inside the main
    gate instead of the 123-column wide region.

    Purpose: the aggregation (compression) inner. The in-circuit SHPLONK
    verifier pays ~280k cells per inner-VK polynomial, so a wide inner
    (~170 polys at nano) costs ~47M aggregation cells; the thin variant
    collapses the inner VK to tens of polys (the reference's aggregated
    circuits are likewise few-column at high k,
    config/committee_update_verifier_*.json)."""
    SHA_BACKEND = "flex"
