"""StepCircuit — the flagship sync-step circuit.

Re-designs sync_step_circuit.rs:64-224 on the spectre_tpu stack:
  * per-validator uncompressed pubkey load + curve check + participation-
    bit-conditional aggregation (:292-364);
  * Poseidon committee commitment over the same byte cells (:105-110);
  * SSZ roots of the attested/finalized headers (:121-152);
  * signing root = H(header_root ‖ domain) (:154-160);
  * in-circuit hash-to-G2 of the signing root (:165-169);
  * BLS aggregate-signature pairing check (:171 assert_valid_signature);
  * finality (depth-6) and execution-payload (depth-4) merkle proofs
    (:174-195);
  * public-input commitment: SHA-256 over slots ‖ participation ‖ roots,
    truncated to 253 bits (:199-221, truncate_sha256_into_single_elem
    :368-388) — parity with witness.step.sync_step_instances.

Instances: [pub_inputs_commitment, poseidon_committee_commitment].
"""
from __future__ import annotations

from typing import List

from ..specs import Spec
from ..fields.params import BLS12_381_FQ as FQ, BLS12_381_G1_GEN
from ..witness.step import SyncStepArgs
from .builder import CircuitBuilder, Context, AssignedValue
from .app import AppCircuit
from .range_chip import RangeChip
from .bigint import FpChip, CrtInt
from .fp2 import Fp2Chip
from .ecc import EccChip, EcPoint
from .pairing_gadget import PairingChip
from .h2c_gadget import HashToCurveChip
from .sha256_gadget import Sha256Chip
from .ssz_merkle import ssz_merkleize_chunks, verify_merkle_proof
from .poseidon_gadget import g1_array_poseidon_gadget

FOLD_LO_BYTES = 26  # (LIMB_BITS/8)*2 with LIMB_BITS=104 (poseidon fold)
SIGN_PACK = 252     # Fr::CAPACITY - 1

U8_TABLE = "u8"


def _register_u8(b: CircuitBuilder):
    if U8_TABLE not in b.tables:
        b.add_table(U8_TABLE, [list(range(256))])


def _bytes_to_cells(b: CircuitBuilder, data: bytes) -> List[AssignedValue]:
    ctx = b.main()
    cells = ctx.assign_many(list(data))
    for c in cells:
        ctx.pin_table(U8_TABLE, [c])
    return cells


def _u64_chunk_cells(b: CircuitBuilder, value: int) -> List[AssignedValue]:
    ctx = b.main()
    le = int(value).to_bytes(8, "little")
    return _bytes_to_cells(b, le) + [ctx.load_constant(0)] * 24


def _crt_from_le_bytes(fp: FpChip, ctx: Context,
                       le_bytes: List[AssignedValue]) -> CrtInt:
    """48 LE byte cells -> CrtInt (13 bytes per 104-bit limb); the bytes
    are already u8-range-constrained, so limb bounds follow."""
    limbs, lvals = [], []
    for i in range(fp.n_limbs):
        chunk = le_bytes[13 * i:13 * (i + 1)]
        if chunk:
            limbs.append(ctx.inner_product(
                chunk, [1 << (8 * j) for j in range(len(chunk))]))
            lvals.append(sum(int(c.value) << (8 * j)
                             for j, c in enumerate(chunk)))
        else:
            limbs.append(ctx.load_zero())
            lvals.append(0)
    return CrtInt(limbs, lvals,
                  ctx.inner_product(limbs, fp._pow_B[:fp.n_limbs]),
                  fp.B - 1)


def _y_sign_bit(fp: FpChip, ctx: Context, y: CrtInt) -> AssignedValue:
    """sign = (2y > q) for canonical y (poseidon.rs:147-163 semantics):
    witness s ∈ {0,1} and z ≥ 0 with the exact integer identity
        z = s·(y − (q+1)/2) + (1−s)·((q−1)/2 − y).
    """
    q = fp.p
    c0 = (q - 1) // 2
    yv = fp.value_of(y) % q
    s_val = 1 if 2 * yv > q else 0
    s = ctx.assign(s_val)
    ctx.assert_bit(s)
    z_val = (yv - (q + 1) // 2) if s_val else (c0 - yv)
    assert z_val >= 0
    z = fp.load(z_val)
    c0_limbs = fp._int_limbs(c0)
    q_limbs = fp.p_limbs
    # rhs_i = 2·(s·y_i) − y_i + c0_i − s·q_i ; exact carry chain rhs − z = 0
    carry_av = None
    carry_val = 0
    B = fp.B
    for i in range(fp.n_limbs):
        w = ctx.mul(s, y.limbs[i])
        acc = ctx.sub(ctx.mul_const(w, 2), y.limbs[i])
        acc = ctx.add_const(acc, c0_limbs[i])
        acc = ctx.sub(acc, ctx.mul_const(s, q_limbs[i]))
        acc = ctx.sub(acc, z.limbs[i])
        if carry_av is not None:
            acc = ctx.add(acc, carry_av)
        v_int = (2 * s_val * y.limb_vals[i] - y.limb_vals[i] + c0_limbs[i]
                 - s_val * q_limbs[i] - z.limb_vals[i] + carry_val)
        if i == fp.n_limbs - 1:
            assert v_int == 0
            ctx.constrain_constant(acc, 0)
            break
        assert v_int % B == 0
        carry_val = v_int // B
        c = ctx.assign(carry_val)  # assign reduces mod r; carries in {-3..3}
        ctx.constrain_constant(ctx.sub(acc, ctx.mul_const(c, B)), 0)
        shifted = ctx.add_const(c, 4)
        fp.range.range_check(ctx, shifted, 3)
        carry_av = c
    return s


class StepCircuit(AppCircuit):
    @classmethod
    def default_witness(cls, spec: Spec):
        from ..witness.step import default_sync_step_args
        return default_sync_step_args(spec)

    @classmethod
    def build(cls, witness: SyncStepArgs, spec: Spec) -> CircuitBuilder:
        b = CircuitBuilder(lookup_bits=13)
        rc = RangeChip(b, 13)
        fp = FpChip(b, rc, FQ)
        f2 = Fp2Chip(fp)
        ecc1 = EccChip(fp, 4)
        ecc2 = EccChip(f2, (4, 4))
        sha = Sha256Chip(b)
        _register_u8(b)
        pairing = PairingChip(fp)
        h2c = HashToCurveChip(b, sha, fp)
        ctx = b.main()

        # ---- pubkeys: load, curve check, decompose for poseidon ----
        points: List[EcPoint] = []
        bits: List[AssignedValue] = []
        x_pairs: List[List[AssignedValue]] = []
        y_signs: List[AssignedValue] = []
        for pk_bytes, part in zip(witness.pubkeys_uncompressed,
                                  witness.pariticipation_bits):
            cells = _bytes_to_cells(b, bytes(pk_bytes))   # 96 BE bytes
            x_le = list(reversed(cells[:48]))
            y_le = list(reversed(cells[48:]))
            x = _crt_from_le_bytes(fp, ctx, x_le)
            y = _crt_from_le_bytes(fp, ctx, y_le)
            pt = EcPoint(x, y)
            ecc1.assert_on_curve(pt)
            fp.enforce_canonical(x)
            fp.enforce_canonical(y)
            points.append(pt)
            bit = ctx.assign(1 if part else 0)
            ctx.assert_bit(bit)
            bits.append(bit)
            # poseidon fold of the same x byte cells
            lo = ctx.inner_product(
                x_le[:FOLD_LO_BYTES],
                [1 << (8 * i) for i in range(FOLD_LO_BYTES)])
            hi = ctx.inner_product(
                x_le[FOLD_LO_BYTES:],
                [1 << (8 * i) for i in range(48 - FOLD_LO_BYTES)])
            x_pairs.append([lo, hi])
            y_signs.append(_y_sign_bit(fp, ctx, y))

        # ---- aggregate with participation bits (G-offset trick) ----
        gen = ecc1.const_point(BLS12_381_G1_GEN)
        acc = ecc1.sum_with_selectors(points, bits, gen)
        neg_gen = ecc1.const_point((BLS12_381_G1_GEN[0],
                                    (-BLS12_381_G1_GEN[1]) % FQ))
        agg_pk = ecc1.add_unequal(acc, neg_gen)

        participation = ctx.inner_product(bits, [1] * len(bits))

        # ---- poseidon commitment ----
        packed = []
        for off in range(0, len(y_signs), SIGN_PACK):
            chunk = y_signs[off:off + SIGN_PACK]
            packed.append(ctx.bits_to_num(chunk))
        poseidon_commit = g1_array_poseidon_gadget(ctx, x_pairs, packed)

        # ---- header roots ----
        def header_chunks(h):
            return [
                _u64_chunk_cells(b, h.slot),
                _u64_chunk_cells(b, h.proposer_index),
                _bytes_to_cells(b, bytes(h.parent_root)),
                _bytes_to_cells(b, bytes(h.state_root)),
                _bytes_to_cells(b, bytes(h.body_root)),
            ]

        att_chunks = header_chunks(witness.attested_header)
        attested_root = ssz_merkleize_chunks(sha, ctx, att_chunks)
        fin_chunks = header_chunks(witness.finalized_header)
        finalized_root = ssz_merkleize_chunks(sha, ctx, fin_chunks)

        # ---- signing root + BLS verification ----
        domain_cells = _bytes_to_cells(b, bytes(witness.domain))
        signing_root = sha.digest_bytes_cells(attested_root + domain_cells)
        msghash = h2c.hash_to_g2(signing_root, spec.dst)

        from ..curves.host import g2_decompress
        sig_pt = g2_decompress(bytes(witness.signature_compressed))
        sig = ecc2.load_point(sig_pt)
        ecc2.assert_on_curve(sig)
        pairing.assert_valid_signature(ecc1, ecc2, agg_pk, msghash, sig)

        # ---- merkle proofs ----
        fin_branch = [_bytes_to_cells(b, bytes(n))
                      for n in witness.finality_branch]
        verify_merkle_proof(sha, ctx, finalized_root, fin_branch,
                            spec.finalized_header_index,
                            att_chunks[3][:32])
        exec_root = _bytes_to_cells(b, bytes(witness.execution_payload_root))
        exec_branch = [_bytes_to_cells(b, bytes(n))
                       for n in witness.execution_payload_branch]
        verify_merkle_proof(sha, ctx, exec_root, exec_branch,
                            spec.execution_state_root_index,
                            fin_chunks[4][:32])

        # ---- public input commitment ----
        part_le = int(sum(1 for x in witness.pariticipation_bits if x)
                      ).to_bytes(8, "little")
        part_cells = _bytes_to_cells(b, part_le)
        recomb = ctx.inner_product(
            part_cells, [1 << (8 * i) for i in range(8)])
        ctx.constrain_equal(recomb, participation)

        inp = (att_chunks[0][:8] + fin_chunks[0][:8] + part_cells
               + finalized_root + exec_root)
        commitment = sha.digest_bytes_cells(inp)
        # truncate to 253 bits (byte 31 &= 0b0001_1111), then interpret the
        # digest array little-endian: byte i has weight 256^i
        last_bits = ctx.num_to_bits(commitment[31], 8)
        last_masked = ctx.bits_to_num(last_bits[:5])
        pub_commit = ctx.inner_product(
            commitment[:31] + [last_masked],
            [1 << (8 * i) for i in range(32)])

        b.expose_public(pub_commit)
        b.expose_public(poseidon_commit)
        return b
