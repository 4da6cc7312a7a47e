"""Contract integration tests — the contract-tests crate analog
(contract-tests/tests/spectre.rs, step_input_encoding.rs), with
evm/interp.World standing in for anvil and mock_verifier() for
MockVerifier.sol.

Covers: deployment, the full first-step flow with post-state assertions
(spectre.rs:34-84), Solidity/Python public-input-commitment equivalence
over the golden witness (step_input_encoding.rs:53-78), rotate gating on a
recorded header root, and rejection paths (bad participation, missing
poseidon, failing verifier)."""
import pytest

from spectre_tpu.evm.interp import World
from spectre_tpu.evm.contracts import (
    deploy_spectre, mock_verifier, step_external_contract,
    encode_step_call, encode_rotate_call, encode_view_call,
    SEL_HEAD, SEL_HEADER_ROOTS, SEL_EXEC_ROOTS, SEL_POSEIDONS,
    SEL_TO_COMMITMENT, selector)
from spectre_tpu.evm.asm import Asm
from spectre_tpu.specs import TESTNET
from spectre_tpu.witness.step import SyncStepArgs, sync_step_instances

SLOTS_PER_PERIOD = 64          # minimal spec: 8 epochs * 8 slots
FINALITY_THRESHOLD = 20


@pytest.fixture(scope="module")
def golden():
    args = SyncStepArgs.from_file(
        "/root/reference/test_data/sync_step_512.json", TESTNET)
    return args, sync_step_instances(args)


def step_input_of(args):
    participation = sum(1 for b in args.pariticipation_bits if b)
    return dict(
        attested_slot=int(args.attested_header.slot),
        finalized_slot=int(args.finalized_header.slot),
        participation=participation,
        finalized_header_root=args.finalized_header.hash_tree_root(),
        execution_payload_root=bytes(args.execution_payload_root),
    )


def deploy(world, initial_period, initial_poseidon,
           step_code=None, upd_code=None):
    return deploy_spectre(
        world,
        step_verifier_code=step_code or mock_verifier(),
        update_verifier_code=upd_code or mock_verifier(),
        initial_sync_period=initial_period,
        initial_poseidon=initial_poseidon,
        slots_per_period=SLOTS_PER_PERIOD,
        finality_threshold=FINALITY_THRESHOLD)


def view(world, addr, sel, arg=None) -> int:
    r = world.call(addr, encode_view_call(sel, arg))
    assert r.success, r.error
    return int.from_bytes(r.returndata, "big")


def test_deploy_and_initial_state(golden):
    args, inst = golden
    world = World()
    period = step_input_of(args)["attested_slot"] // SLOTS_PER_PERIOD
    spectre = deploy(world, period, inst[0][1])
    assert view(world, spectre, SEL_HEAD) == 0
    assert view(world, spectre, SEL_POSEIDONS, period) == inst[0][1]


def test_first_step_updates_state(golden):
    """spectre.rs:34-84: step() with the golden witness against mock
    verifiers; head/blockHeaderRoots/executionPayloadRoots post-state."""
    args, inst = golden
    si = step_input_of(args)
    world = World()
    period = si["attested_slot"] // SLOTS_PER_PERIOD
    spectre = deploy(world, period, inst[0][1])

    r = world.call(spectre, encode_step_call(proof=b"\x00" * 384, **si))
    assert r.success, r.error

    head = view(world, spectre, SEL_HEAD)
    assert head == si["finalized_slot"]
    assert view(world, spectre, SEL_HEADER_ROOTS, head) == int.from_bytes(
        si["finalized_header_root"], "big")
    assert view(world, spectre, SEL_EXEC_ROOTS, head) == int.from_bytes(
        si["execution_payload_root"], "big")


def test_step_advances_head_monotonically(golden):
    """Synthetic nonzero slots (the golden fixture's finalized slot is 0):
    head advances to finalized_slot, and a later step with an older
    finalized slot does not move head backwards."""
    args, inst = golden
    world = World()
    spectre = deploy(world, 5000 // SLOTS_PER_PERIOD, inst[0][1])
    si = dict(attested_slot=5000, finalized_slot=4900, participation=30,
              finalized_header_root=b"\x11" * 32,
              execution_payload_root=b"\x22" * 32)
    assert world.call(
        spectre, encode_step_call(proof=b"", **si)).success
    assert view(world, spectre, SEL_HEAD) == 4900
    older = dict(si, attested_slot=5003, finalized_slot=4800,
                 finalized_header_root=b"\x33" * 32)
    assert world.call(
        spectre, encode_step_call(proof=b"", **older)).success
    assert view(world, spectre, SEL_HEAD) == 4900           # unchanged
    assert view(world, spectre, SEL_HEADER_ROOTS, 4800) == int.from_bytes(
        b"\x33" * 32, "big")                                # still recorded


def test_step_rejections(golden):
    args, inst = golden
    si = step_input_of(args)
    world = World()
    period = si["attested_slot"] // SLOTS_PER_PERIOD
    # missing poseidon for the period -> revert
    spectre = deploy(world, period + 7, inst[0][1])
    assert not world.call(
        spectre, encode_step_call(proof=b"", **si)).success
    # participation below threshold -> revert
    spectre2 = deploy(world, period, inst[0][1])
    low = dict(si, participation=FINALITY_THRESHOLD - 1)
    assert not world.call(
        spectre2, encode_step_call(proof=b"", **low)).success
    # verifier returning 0 -> revert, no state change
    zero = Asm()
    zero.push(0).push(0).op("MSTORE")
    zero.push(32).push(0).op("RETURN")
    spectre3 = deploy(world, period, inst[0][1],
                      step_code=zero.assemble())
    assert not world.call(
        spectre3, encode_step_call(proof=b"", **si)).success
    assert view(world, spectre3, SEL_HEAD) == 0


def test_rotate_requires_recorded_header_then_rotates(golden):
    args, inst = golden
    si = step_input_of(args)
    world = World()
    period = si["attested_slot"] // SLOTS_PER_PERIOD
    spectre = deploy(world, period, inst[0][1])

    next_poseidon = 0x1234567
    # before any step: no recorded header root -> revert
    r = world.call(spectre, encode_rotate_call(
        si["finalized_slot"], next_poseidon, b""))
    assert not r.success

    assert world.call(
        spectre, encode_step_call(proof=b"", **si)).success
    r = world.call(spectre, encode_rotate_call(
        si["finalized_slot"], next_poseidon, b""))
    assert r.success, r.error
    fin_period = si["finalized_slot"] // SLOTS_PER_PERIOD
    assert view(world, spectre, SEL_POSEIDONS,
                fin_period + 1) == next_poseidon


def test_commitment_evm_equivalence(golden):
    """step_input_encoding.rs:53-78: the on-chain recomputation equals
    StepCircuit.get_instances()[0][0] for the golden witness."""
    args, inst = golden
    si = step_input_of(args)
    world = World()
    ext = world.deploy(0xE47, step_external_contract())
    cd = (SEL_TO_COMMITMENT.to_bytes(4, "big")
          + si["attested_slot"].to_bytes(32, "big")
          + si["finalized_slot"].to_bytes(32, "big")
          + si["participation"].to_bytes(32, "big")
          + si["finalized_header_root"]
          + si["execution_payload_root"])
    r = world.call(ext, cd)
    assert r.success, r.error
    assert int.from_bytes(r.returndata, "big") == inst[0][0]
