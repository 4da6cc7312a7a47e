"""Spectre light-client contracts as directly-emitted EVM bytecode.

The reference keeps Spectre.sol in a contracts submodule (not checked out;
behavior observed through contract-tests/tests/spectre.rs:34-117 and
step_input_encoding.rs:17-78): the contract stores `head`,
`blockHeaderRoots[slot]`, `executionPayloadRoots[slot]`,
`syncCommitteePoseidons[period]`, recomputes the step public-input
commitment on-chain from a StepInput struct, and gates state updates on a
SNARK verifier contract. This module emits the same state machine with our
assembler, runnable in evm/interp.World — the anvil/revm stand-in.

Storage layout (Solidity-convention mapping slots keccak256(key ‖ slot)):
  0 head | 1 slotsPerPeriod | 2 finalityThreshold
  3 stepVerifier address | 4 updateVerifier address
  5 blockHeaderRoots | 6 executionPayloadRoots | 7 syncCommitteePoseidons

ABI (selectors keccak-derived exactly as solc would):
  head() / blockHeaderRoots(uint256) / executionPayloadRoots(uint256) /
  syncCommitteePoseidons(uint256)
  step((uint64,uint64,uint64,bytes32,bytes32),bytes)   — StepInput, proof
  rotate(uint64,uint256,bytes)  — finalizedSlot, nextPoseidon, proof
    (the submodule's RotateInput is not observable; this binding passes the
     finalized slot whose header root a prior step recorded, matching the
     committee-update instance layout [poseidon, root_lo, root_hi])

Verifier call convention: raw [instances ‖ proof] calldata — the layout of
evm/calldata.encode_calldata and the generated verifiers.
"""
from __future__ import annotations

from ..hashes.keccak import keccak256
from .asm import Asm

SLOT_HEAD = 0
SLOT_SLOTS_PER_PERIOD = 1
SLOT_THRESHOLD = 2
SLOT_STEP_VERIFIER = 3
SLOT_UPDATE_VERIFIER = 4
MAP_HEADER_ROOTS = 5
MAP_EXEC_ROOTS = 6
MAP_POSEIDONS = 7


def selector(sig: str) -> int:
    return int.from_bytes(keccak256(sig.encode())[:4], "big")


SEL_HEAD = selector("head()")
SEL_HEADER_ROOTS = selector("blockHeaderRoots(uint256)")
SEL_EXEC_ROOTS = selector("executionPayloadRoots(uint256)")
SEL_POSEIDONS = selector("syncCommitteePoseidons(uint256)")
SEL_STEP = selector("step((uint64,uint64,uint64,bytes32,bytes32),bytes)")
SEL_ROTATE = selector("rotate(uint64,uint256,bytes)")


def map_slot(key: int, base_slot: int) -> int:
    """Solidity mapping storage slot for a uint256 key."""
    return int.from_bytes(
        keccak256(int(key).to_bytes(32, "big")
                  + int(base_slot).to_bytes(32, "big")), "big")


def mock_verifier() -> bytes:
    """MockVerifier.sol analog: accept anything, return uint256(1)."""
    a = Asm()
    a.push(1).push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    return a.assemble()


# scratch memory map inside step/rotate
_BUF = 0x80        # 88-byte sha256 input buffer
_DIG = 0x100       # sha256 digest
_REV = 0x140       # byte-reversed digest
_MAP = 0x180       # mapping-slot scratch (64 bytes)
_L_COMMIT = 0x1C0  # locals
_L_POSE = 0x1E0
_L_LEN = 0x200
_L_FIN = 0x220
_L_ROOT = 0x240
_VCD = 0x300       # verifier calldata buffer


def _store_u64_le(a: Asm, cd_off: int, mem_off: int):
    """mem[mem_off:+8] = LE bytes of the uint64 at calldata[cd_off]."""
    for i in range(8):
        a.push(cd_off).op("CALLDATALOAD")
        a.push(8 * i).op("SHR")
        a.push(0xFF).op("AND")
        a.push(mem_off + i).op("MSTORE8")


def _mapping_slot(a: Asm):
    """stack: base_slot, key(top) -> mapping storage slot."""
    a.push(_MAP).op("MSTORE")          # mem[_MAP] = key
    a.push(_MAP + 32).op("MSTORE")     # mem[_MAP+32] = base_slot
    a.push(64).push(_MAP).op("KECCAK256")


def _require(a: Asm, fail):
    """stack: cond(top) — revert if zero."""
    a.op("ISZERO")
    a.push_label(fail)
    a.op("JUMPI")


def _copy_proof_and_call(a: Asm, fail, bytes_head_off: int,
                         n_inst_words: int, verifier_slot: int):
    """Copy the dynamic `bytes proof` arg (ABI head word at calldata
    bytes_head_off) after n_inst_words instance words in _VCD, then
    STATICCALL the verifier and require a uint256(1) return."""
    inst_bytes = 32 * n_inst_words
    # proof length + data position
    a.push(bytes_head_off).op("CALLDATALOAD")
    a.push(4).op("ADD")                  # -> length word position
    a.op("DUP1", "CALLDATALOAD")         # [lenpos, len]
    a.push(_L_LEN).op("MSTORE")          # [lenpos]
    a.push(32).op("ADD")                 # [datapos]
    a.push(_L_LEN).op("MLOAD")           # [datapos, len]
    a.op("SWAP1")                        # [len, datapos]
    a.push(_VCD + inst_bytes)            # [len, datapos, dest]
    a.op("CALLDATACOPY")
    # STATICCALL(gas, to, in=_VCD, insize=len+inst, out=0, outsize=32)
    a.push(32).push(0)
    a.push(_L_LEN).op("MLOAD").push(inst_bytes).op("ADD")
    a.push(_VCD)
    a.push(verifier_slot).op("SLOAD")
    a.op("GAS")
    a.op("STATICCALL")
    _require(a, fail)
    a.push(0).op("MLOAD").push(1).op("EQ")
    _require(a, fail)


def _emit_commitment(a: Asm, fail):
    """Compute the step public-input commitment from a StepInput at
    calldata[4:] into mem[_L_COMMIT] — sync_step_instances' exact packing
    (witness/step.py:118-127; StepExternal.toPublicInputsCommitment):
    sha256(LE(slots ‖ participation) ‖ roots), LE-interpreted, 253-bit."""
    _store_u64_le(a, 4, _BUF)            # attested_slot LE
    _store_u64_le(a, 36, _BUF + 8)       # finalized_slot LE
    _store_u64_le(a, 68, _BUF + 16)      # participation LE
    a.push(100).op("CALLDATALOAD").push(_BUF + 24).op("MSTORE")
    a.push(132).op("CALLDATALOAD").push(_BUF + 56).op("MSTORE")
    a.push(32).push(_DIG).push(88).push(_BUF).push(2).op("GAS")
    a.op("STATICCALL")
    _require(a, fail)
    a.push(_DIG).op("MLOAD")
    for i in range(32):
        a.op("DUP1")
        a.push(i).op("BYTE")
        a.push(_REV + 31 - i).op("MSTORE8")
    a.op("POP")
    a.push(_REV).op("MLOAD")
    a.push((1 << 253) - 1).op("AND")
    a.push(_L_COMMIT).op("MSTORE")


SEL_TO_COMMITMENT = selector(
    "toPublicInputsCommitment((uint64,uint64,uint64,bytes32,bytes32))")


def step_external_contract() -> bytes:
    """StepExternal.sol analog: pure recomputation of the step circuit's
    public-input commitment (step_input_encoding.rs:55-78 equivalence)."""
    a = Asm()
    fail = a.new_label("fail")
    go = a.new_label("go")
    a.push(0).op("CALLDATALOAD").push(224).op("SHR")
    a.push(SEL_TO_COMMITMENT).op("EQ")
    a.push_label(go)
    a.op("JUMPI")
    a.push(0).push(0).op("REVERT")
    a.mark(go)
    _emit_commitment(a, fail)
    a.push(_L_COMMIT).op("MLOAD").push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    a.mark(fail)
    a.push(0).push(0).op("REVERT")
    return a.assemble()


def spectre_contract() -> bytes:
    """The Spectre.sol state-machine analog (runtime bytecode)."""
    a = Asm()
    fail = a.new_label("fail")
    l_head = a.new_label("vhead")
    l_hroots = a.new_label("hroots")
    l_eroots = a.new_label("eroots")
    l_pose = a.new_label("pose")
    l_step = a.new_label("step")
    l_rotate = a.new_label("rotate")

    # dispatch on the 4-byte selector
    a.push(0).op("CALLDATALOAD").push(224).op("SHR")
    for sel, lab in ((SEL_HEAD, l_head), (SEL_HEADER_ROOTS, l_hroots),
                     (SEL_EXEC_ROOTS, l_eroots), (SEL_POSEIDONS, l_pose),
                     (SEL_STEP, l_step), (SEL_ROTATE, l_rotate)):
        a.op("DUP1").push(sel).op("EQ")
        a.push_label(lab)
        a.op("JUMPI")
    a.push(0).push(0).op("REVERT")

    # ---- views ----
    a.mark(l_head)
    a.push(SLOT_HEAD).op("SLOAD").push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    for lab, base in ((l_hroots, MAP_HEADER_ROOTS),
                      (l_eroots, MAP_EXEC_ROOTS),
                      (l_pose, MAP_POSEIDONS)):
        a.mark(lab)
        a.push(base)
        a.push(4).op("CALLDATALOAD")
        _mapping_slot(a)
        a.op("SLOAD")
        a.push(0).op("MSTORE")
        a.push(32).push(0).op("RETURN")

    # ---- step(StepInput, proof) ----
    # calldata: 4 | attested | finalized | participation | headerRoot |
    #           execRoot | bytesOffset | … | len | proof
    a.mark(l_step)
    _emit_commitment(a, fail)
    # 4. poseidon = syncCommitteePoseidons[attested/slotsPerPeriod] != 0
    a.push(MAP_POSEIDONS)
    a.push(SLOT_SLOTS_PER_PERIOD).op("SLOAD")
    a.push(4).op("CALLDATALOAD")
    a.op("DIV")                          # attested // slotsPerPeriod
    _mapping_slot(a)
    a.op("SLOAD")
    a.op("DUP1")
    a.push(_L_POSE).op("MSTORE")
    _require(a, fail)                    # poseidon != 0
    # 5. participation >= finalityThreshold
    a.push(SLOT_THRESHOLD).op("SLOAD")
    a.push(68).op("CALLDATALOAD")
    a.op("LT", "ISZERO")                 # !(participation < threshold)
    _require(a, fail)
    # 6. verify: calldata = commitment ‖ poseidon ‖ proof
    a.push(_L_COMMIT).op("MLOAD").push(_VCD).op("MSTORE")
    a.push(_L_POSE).op("MLOAD").push(_VCD + 32).op("MSTORE")
    _copy_proof_and_call(a, fail, bytes_head_off=164, n_inst_words=2,
                         verifier_slot=SLOT_STEP_VERIFIER)
    # 7. effects
    a.push(36).op("CALLDATALOAD").push(_L_FIN).op("MSTORE")
    lab_skip = a.new_label("skiphead")
    a.push(_L_FIN).op("MLOAD")
    a.push(SLOT_HEAD).op("SLOAD")
    a.op("LT", "ISZERO")                 # head >= fin -> skip
    a.push_label(lab_skip)
    a.op("JUMPI")
    a.push(_L_FIN).op("MLOAD").push(SLOT_HEAD).op("SSTORE")
    a.mark(lab_skip)
    for cd_off, base in ((100, MAP_HEADER_ROOTS), (132, MAP_EXEC_ROOTS)):
        a.push(cd_off).op("CALLDATALOAD")   # value
        a.push(base)
        a.push(_L_FIN).op("MLOAD")
        _mapping_slot(a)                    # [value, slot]
        a.op("SSTORE")
    a.op("STOP")

    # ---- rotate(finalizedSlot, nextPoseidon, proof) ----
    a.mark(l_rotate)
    a.push(4).op("CALLDATALOAD").push(_L_FIN).op("MSTORE")
    # root previously recorded by a verified step
    a.push(MAP_HEADER_ROOTS)
    a.push(_L_FIN).op("MLOAD")
    _mapping_slot(a)
    a.op("SLOAD")
    a.op("DUP1")
    a.push(_L_ROOT).op("MSTORE")
    _require(a, fail)                    # root != 0
    # instances: [poseidon, root_lo(128), root_hi(128)]
    a.push(36).op("CALLDATALOAD").push(_VCD).op("MSTORE")
    a.push(_L_ROOT).op("MLOAD")
    a.push((1 << 128) - 1).op("AND").push(_VCD + 32).op("MSTORE")
    a.push(_L_ROOT).op("MLOAD")
    a.push(128).op("SHR").push(_VCD + 64).op("MSTORE")
    _copy_proof_and_call(a, fail, bytes_head_off=68, n_inst_words=3,
                         verifier_slot=SLOT_UPDATE_VERIFIER)
    # syncCommitteePoseidons[period(fin)+1] = nextPoseidon
    a.push(36).op("CALLDATALOAD")        # value
    a.push(MAP_POSEIDONS)
    a.push(SLOT_SLOTS_PER_PERIOD).op("SLOAD")
    a.push(_L_FIN).op("MLOAD")
    a.op("DIV").push(1).op("ADD")        # period + 1
    _mapping_slot(a)
    a.op("SSTORE")
    a.op("STOP")

    a.mark(fail)
    a.push(0).push(0).op("REVERT")
    return a.assemble()


# ---------------------------- ABI helpers ----------------------------

def encode_step_call(attested_slot: int, finalized_slot: int,
                     participation: int, finalized_header_root: bytes,
                     execution_payload_root: bytes, proof: bytes) -> bytes:
    head = (SEL_STEP.to_bytes(4, "big")
            + attested_slot.to_bytes(32, "big")
            + finalized_slot.to_bytes(32, "big")
            + participation.to_bytes(32, "big")
            + bytes(finalized_header_root).rjust(32, b"\x00")
            + bytes(execution_payload_root).rjust(32, b"\x00")
            + (192).to_bytes(32, "big"))
    return head + len(proof).to_bytes(32, "big") + proof


def encode_rotate_call(finalized_slot: int, next_poseidon: int,
                       proof: bytes) -> bytes:
    head = (SEL_ROTATE.to_bytes(4, "big")
            + finalized_slot.to_bytes(32, "big")
            + next_poseidon.to_bytes(32, "big")
            + (96).to_bytes(32, "big"))
    return head + len(proof).to_bytes(32, "big") + proof


def encode_view_call(sel: int, arg: int | None = None) -> bytes:
    out = sel.to_bytes(4, "big")
    if arg is not None:
        out += int(arg).to_bytes(32, "big")
    return out


def deploy_spectre(world, *, step_verifier_code: bytes,
                   update_verifier_code: bytes,
                   initial_sync_period: int,
                   initial_poseidon: int,
                   slots_per_period: int,
                   finality_threshold: int,
                   address: int = 0x5BEC7):
    """Deploy Spectre + its two verifier contracts into a World with the
    constructor semantics of deploy_spectre_mock_verifiers
    (contract-tests/tests/spectre.rs:92-117)."""
    step_addr = world.deploy(0x57e9, step_verifier_code)
    upd_addr = world.deploy(0x0b0d, update_verifier_code)
    storage = {
        SLOT_SLOTS_PER_PERIOD: slots_per_period,
        SLOT_THRESHOLD: finality_threshold,
        SLOT_STEP_VERIFIER: step_addr,
        SLOT_UPDATE_VERIFIER: upd_addr,
        map_slot(initial_sync_period, MAP_POSEIDONS): initial_poseidon,
    }
    return world.deploy(address, spectre_contract(), storage)
