"""Minimal EVM bytecode assembler.

Supports named labels (resolved as PUSH2 + patch), auto-sized immediate
pushes, and the opcode subset the generated verifiers use. This replaces
the reference's Yul-through-solc pipeline (snark-verifier loader codegen)
with direct bytecode emission — no external toolchain.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

OPS = {
    "STOP": 0x00, "ADD": 0x01, "MUL": 0x02, "SUB": 0x03, "DIV": 0x04,
    "SDIV": 0x05, "MOD": 0x06, "SMOD": 0x07, "ADDMOD": 0x08,
    "MULMOD": 0x09, "EXP": 0x0A, "SIGNEXTEND": 0x0B,
    "LT": 0x10, "GT": 0x11, "SLT": 0x12, "SGT": 0x13, "EQ": 0x14,
    "ISZERO": 0x15, "AND": 0x16, "OR": 0x17, "XOR": 0x18, "NOT": 0x19,
    "BYTE": 0x1A, "SHL": 0x1B, "SHR": 0x1C, "SAR": 0x1D,
    "KECCAK256": 0x20,
    "ADDRESS": 0x30, "BALANCE": 0x31, "ORIGIN": 0x32, "CALLER": 0x33,
    "CALLVALUE": 0x34, "CALLDATALOAD": 0x35, "CALLDATASIZE": 0x36,
    "CALLDATACOPY": 0x37, "CODESIZE": 0x38, "CODECOPY": 0x39,
    "EXTCODESIZE": 0x3B, "EXTCODECOPY": 0x3C,
    "RETURNDATASIZE": 0x3D, "RETURNDATACOPY": 0x3E,
    "POP": 0x50, "MLOAD": 0x51, "MSTORE": 0x52, "MSTORE8": 0x53,
    "SLOAD": 0x54, "SSTORE": 0x55, "JUMP": 0x56, "JUMPI": 0x57,
    "PC": 0x58, "MSIZE": 0x59, "GAS": 0x5A, "JUMPDEST": 0x5B,
    "PUSH0": 0x5F,
    "CALL": 0xF1, "RETURN": 0xF3, "STATICCALL": 0xFA, "REVERT": 0xFD,
    "INVALID": 0xFE,
}
for _i in range(1, 33):
    OPS[f"PUSH{_i}"] = 0x5F + _i
for _i in range(1, 17):
    OPS[f"DUP{_i}"] = 0x7F + _i
    OPS[f"SWAP{_i}"] = 0x8F + _i


class Label:
    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name


class Asm:
    def __init__(self):
        self.items: List[object] = []   # int opcode | bytes | Label-use
        self._label_ctr = 0

    # ---- emission ----
    def op(self, name: str, *ops_after: str) -> "Asm":
        self.items.append(OPS[name])
        for o in ops_after:
            self.items.append(OPS[o])
        return self

    def push(self, value: int) -> "Asm":
        value = int(value)
        assert 0 <= value < (1 << 256)
        if value == 0:
            self.items.append(OPS["PUSH0"])
            return self
        nb = (value.bit_length() + 7) // 8
        self.items.append(OPS[f"PUSH{nb}"])
        self.items.append(value.to_bytes(nb, "big"))
        return self

    def new_label(self, hint: str = "L") -> Label:
        self._label_ctr += 1
        return Label(f"{hint}{self._label_ctr}")

    def push_label(self, lab: Label) -> "Asm":
        # PUSH3: generated verifiers for large gate sets exceed 64 KiB
        self.items.append(OPS["PUSH3"])
        self.items.append(lab)          # placeholder, patched at assemble
        return self

    def mark(self, lab: Label) -> "Asm":
        self.items.append(("MARK", lab))
        self.items.append(OPS["JUMPDEST"])
        return self

    def mark_data(self, lab: Label) -> "Asm":
        """Label a position without a JUMPDEST (data segment starts)."""
        self.items.append(("MARK", lab))
        return self

    def raw(self, blob: bytes) -> "Asm":
        """Append raw bytes (data segments: tapes, constant tables)."""
        self.items.append(bytes(blob))
        return self

    # ---- finalize ----
    def assemble(self) -> bytes:
        # first pass: offsets (labels occupy 2 bytes)
        off = 0
        pos: Dict[str, int] = {}
        for it in self.items:
            if isinstance(it, tuple) and it[0] == "MARK":
                pos[it[1].name] = off
            elif isinstance(it, Label):
                off += 3
            elif isinstance(it, bytes):
                off += len(it)
            else:
                off += 1
        out = bytearray()
        for it in self.items:
            if isinstance(it, tuple) and it[0] == "MARK":
                continue
            if isinstance(it, Label):
                out += pos[it.name].to_bytes(3, "big")
            elif isinstance(it, bytes):
                out += it
            else:
                out.append(it)
        return bytes(out)
