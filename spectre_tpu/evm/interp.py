"""Minimal EVM interpreter — the revm/anvil analog for in-process
verification of generated verifier programs (util/circuit.rs:213-215's
`evm_verify` capability, rebuilt without external tooling).

Implements the opcode subset the assembler emits, the four precompiles the
verifier needs (modexp 0x05, ecAdd 0x06, ecMul 0x07, ecPairing 0x08 —
backed by the from-scratch host curve/pairing stack), keccak256, and
mainnet gas accounting (EIP-1108/EIP-2565 precompile costs) so tests can
report verify-gas like the reference's `--estimate-gas` (cli.rs:259-268).
"""
from __future__ import annotations

from dataclasses import dataclass

from ..hashes.keccak import keccak256

U256 = (1 << 256) - 1


@dataclass
class EvmResult:
    success: bool
    returndata: bytes
    gas_used: int
    error: str = ""


def _mem_gas(words: int) -> int:
    return 3 * words + words * words // 512


class _Memory:
    def __init__(self):
        self.data = bytearray()
        self.words = 0

    def _expand(self, end: int) -> int:
        """Returns incremental memory gas."""
        if end <= len(self.data):
            return 0
        new_words = (end + 31) // 32
        delta = _mem_gas(new_words) - _mem_gas(self.words)
        self.words = new_words
        self.data += b"\x00" * (new_words * 32 - len(self.data))
        return delta

    def load(self, off: int) -> int:
        g = self._expand(off + 32)
        return int.from_bytes(self.data[off:off + 32], "big"), g

    def store(self, off: int, val: int, size: int = 32) -> int:
        g = self._expand(off + size)
        self.data[off:off + size] = int(val).to_bytes(size, "big")
        return g

    def store_bytes(self, off: int, b: bytes) -> int:
        g = self._expand(off + len(b))
        self.data[off:off + len(b)] = b
        return g

    def read(self, off: int, size: int) -> bytes:
        g = self._expand(off + size)
        return bytes(self.data[off:off + size]), g


def _precompile(addr: int, data: bytes):
    """Returns (success, output, gas) for the supported precompiles."""
    from ..curves import host as H
    from ..curves.pairing import bn254
    from ..fields.params import BN254_FQ as FQ, BN254_FR as FR

    if addr == 2:  # sha256
        import hashlib
        words = (len(data) + 31) // 32
        return True, hashlib.sha256(data).digest(), 60 + 12 * words

    if addr == 4:  # identity
        words = (len(data) + 31) // 32
        return True, bytes(data), 15 + 3 * words

    if addr == 5:  # modexp (EIP-2565 gas, simplified for 32-byte operands)
        bsize = int.from_bytes(data[0:32], "big")
        esize = int.from_bytes(data[32:64], "big")
        msize = int.from_bytes(data[64:96], "big")
        if max(bsize, esize, msize) > 1024:
            return False, b"", 0
        p = 96
        B = int.from_bytes(data[p:p + bsize], "big"); p += bsize
        E = int.from_bytes(data[p:p + esize], "big"); p += esize
        M = int.from_bytes(data[p:p + msize], "big")
        out = pow(B, E, M) if M else 0
        words = (max(bsize, msize) + 7) // 8
        # EIP-2565 iteration count: exponents beyond 32 bytes add
        # 8*(esize-32) plus the bit length of the low 256 bits
        if esize <= 32:
            it = max(E.bit_length() - 1, 0)
        else:
            it = 8 * (esize - 32) + max(
                (E % (1 << 256)).bit_length() - 1, 0)
        gas = max(200, words * words * max(it, 1) // 3)
        return True, out.to_bytes(msize, "big"), gas

    def g1_of(b: bytes):
        x = int.from_bytes(b[0:32], "big")
        y = int.from_bytes(b[32:64], "big")
        if x >= FQ or y >= FQ:
            raise ValueError("coordinate out of range")
        if x == 0 and y == 0:
            return None
        if (y * y - (x * x % FQ * x + 3)) % FQ != 0:
            raise ValueError("not on curve")
        return (x, y)

    def g1_bytes(pt) -> bytes:
        if pt is None:
            return b"\x00" * 64
        return int(pt[0]).to_bytes(32, "big") + int(pt[1]).to_bytes(32, "big")

    data = bytes(data)
    try:
        if addr == 6:  # ecAdd
            data = data.ljust(128, b"\x00")
            a, b = g1_of(data[0:64]), g1_of(data[64:128])
            return True, g1_bytes(H.bn254_g1.add(a, b)), 150
        if addr == 7:  # ecMul
            data = data.ljust(96, b"\x00")
            a = g1_of(data[0:64])
            s = int.from_bytes(data[64:96], "big")
            return True, g1_bytes(H.bn254_g1.mul(a, s % FR) if s % FR
                                  else None), 6000
        if addr == 8:  # ecPairing
            if len(data) % 192 != 0:
                return False, b"", 45000
            npairs = len(data) // 192
            pairs = []
            for i in range(npairs):
                seg = data[192 * i:192 * (i + 1)]
                p = g1_of(seg[0:64])
                # G2 point: (x_im, x_re, y_im, y_re) per EIP-197 encoding
                x_im = int.from_bytes(seg[64:96], "big")
                x_re = int.from_bytes(seg[96:128], "big")
                y_im = int.from_bytes(seg[128:160], "big")
                y_re = int.from_bytes(seg[160:192], "big")
                if max(x_im, x_re, y_im, y_re) >= FQ:
                    raise ValueError("G2 coordinate out of range")
                q = ((x_re, x_im), (y_re, y_im))
                if p is not None and q != ((0, 0), (0, 0)):
                    pairs.append((p, q))
            ok = bn254().pairing_check(pairs) if pairs else True
            out = (1 if ok else 0).to_bytes(32, "big")
            return True, out, 34000 * npairs + 45000
    except ValueError:
        return False, b"", 6000
    return False, b"", 0


GAS = {}
for _ops, _g in (
    (("STOP", "RETURN", "REVERT",
      "EXTCODESIZE", "EXTCODECOPY"), 0),   # ext ops priced at use site
    (("JUMPDEST",), 1),
    (("ADDRESS", "ORIGIN", "CALLER", "CALLVALUE", "CALLDATASIZE", "PC",
      "MSIZE", "GAS", "RETURNDATASIZE", "POP", "PUSH0"), 2),
    (("ADD", "SUB", "LT", "GT", "SLT", "SGT", "EQ", "ISZERO", "AND", "OR",
      "XOR", "NOT", "BYTE", "SHL", "SHR", "SAR", "CALLDATALOAD", "MLOAD",
      "MSTORE", "MSTORE8", "CALLDATACOPY", "CODECOPY",
      "RETURNDATACOPY"), 3),
    (("MUL", "DIV", "SDIV", "MOD", "SMOD", "SIGNEXTEND"), 5),
    (("ADDMOD", "MULMOD", "JUMP"), 8),
    (("JUMPI",), 10),
    (("KECCAK256",), 30),
    (("EXP",), 10),
):
    for _o in _ops:
        GAS[_o] = _g

from .asm import OPS as _OPS

_BY_CODE = {v: k for k, v in _OPS.items()}


class World:
    """Minimal multi-contract state: address -> (code, storage dict).
    The anvil/revm stand-in for contract-tests (SURVEY §4 item 5)."""

    def __init__(self):
        self.accounts: dict = {}

    def deploy(self, address: int, code: bytes, storage: dict | None = None):
        self.accounts[address] = {"code": bytes(code),
                                  "storage": dict(storage or {})}
        return address

    def storage(self, address: int) -> dict:
        return self.accounts[address]["storage"]

    def call(self, address: int, calldata: bytes = b"",
             caller: int = 0, gas_limit: int = 500_000_000,
             static: bool = False) -> "EvmResult":
        acct = self.accounts.get(address)
        if acct is None:
            return EvmResult(False, b"", 0, f"no code at {address:#x}")
        return execute(acct["code"], calldata, gas_limit, world=self,
                       address=address, caller=caller, static=static)


def execute(code: bytes, calldata: bytes = b"",
            gas_limit: int = 500_000_000, world: World | None = None,
            address: int = 0, caller: int = 0,
            static: bool = False, _depth: int = 0) -> EvmResult:
    if _depth > 64:
        return EvmResult(False, b"", 0, "call depth exceeded")
    stack: list = []
    mem = _Memory()
    storage = (world.accounts[address]["storage"]
               if world is not None and address in world.accounts else {})
    returndata = b""
    warm_addrs = {address, caller}   # EIP-2929 accessed-address set
    pc = 0
    gas = (0 if _depth else
           21000 + sum(16 if b else 4 for b in calldata))  # intrinsic
    jumpdests = set()
    i = 0
    while i < len(code):
        op = code[i]
        if op == 0x5B:
            jumpdests.add(i)
        if 0x60 <= op <= 0x7F:
            i += op - 0x5F
        i += 1

    def pop():
        return stack.pop()

    while pc < len(code):
        op = code[pc]
        name = _BY_CODE.get(op)
        if name is None:
            return EvmResult(False, b"", gas, f"invalid opcode {op:#x}@{pc}")
        if 0x60 <= op <= 0x7F:   # PUSH1..32
            nb = op - 0x5F
            val = int.from_bytes(code[pc + 1:pc + 1 + nb], "big")
            stack.append(val)
            gas += 3
            pc += 1 + nb
            continue
        pc += 1
        gas += GAS.get(name, 3)
        try:
            if op == 0x5F:
                stack.append(0)
            elif 0x80 <= op <= 0x8F:   # DUP
                stack.append(stack[-(op - 0x7F)])
            elif 0x90 <= op <= 0x9F:   # SWAP
                d = op - 0x8F
                stack[-1], stack[-1 - d] = stack[-1 - d], stack[-1]
            elif name == "POP":
                pop()
            elif name == "ADD":
                stack.append((pop() + pop()) & U256)
            elif name == "MUL":
                stack.append((pop() * pop()) & U256)
            elif name == "SUB":
                a, b = pop(), pop()
                stack.append((a - b) & U256)
            elif name == "DIV":
                a, b = pop(), pop()
                stack.append(a // b if b else 0)
            elif name == "MOD":
                a, b = pop(), pop()
                stack.append(a % b if b else 0)
            elif name == "ADDMOD":
                a, b, m = pop(), pop(), pop()
                stack.append((a + b) % m if m else 0)
            elif name == "MULMOD":
                a, b, m = pop(), pop(), pop()
                stack.append((a * b) % m if m else 0)
            elif name == "EXP":
                a, e = pop(), pop()
                gas += 50 * ((e.bit_length() + 7) // 8)
                stack.append(pow(a, e, 1 << 256))
            elif name == "LT":
                a, b = pop(), pop()
                stack.append(1 if a < b else 0)
            elif name == "GT":
                a, b = pop(), pop()
                stack.append(1 if a > b else 0)
            elif name == "EQ":
                stack.append(1 if pop() == pop() else 0)
            elif name == "ISZERO":
                stack.append(1 if pop() == 0 else 0)
            elif name == "AND":
                stack.append(pop() & pop())
            elif name == "OR":
                stack.append(pop() | pop())
            elif name == "XOR":
                stack.append(pop() ^ pop())
            elif name == "NOT":
                stack.append(pop() ^ U256)
            elif name == "BYTE":
                i_, x = pop(), pop()
                stack.append((x >> (8 * (31 - i_))) & 0xFF if i_ < 32 else 0)
            elif name == "SHL":
                s, v = pop(), pop()
                stack.append((v << s) & U256 if s < 256 else 0)
            elif name == "SHR":
                s, v = pop(), pop()
                stack.append(v >> s if s < 256 else 0)
            elif name == "KECCAK256":
                off, size = pop(), pop()
                data, g = mem.read(off, size)
                gas += g + 6 * ((size + 31) // 32)
                stack.append(int.from_bytes(keccak256(data), "big"))
            elif name == "CALLDATALOAD":
                off = pop()
                stack.append(int.from_bytes(
                    calldata[off:off + 32].ljust(32, b"\x00"), "big"))
            elif name == "CALLDATASIZE":
                stack.append(len(calldata))
            elif name == "CALLDATACOPY":
                doff, soff, size = pop(), pop(), pop()
                gas += mem.store_bytes(
                    doff, calldata[soff:soff + size].ljust(size, b"\x00"))
                gas += 3 * ((size + 31) // 32)
            elif name == "CODECOPY":
                doff, soff, size = pop(), pop(), pop()
                gas += mem.store_bytes(
                    doff, code[soff:soff + size].ljust(size, b"\x00"))
                gas += 3 * ((size + 31) // 32)
            elif name == "CODESIZE":
                stack.append(len(code))
            elif name == "EXTCODESIZE":
                a_ = pop() & ((1 << 160) - 1)
                gas += 100 if a_ in warm_addrs else 2600  # EIP-2929
                warm_addrs.add(a_)
                acct_ = world.accounts.get(a_) if world else None
                stack.append(len(acct_["code"]) if acct_ else 0)
            elif name == "EXTCODECOPY":
                a_ = pop() & ((1 << 160) - 1)
                doff, soff, size = pop(), pop(), pop()
                gas += 100 if a_ in warm_addrs else 2600  # EIP-2929
                warm_addrs.add(a_)
                acct_ = world.accounts.get(a_) if world else None
                src = acct_["code"] if acct_ else b""
                gas += mem.store_bytes(
                    doff, src[soff:soff + size].ljust(size, b"\x00"))
                gas += 3 * ((size + 31) // 32)
            elif name == "MLOAD":
                v, g = mem.load(pop())
                gas += g
                stack.append(v)
            elif name == "MSTORE":
                off, v = pop(), pop()
                gas += mem.store(off, v)
            elif name == "MSTORE8":
                off, v = pop(), pop()
                gas += mem.store(off, v & 0xFF, 1)
            elif name == "JUMP":
                pc = pop()
                if pc not in jumpdests:
                    return EvmResult(False, b"", gas, f"bad jump {pc}")
            elif name == "JUMPI":
                dest, cond = pop(), pop()
                if cond:
                    pc = dest
                    if pc not in jumpdests:
                        return EvmResult(False, b"", gas,
                                         f"bad jumpi {dest}")
            elif name == "PC":
                stack.append(pc - 1)
            elif name == "MSIZE":
                stack.append(mem.words * 32)
            elif name == "GAS":
                stack.append(max(gas_limit - gas, 0))
            elif name == "RETURNDATASIZE":
                stack.append(len(returndata))
            elif name == "RETURNDATACOPY":
                doff, soff, size = pop(), pop(), pop()
                if soff + size > len(returndata):
                    return EvmResult(False, b"", gas, "returndata oob")
                gas += mem.store_bytes(doff,
                                       returndata[soff:soff + size])
            elif name in ("STATICCALL", "CALL"):
                if name == "CALL":
                    (_g, addr, _val, aoff, asz, roff, rsz) = (
                        pop(), pop(), pop(), pop(), pop(), pop(), pop())
                    if static and _val:
                        return EvmResult(False, b"", gas,
                                         "value in static context")
                else:
                    _g, addr, aoff, asz, roff, rsz = (pop(), pop(), pop(),
                                                      pop(), pop(), pop())
                data, g1 = mem.read(aoff, asz)
                gas += g1 + 100
                if world is not None and addr in world.accounts:
                    sub = execute(world.accounts[addr]["code"], data,
                                  gas_limit - gas, world=world,
                                  address=addr, caller=address,
                                  static=static or name == "STATICCALL",
                                  _depth=_depth + 1)
                    ok, out, pgas = sub.success, sub.returndata, sub.gas_used
                else:
                    ok, out, pgas = _precompile(addr, data)
                gas += pgas
                returndata = out
                if ok:
                    gas += mem.store_bytes(roff, out[:rsz].ljust(
                        min(rsz, len(out)), b"\x00") if rsz else b"")
                stack.append(1 if ok else 0)
            elif name == "ADDRESS":
                stack.append(address)
            elif name == "CALLER":
                stack.append(caller)
            elif name in ("ORIGIN", "CALLVALUE"):
                stack.append(0)
            elif name == "SLOAD":
                gas += 2100 - 3
                stack.append(storage.get(pop(), 0))
            elif name == "SSTORE":
                if static:
                    return EvmResult(False, b"", gas,
                                     "SSTORE in static context")
                gas += 20000 - 3
                k, v = pop(), pop()
                if v:
                    storage[k] = v
                else:
                    storage.pop(k, None)
            elif name == "RETURN":
                off, size = pop(), pop()
                data, g = mem.read(off, size)
                gas += g
                return EvmResult(gas <= gas_limit, data, gas,
                                 "" if gas <= gas_limit else "out of gas")
            elif name == "REVERT":
                off, size = pop(), pop()
                data, _ = mem.read(off, size)
                return EvmResult(False, data, gas, "revert")
            elif name == "STOP":
                return EvmResult(gas <= gas_limit, b"", gas,
                                 "" if gas <= gas_limit else "out of gas")
            elif name == "JUMPDEST":
                pass
            else:
                return EvmResult(False, b"", gas, f"unhandled {name}")
        except IndexError:
            return EvmResult(False, b"", gas, f"stack underflow at {name}")
        if gas > gas_limit:
            return EvmResult(False, b"", gas, "out of gas")
    return EvmResult(True, b"", gas)
