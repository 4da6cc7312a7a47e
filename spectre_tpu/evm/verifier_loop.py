"""Looped EVM verifier generator — deployable-size gen_evm_verifier.

The straight-line generator (verifier_gen.py) unrolls every per-column /
per-query / per-poly step into inline bytecode: correct, but the code size
scales with the circuit's column count (the round-3 toy aggregation
verifier hit 2.76 MB — 112x EIP-170's 24,576-byte deploy cap). The
reference deploys snark-verifier-generated contracts via forge
(justfile:26-36,45-53; prover/src/cli.rs:244-271), so a verifier this
stack emits must actually fit on a chain.

This generator keeps the SAME verification algorithm and transcript
framing but emits O(1) code per *section* plus O(columns) bytes of DATA:

  - uniform sections (point reads, eval reads, instance barycentric,
    h-commitment fold, SHPLONK per-poly fold, permutation-product fold)
    become runtime loops whose bodies compute addresses from the loop
    counter;
  - gate constraints are evaluated by a ~200-byte RPN tape interpreter
    over a bytecode tape in the contract's data segment (3 bytes per
    operand load, 1 byte per ADD/MUL/FOLD — vs ~30 inline bytes);
  - fixed/sigma commitments and gate constants live in a CODECOPY'd
    constant table instead of PUSH32 pairs.

All transcript offsets, calldata offsets and scratch slots stay
compile-time static (loop bodies use i-scaled addressing), so the
emitted program is byte-for-byte deterministic for a given VK, like the
straight-line one. Both generators must accept/reject identically;
tests/test_evm_verifier.py cross-checks them on real proofs.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

from ..fields.params import BN254_FR as FR, BN254_FQ as FQ
from ..plonk.keygen import VerifyingKey, DELTA
from ..plonk.expression import Expr, Const, ColumnRef, Sum, Prod, Scaled
from ..plonk.protocol import column_queries
from ..plonk.prover import _cs_degree
from .verifier_gen import _Gen, SUCCESS, SCRATCH, _dbg_return

# memory vars (after the 384-byte SCRATCH at 0x20..0x1A0)
I_VAR = 0x1A0
J_VAR = 0x1C0
DP_VAR = 0x1E0
X1 = 0x200   # loop temps: running omega power / delta power / bound
X2 = 0x220
X3 = 0x240
FR_ADDR = 0x260   # the moduli live in memory: a 3-byte MLOAD instead of
FQ_ADDR = 0x280   # a 33-byte PUSH32 at every field op (~5x code size)
K_VAR = 0x2A0     # inner dynamic loop bound
LOOP_SLOT_BASE = 0x2C0

# gate-tape opcodes
OP_END = 0
OP_PUSH_MEM = 1     # addr16: push MLOAD(addr)
OP_ADD = 2
OP_MUL = 3
OP_FOLD = 4         # folded = folded*y + pop

# EIP-170 deployed-code cap; data contracts carry a 1-byte 0x00 guard
# (so they can't be executed as a no-op success) + payload
EIP170_MAX = 24_576
MAX_DATA_BYTES = EIP170_MAX - 1


def _placeholder_addr(idx: int) -> int:
    """Deterministic 20-byte link placeholder for data contract #idx
    (solc library link-reference analog); top byte nonzero so the
    auto-sizing push always emits PUSH20."""
    base = int.from_bytes(b"\xd0" + b"\xda" * 17 + b"\xc0\x00", "big")
    return base + idx


class _LoopGen(_Gen):
    """Loop-emitting generation pass. Inherits all scalar/EC/transcript
    primitives from the straight-line _Gen; slots stay statically
    allocated — loops address them as base + stride*i."""

    def __init__(self, vk, srs, inst_shape, tb, acc_indices=None,
                 data_base: int = 1 << 22):
        super().__init__(vk, srs, inst_shape, tb, acc_indices)
        self.data_base = data_base
        self.data = bytearray()       # CODECOPY'd data segment
        self.const_off: Dict[int, int] = {}   # value -> data offset
        self.tape = bytearray()
        self.sections: List[tuple] = []       # (name, item index): sizing

    def section(self, name: str):
        self.sections.append((name, len(self.a.items)))

    def section_sizes(self):
        """Assembled-size estimate per section (labels count 3 bytes)."""
        from .asm import Label

        def isz(it):
            if isinstance(it, tuple):
                return 0
            if isinstance(it, Label):
                return 3
            if isinstance(it, bytes):
                return len(it)
            return 1

        sizes = [isz(it) for it in self.a.items]
        out = []
        marks = self.sections + [("<end>", len(sizes))]
        for (name, i0), (_n, i1) in zip(marks, marks[1:]):
            out.append((name, sum(sizes[i0:i1])))
        return out

    def off(self, s: int) -> int:
        return LOOP_SLOT_BASE + 32 * s

    # ---- modulus-from-memory overrides (size: 3 B vs PUSH32's 33 B) ----
    def push_fr(self):
        self.a.push(FR_ADDR).op("MLOAD")

    def fr_add_stack(self):
        self.push_fr()
        self.a.op("SWAP2", "ADDMOD")

    def fr_mul_stack(self):
        self.push_fr()
        self.a.op("SWAP2", "MULMOD")

    def fr_neg_stack(self):
        self.push_fr()
        self.a.op("SUB")
        self.push_fr()
        self.a.op("SWAP1", "MOD")

    # ---- data segment ----
    def data_const(self, v: int) -> int:
        """Intern a 32-byte constant; returns its runtime memory addr."""
        v = int(v) % (1 << 256)
        if v not in self.const_off:
            self.const_off[v] = len(self.data)
            self.data += v.to_bytes(32, "big")
        return self.data_base + self.const_off[v]

    def data_point(self, pt) -> int:
        """Intern an affine point (None = identity) as 64 data bytes."""
        x, y = (0, 0) if pt is None else (int(pt[0]), int(pt[1]))
        off = len(self.data)
        self.data += x.to_bytes(32, "big") + y.to_bytes(32, "big")
        return self.data_base + off

    def data_blob(self, blob: bytes) -> int:
        off = len(self.data)
        self.data += blob
        return self.data_base + off

    # ---- loop emission ----
    def loop_static(self, count: int, body, ivar: int = I_VAR):
        """for i in range(count): body().  body must keep stack balance;
        it reads the counter via MLOAD(ivar)."""
        if count == 0:
            return
        a = self.a
        a.push(0).push(ivar).op("MSTORE")
        head = a.new_label("loop")
        a.mark(head)
        body()
        a.push(ivar).op("MLOAD")
        a.push(1).op("ADD", "DUP1")
        a.push(ivar).op("MSTORE")
        a.push(count).op("SWAP1", "LT")       # (i+1) < count
        a.push_label(head)
        a.op("JUMPI")

    def loop_dyn(self, bound_var: int, body, ivar: int = J_VAR):
        """for i in range(MLOAD(bound_var)): body()."""
        a = self.a
        skip = a.new_label("skip")
        a.push(bound_var).op("MLOAD", "ISZERO")
        a.push_label(skip)
        a.op("JUMPI")
        a.push(0).push(ivar).op("MSTORE")
        head = a.new_label("loop")
        a.mark(head)
        body()
        a.push(ivar).op("MLOAD")
        a.push(1).op("ADD", "DUP1")
        a.push(ivar).op("MSTORE")
        a.push(bound_var).op("MLOAD", "SWAP1", "LT")
        a.push_label(head)
        a.op("JUMPI")
        a.mark(skip)

    def push_i_addr(self, base: int, stride: int, ivar: int = I_VAR):
        """Pushes base + stride * MLOAD(ivar)."""
        a = self.a
        a.push(ivar).op("MLOAD")
        if stride != 1:
            a.push(stride).op("MUL")
        a.push(base).op("ADD")

    def dp_read(self, nbytes: int):
        """Pushes the next 1/3-byte table item; advances DP."""
        a = self.a
        a.push(DP_VAR).op("MLOAD", "MLOAD")
        a.push(256 - 8 * nbytes).op("SHR")
        a.push(nbytes)
        a.push(DP_VAR).op("MLOAD", "ADD")
        a.push(DP_VAR).op("MSTORE")

    # ---- dynamic-address EC / checks ----
    def push_fq(self):
        self.a.push(FQ_ADDR).op("MLOAD")

    def curve_check_dyn(self, addr_var: int, allow_identity: bool = True):
        """curve_check on the point at MLOAD(addr_var) (x) / +32 (y)."""
        a = self.a

        def ld(extra):
            a.push(addr_var).op("MLOAD")
            if extra:
                a.push(extra).op("ADD")
            a.op("MLOAD")

        ld(0)
        self.push_fq()
        a.op("SWAP1", "LT")
        self.and_success()
        ld(32)
        self.push_fq()
        a.op("SWAP1", "LT")
        self.and_success()
        ld(32)
        a.op("DUP1")
        self.push_fq()
        a.op("SWAP2", "MULMOD")
        ld(0)
        a.op("DUP1")
        self.push_fq()
        a.op("SWAP2", "MULMOD")
        ld(0)
        self.push_fq()
        a.op("SWAP2", "MULMOD")
        a.push(3)
        self.push_fq()
        a.op("SWAP2", "ADDMOD")
        a.op("EQ")
        if allow_identity:
            ld(0)
            ld(32)
            a.op("OR", "ISZERO", "OR")
        self.and_success()

    def ec_mul_dyn_to_scratch(self, addr_var: int, scalar_slot: int):
        """SCRATCH..+64 := point@MLOAD(addr_var) * slot scalar."""
        a = self.a
        a.push(addr_var).op("MLOAD", "MLOAD")
        self.mstore_at(SCRATCH)
        a.push(addr_var).op("MLOAD")
        a.push(32).op("ADD", "MLOAD")
        self.mstore_at(SCRATCH + 32)
        self.load(scalar_slot)
        self.mstore_at(SCRATCH + 64)
        self._staticcall(7, SCRATCH, 96, SCRATCH, 64)
        self.and_success()

    def ec_add_scratch_into_dyn(self, addr_var: int):
        """point@MLOAD(addr_var) += SCRATCH point (result written back)."""
        a = self.a
        a.push(addr_var).op("MLOAD", "MLOAD")
        self.mstore_at(SCRATCH + 64)
        a.push(addr_var).op("MLOAD")
        a.push(32).op("ADD", "MLOAD")
        self.mstore_at(SCRATCH + 96)
        self._staticcall(6, SCRATCH, 128, SCRATCH, 64)
        self.and_success()
        a.push(SCRATCH).op("MLOAD")
        a.push(addr_var).op("MLOAD", "MSTORE")
        a.push(SCRATCH + 32).op("MLOAD")
        a.push(addr_var).op("MLOAD")
        a.push(32).op("ADD", "MSTORE")

    # ---- gate tape (3-byte memory addresses: slot regions of large
    # circuits exceed 64 KiB) ----
    def tape_expr(self, e: Expr, eval_slots):
        t = self.tape
        if isinstance(e, Const):
            addr = self.data_const(e.value % FR)
            t.append(OP_PUSH_MEM)
            t += addr.to_bytes(3, "big")
        elif isinstance(e, ColumnRef):
            addr = self.off(eval_slots[(e.index, e.rotation)])
            t.append(OP_PUSH_MEM)
            t += addr.to_bytes(3, "big")
        elif isinstance(e, Sum):
            self.tape_expr(e.terms[0], eval_slots)
            for term in e.terms[1:]:
                self.tape_expr(term, eval_slots)
                t.append(OP_ADD)
        elif isinstance(e, Prod):
            self.tape_expr(e.factors[0], eval_slots)
            for f in e.factors[1:]:
                self.tape_expr(f, eval_slots)
                t.append(OP_MUL)
        elif isinstance(e, Scaled):
            self.tape_expr(e.inner, eval_slots)
            addr = self.data_const(e.scalar % FR)
            t.append(OP_PUSH_MEM)
            t += addr.to_bytes(3, "big")
            t.append(OP_MUL)
        else:
            raise TypeError(f"unsupported expr in EVM codegen: {e!r}")

    def emit_tape_interpreter(self, tape_addr: int, folded: int, y: int):
        """Runs the RPN tape at tape_addr; folds via (folded, y) slots."""
        a = self.a
        a.push(tape_addr).push(DP_VAR).op("MSTORE")
        head = a.new_label("tape")
        done = a.new_label("tdone")
        l_push = a.new_label("tpush")
        l_add = a.new_label("tadd")
        l_mul = a.new_label("tmul")
        l_fold = a.new_label("tfold")
        a.mark(head)
        a.push(DP_VAR).op("MLOAD", "MLOAD")   # [.. w]
        a.op("DUP1")
        a.push(248).op("SHR")                 # [.. w op]
        a.op("DUP1")
        a.push(OP_PUSH_MEM).op("EQ")
        a.push_label(l_push)
        a.op("JUMPI")
        a.op("DUP1")
        a.push(OP_ADD).op("EQ")
        a.push_label(l_add)
        a.op("JUMPI")
        a.op("DUP1")
        a.push(OP_MUL).op("EQ")
        a.push_label(l_mul)
        a.op("JUMPI")
        a.push(OP_FOLD).op("EQ")
        a.push_label(l_fold)
        a.op("JUMPI")
        a.op("POP")                           # OP_END: drop w
        a.push_label(done)
        a.op("JUMP")

        def advance(nb):
            a.push(nb)
            a.push(DP_VAR).op("MLOAD", "ADD")
            a.push(DP_VAR).op("MSTORE")
            a.push_label(head)
            a.op("JUMP")

        a.mark(l_push)                        # [.. w op]
        a.op("POP")
        a.push(224).op("SHR")
        a.push(0xFFFFFF).op("AND", "MLOAD")   # [.. val]
        advance(4)
        a.mark(l_add)                         # [.. x y w op]
        a.op("POP", "POP")
        self.fr_add_stack()
        advance(1)
        a.mark(l_mul)
        a.op("POP", "POP")
        self.fr_mul_stack()
        advance(1)
        a.mark(l_fold)                        # [.. v w] (op consumed by EQ)
        a.op("POP")
        self.load(folded)
        self.load(y)
        self.fr_mul_stack()                   # folded*y
        self.fr_add_stack()                   # + v
        self.store(folded)
        advance(1)
        a.mark(done)


def _generate_loop(vk: VerifyingKey, srs, inst_shape: List[int], tb: int,
                   acc_indices=None, data_base: int = 1 << 22,
                   data_len: int = 0, debug_return=None,
                   ext_data: bool = False) -> _LoopGen:
    """data_len: total data-segment length (0 on the counting pass; the
    real value — which is pass-stable because every table entry is
    fixed-width — on the emission pass).

    ext_data: load the data segment from EXTERNAL data contracts
    (EXTCODECOPY from placeholder PUSH20 addresses, patched at link time)
    instead of appending it to this contract's code — the EIP-170 split
    (VERDICT r4 next #5): verifier code alone fits the 24,576-byte deploy
    cap; tables ride separate <=24,576-byte data contracts."""
    cs = vk.cs
    dom = vk.domain
    n = vk.n
    usable = cs.usable_rows(n)
    g = _LoopGen(vk, srs, inst_shape, tb, acc_indices, data_base)
    g.debug_return = debug_return
    a = g.a

    def _finish():
        a.mark_data(data_label)
        a.raw(bytes(g.data))
        return g

    def dbg(name, slots):
        if _dbg_return(g, name, slots):
            return True
        return False

    g.section("prologue")
    a.push(1).push(SUCCESS).op("MSTORE")
    a.push(FR).push(FR_ADDR).op("MSTORE")
    a.push(FQ).push(FQ_ADDR).op("MSTORE")

    # load the data segment (constant tables + tapes) up front
    data_label = a.new_label("data")
    g.ext_data = ext_data
    if ext_data and data_len:
        off = 0
        idx = 0
        while off < data_len:
            ln = min(data_len - off, MAX_DATA_BYTES)
            a.push(ln)                       # length
            a.push(1)                        # src offset (skip 0x00 guard)
            a.push(data_base + off)          # destOffset
            a.push(_placeholder_addr(idx))   # PUSH20, patched by link()
            a.op("EXTCODECOPY")
            off += ln
            idx += 1
    else:
        a.push(data_len)
        a.push_label(data_label)
        a.push(data_base).op("CODECOPY")

    # ---- absorb instances: loop over all instance words ----
    n_inst = sum(inst_shape)
    t0 = g.t_ptr

    def inst_body():
        g.push_i_addr(0, 32)
        a.op("CALLDATALOAD", "DUP1")
        a.push(FR).op("SWAP1", "LT")
        g.and_success()
        g.push_i_addr(g.tb + t0, 32)
        a.op("MSTORE")

    g.loop_static(n_inst, inst_body)
    g.t_ptr += 32 * n_inst

    # ---- transcript phases: point-read loops + static squeezes ----
    d = _cs_degree(cs)
    chunk_len = d - 2
    perm_cols = cs.permutation_columns
    chunks = [perm_cols[i:i + chunk_len]
              for i in range(0, len(perm_cols), chunk_len)]
    nL = len(cs.lookups)
    ext_k = vk.k + max(1, (d - 1).bit_length())
    f = (1 << ext_k) // n

    def read_points_loop(count: int) -> int:
        """Reads `count` points from the calldata cursor into `count`
        consecutive point slots; returns the first slot."""
        if count == 0:
            return g.n_slots
        base_slot = g.n_slots
        for _ in range(count):
            g.point_slot()
        cd0, tp0 = g.cd_off, g.t_ptr
        base_addr = g.off(base_slot)

        def body():
            for coord in (0, 32):
                g.push_i_addr(cd0 + coord, 64)
                a.op("CALLDATALOAD", "DUP1")
                g.push_i_addr(g.tb + tp0 + coord, 64)
                a.op("MSTORE")                 # absorb
                g.push_i_addr(base_addr + coord, 64)
                a.op("MSTORE")                 # slot store
            g.push_i_addr(base_addr, 64)
            a.push(X1).op("MSTORE")
            g.curve_check_dyn(X1)

        g.loop_static(count, body)
        g.cd_off += 64 * count
        g.t_ptr += 64 * count
        return base_slot

    g.section("phases")
    adv0 = read_points_loop(len(cs.advice))
    advice_comms = [adv0 + 2 * i for i in range(len(cs.advice))]
    theta = g.squeeze()
    lp0 = read_points_loop(2 * nL)
    lookup_perm_comms = [(lp0 + 4 * i, lp0 + 4 * i + 2) for i in range(nL)]
    beta = g.squeeze()
    gamma_perm = g.squeeze()
    zc0 = read_points_loop(len(chunks) + nL + 1)
    z_comms = [zc0 + 2 * i for i in range(len(chunks))]
    lookup_z_comms = [zc0 + 2 * (len(chunks) + i) for i in range(nL)]
    rand_comm = zc0 + 2 * (len(chunks) + nL)
    y = g.squeeze()
    h0 = read_points_loop(f)
    h_comms = [h0 + 2 * i for i in range(f)]
    x = g.squeeze()
    if dbg("challenges", [theta, beta, gamma_perm, y, x]):
        return _finish()

    # ---- point powers z_e = x * omega^e ----
    queries = column_queries(cs)
    kind_of = {col.index: col.kind for col in cs.columns}
    adv_idx = {col.index: i for i, col in enumerate(cs.advice)}
    fix_idx = {col.index: i for i, col in enumerate(cs.fixed)}
    inst_idx = {col.index: i for i, col in enumerate(cs.instance)}

    exps: List[int] = []

    def sym(e_: int) -> int:
        e_ %= n
        if e_ not in exps:
            exps.append(e_)
        return e_

    for (_gcol, rot) in queries:
        sym(rot)
    sym(0), sym(1), sym(n - 1), sym(usable)

    g.section("zslots")
    zslot: Dict[int, int] = {}
    for e_ in exps:
        s = g.slot()
        g.load(x)
        a.push(pow(dom.omega, e_, FR))
        g.fr_mul_stack()
        g.store(s)
        zslot[e_] = s

    xn = g.slot()
    g.load(x)
    for _ in range(vk.k):
        a.op("DUP1")
        g.fr_mul_stack()
    g.store(xn)
    zh_inv = g.slot()
    g.load(xn)
    a.push(FR - 1)
    g.fr_add_stack()
    g.fr_inv_stack()
    g.store(zh_inv)

    n_inv = pow(n, FR - 2, FR)

    def lagrange_at_stack(i: int):
        w = pow(dom.omega, i % n, FR)
        g.load(x)
        a.push(FR - w)
        g.fr_add_stack()
        g.fr_inv_stack()
        g.load(xn)
        a.push(FR - 1)
        g.fr_add_stack()
        g.fr_mul_stack()
        a.push(w * n_inv % FR)
        g.fr_mul_stack()

    # ---- instance column evals: barycentric loops ----
    g.section("inst_evals")
    inst_evals: Dict[Tuple[int, int], int] = {}
    for (gcol, rot) in queries:
        if kind_of[gcol] != "instance":
            continue
        ci = inst_idx[gcol]
        nrows = inst_shape[ci]
        base_cd = 32 * sum(inst_shape[:ci])
        s = g.slot()
        a.push(1).push(X1).op("MSTORE")      # w
        a.push(0).push(X2).op("MSTORE")      # acc

        def bary_body():
            # inv(z - w)
            g.load(zslot[rot % n])
            a.push(X1).op("MLOAD")
            g.push_fr()
            a.op("SUB")                       # FR - w (w canonical, != 0)
            g.fr_add_stack()
            g.fr_inv_stack()
            g.load(xn)
            a.push(FR - 1)
            g.fr_add_stack()
            g.fr_mul_stack()
            a.push(X1).op("MLOAD")
            g.fr_mul_stack()
            a.push(n_inv)
            g.fr_mul_stack()
            g.push_i_addr(base_cd, 32)
            a.op("CALLDATALOAD")
            g.fr_mul_stack()
            a.push(X2).op("MLOAD")
            g.fr_add_stack()
            a.push(X2).op("MSTORE")
            # w *= omega
            a.push(X1).op("MLOAD")
            a.push(dom.omega)
            g.fr_mul_stack()
            a.push(X1).op("MSTORE")

        g.loop_static(nrows, bary_body)
        a.push(X2).op("MLOAD")
        g.store(s)
        inst_evals[(gcol, rot)] = s
    if dbg("inst", list(inst_evals.values())):
        return _finish()

    # ---- claimed evals: one read loop over consecutive slots ----
    g.section("evals_read")
    nq = [(gcol, rot) for (gcol, rot) in queries
          if kind_of[gcol] != "instance"]
    n_evals = (len(nq) + 1 + len(perm_cols) + 2 * len(chunks)
               + max(0, len(chunks) - 1) + 5 * nL)
    ev_base = g.n_slots
    for _ in range(n_evals):
        g.slot()
    cd0, tp0 = g.cd_off, g.t_ptr
    ev_addr = g.off(ev_base)

    def evals_body():
        g.push_i_addr(cd0, 32)
        a.op("CALLDATALOAD", "DUP1")
        a.push(FR).op("SWAP1", "LT")
        g.and_success()
        a.op("DUP1")
        g.push_i_addr(g.tb + tp0, 32)
        a.op("MSTORE")
        g.push_i_addr(ev_addr, 32)
        a.op("MSTORE")

    g.loop_static(n_evals, evals_body)
    g.cd_off += 32 * n_evals
    g.t_ptr += 32 * n_evals

    # static eval-slot map mirroring the read order
    cur = ev_base
    eval_slots: Dict[Tuple[int, int], int] = dict(inst_evals)
    claims: List[tuple] = []
    for (gcol, rot) in nq:
        eval_slots[(gcol, rot)] = cur
        comm = (advice_comms[adv_idx[gcol]] if kind_of[gcol] == "advice"
                else g.data_point(vk.fixed_commitments[fix_idx[gcol]]))
        claims.append((("col", gcol), comm, sym(rot), cur,
                       kind_of[gcol] == "advice"))
        cur += 1
    rand_eval = cur
    claims.append((("rand",), rand_comm, sym(0), cur, True))
    cur += 1
    sigma_evals = []
    for gi in range(len(perm_cols)):
        sigma_evals.append(cur)
        claims.append((("sig", gi),
                       g.data_point(vk.sigma_commitments[gi]),
                       sym(0), cur, False))
        cur += 1
    z_at_x, z_at_next = [], []
    for c_idx in range(len(chunks)):
        z_at_x.append(cur)
        z_at_next.append(cur + 1)
        claims.append((("z", c_idx), z_comms[c_idx], sym(0), cur, True))
        claims.append((("z", c_idx), z_comms[c_idx], sym(1), cur + 1, True))
        cur += 2
    z_prev_last = []
    for c_idx in range(1, len(chunks)):
        z_prev_last.append(cur)
        claims.append((("z", c_idx - 1), z_comms[c_idx - 1],
                       sym(usable), cur, True))
        cur += 1
    lookup_evals = []
    for li in range(nL):
        zx, zn, apx, app, spx = cur, cur + 1, cur + 2, cur + 3, cur + 4
        lookup_evals.append((zx, zn, apx, app, spx))
        ca, cst = lookup_perm_comms[li]
        claims.append((("lz", li), lookup_z_comms[li], sym(0), zx, True))
        claims.append((("lz", li), lookup_z_comms[li], sym(1), zn, True))
        claims.append((("la", li), ca, sym(0), apx, True))
        claims.append((("la", li), ca, sym(n - 1), app, True))
        claims.append((("ls", li), cst, sym(0), spx, True))
        cur += 5
    assert cur - ev_base == n_evals

    # ---- lagrange pieces ----
    g.section("lagrange")
    l0 = g.slot()
    lagrange_at_stack(0)
    g.store(l0)
    llast = g.slot()
    lagrange_at_stack(usable)
    g.store(llast)
    lactive = g.slot()
    # 1 - llast - sum_{i in (usable, n)} L_i(x), via a loop with a
    # running omega power starting at omega^(usable+1)
    a.push(1)
    g.load(llast)
    g.fr_sub_stack()
    a.push(X2).op("MSTORE")
    a.push(pow(dom.omega, usable + 1, FR)).push(X1).op("MSTORE")

    def blind_body():
        g.load(x)
        a.push(X1).op("MLOAD")
        g.push_fr()
        a.op("SUB")
        g.fr_add_stack()
        g.fr_inv_stack()
        g.load(xn)
        a.push(FR - 1)
        g.fr_add_stack()
        g.fr_mul_stack()
        a.push(X1).op("MLOAD")
        g.fr_mul_stack()
        a.push(n_inv)
        g.fr_mul_stack()
        # acc -= term
        g.fr_neg_stack()
        a.push(X2).op("MLOAD")
        g.fr_add_stack()
        a.push(X2).op("MSTORE")
        a.push(X1).op("MLOAD")
        a.push(dom.omega)
        g.fr_mul_stack()
        a.push(X1).op("MSTORE")

    g.loop_static(n - 1 - usable, blind_body)
    a.push(X2).op("MLOAD")
    g.store(lactive)
    if dbg("lagrange", [l0, llast, lactive]):
        return _finish()

    # ---- gate fold via the RPN tape interpreter ----
    g.section("gates_tape")
    folded = g.slot()
    a.push(0)
    g.store(folded)
    for gate in cs.gates:
        for p in gate.polys:
            g.tape_expr(p, eval_slots)
            g.tape.append(OP_FOLD)
    g.tape.append(OP_END)
    tape_addr = g.data_blob(bytes(g.tape))
    g.emit_tape_interpreter(tape_addr, folded, y)

    def fold_push():
        g.load(folded)
        g.load(y)
        g.fr_mul_stack()
        g.fr_add_stack()
        g.store(folded)

    # ---- permutation folds ----
    g.section("perm_folds")
    if chunks:
        a.push(1)
        g.load(z_at_x[0])
        g.fr_sub_stack()
        g.load(l0)
        g.fr_mul_stack()
        fold_push()
        g.load(z_at_x[-1])
        a.op("DUP1", "DUP1")
        g.fr_mul_stack()
        a.op("SWAP1")
        g.fr_sub_stack()
        g.load(llast)
        g.fr_mul_stack()
        fold_push()
        # per-chunk product folds as ONE runtime loop over chunks (at
        # degree-3 gate sets chunk_len is 1, so chunks ~= perm columns):
        # the continuity fold branches on c>0, the inner column loop's
        # bound comes from a 1-byte-per-chunk table (last chunk ragged),
        # and the delta power runs across the whole loop in X1
        perm_tbl = bytearray()
        for col in perm_cols:
            perm_tbl += g.off(eval_slots[(col, 0)]).to_bytes(3, "big")
        perm_tbl_addr = g.data_blob(bytes(perm_tbl))
        cnt_tbl_addr = g.data_blob(bytes(len(ch) for ch in chunks))
        a.push(1).push(X1).op("MSTORE")       # delta_run

        def push_gi(scale: int, base_addr: int):
            """Pushes base_addr + scale * (c*chunk_len + j)."""
            a.push(I_VAR).op("MLOAD")
            a.push(chunk_len).op("MUL")
            a.push(J_VAR).op("MLOAD", "ADD")
            if scale != 1:
                a.push(scale).op("MUL")
            a.push(base_addr).op("ADD")

        # continuity folds for c in 1..nchunks FIRST (the y-fold order
        # must match the prover's quotient term order exactly)
        def cont_body():
            # i runs 0..nchunks-2; c = i+1
            g.push_i_addr(g.off(z_at_x[0]) + 64, 64)
            a.op("MLOAD")
            g.push_i_addr(g.off(z_prev_last[0]) if z_prev_last else 0, 32)
            a.op("MLOAD")
            g.fr_sub_stack()
            g.load(l0)
            g.fr_mul_stack()
            fold_push()

        g.loop_static(len(chunks) - 1, cont_body)

        def chunk_iter():
            g.push_i_addr(g.off(z_at_next[0]), 64)
            a.op("MLOAD")
            a.push(X2).op("MSTORE")           # left acc
            g.push_i_addr(g.off(z_at_x[0]), 64)
            a.op("MLOAD")
            a.push(X3).op("MSTORE")           # right acc
            g.push_i_addr(cnt_tbl_addr, 1)
            a.op("MLOAD")
            a.push(248).op("SHR")
            a.push(K_VAR).op("MSTORE")

            def col_body():
                # a_val + gamma
                push_gi(3, perm_tbl_addr)
                a.op("MLOAD")
                a.push(232).op("SHR", "MLOAD")
                g.load(gamma_perm)
                g.fr_add_stack()
                a.op("DUP1")                   # [t t]
                # left: t + beta*sigma_gi
                g.load(beta)
                push_gi(32, g.off(sigma_evals[0]))
                a.op("MLOAD")
                g.fr_mul_stack()
                g.fr_add_stack()
                a.push(X2).op("MLOAD")
                g.fr_mul_stack()
                a.push(X2).op("MSTORE")        # [t]
                # right: t + beta*delta_run*x
                g.load(beta)
                a.push(X1).op("MLOAD")
                g.fr_mul_stack()
                g.load(x)
                g.fr_mul_stack()
                g.fr_add_stack()
                a.push(X3).op("MLOAD")
                g.fr_mul_stack()
                a.push(X3).op("MSTORE")
                # delta_run *= DELTA
                a.push(X1).op("MLOAD")
                a.push(DELTA)
                g.fr_mul_stack()
                a.push(X1).op("MSTORE")

            g.loop_dyn(K_VAR, col_body)
            a.push(X2).op("MLOAD")
            a.push(X3).op("MLOAD")
            g.fr_sub_stack()
            g.load(lactive)
            g.fr_mul_stack()
            fold_push()

        g.loop_static(len(chunks), chunk_iter)

    # ---- lookup folds (per lookup, inline; few lookups exist) ----
    g.section("lookup_folds")
    from .verifier_gen import _emit_expr
    for li, lk in enumerate(cs.lookups):
        zx, zn, apx, app, spx = lookup_evals[li]

        def horner(exprs):
            a.push(0)
            for e_ in exprs:
                g.load(theta)
                g.fr_mul_stack()
                _emit_expr(g, e_, eval_slots)
                g.fr_add_stack()

        a.push(1)
        g.load(zx)
        g.fr_sub_stack()
        g.load(l0)
        g.fr_mul_stack()
        fold_push()
        g.load(zx)
        a.op("DUP1", "DUP1")
        g.fr_mul_stack()
        a.op("SWAP1")
        g.fr_sub_stack()
        g.load(llast)
        g.fr_mul_stack()
        fold_push()
        g.load(zn)
        g.load(apx)
        g.load(beta)
        g.fr_add_stack()
        g.fr_mul_stack()
        g.load(spx)
        g.load(gamma_perm)
        g.fr_add_stack()
        g.fr_mul_stack()
        g.load(zx)
        horner(lk.inputs)
        g.load(beta)
        g.fr_add_stack()
        g.fr_mul_stack()
        horner(lk.tables)
        g.load(gamma_perm)
        g.fr_add_stack()
        g.fr_mul_stack()
        g.fr_sub_stack()
        g.load(lactive)
        g.fr_mul_stack()
        fold_push()
        g.load(apx)
        g.load(spx)
        g.fr_sub_stack()
        g.load(l0)
        g.fr_mul_stack()
        fold_push()
        g.load(apx)
        g.load(spx)
        g.fr_sub_stack()
        g.load(apx)
        g.load(app)
        g.fr_sub_stack()
        g.fr_mul_stack()
        g.load(lactive)
        g.fr_mul_stack()
        fold_push()

    # the gate tape runs BEFORE the permutation/lookup folds in value
    # order — emit the interpreter call at the right place instead:
    # (the folds above multiplied `folded` by y per fold_push, so order
    # matters; the tape handled gates first because it was emitted first)

    # expected_h = folded / zh
    expected_h = g.slot()
    g.load(folded)
    g.load(zh_inv)
    g.fr_mul_stack()
    g.store(expected_h)
    if dbg("folded", [folded, expected_h]):
        return _finish()

    # ---- h_comm = sum xn^i [h_i]: loop ----
    g.section("h_fold")
    h_comm = g.point_slot()
    mult = g.slot()
    a.push(1)
    g.store(mult)
    # h_comm starts as untouched (0,0) memory = identity

    def h_body():
        g.push_i_addr(g.off(h_comms[0]), 64)
        a.push(X1).op("MSTORE")
        g.ec_mul_dyn_to_scratch(X1, mult)
        a.push(g.off(h_comm)).push(X1).op("MSTORE")
        g.ec_add_scratch_into_dyn(X1)
        g.load(mult)
        g.load(xn)
        g.fr_mul_stack()
        g.store(mult)

    g.loop_static(f, h_body)
    claims.append((("H",), h_comm, sym(0), expected_h, True))

    # ================= SHPLONK =================
    g.section("shplonk_polys")
    gamma = g.squeeze()

    poly_order: List[object] = []
    by_poly: Dict[object, dict] = {}
    for (key, comm, e_, vslot, is_slot) in claims:
        if key not in by_poly:
            by_poly[key] = dict(idx=len(poly_order), pts={},
                                obj=comm, is_slot=is_slot)
            poly_order.append(key)
        by_poly[key]["pts"][e_] = vslot
    sets: Dict[tuple, list] = {}
    for key in poly_order:
        S = tuple(sorted(by_poly[key]["pts"]))
        sets.setdefault(S, []).append(key)
    T = sorted({e_ for (_k, _c, e_, _v, _s) in claims})

    # per-set runtime regions: [Cx, Cy, val_0 .. val_{|S|-1}]
    set_region: Dict[tuple, int] = {}
    for S in sets:
        base_slot = g.n_slots
        g.point_slot()
        for _ in S:
            g.slot()
        set_region[S] = base_slot
    # C and vals start as zeroed memory (identity / 0)

    # data rows per poly: comm_addr(3) set_ptr(3) npts(1) [eval_addr(3)]*
    rows = bytearray()
    for key in poly_order:
        info = by_poly[key]
        S = tuple(sorted(info["pts"]))
        comm_addr = (g.off(info["obj"]) if info["is_slot"]
                     else info["obj"])
        rows += comm_addr.to_bytes(3, "big")
        rows += g.off(set_region[S]).to_bytes(3, "big")
        rows.append(len(S))
        for e_ in S:
            rows += g.off(info["pts"][e_]).to_bytes(3, "big")
    rows_addr = g.data_blob(bytes(rows))

    gp = g.slot()
    a.push(1)
    g.store(gp)
    a.push(rows_addr).push(DP_VAR).op("MSTORE")

    def poly_body():
        g.dp_read(3)                      # comm_addr
        a.push(X1).op("MSTORE")
        g.dp_read(3)                      # set_ptr
        a.push(X2).op("MSTORE")
        g.dp_read(1)                      # npts
        a.push(X3).op("MSTORE")
        # C_set += gp * comm
        g.ec_mul_dyn_to_scratch(X1, gp)
        g.ec_add_scratch_into_dyn(X2)

        def pt_body():
            g.dp_read(3)                  # eval addr
            a.op("MLOAD")                 # [v]
            g.load(gp)
            g.fr_mul_stack()              # [gp*v]
            # val_ptr = set_ptr + 64 + 32*j
            a.push(J_VAR).op("MLOAD")
            a.push(32).op("MUL")
            a.push(64).op("ADD")
            a.push(X2).op("MLOAD", "ADD")  # [gp*v, val_ptr]
            a.op("DUP1", "MLOAD")          # [gp*v, val_ptr, val]
            a.op("SWAP2")                  # [val, val_ptr, gp*v]
            a.op("SWAP1")                  # [val, gp*v, val_ptr]
            a.op("SWAP2")                  # [val_ptr, gp*v, val]
            g.fr_add_stack()               # [val_ptr, val+gp*v]
            a.op("SWAP1", "MSTORE")
        g.loop_dyn(X3, pt_body)
        g.load(gp)
        g.load(gamma)
        g.fr_mul_stack()
        g.store(gp)

    g.loop_static(len(poly_order), poly_body)

    Hc = g.read_point()
    u = g.squeeze()
    if dbg("u", [gamma, u, Hc, Hc + 1]):
        return _finish()

    g.section("udiff")
    udiff = {}
    for e_ in T:
        s = g.slot()
        g.load(u)
        g.load(zslot[e_])
        g.fr_sub_stack()
        g.store(s)
        udiff[e_] = s

    g.section("sets")
    E = g.point_slot()
    const_acc = g.slot()
    a.push(0)
    g.store(const_acc)

    first_set = True
    for S, keys in sets.items():
        region = set_region[S]
        C = region
        vals = {e_: region + 2 + j for j, e_ in enumerate(S)}
        zts = g.slot()
        a.push(1)
        for e_ in T:
            if e_ not in S:
                g.load(udiff[e_])
                g.fr_mul_stack()
        g.store(zts)
        if first_set:
            g.ec_mul(E, C, zts)
            first_set = False
        else:
            tmp = g.point_slot()
            g.ec_mul(tmp, C, zts)
            g.ec_add(E, E, tmp)
        # r_S(u) = sum_i vals[i] * prod_{j!=i} udiff[zj] / (zi - zj),
        # as nested runtime loops over 3-byte addr tables (the inline
        # O(|S|^2) emission was ~50 KB on wide circuits)
        if len(S) == 1:
            g.load(vals[S[0]])
        else:
            ztbl = bytearray()
            utbl = bytearray()
            for zi in S:
                ztbl += g.off(zslot[zi]).to_bytes(3, "big")
                utbl += g.off(udiff[zi]).to_bytes(3, "big")
            ztbl_addr = g.data_blob(bytes(ztbl))
            utbl_addr = g.data_blob(bytes(utbl))
            a.push(0).push(X2).op("MSTORE")          # acc

            def ri_body(S=S, ztbl_addr=ztbl_addr, utbl_addr=utbl_addr,
                        vbase=g.off(region + 2)):
                g.push_i_addr(vbase, 32)
                a.op("MLOAD")
                a.push(X1).op("MSTORE")              # num = vals[i]
                a.push(1).push(X3).op("MSTORE")      # den = 1

                def rj_body():
                    skip = a.new_label("rij")
                    a.push(I_VAR).op("MLOAD")
                    a.push(J_VAR).op("MLOAD", "EQ")
                    a.push_label(skip)
                    a.op("JUMPI")
                    # num *= udiff[zj]
                    g.push_i_addr(utbl_addr, 3, ivar=J_VAR)
                    a.op("MLOAD")
                    a.push(232).op("SHR", "MLOAD")
                    a.push(X1).op("MLOAD")
                    g.fr_mul_stack()
                    a.push(X1).op("MSTORE")
                    # den *= (zi - zj)
                    g.push_i_addr(ztbl_addr, 3, ivar=I_VAR)
                    a.op("MLOAD")
                    a.push(232).op("SHR", "MLOAD")
                    g.push_i_addr(ztbl_addr, 3, ivar=J_VAR)
                    a.op("MLOAD")
                    a.push(232).op("SHR", "MLOAD")
                    g.fr_sub_stack()
                    a.push(X3).op("MLOAD")
                    g.fr_mul_stack()
                    a.push(X3).op("MSTORE")
                    a.mark(skip)

                g.loop_static(len(S), rj_body, ivar=J_VAR)
                # acc += num * inv(den)
                a.push(X3).op("MLOAD")
                g.fr_inv_stack()
                a.push(X1).op("MLOAD")
                g.fr_mul_stack()
                a.push(X2).op("MLOAD")
                g.fr_add_stack()
                a.push(X2).op("MSTORE")

            g.loop_static(len(S), ri_body, ivar=I_VAR)
            a.push(X2).op("MLOAD")
        g.load(zts)
        g.fr_mul_stack()
        g.load(const_acc)
        g.fr_add_stack()
        g.store(const_acc)

    g.section("pairing_tail")
    zt_u = g.slot()
    a.push(1)
    for e_ in T:
        g.load(udiff[e_])
        g.fr_mul_stack()
    g.store(zt_u)

    neg_const = g.slot()
    g.load(const_acc)
    g.fr_neg_stack()
    g.store(neg_const)
    tmp = g.point_slot()
    g.ec_mul(tmp, (1, 2), neg_const)
    g.ec_add(E, E, tmp)
    neg_zt = g.slot()
    g.load(zt_u)
    g.fr_neg_stack()
    g.store(neg_zt)
    tmp2 = g.point_slot()
    g.ec_mul(tmp2, Hc, neg_zt)
    g.ec_add(E, E, tmp2)
    if dbg("E", [const_acc, zt_u, E, E + 1]):
        return _finish()

    W = g.read_point()

    uW = g.point_slot()
    g.ec_mul(uW, W, u)
    P1 = g.point_slot()
    g.ec_add(P1, E, uW)
    negW = g.point_slot()
    g.ec_neg(negW, W)

    if g.acc_indices:
        flat_off = []
        for (ci, ri) in g.acc_indices:
            flat_off.append(32 * (sum(inst_shape[:ci]) + ri))
        acc_pts = []
        for pi in range(2):
            ps = g.point_slot()
            for coord in range(2):
                offs = flat_off[6 * pi + 3 * coord:6 * pi + 3 * coord + 3]
                a.push(0)
                for li_, o in enumerate(offs):
                    a.push(o).op("CALLDATALOAD")
                    a.op("DUP1")
                    a.push(78 if li_ == 2 else 88).op("SHR", "ISZERO")
                    g.and_success()
                    a.push(88 * li_).op("SHL", "ADD")
                a.op("DUP1")
                g.absorb_stack_word()
                g.store(ps + coord)
            g.curve_check(ps, allow_identity=False)
            acc_pts.append(ps)
        for s_ in (P1, negW):
            for c_ in (0, 1):
                g.load(s_ + c_)
                g.absorb_stack_word()
        r_fold = g.squeeze()
        tmp_l = g.point_slot()
        g.ec_mul(tmp_l, acc_pts[0], r_fold)
        g.ec_add(P1, P1, tmp_l)
        tmp_r = g.point_slot()
        g.ec_mul(tmp_r, acc_pts[1], r_fold)
        g.ec_add(negW, negW, tmp_r)

    g2 = srs.g2
    s_g2 = srs.s_g2
    pos = SCRATCH
    g.ec_write_operand(P1, pos)
    for i, v in enumerate((g2[0][1], g2[0][0], g2[1][1], g2[1][0])):
        a.push(int(v))
        g.mstore_at(pos + 64 + 32 * i)
    g.ec_write_operand(negW, pos + 192)
    for i, v in enumerate((s_g2[0][1], s_g2[0][0], s_g2[1][1], s_g2[1][0])):
        a.push(int(v))
        g.mstore_at(pos + 256 + 32 * i)
    if dbg("pairing", [P1, P1 + 1, negW, negW + 1]):
        return _finish()
    g._staticcall(8, pos, 384, pos, 32)
    g.and_success()
    a.push(pos).op("MLOAD")
    g.and_success()

    ok = a.new_label("ok")
    a.push(SUCCESS).op("MLOAD")
    a.push_label(ok)
    a.op("JUMPI")
    a.push(0).push(0).op("REVERT")
    a.mark(ok)
    a.push(1).push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")

    # append the data segment (constant tables + tapes) after the code —
    # unless it ships in external data contracts (ext_data)
    a.mark_data(data_label)
    if not ext_data:
        a.raw(bytes(g.data))
    return g


def gen_evm_verifier_looped(vk: VerifyingKey, srs, inst_shape: List[int],
                            accumulator_indices=None) -> bytes:
    """Deployable-size verifier: same interface as gen_evm_verifier."""
    # pass 1 with dummy bases: counts slots and the data-segment length
    g1 = _generate_loop(vk, srs, inst_shape, tb=1 << 22,
                        acc_indices=accumulator_indices,
                        data_base=1 << 21)
    slot_end = LOOP_SLOT_BASE + 32 * g1.n_slots
    data_base = (slot_end + 31) & ~31
    tb = data_base + ((len(g1.data) + 31) & ~31)
    g2_ = _generate_loop(vk, srs, inst_shape, tb=tb,
                         acc_indices=accumulator_indices,
                         data_base=data_base, data_len=len(g1.data))
    assert g2_.n_slots == g1.n_slots
    assert len(g2_.data) == len(g1.data)
    return g2_.a.assemble()


class DeployableVerifier:
    """EIP-170-splittable verifier: code (placeholder-linked) + external
    data contracts. The reference deploys snark-verifier contracts via
    forge (prover/src/cli.rs:244-271); deployed code is capped at
    24,576 bytes, so the constant tables + gate tapes ship as separate
    0x00-guarded data contracts loaded with EXTCODECOPY at runtime."""

    def __init__(self, code: bytes, data_contracts: List[bytes]):
        self.code = code                      # unlinked runtime code
        self.data_contracts = data_contracts  # runtime code, 0x00 + payload

    def link(self, addresses: List[int]) -> bytes:
        """Patch the placeholder PUSH20s with the deployed data-contract
        addresses (in chunk order). Returns deployable runtime code."""
        assert len(addresses) == len(self.data_contracts)
        out = bytearray(self.code)
        for i, addr in enumerate(addresses):
            pat = _placeholder_addr(i).to_bytes(20, "big")
            pos = bytes(out).find(pat)
            assert pos >= 0, f"placeholder {i} not found"
            out[pos:pos + 20] = int(addr).to_bytes(20, "big")
        return bytes(out)

    def deploy(self, world, base_address: int) -> int:
        """Deploy data contracts at base_address+1.. and the linked
        verifier at base_address on the in-repo EVM. Returns the
        verifier address."""
        addrs = []
        for i, dc in enumerate(self.data_contracts):
            world.deploy(base_address + 1 + i, dc)
            addrs.append(base_address + 1 + i)
        world.deploy(base_address, self.link(addrs))
        return base_address


def gen_evm_verifier_deployable(vk: VerifyingKey, srs,
                                inst_shape: List[int],
                                accumulator_indices=None
                                ) -> DeployableVerifier:
    """Same verification algorithm/calldata ABI as the looped generator,
    but EIP-170 deployable: the returned code holds only the program
    (placeholder data-contract addresses, patched by .link()); tables
    ship in <=24,576-byte data contracts."""
    g1 = _generate_loop(vk, srs, inst_shape, tb=1 << 22,
                        acc_indices=accumulator_indices,
                        data_base=1 << 21)
    slot_end = LOOP_SLOT_BASE + 32 * g1.n_slots
    data_base = (slot_end + 31) & ~31
    tb = data_base + ((len(g1.data) + 31) & ~31)
    g2_ = _generate_loop(vk, srs, inst_shape, tb=tb,
                         acc_indices=accumulator_indices,
                         data_base=data_base, data_len=len(g1.data),
                         ext_data=True)
    assert g2_.n_slots == g1.n_slots
    assert len(g2_.data) == len(g1.data)
    data = bytes(g2_.data)
    chunks = [b"\x00" + data[off:off + MAX_DATA_BYTES]
              for off in range(0, len(data), MAX_DATA_BYTES)]
    return DeployableVerifier(g2_.a.assemble(), chunks)
