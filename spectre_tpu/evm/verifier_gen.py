"""EVM verifier generator — gen_evm_verifier_shplonk analog.

Given a VerifyingKey (+ SRS G2 points), emits a standalone EVM program
that verifies a SHPLONK proof produced with the Keccak (EVM-flavor)
transcript. Calldata layout (encode_calldata analog,
util/circuit.rs:255-271): instance scalars as 32-byte BE words
(column-major), followed by the raw proof bytes.

The generator is a straight-line transcription of the native verifier
(plonk/verifier.py:_verify_proof + _check_shplonk): the verification
algorithm's control flow is fully static given the constraint system, so
every loop unrolls and every calldata/transcript offset is a compile-time
constant — the same property snark-verifier's EvmLoader exploits. Checks
accumulate into one success flag (no mid-code branching); field inversions
go through the modexp precompile, curve ops through ecAdd/ecMul/ecPairing
(EIP-196/197).

Emitted program: returns the 32-byte word 1 iff the proof verifies,
reverts otherwise.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

from ..fields.params import BN254_FR as FR, BN254_FQ as FQ
from ..plonk.keygen import VerifyingKey, DELTA
from ..plonk.expression import Expr, Const, ColumnRef, Sum, Prod, Scaled
from ..plonk.protocol import column_queries
from ..plonk.prover import _cs_degree
from .asm import Asm

# memory map
SUCCESS = 0x00
SCRATCH = 0x20           # precompile IO (up to 384 bytes)
SLOT_BASE = 0x220


class _Gen:
    """One generation pass. Slots hold Fr scalars (1 word) or G1 points
    (2 consecutive slots)."""

    def __init__(self, vk: VerifyingKey, srs, inst_shape: List[int],
                 tb: int, acc_indices=None):
        self.vk = vk
        self.srs = srs
        self.inst_shape = inst_shape
        self.acc_indices = acc_indices
        self.tb = tb                 # transcript region base
        self.a = Asm()
        self.n_slots = 0
        self.t_ptr = 0               # absorbed bytes since region start
        self.cd_off = 32 * sum(inst_shape)   # proof read cursor

    # ---- slots ----
    def slot(self) -> int:
        s = self.n_slots
        self.n_slots += 1
        return s

    def point_slot(self) -> int:
        s = self.n_slots
        self.n_slots += 2
        return s

    def off(self, s: int) -> int:
        return SLOT_BASE + 32 * s

    # ---- stack primitives (value on top of stack unless noted) ----
    def load(self, s: int):
        self.a.push(self.off(s)).op("MLOAD")

    def store(self, s: int):
        """Pops the stack top into slot s."""
        self.a.push(self.off(s)).op("MSTORE")

    def mstore_at(self, addr: int):
        self.a.push(addr).op("MSTORE")

    def and_success(self):
        """Pops a flag, ANDs it into the success accumulator."""
        self.a.push(SUCCESS).op("MLOAD", "AND")
        self.a.push(SUCCESS).op("MSTORE")

    # ---- Fr ops: operate on stack values, result on stack ----
    def fr_add_stack(self):
        """[.. a b] -> [.. (a+b)%r]  (push r below operands first)."""
        self.a.push(FR).op("SWAP2", "ADDMOD")

    def fr_mul_stack(self):
        self.a.push(FR).op("SWAP2", "MULMOD")

    def fr_neg_stack(self):
        """[.. a] -> [.. (r-a)%r]"""
        self.a.push(FR).op("SUB")          # r - a  (a canonical)
        self.a.push(FR).op("SWAP1", "MOD")  # handle a == 0

    def fr_sub_stack(self):
        """[.. a b] -> [.. (a-b)%r]"""
        self.fr_neg_stack()
        self.fr_add_stack()

    def fr_inv_stack(self):
        """[.. a] -> [.. a^-1 mod r] via modexp; flags success."""
        a = self.a
        for i, v in enumerate((32, 32, 32)):
            a.push(v)
            self.mstore_at(SCRATCH + 32 * i)
        self.mstore_at(SCRATCH + 96)      # base := popped operand
        a.push(FR - 2)
        self.mstore_at(SCRATCH + 128)
        a.push(FR)
        self.mstore_at(SCRATCH + 160)
        self._staticcall(5, SCRATCH, 192, SCRATCH + 192, 32)
        self.and_success()
        a.push(SCRATCH + 192).op("MLOAD")

    def _staticcall(self, addr: int, ao: int, asz: int, ro: int, rsz: int):
        a = self.a
        a.push(rsz).push(ro).push(asz).push(ao).push(addr)
        a.op("GAS", "STATICCALL")

    # ---- G1 ops over slots ----
    def ec_write_operand(self, src, pos: int):
        """src: point slot int, or (x, y) constant tuple."""
        if isinstance(src, tuple):
            self.a.push(src[0])
            self.mstore_at(pos)
            self.a.push(src[1])
            self.mstore_at(pos + 32)
        else:
            self.load(src)
            self.mstore_at(pos)
            self.load(src + 1)
            self.mstore_at(pos + 32)

    def ec_read_result(self, dst: int, pos: int):
        self.a.push(pos).op("MLOAD")
        self.store(dst)
        self.a.push(pos + 32).op("MLOAD")
        self.store(dst + 1)

    def ec_add(self, dst: int, p, q):
        self.ec_write_operand(p, SCRATCH)
        self.ec_write_operand(q, SCRATCH + 64)
        self._staticcall(6, SCRATCH, 128, SCRATCH, 64)
        self.and_success()
        self.ec_read_result(dst, SCRATCH)

    def ec_mul(self, dst: int, p, scalar_slot: int):
        self.ec_write_operand(p, SCRATCH)
        self.load(scalar_slot)
        self.mstore_at(SCRATCH + 64)
        self._staticcall(7, SCRATCH, 96, SCRATCH, 64)
        self.and_success()
        self.ec_read_result(dst, SCRATCH)

    def ec_neg(self, dst: int, p: int):
        """dst = -p: y -> (q - y) % q ((0,0) identity stays fixed since
        q % q == 0)."""
        self.load(p)
        self.store(dst)
        self.load(p + 1)
        self.a.push(FQ).op("SUB")               # q - y
        self.a.push(FQ).op("SWAP1", "MOD")      # (q - y) % q
        self.store(dst + 1)

    # ---- transcript ----
    def absorb_stack_word(self):
        """Pops a word, appends to the transcript region."""
        self.mstore_at(self.tb + self.t_ptr)
        self.t_ptr += 32

    def squeeze(self) -> int:
        """Keccak over the absorbed region; returns challenge slot."""
        a = self.a
        a.push(self.t_ptr).push(self.tb).op("KECCAK256")
        a.op("DUP1")
        self.mstore_at(self.tb)          # reseed: absorbed := digest
        self.t_ptr = 32
        a.push(FR).op("SWAP1", "MOD")
        s = self.slot()
        self.store(s)
        return s

    # ---- proof reading ----
    def read_scalar(self) -> int:
        """Reads a proof scalar: canonicity check + absorb + slot."""
        a = self.a
        a.push(self.cd_off).op("CALLDATALOAD")
        self.cd_off += 32
        a.op("DUP1")
        a.push(FR).op("SWAP1", "LT")     # v < r
        self.and_success()
        a.op("DUP1")
        self.absorb_stack_word()
        s = self.slot()
        self.store(s)
        return s

    def read_point(self) -> int:
        """Reads an uncompressed (x,y) proof point: canonicity + on-curve
        (or identity) check + absorb + point slot."""
        a = self.a
        p = self.point_slot()
        a.push(self.cd_off).op("CALLDATALOAD")
        a.op("DUP1")
        self.absorb_stack_word()
        self.store(p)
        a.push(self.cd_off + 32).op("CALLDATALOAD")
        a.op("DUP1")
        self.absorb_stack_word()
        self.store(p + 1)
        self.cd_off += 64
        self.curve_check(p)
        return p

    def curve_check(self, p: int, allow_identity: bool = True):
        """checks: x < q, y < q, (y^2 == x^3 + 3  OR  x==y==0)."""
        a = self.a
        self.load(p)
        a.push(FQ).op("SWAP1", "LT")     # x < q
        self.and_success()
        self.load(p + 1)
        a.push(FQ).op("SWAP1", "LT")     # y < q
        self.and_success()
        # y2 = mulmod(y, y, q)
        self.load(p + 1)
        a.op("DUP1")
        a.push(FQ).op("SWAP2", "MULMOD")
        # x3 = mulmod(mulmod(x, x, q), x, q)
        self.load(p)
        a.op("DUP1")
        a.push(FQ).op("SWAP2", "MULMOD")
        self.load(p)
        a.push(FQ).op("SWAP2", "MULMOD")
        # rhs = addmod(x3, 3, q)
        a.push(3)
        a.push(FQ).op("SWAP2", "ADDMOD")
        a.op("EQ")                       # oncurve = (y2 == rhs)
        if allow_identity:
            self.load(p)
            self.load(p + 1)
            a.op("OR", "ISZERO")         # identity = ((x|y) == 0)
            a.op("OR")                   # oncurve || identity
        self.and_success()


def _emit_expr(g: _Gen, e: Expr, eval_slots: Dict[Tuple[int, int], int]):
    """Pushes the expression value (an Fr scalar) onto the stack."""
    a = g.a
    if isinstance(e, Const):
        a.push(e.value % FR)
    elif isinstance(e, ColumnRef):
        g.load(eval_slots[(e.index, e.rotation)])
    elif isinstance(e, Sum):
        _emit_expr(g, e.terms[0], eval_slots)
        for t in e.terms[1:]:
            _emit_expr(g, t, eval_slots)
            g.fr_add_stack()
    elif isinstance(e, Prod):
        _emit_expr(g, e.factors[0], eval_slots)
        for f in e.factors[1:]:
            _emit_expr(g, f, eval_slots)
            g.fr_mul_stack()
    elif isinstance(e, Scaled):
        _emit_expr(g, e.inner, eval_slots)
        a.push(e.scalar % FR)
        g.fr_mul_stack()
    else:
        raise TypeError(f"unsupported expr in EVM codegen: {e!r}")


def _dbg_return(g: _Gen, name: str, slots) -> bool:
    """Debug hook: when generation was asked to stop at `name`, emit code
    returning the listed slots (bisecting looped-vs-straight codegen)."""
    if getattr(g, "debug_return", None) != name:
        return False
    a = g.a
    for i, s in enumerate(slots):
        g.load(s)
        g.mstore_at(32 * (i + 1))
    a.push(SUCCESS).op("MLOAD")
    a.push(0).op("MSTORE")
    a.push(32 * (len(slots) + 1)).push(0).op("RETURN")
    return True


def _generate(vk: VerifyingKey, srs, inst_shape: List[int],
              tb: int, acc_indices=None, debug_return=None) -> _Gen:
    cs = vk.cs
    dom = vk.domain
    n = vk.n
    usable = cs.usable_rows(n)
    g = _Gen(vk, srs, inst_shape, tb, acc_indices)
    g.debug_return = debug_return
    a = g.a

    # success := 1
    a.push(1).push(SUCCESS).op("MSTORE")

    # ---- absorb instances (common_scalar each) ----
    cd = 0
    for ncol in inst_shape:
        for _ in range(ncol):
            a.push(cd).op("CALLDATALOAD")
            a.op("DUP1")
            a.push(FR).op("SWAP1", "LT")
            g.and_success()
            g.absorb_stack_word()
            cd += 32

    # ---- transcript phase 1: commitments + challenges ----
    advice_comms = [g.read_point() for _ in cs.advice]
    theta = g.squeeze()
    lookup_perm_comms = [(g.read_point(), g.read_point())
                         for _ in cs.lookups]
    beta = g.squeeze()
    gamma_perm = g.squeeze()

    d = _cs_degree(cs)
    chunk_len = d - 2
    perm_cols = cs.permutation_columns
    chunks = [perm_cols[i:i + chunk_len]
              for i in range(0, len(perm_cols), chunk_len)]
    z_comms = [g.read_point() for _ in chunks]
    lookup_z_comms = [g.read_point() for _ in cs.lookups]
    rand_comm = g.read_point()
    y = g.squeeze()

    ext_k = vk.k + max(1, (d - 1).bit_length())
    f = (1 << ext_k) // n
    h_comms = [g.read_point() for _ in range(f)]
    x = g.squeeze()
    if _dbg_return(g, "challenges", [theta, beta, gamma_perm, y, x]):
        return g

    # ---- point powers: z_e = x * omega^e for every needed exponent ----
    queries = column_queries(cs)
    kind_of = {col.index: col.kind for col in cs.columns}
    adv_idx = {col.index: i for i, col in enumerate(cs.advice)}
    fix_idx = {col.index: i for i, col in enumerate(cs.fixed)}
    inst_idx = {col.index: i for i, col in enumerate(cs.instance)}

    exps = []                       # point symbols, as omega exponents

    def sym(e_: int) -> int:
        e_ %= n
        if e_ not in exps:
            exps.append(e_)
        return e_

    for (_gcol, rot) in queries:
        sym(rot)
    sym(0), sym(1), sym(n - 1), sym(usable)

    zslot: Dict[int, int] = {}
    for e_ in exps:
        s = g.slot()
        g.load(x)
        a.push(pow(dom.omega, e_, FR))
        g.fr_mul_stack()
        g.store(s)
        zslot[e_] = s

    # xn = x^n, zh = x^n - 1, zh_inv
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

    # zn1 = (x^n - 1), n_inv constants for lagrange
    n_inv = pow(n, FR - 2, FR)

    def lagrange_at_stack(i: int):
        """Pushes L_i(x) = omega^i * (x^n-1) / (n (x - omega^i))."""
        w = pow(dom.omega, i % n, FR)
        g.load(x)
        a.push(FR - w)
        g.fr_add_stack()            # x - w^i
        g.fr_inv_stack()
        g.load(xn)
        a.push(FR - 1)
        g.fr_add_stack()
        g.fr_mul_stack()
        a.push(w * n_inv % FR)
        g.fr_mul_stack()

    # ---- instance column evals at their queried points ----
    inst_evals: Dict[Tuple[int, int], int] = {}
    for (gcol, rot) in queries:
        if kind_of[gcol] != "instance":
            continue
        ci = inst_idx[gcol]
        nrows = inst_shape[ci]
        base_cd = 32 * sum(inst_shape[:ci])
        s = g.slot()
        # sum_i v_i * w^i (z^n - 1) / (n (z - w^i)) with z = x*omega^rot:
        # z^n = x^n (omega^rot is an n-th root of unity)
        a.push(0)
        for i in range(nrows):
            w = pow(dom.omega, i % n, FR)
            g.load(zslot[rot % n])
            a.push(FR - w)
            g.fr_add_stack()
            g.fr_inv_stack()
            g.load(xn)
            a.push(FR - 1)
            g.fr_add_stack()
            g.fr_mul_stack()
            a.push(w * n_inv % FR)
            g.fr_mul_stack()
            a.push(base_cd + 32 * i).op("CALLDATALOAD")
            g.fr_mul_stack()
            g.fr_add_stack()
        g.store(s)
        inst_evals[(gcol, rot)] = s
    if _dbg_return(g, "inst", list(inst_evals.values())):
        return g

    # ---- read claimed evals; build the claims list ----
    # claim: (key, comm, e_sym, val_slot); comm: slot int | (x,y) const
    eval_slots: Dict[Tuple[int, int], int] = dict(inst_evals)
    claims: List[tuple] = []
    for (gcol, rot) in queries:
        if kind_of[gcol] == "instance":
            continue
        v = g.read_scalar()
        eval_slots[(gcol, rot)] = v
        comm = (advice_comms[adv_idx[gcol]] if kind_of[gcol] == "advice"
                else vk.fixed_commitments[fix_idx[gcol]])
        if not isinstance(comm, int):
            comm = comm if comm is not None else (0, 0)
            comm = (int(comm[0]), int(comm[1]))
        claims.append((("col", gcol), comm, sym(rot), v))

    rand_eval = g.read_scalar()
    claims.append((("rand",), rand_comm, sym(0), rand_eval))

    sigma_evals = []
    for gi in range(len(perm_cols)):
        v = g.read_scalar()
        sigma_evals.append(v)
        c = vk.sigma_commitments[gi]
        c = (int(c[0]), int(c[1])) if c is not None else (0, 0)
        claims.append((("sig", gi), c, sym(0), v))

    z_at_x, z_at_next = [], []
    for c_idx in range(len(chunks)):
        vx = g.read_scalar()
        vn = g.read_scalar()
        z_at_x.append(vx)
        z_at_next.append(vn)
        claims.append((("z", c_idx), z_comms[c_idx], sym(0), vx))
        claims.append((("z", c_idx), z_comms[c_idx], sym(1), vn))
    z_prev_last = []
    for c_idx in range(1, len(chunks)):
        v = g.read_scalar()
        z_prev_last.append(v)
        claims.append((("z", c_idx - 1), z_comms[c_idx - 1],
                       sym(usable), v))

    lookup_evals = []
    for li in range(len(cs.lookups)):
        zx = g.read_scalar()
        zn = g.read_scalar()
        apx = g.read_scalar()
        app = g.read_scalar()
        spx = g.read_scalar()
        lookup_evals.append((zx, zn, apx, app, spx))
        ca, cst = lookup_perm_comms[li]
        claims.append((("lz", li), lookup_z_comms[li], sym(0), zx))
        claims.append((("lz", li), lookup_z_comms[li], sym(1), zn))
        claims.append((("la", li), ca, sym(0), apx))
        claims.append((("la", li), ca, sym(n - 1), app))
        claims.append((("ls", li), cst, sym(0), spx))

    # ---- lagrange pieces: l0, llast, lblind, lactive ----
    l0 = g.slot()
    lagrange_at_stack(0)
    g.store(l0)
    llast = g.slot()
    lagrange_at_stack(usable)
    g.store(llast)
    lactive = g.slot()
    a.push(1)
    g.load(llast)
    g.fr_sub_stack()
    for i in range(usable + 1, n):
        lagrange_at_stack(i)
        g.fr_sub_stack()
    g.store(lactive)
    if _dbg_return(g, "lagrange", [l0, llast, lactive]):
        return g

    # ---- fold the constraint values with y (Horner, running slot) ----
    folded = g.slot()
    a.push(0)
    g.store(folded)

    def fold_push():
        """Pops a value v; folded = folded*y + v."""
        g.load(folded)
        g.load(y)
        g.fr_mul_stack()
        g.fr_add_stack()
        g.store(folded)

    for gate in cs.gates:
        for p in gate.polys:
            _emit_expr(g, p, eval_slots)
            fold_push()

    if chunks:
        # l0 * (1 - z0(x))
        a.push(1)
        g.load(z_at_x[0])
        g.fr_sub_stack()
        g.load(l0)
        g.fr_mul_stack()
        fold_push()
        # llast * (zlast^2 - zlast)
        g.load(z_at_x[-1])
        a.op("DUP1", "DUP1")
        g.fr_mul_stack()        # [z, z^2]
        a.op("SWAP1")           # [z^2, z]
        g.fr_sub_stack()        # z^2 - z
        g.load(llast)
        g.fr_mul_stack()
        fold_push()
        for c in range(1, len(chunks)):
            g.load(z_at_x[c])
            g.load(z_prev_last[c - 1])
            g.fr_sub_stack()
            g.load(l0)
            g.fr_mul_stack()
            fold_push()
        for c_idx, chunk in enumerate(chunks):
            base = c_idx * chunk_len
            # left = z_next * prod(a + beta*sigma + gamma)
            g.load(z_at_next[c_idx])
            for off_, col in enumerate(chunk):
                gi = base + off_
                g.load(eval_slots[(col, 0)])
                g.load(beta)
                g.load(sigma_evals[gi])
                g.fr_mul_stack()
                g.fr_add_stack()
                g.load(gamma_perm)
                g.fr_add_stack()
                g.fr_mul_stack()
            # right = z_x * prod(a + beta*delta^gi*x + gamma)
            g.load(z_at_x[c_idx])
            for off_, col in enumerate(chunk):
                gi = base + off_
                g.load(eval_slots[(col, 0)])
                a.push(pow(DELTA, gi, FR))
                g.load(beta)
                g.fr_mul_stack()
                g.load(x)
                g.fr_mul_stack()
                g.fr_add_stack()
                g.load(gamma_perm)
                g.fr_add_stack()
                g.fr_mul_stack()
            g.fr_sub_stack()
            g.load(lactive)
            g.fr_mul_stack()
            fold_push()

    for li, lk in enumerate(cs.lookups):
        zx, zn, apx, app, spx = lookup_evals[li]
        # a_c = horner(theta, inputs), s_c = horner(theta, tables)
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
        g.fr_mul_stack()        # [z, z^2]
        a.op("SWAP1")
        g.fr_sub_stack()        # z^2 - z
        g.load(llast)
        g.fr_mul_stack()
        fold_push()
        # lactive * (zn*(apx+beta)*(spx+gamma) - zx*(a_c+beta)*(s_c+gamma))
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

    # expected_h = folded / zh
    expected_h = g.slot()
    g.load(folded)
    g.load(zh_inv)
    g.fr_mul_stack()
    g.store(expected_h)
    if _dbg_return(g, "folded", [folded, expected_h]):
        return g

    # h_comm = sum xn^i [h_i]
    h_comm = g.point_slot()
    mult = g.slot()
    a.push(1)
    g.store(mult)
    a.push(0)
    g.store(h_comm)
    a.push(0)
    g.store(h_comm + 1)
    for i, hc in enumerate(h_comms):
        if i == 0:
            g.load(hc)
            g.store(h_comm)
            g.load(hc + 1)
            g.store(h_comm + 1)
        else:
            tmp = g.point_slot()
            g.ec_mul(tmp, hc, mult)
            g.ec_add(h_comm, h_comm, tmp)
        g.load(mult)
        g.load(xn)
        g.fr_mul_stack()
        g.store(mult)
    claims.append((("H",), h_comm, sym(0), expected_h))

    # ================= SHPLONK (BDFG23) =================
    gamma = g.squeeze()

    # static partition, mirroring prover.shplonk_partition
    poly_order: List[object] = []
    by_poly: Dict[object, dict] = {}
    for (key, comm, e_, val) in claims:
        if key not in by_poly:
            by_poly[key] = dict(idx=len(poly_order), pts={}, obj=comm)
            poly_order.append(key)
        by_poly[key]["pts"][e_] = val
    sets: Dict[tuple, list] = {}
    for key in poly_order:
        S = tuple(sorted(by_poly[key]["pts"]))
        sets.setdefault(S, []).append(key)
    T = sorted({e_ for (_k, _c, e_, _v) in claims})

    # gamma powers per poly index
    npoly = len(poly_order)
    gpow = [g.slot() for _ in range(npoly)]
    a.push(1)
    g.store(gpow[0])
    for i in range(1, npoly):
        g.load(gpow[i - 1])
        g.load(gamma)
        g.fr_mul_stack()
        g.store(gpow[i])

    # per set: C_S point slot + folded vals per point
    group_data = []
    for S, keys in sets.items():
        C = g.point_slot()
        a.push(0)
        g.store(C)
        a.push(0)
        g.store(C + 1)
        vals = {e_: g.slot() for e_ in S}
        for e_ in S:
            a.push(0)
            g.store(vals[e_])
        first = True
        for key in keys:
            info = by_poly[key]
            gp = gpow[info["idx"]]
            if first and info["idx"] == 0:
                # gamma^0 = 1: copy the commitment directly
                if isinstance(info["obj"], int):
                    g.load(info["obj"])
                    g.store(C)
                    g.load(info["obj"] + 1)
                    g.store(C + 1)
                else:
                    a.push(info["obj"][0])
                    g.store(C)
                    a.push(info["obj"][1])
                    g.store(C + 1)
            else:
                tmp = g.point_slot()
                g.ec_mul(tmp, info["obj"], gp)
                g.ec_add(C, C, tmp)
            first = False
            for e_ in S:
                g.load(vals[e_])
                g.load(gp)
                g.load(info["pts"][e_])
                g.fr_mul_stack()
                g.fr_add_stack()
                g.store(vals[e_])
        group_data.append((S, C, vals))

    Hc = g.read_point()
    u = g.squeeze()
    if _dbg_return(g, "u", [gamma, u, Hc, Hc + 1]):
        return g

    # (u - z_e) differences for all T
    udiff = {}
    for e_ in T:
        s = g.slot()
        g.load(u)
        g.load(zslot[e_])
        g.fr_sub_stack()
        g.store(s)
        udiff[e_] = s

    # E accumulation
    E = g.point_slot()
    a.push(0)
    g.store(E)
    a.push(0)
    g.store(E + 1)
    const_acc = g.slot()
    a.push(0)
    g.store(const_acc)

    first_set = True
    for (S, C, vals) in group_data:
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
        # r_S(u) via barycentric: sum_i v_i * prod_{j!=i}(u-zj)/(zi-zj)
        a.push(0)
        for zi in S:
            g.load(vals[zi])
            for zj in S:
                if zj == zi:
                    continue
                g.load(udiff[zj])
                g.fr_mul_stack()
            if len(S) > 1:
                # 1 / prod_{j!=i} (zi - zj)
                a.push(1)
                for zj in S:
                    if zj == zi:
                        continue
                    g.load(zslot[zi])
                    g.load(zslot[zj])
                    g.fr_sub_stack()
                    g.fr_mul_stack()
                g.fr_inv_stack()
                g.fr_mul_stack()
            g.fr_add_stack()
        # const_acc += zts * r_S(u)
        g.load(zts)
        g.fr_mul_stack()
        g.load(const_acc)
        g.fr_add_stack()
        g.store(const_acc)

    # E -= const_acc * G;  E -= Z_T(u) * Hc
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
    g.ec_mul(tmp, (1, 2), neg_const)      # -(const)*G via (r-const)*G
    g.ec_add(E, E, tmp)
    neg_zt = g.slot()
    g.load(zt_u)
    g.fr_neg_stack()
    g.store(neg_zt)
    tmp2 = g.point_slot()
    g.ec_mul(tmp2, Hc, neg_zt)
    g.ec_add(E, E, tmp2)
    if _dbg_return(g, "E", [const_acc, zt_u, E, E + 1]):
        return g

    W = g.read_point()

    # P1 = E + u*W ; A2 = -W
    uW = g.point_slot()
    g.ec_mul(uW, W, u)
    P1 = g.point_slot()
    g.ec_add(P1, E, uW)
    negW = g.point_slot()
    g.ec_neg(negW, W)

    # ---- fold an exposed KZG accumulator (aggregation circuits) ----
    # instances carry 12 88-bit limbs (lhs.x, lhs.y, rhs.x, rhs.y); the
    # pair is combined into this proof's own pairing check with a
    # transcript-derived random factor (snark-verifier's accumulator
    # folding shape).
    if g.acc_indices:
        flat_off = []
        for (ci, ri) in g.acc_indices:
            flat_off.append(32 * (sum(inst_shape[:ci]) + ri))
        acc_pts = []
        for pi in range(2):          # lhs, rhs
            ps = g.point_slot()
            for coord in range(2):   # x, y
                offs = flat_off[6 * pi + 3 * coord:6 * pi + 3 * coord + 3]
                a.push(0)
                for li, o in enumerate(offs):
                    a.push(o).op("CALLDATALOAD")
                    # limb < 2^88 (top limb < 2^78 so the shift-compose
                    # cannot wrap mod 2^256)
                    a.op("DUP1")
                    a.push(78 if li == 2 else 88).op("SHR", "ISZERO")
                    g.and_success()
                    a.push(88 * li).op("SHL", "ADD")
                a.op("DUP1")
                g.absorb_stack_word()
                g.store(ps + coord)
            g.curve_check(ps, allow_identity=False)
            acc_pts.append(ps)
        # absorb our own pair, derive the folding factor r
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

    # pairing input: (P1, g2) (negW, s_g2)
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
    if _dbg_return(g, "pairing", [P1, P1 + 1, negW, negW + 1]):
        return g
    g._staticcall(8, pos, 384, pos, 32)
    g.and_success()
    a.push(pos).op("MLOAD")
    g.and_success()

    # ---- epilogue: return success word or revert ----
    ok = a.new_label("ok")
    a.push(SUCCESS).op("MLOAD")
    a.push_label(ok)
    a.op("JUMPI")
    a.push(0).push(0).op("REVERT")
    a.mark(ok)
    a.push(1).push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    return g


def gen_evm_verifier(vk: VerifyingKey, srs, inst_shape: List[int],
                     accumulator_indices=None) -> bytes:
    """Generate the verifier program. inst_shape: rows per instance
    column (the fixed public-input count the verifier is built for).
    accumulator_indices: 12 (col, row) positions of an exposed KZG
    accumulator to fold into the final pairing (aggregation circuits)."""
    # pass 1: count slots to place the transcript region
    g1 = _generate(vk, srs, inst_shape, tb=1 << 22,
                   acc_indices=accumulator_indices)
    tb = SLOT_BASE + 32 * g1.n_slots
    g2_ = _generate(vk, srs, inst_shape, tb=tb,
                    acc_indices=accumulator_indices)
    assert g2_.n_slots == g1.n_slots
    return g2_.a.assemble()
