"""Tape-driven on-device gate evaluator (the quotient's "bytecode VM").

Problem: the quotient stage must evaluate every gate polynomial on the
extended coset. Structurally-shared gates (e.g. the vertical gate on every
advice column) compile once and vmap across members — but the zkEVM-style
wide-SHA region contributes a handful of HUGE one-off polys (101 column
refs, ~3,100 expression nodes). Compiling those as one XLA graph OOMs the
tunnel compiler (round-2 finding), and interpreting them node-by-node costs
one device dispatch per node — ~6,700 dispatches ≈ 90% of quotient
wall-clock at nano/k=13 (measured round 3: the whole 686 s quotient phase).

TPU-first fix: compile ONE small program — a register VM whose body is a
`lax.switch` over 6 opcodes inside a `lax.scan` over an instruction tape.
Any set of gate polys lowers (host-side, once per circuit) to a tape of
(op, dst, a, b, aux) rows; evaluation of ALL oversized polys then costs ONE
dispatch regardless of node count. Register file and column stack live in
HBM; per-step work is one (NL, n) mont_mul — scan overhead, not dispatch
RTT, is the only per-node cost.

Opcodes (dst/a/b are register indices, c* are constant-pool indices):
    LOADCOL   dst <- roll(cols[a], -aux)          (aux = rotation*rot_unit)
    LOADCONST dst <- consts[a]  (broadcast)
    MUL       dst <- R[a] * R[b]
    ADD       dst <- fold(R[a] + R[b])
    MULC      dst <- R[a] * consts[b]
    FMA       dst <- fold(R[a] + R[b] * consts[aux])

The y-fold accumulator is register 0: each poly ends with
FMA(0, 0, r_poly, widx) where consts[widx] = y^(P-1-pos). The VM returns
R[0] = sum_i y_weight_i * poly_i(coset) — the same partial the compiled
group path produces, added into the running quotient accumulator.

Reference parity: this evaluates halo2's gate expressions on the extended
domain (halo2_proofs evaluation.rs uses a similar "calculation graph"
lowered form on CPU); the tape is this rebuild's XLA-friendly equivalent.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.params import BN254_FR as FR
from ..fields import limb as L
from ..fields.limb_t import make_ops_t, carry_relax_t
from .expression import Expr, Const, ColumnRef, Sum, Prod, Scaled

spec = L.fr_spec
ops = make_ops_t("bn254_fr")
NL = spec.n_limbs

OP_LOADCOL, OP_LOADCONST, OP_MUL, OP_ADD, OP_MULC, OP_FMA = range(6)

NREG = 16  # registers incl. the reserved accumulator R[0]


class TapeBuilder:
    """Lower gate polys to a tape. Host-side, once per circuit; the tape and
    the constant-pool *indices* are fixed — only constant VALUES (challenge-
    dependent weights) change per proof."""

    def __init__(self, col_index: Dict[int, int], rot_unit: int, n: int):
        self.col_index = col_index      # global column idx -> stack row
        self.rot_unit = rot_unit
        self.n = n
        self.rows: List[Tuple[int, int, int, int, int]] = []
        self.consts: List[int] = []
        self._const_idx: Dict[int, int] = {}
        self._free = list(range(NREG - 1, 0, -1))   # R0 reserved

    def cidx(self, v: int) -> int:
        v = v % FR
        if v not in self._const_idx:
            self._const_idx[v] = len(self.consts)
            self.consts.append(v)
        return self._const_idx[v]

    def fresh_slot(self) -> int:
        """Un-deduplicated pool entry — for per-proof values (y-power
        weights) that get overwritten later; sharing one via cidx would
        clobber a poly constant that happens to equal the placeholder."""
        self.consts.append(0)
        return len(self.consts) - 1

    def _alloc(self) -> int:
        if not self._free:
            raise RuntimeError("tape VM register spill (deepen NREG)")
        return self._free.pop()

    def _release(self, r: int):
        if r != 0:
            self._free.append(r)

    def emit_expr(self, e: Expr) -> int:
        """Post-order lowering; returns the register holding the value."""
        if isinstance(e, Const):
            r = self._alloc()
            self.rows.append((OP_LOADCONST, r, self.cidx(e.value), 0, 0))
            return r
        if isinstance(e, ColumnRef):
            r = self._alloc()
            shift = (e.rotation * self.rot_unit) % self.n
            self.rows.append(
                (OP_LOADCOL, r, self.col_index[e.index], 0, shift))
            return r
        if isinstance(e, Scaled):
            r = self.emit_expr(e.inner)
            self.rows.append((OP_MULC, r, r, self.cidx(e.scalar), 0))
            return r
        if isinstance(e, Prod):
            r = self.emit_expr(e.factors[0])
            for f in e.factors[1:]:
                rf = self.emit_expr(f)
                self.rows.append((OP_MUL, r, r, rf, 0))
                self._release(rf)
            return r
        if isinstance(e, Sum):
            acc = None
            const_acc = 0
            for t in e.terms:
                if isinstance(t, Const):
                    const_acc = (const_acc + t.value) % FR
                    continue
                if isinstance(t, Scaled) and acc is not None:
                    rt = self.emit_expr(t.inner)
                    self.rows.append(
                        (OP_FMA, acc, acc, rt, self.cidx(t.scalar)))
                    self._release(rt)
                    continue
                rt = self.emit_expr(t)
                if acc is None:
                    acc = rt
                else:
                    self.rows.append((OP_ADD, acc, acc, rt, 0))
                    self._release(rt)
            if const_acc:
                if acc is None:
                    acc = self._alloc()
                    self.rows.append(
                        (OP_LOADCONST, acc, self.cidx(const_acc), 0, 0))
                else:
                    rc = self._alloc()
                    self.rows.append(
                        (OP_LOADCONST, rc, self.cidx(const_acc), 0, 0))
                    self.rows.append((OP_ADD, acc, acc, rc, 0))
                    self._release(rc)
            if acc is None:       # empty sum
                acc = self._alloc()
                self.rows.append((OP_LOADCONST, acc, self.cidx(0), 0, 0))
            return acc
        raise TypeError(f"unknown expr {e!r}")

    def emit_poly_accum(self, poly: Expr, weight_slot: int):
        """acc (R0) += consts[weight_slot] * poly."""
        r = self.emit_expr(poly)
        self.rows.append((OP_FMA, 0, 0, r, weight_slot))
        self._release(r)


@functools.lru_cache(maxsize=None)
def _vm_jit(C: int, T: int, K: int, n: int):
    """The VM program: one shape per (stack size, tape length, const-pool
    size, row count) — a single cached compile per circuit."""

    @jax.jit
    def run(cols, consts, tape):
        def step(R, row):
            op, dst, a, b, aux = (row[0], row[1], row[2], row[3], row[4])

            def read_reg(i):
                return jax.lax.dynamic_index_in_dim(
                    R, i, axis=0, keepdims=False)

            def f_loadcol(_):
                col = jax.lax.dynamic_index_in_dim(cols, a, axis=0,
                                                   keepdims=False)
                if col.dtype != jnp.int32:
                    # the quotient stores sub-coset stacks int16 at rest
                    col = col.astype(jnp.int32)
                dbl = jnp.concatenate([col, col], axis=-1)
                return jax.lax.dynamic_slice(dbl, (0, aux), (NL, n))

            def f_loadconst(_):
                return jnp.broadcast_to(
                    jax.lax.dynamic_index_in_dim(consts, a, axis=0,
                                                 keepdims=False), (NL, n))

            def f_mul(_):
                return ops.mont_mul(read_reg(a), read_reg(b))

            def f_add(_):
                return ops.fold(carry_relax_t(
                    spec, read_reg(a) + read_reg(b), passes=1))

            def f_mulc(_):
                c = jax.lax.dynamic_index_in_dim(consts, b, axis=0,
                                                 keepdims=False)
                return ops.mont_mul(read_reg(a), c)

            def f_fma(_):
                c = jax.lax.dynamic_index_in_dim(consts, aux, axis=0,
                                                 keepdims=False)
                return ops.fold(carry_relax_t(
                    spec, read_reg(a) + ops.mont_mul(read_reg(b), c),
                    passes=1))

            out = jax.lax.switch(
                op, [f_loadcol, f_loadconst, f_mul, f_add, f_mulc, f_fma],
                None)
            R = jax.lax.dynamic_update_slice_in_dim(R, out[None], dst,
                                                    axis=0)
            return R, None

        R0 = jnp.zeros((NREG, NL, n), jnp.int32)
        R, _ = jax.lax.scan(step, R0, tape)
        return R[0]

    return run


class GateTape:
    """Compiled tape for a fixed set of (poly, y-power-position) pairs.

    Built once per circuit (per rot_unit/n); per proof, only the constant
    pool entries holding y powers are refreshed via weight slots.
    """

    def __init__(self, polys_with_pos: List[Tuple[Expr, int]],
                 col_index: Dict[int, int], rot_unit: int, n: int):
        tb = TapeBuilder(col_index, rot_unit, n)
        self.weight_slots: List[Tuple[int, int]] = []  # (pos, const slot)
        for poly, pos in polys_with_pos:
            slot = tb.fresh_slot()
            self.weight_slots.append((pos, slot))
            tb.emit_poly_accum(poly, slot)
        zero_slot = tb.cidx(0)    # before freezing the pool
        self.rows = np.asarray(tb.rows, np.int32)
        self.base_consts = list(tb.consts)
        self.n = n
        # pad tape to a power of two with no-op writes to a scratch register
        T = len(tb.rows)
        Tp = 1 << max(0, (T - 1).bit_length())
        if T < Tp:
            nop = np.asarray(
                [(OP_LOADCONST, NREG - 1, zero_slot, 0, 0)] * (Tp - T),
                np.int32)
            self.rows = np.concatenate([self.rows, nop])
        self.tape_dev = jnp.asarray(self.rows)

    def run(self, cols_stacked, y: int, total_polys: int):
        """cols_stacked: (C, NL, n) coset columns in tape column order."""
        consts = list(self.base_consts)
        for pos, slot in self.weight_slots:
            consts[slot] = pow(y, total_polys - 1 - pos, FR)
        K = len(consts)
        Kp = 1 << max(0, (K - 1).bit_length())
        consts = consts + [0] * (Kp - K)
        cpool = jnp.asarray(np.stack(
            [spec.encode(v) for v in consts]))[:, :, None]
        C = cols_stacked.shape[0]
        return _vm_jit(C, self.rows.shape[0], Kp, self.n)(
            cols_stacked, cpool, self.tape_dev)
