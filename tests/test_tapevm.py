"""Tape VM (plonk/tapevm.py) — parity vs the compiled expression evaluator.

The VM must produce bit-identical folds for arbitrary gate polys, including
rotations, constants, scaled sums and deep products — it replaces the
node-per-dispatch interpreter on the quotient's oversized gates.
"""
import numpy as np
import pytest

from spectre_tpu.fields.params import BN254_FR as FR
from spectre_tpu.poly import fr_vec as V
from spectre_tpu.plonk.expression import Const, ColumnRef, Sum, Prod, Scaled
from spectre_tpu.plonk.expression import eval_expr_t
from spectre_tpu.plonk.tapevm import GateTape

N = 64
import random as _random
rng = _random.Random(7)


def _cols(n_cols):
    vals = [[rng.randrange(FR) for _ in range(N)] for _ in range(n_cols)]
    import jax.numpy as jnp
    devs = [V.upload_ints(c, N) for c in vals]
    return vals, jnp.stack(devs), devs


def _native_eval(expr, cols, rot_unit, r):
    if isinstance(expr, Const):
        return expr.value % FR
    if isinstance(expr, ColumnRef):
        return cols[expr.index][(r + expr.rotation * rot_unit) % N] % FR
    if isinstance(expr, Sum):
        return sum(_native_eval(t, cols, rot_unit, r)
                   for t in expr.terms) % FR
    if isinstance(expr, Prod):
        out = 1
        for f in expr.factors:
            out = out * _native_eval(f, cols, rot_unit, r) % FR
        return out
    if isinstance(expr, Scaled):
        return expr.scalar * _native_eval(expr.inner, cols, rot_unit, r) % FR
    raise TypeError(expr)


@pytest.mark.parametrize("rot_unit", [1, 4])
def test_vm_matches_native_fold(rot_unit):
    vals, stacked, _devs = _cols(3)
    c0, c1, c2 = (ColumnRef(i, 0) for i in range(3))
    c1n = ColumnRef(1, 1)       # next-row rotation
    c2p = ColumnRef(2, -1)      # prev-row rotation
    polys = [
        Prod((c0, c1, Sum((c2, Const(5))))),
        Sum((Scaled(Prod((c0, c0)), 3), Scaled(c1n, FR - 1), Const(11))),
        Prod((Sum((c0, Scaled(c2p, 7))), Sum((c1, Const(FR - 2))))),
    ]
    y = 0x1234567
    P = len(polys)
    tape = GateTape([(p, i) for i, p in enumerate(polys)],
                    {0: 0, 1: 1, 2: 2}, rot_unit, N)
    out = V.download_ints(tape.run(stacked, y, P))
    for r in range(N):
        want = 0
        for i, p in enumerate(polys):
            want = (want + pow(y, P - 1 - i, FR)
                    * _native_eval(p, vals, rot_unit, r)) % FR
        assert out[r] == want, f"row {r}"


def test_vm_matches_eval_expr_t():
    """Same fold through the compiled evaluator used by the group path."""
    vals, stacked, devs = _cols(4)
    refs = [ColumnRef(i, 0) for i in range(4)]
    expr = Sum((
        Prod((refs[0], refs[1], refs[2])),
        Scaled(Prod((refs[3], refs[3])), 9),
        Scaled(refs[1], FR - 4),
    ))
    cols = {i: devs[i] for i in range(4)}
    ref_val = V.ops.canon(eval_expr_t(expr, cols, V.spec, rot_unit=1), 2)
    tape = GateTape([(expr, 0)], {i: i for i in range(4)}, 1, N)
    got = tape.run(stacked, 1, 1)
    assert V.download_ints(got) == V.download_ints(ref_val)


def test_vm_deep_product_register_reuse():
    """A 40-factor product stays within the register file."""
    vals, stacked, _ = _cols(2)
    factors = tuple(ColumnRef(i % 2, 0) for i in range(40))
    expr = Prod(factors)
    tape = GateTape([(expr, 0)], {0: 0, 1: 1}, 1, N)
    out = V.download_ints(tape.run(stacked, 1, 1))
    for r in (0, 13, N - 1):
        want = 1
        for i in range(40):
            want = want * vals[i % 2][r] % FR
        assert out[r] == want
