"""ConstraintSystem + MockProver on toy circuits."""
import numpy as np
import pytest

from spectre_tpu.fields import limb as L
from spectre_tpu.fields.params import BN254_FR as FR
from spectre_tpu.plonk import ConstraintSystem, MockProver


def _mul_circuit():
    """A tiny multiplication circuit: s * (a*b - c) = 0."""
    cs = ConstraintSystem()
    s = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    cs.create_gate("mul", s.at() * (a.at() * b.at() - c.at()))
    return cs, (s, a, b, c)


def _assign(spec, n, rows):
    """rows: list of (s, a, b, c) python ints; pad with zeros."""
    cols = []
    for j in range(4):
        vals = [r[j] for r in rows] + [0] * (n - len(rows))
        cols.append(spec.encode_batch(vals))
    return cols


def test_mock_prover_passes():
    spec = L.fr_spec
    cs, _ = _mul_circuit()
    n = 16
    rows = [(1, 3, 5, 15), (1, 2, 2, 4), (0, 7, 7, 7)]
    prover = MockProver(cs, n, _assign(spec, n, rows))
    assert prover.verify() == []


def test_mock_prover_catches_bad_row():
    spec = L.fr_spec
    cs, _ = _mul_circuit()
    n = 16
    rows = [(1, 3, 5, 16)]  # 3*5 != 16
    prover = MockProver(cs, n, _assign(spec, n, rows))
    fails = prover.verify(raise_on_failure=False)
    assert fails and "mul" in fails[0]


def test_mock_prover_copy_constraints():
    spec = L.fr_spec
    cs, (s, a, b, c) = _mul_circuit()
    cs.enable_equality(a)
    cs.enable_equality(c)
    n = 16
    rows = [(1, 4, 4, 16), (1, 16, 1, 16)]
    # c at row 0 must equal a at row 1 (chained)
    cs.copy((c.index, 0), (a.index, 1))
    prover = MockProver(cs, n, _assign(spec, n, rows))
    assert prover.verify() == []
    # break the chain
    rows_bad = [(1, 4, 4, 16), (1, 15, 1, 15)]
    prover = MockProver(cs, n, _assign(spec, n, rows_bad))
    fails = prover.verify(raise_on_failure=False)
    assert any("copy" in f for f in fails)


def test_mock_prover_lookup():
    spec = L.fr_spec
    cs = ConstraintSystem()
    t = cs.fixed_column()
    a = cs.advice_column()
    cs.add_lookup("range4", [a.at()], [t.at()])
    n = 16
    table = list(range(4)) + [0] * (n - 4)
    good = [3, 1, 0, 2] + [0] * (n - 4)
    cols = [spec.encode_batch(table), spec.encode_batch(good)]
    assert MockProver(cs, n, cols).verify() == []
    bad = [3, 9] + [0] * (n - 2)
    cols = [spec.encode_batch(table), spec.encode_batch(bad)]
    fails = MockProver(cs, n, cols).verify(raise_on_failure=False)
    assert any("lookup" in f for f in fails)
