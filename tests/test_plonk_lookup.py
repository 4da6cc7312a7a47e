"""Lookup argument end-to-end: range-table circuit prove + verify."""
import pytest

from spectre_tpu.fields.params import BN254_FR as FR
from spectre_tpu.plonk import ConstraintSystem
from spectre_tpu.plonk.keygen import keygen
from spectre_tpu.plonk.prover import create_proof
from spectre_tpu.plonk.verifier import verify_proof
from spectre_tpu.poly import kzg as _kzg

K = 5
N = 1 << K


def _range_circuit():
    cs = ConstraintSystem()
    table = cs.fixed_column()
    a = cs.advice_column()
    cs.add_lookup("range16", [a.at()], [table.at()])
    # an arithmetic gate too, so gates+lookups mix: s*(a - b*b) = 0
    s = cs.fixed_column()
    b = cs.advice_column()
    cs.create_gate("square", s.at() * (a.at() - b.at() * b.at()))
    return cs, (table, a, s, b)


@pytest.fixture(scope="module")
def setup():
    cs, cols = _range_circuit()
    srs = _kzg.test_srs(K)
    table_vals = list(range(16)) + [0] * (N - 16)
    s_vals = [1, 1, 1] + [0] * (N - 3)
    pk = keygen(cs, K, [table_vals, s_vals], srs)
    return cs, srs, pk


def test_lookup_prove_verify(setup):
    cs, srs, pk = setup
    a_vals = [4, 9, 1]   # squares, all < 16
    b_vals = [2, 3, 1]
    proof = create_proof(pk, srs, [a_vals, b_vals], [])
    assert verify_proof(pk.vk, srs, proof, [])


def test_lookup_prover_rejects_out_of_range(setup):
    cs, srs, pk = setup
    a_vals = [25, 9, 1]  # 25 not in table
    b_vals = [5, 3, 1]
    with pytest.raises(ValueError, match="not in table"):
        create_proof(pk, srs, [a_vals, b_vals], [])


def test_lookup_forged_proof_rejected(setup):
    """Honest-looking witness but gate broken -> verifier rejects."""
    cs, srs, pk = setup
    a_vals = [4, 9, 2]   # 2 != 1*1
    b_vals = [2, 3, 1]
    proof = create_proof(pk, srs, [a_vals, b_vals], [])
    assert not verify_proof(pk.vk, srs, proof, [])
