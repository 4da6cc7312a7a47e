"""PLONK keygen: fixed commitments + permutation sigmas (halo2 semantics).

Mirrors halo2_proofs keygen_vk/keygen_pk as consumed by the reference's
AppCircuit::create_pk (util/circuit.rs:119-137). Cells are labeled
delta^i · omega^j (delta = g^2^S generates the non-2-adic part, so column
cosets are disjoint); copy cycles are built union-find style and each sigma
column evaluates to the label of the cycle-successor cell.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

from ..fields.params import BN254_FR as FR, BN254_FR_GENERATOR as GEN, BN254_FR_S as S
from ..poly.domain import Domain
from ..poly import kzg
from .cs import ConstraintSystem

DELTA = pow(GEN, 1 << S, FR)


@dataclass
class VerifyingKey:
    k: int
    cs: ConstraintSystem
    fixed_commitments: List
    sigma_commitments: List
    domain: Domain

    @property
    def n(self):
        return 1 << self.k


@dataclass
class ProvingKey:
    vk: VerifyingKey
    fixed_evals: List[List[int]]       # per fixed column, n evals
    fixed_coeffs: List[List[int]]
    sigma_evals: List[List[int]]       # per permutation column
    sigma_coeffs: List[List[int]]
    # permutation cycle successor: per perm column, list of (col_pos, row)
    mapping: List[List[Tuple[int, int]]]


def _build_permutation(cs: ConstraintSystem, n: int):
    """Cycle structure over equality-enabled columns; returns mapping and
    sigma eval tables."""
    perm_cols = cs.permutation_columns       # global column indices
    col_pos = {c: i for i, c in enumerate(perm_cols)}
    m = len(perm_cols)
    # mapping[i][j] = (i, j) initially (identity)
    mapping = [[(i, j) for j in range(n)] for i in range(m)]
    aux = [[(i, j) for j in range(n)] for i in range(m)]  # cycle leader
    sizes = {}

    def leader(cell):
        i, j = cell
        while aux[i][j] != (i, j):
            i, j = aux[i][j]
        return (i, j)

    for (ca, ra), (cb, rb) in cs.copies:
        assert ca in col_pos and cb in col_pos, (
            "copy on column without enable_equality")
        a = (col_pos[ca], ra)
        b = (col_pos[cb], rb)
        la, lb = leader(a), leader(b)
        if la == lb:
            continue
        # cycle splice (halo2 assembly semantics): swap the successors of the
        # two cells themselves, then union the leader sets
        mapping[a[0]][a[1]], mapping[b[0]][b[1]] = (
            mapping[b[0]][b[1]], mapping[a[0]][a[1]])
        aux[la[0]][la[1]] = lb

    return mapping


def keygen(cs: ConstraintSystem, k: int, fixed_evals: List[List[int]],
           srs: kzg.SrsKZG) -> ProvingKey:
    """fixed_evals: per fixed column, length-2^k int evaluations."""
    n = 1 << k
    dom = Domain(k)
    assert len(fixed_evals) == len(cs.fixed)

    mapping = _build_permutation(cs, n)
    m = len(cs.permutation_columns)

    # labels: cell (i, j) -> delta^i * omega^j
    deltas = [pow(DELTA, i, FR) for i in range(m)]
    omegas = [1] * n
    for j in range(1, n):
        omegas[j] = omegas[j - 1] * dom.omega % FR

    sigma_evals = [[deltas[ti] * omegas[tj] % FR
                    for (ti, tj) in mapping[i]] for i in range(m)]

    fixed_coeffs = [dom.intt_host(e) for e in fixed_evals]
    sigma_coeffs = [dom.intt_host(e) for e in sigma_evals]

    fixed_comms = [kzg.commit_lagrange_auto(srs, e) for e in fixed_evals]
    sigma_comms = [kzg.commit_lagrange_auto(srs, e) for e in sigma_evals]

    vk = VerifyingKey(k, cs, fixed_comms, sigma_comms, dom)
    return ProvingKey(vk, fixed_evals, fixed_coeffs, sigma_evals,
                      sigma_coeffs, mapping)
