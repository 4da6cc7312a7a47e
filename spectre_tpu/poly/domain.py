"""Multiplicative evaluation domains for BN254 Fr.

omega = g^((r-1)/2^k) with g = 7 (halo2curves bn256::Fr multiplicative
generator), matching the domain construction halo2's EvaluationDomain uses —
so evaluations/commitments line up with the reference proof system
(SURVEY.md §2b halo2_proofs row).
"""
from __future__ import annotations

import functools

import numpy as np

from ..fields.params import BN254_FR as FR, BN254_FR_GENERATOR as GEN, BN254_FR_S as S
from ..fields.host import inv_mod
from ..fields import limb as L


@functools.lru_cache(maxsize=None)
def root_of_unity(k: int) -> int:
    """Primitive 2^k-th root of unity in Fr."""
    assert k <= S
    return pow(GEN, (FR - 1) >> k, FR)


class Domain:
    """Size-2^k multiplicative subgroup with precomputed twiddle tables."""

    def __init__(self, k: int, spec: L.FieldSpec = L.fr_spec):
        self.k = k
        self.n = 1 << k
        self.spec = spec
        self.omega = root_of_unity(k)
        self.omega_inv = inv_mod(self.omega, FR)
        self.n_inv = inv_mod(self.n, FR)
        self.g_coset = GEN  # halo2 uses the field generator as coset shift
        self.g_coset_inv = inv_mod(GEN, FR)

    @functools.cached_property
    def bitrev(self) -> np.ndarray:
        idx = np.arange(self.n)
        rev = np.zeros(self.n, dtype=np.int64)
        for b in range(self.k):
            rev |= ((idx >> b) & 1) << (self.k - 1 - b)
        return rev

    def _twiddle_table(self, root: int) -> list:
        """Per-stage twiddles for an iterative DIT NTT, Montgomery limbs.

        Stage s (s = 1..k) has half = 2^(s-1) butterflies per block with
        twiddles root_{2^s}^j, j < half, where root_{2^s} = root^(n / 2^s).
        """
        tables = []
        for s in range(1, self.k + 1):
            m = 1 << s
            w_m = pow(root, self.n // m, FR)
            ws = []
            w = 1
            for _ in range(m // 2):
                ws.append(w)
                w = w * w_m % FR
            tables.append(self.spec.encode_batch(ws))
        return tables

    @functools.cached_property
    def twiddles_fwd(self) -> list:
        return self._twiddle_table(self.omega)

    @functools.cached_property
    def twiddles_inv(self) -> list:
        return self._twiddle_table(self.omega_inv)

    @functools.cached_property
    def n_inv_mont(self) -> np.ndarray:
        return self.spec.encode(self.n_inv)

    # host oracle
    def ntt_host(self, coeffs: list) -> list:
        """O(n^2)-free host NTT oracle (recursive radix-2, python ints)."""
        n = self.n
        a = [c % FR for c in coeffs]
        assert len(a) == n

        def rec(vals, w):
            m = len(vals)
            if m == 1:
                return vals
            even = rec(vals[0::2], w * w % FR)
            odd = rec(vals[1::2], w * w % FR)
            out = [0] * m
            wj = 1
            for j in range(m // 2):
                t = wj * odd[j] % FR
                out[j] = (even[j] + t) % FR
                out[j + m // 2] = (even[j] - t) % FR
                wj = wj * w % FR
            return out

        return rec(a, self.omega)

    def intt_host(self, evals: list) -> list:
        n = self.n
        a = [e % FR for e in evals]

        def rec(vals, w):
            m = len(vals)
            if m == 1:
                return vals
            even = rec(vals[0::2], w * w % FR)
            odd = rec(vals[1::2], w * w % FR)
            out = [0] * m
            wj = 1
            for j in range(m // 2):
                t = wj * odd[j] % FR
                out[j] = (even[j] + t) % FR
                out[j + m // 2] = (even[j] - t) % FR
                wj = wj * w % FR
            return out

        res = rec(a, self.omega_inv)
        return [x * self.n_inv % FR for x in res]
