"""Four-step NTT (poly/ntt4) vs host oracles.

The kernel path is additionally validated bit-exact on the real chip at
k = 8/15/16/18 by scripts/ntt4_check.py (fwd vs ntt_fast.ntt_t + roundtrip);
these tests pin the digit algebra and the interpret-mode kernels on CPU.
"""
import numpy as np
import pytest

from spectre_tpu.fields import limb as L
from spectre_tpu.fields.params import BN254_FR as FR
from spectre_tpu.poly import ntt4
from spectre_tpu.poly.domain import Domain

spec = L.fr_spec


@pytest.mark.parametrize("k", [9, 12])
def test_host_factored_vs_direct(k, rng):
    """The factored pipeline (pass structure + digit reorders) on ints."""
    x = [rng.randrange(FR) for _ in range(1 << k)]
    assert ntt4.ntt_host_factored(x, k) == ntt4.ntt_host_direct(x, k)


def test_host_factored_two_pass(rng, monkeypatch):
    """Pass-1 coupling + final interleave (k > KIN) at a toy KIN so the
    outer/inner digit algebra runs in milliseconds on ints."""
    monkeypatch.setattr(ntt4, "KIN", 6)
    for k in (9, 11):
        x = [rng.randrange(FR) for _ in range(1 << k)]
        assert ntt4.ntt_host_factored(x, k) == ntt4.ntt_host_direct(x, k)


@pytest.mark.slow
def test_kernel_interpret_vs_host(rng):
    """Interpret-mode kernels (minutes on CPU; the on-chip check script is
    the fast path for kernel validation)."""
    k = 8
    dom = Domain(k)
    coeffs = [rng.randrange(FR) for _ in range(1 << k)]
    a_t = spec.encode_batch(coeffs).T.copy()
    got = spec.decode_batch(np.asarray(ntt4.ntt_t4(a_t, k)).T)
    assert got == dom.ntt_host(coeffs)
    back = np.asarray(ntt4.intt_t4(ntt4.ntt_t4(a_t, k), k))
    assert spec.decode_batch(back.T) == [c % FR for c in coeffs]
