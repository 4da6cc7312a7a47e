"""Blocked (multi-chunk) paths of the batched fr_vec helpers.

At production scale (k>=17) col_chunk(n) drops to 2-4 columns and
batch_inv_many / grand_product_many / grand_product_scale run their
block loop + pow2 padding — a path test-size inputs never exercise
(col_chunk(256)=64, so C<=64 is always one block). ADVICE r4: force the
blocked path by monkeypatching col_chunk and pin it against the
single-block result.
"""
import numpy as np
import pytest

from spectre_tpu.fields.params import BN254_FR as FR
from spectre_tpu.fields.host import inv_mod
from spectre_tpu.poly import fr_vec as FV


C, N, USABLE = 11, 64, 50


@pytest.fixture
def cols(rng):
    return [[rng.randrange(1, FR) for _ in range(N)] for _ in range(C)]


def _force_blocks(monkeypatch, width=4):
    monkeypatch.setattr(FV, "col_chunk",
                        lambda n, *a, **kw: width)


def test_batch_inv_many_blocked(monkeypatch, cols, rng):
    v = FV.upload_ints_many(cols, N)
    want = FV.download_ints(FV.batch_inv_many(v))     # single block (C<=64)
    _force_blocks(monkeypatch)
    got = FV.download_ints(FV.batch_inv_many(v))      # 3 blocks of <=4
    assert got == want
    # and both match the host inverse
    flat = [inv_mod(x, FR) for col in cols for x in col]
    assert got == flat


def test_grand_product_many_blocked(monkeypatch, cols, rng):
    blinds = [[rng.randrange(FR) for _ in range(N - USABLE - 1)]
              for _ in range(C)]
    ratios = FV.upload_ints_many(cols, N)
    z1, lasts1 = FV.grand_product_many(ratios, USABLE, blinds)
    _force_blocks(monkeypatch)
    z2, lasts2 = FV.grand_product_many(ratios, USABLE, blinds)
    assert lasts2 == lasts1
    assert FV.download_ints(z2) == FV.download_ints(z1)
    # host oracle: Z_0=1, Z_{r+1} = Z_r * ratio_r, blind tail
    for c in range(C):
        z = 1
        want = [1]
        for r in range(USABLE):
            z = z * cols[c][r] % FR
            want.append(z)
        assert lasts1[c] == z
        got = FV.download_ints(z2[c])
        assert got[:USABLE + 1] == want
        assert got[USABLE + 1:] == blinds[c]


def test_grand_product_scale_blocked(monkeypatch, cols, rng):
    blinds = [[rng.randrange(FR) for _ in range(N - USABLE - 1)]
              for _ in range(C)]
    ratios = FV.upload_ints_many(cols, N)
    z, _ = FV.grand_product_many(ratios, USABLE, blinds)
    starts = [rng.randrange(1, FR) for _ in range(C)]
    want = FV.download_ints(FV.grand_product_scale(z, USABLE, starts))
    _force_blocks(monkeypatch)
    got = FV.download_ints(FV.grand_product_scale(z, USABLE, starts))
    assert got == want
    for c in range(C):
        row = FV.download_ints(z[c])
        exp = ([v * starts[c] % FR for v in row[:USABLE + 1]]
               + row[USABLE + 1:])
        assert got[c * N:(c + 1) * N] == exp
