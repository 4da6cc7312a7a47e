"""Batched JAX curve ops vs the host oracle; (de)compression round-trips."""
import json

import numpy as np
import pytest

from spectre_tpu.curves import host as H
from spectre_tpu.curves import limbjax as CJ

CASES = [
    (H.bn254_g1, CJ.bn254_g1_ops),
    (H.bls_g1, CJ.bls_g1_ops),
]


def _random_points(curve, rng, n):
    """Random multiples of the generator (host oracle)."""
    return [curve.mul(curve.gen, rng.randrange(1, 1 << 128)) for _ in range(n)]


@pytest.mark.parametrize("curve,cops", CASES, ids=lambda c: getattr(c, "name", ""))
def test_padd_batch_vs_host(curve, cops, rng):
    pts_a = _random_points(curve, rng, 6) + [None, curve.gen]
    pts_b = _random_points(curve, rng, 6) + [curve.gen, None]
    # include doubling (equal points) and inverse (P + -P) cases
    pts_a += [pts_a[0], pts_a[1]]
    pts_b += [pts_a[0], curve.neg(pts_a[1])]
    A = cops.encode_points(pts_a)
    B = cops.encode_points(pts_b)
    C = cops.padd(A, B)
    got = cops.decode_points(C)
    want = [curve.add(a, b) for a, b in zip(pts_a, pts_b)]
    assert got == want


@pytest.mark.parametrize("curve,cops", CASES, ids=lambda c: getattr(c, "name", ""))
def test_pdbl_batch_vs_host(curve, cops, rng):
    pts = _random_points(curve, rng, 4) + [None]
    P = cops.encode_points(pts)
    D = cops.pdbl(P)
    got = cops.decode_points(D)
    want = [curve.add(p, p) for p in pts]
    assert got == want


@pytest.mark.parametrize("curve,cops", CASES, ids=lambda c: getattr(c, "name", ""))
def test_tree_reduce(curve, cops, rng):
    pts = _random_points(curve, rng, 7) + [None]
    P = cops.encode_points(pts)
    S = cops.tree_reduce(P)
    got = cops.decode_points(tuple(c[None] for c in S))[0]
    want = None
    for p in pts:
        want = curve.add(want, p)
    assert got == want


def test_bls_g1_compression_roundtrip(rng):
    curve = H.bls_g1
    for _ in range(4):
        pt = curve.mul(curve.gen, rng.randrange(1, 1 << 200))
        comp = H.g1_compress(pt)
        assert H.g1_decompress(comp) == pt
        unc = H.g1_to_uncompressed(pt)
        assert H.g1_from_uncompressed(unc) == pt


def test_bls_g2_host_and_compression(rng):
    g2 = H.bls_g2_host
    gen = H.P.BLS12_381_G2_GEN
    assert g2.is_on_curve(gen)
    for k in (2, 3, 12345):
        pt = g2.mul(gen, k)
        assert g2.is_on_curve(pt)
        comp = H.g2_compress(pt)
        assert H.g2_decompress(comp) == pt


def test_reference_pubkeys_decompress_consistent():
    """Cross-check: test_data compressed vs uncompressed pubkeys agree.

    rotation_512.json carries the same committee as sync_step_512.json
    (compressed vs uncompressed) — decompression must map one onto the other.
    """
    with open("/root/reference/test_data/rotation_512.json") as f:
        rot = json.load(f)
    with open("/root/reference/test_data/sync_step_512.json") as f:
        step = json.load(f)
    comp = rot["pubkeys_compressed"]
    unc = step["pubkeys_uncompressed"]
    assert len(comp) == len(unc) == 512
    for c, u in zip(comp[:16], unc[:16]):
        pt_c = H.g1_decompress(bytes(c))
        pt_u = H.g1_from_uncompressed(bytes(u))
        assert pt_c == pt_u
        assert H.bls_g1.is_on_curve(pt_c)
