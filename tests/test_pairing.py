"""Pairing engines: bilinearity, KZG pairing check, golden BLS verification."""
import pytest

from spectre_tpu.curves import pairing as PP
from spectre_tpu.curves.host import bn254_g1, bls_g1, bls_g2_host
from spectre_tpu.fields.params import BLS12_381_G2_GEN, BN254_FR
from spectre_tpu.poly.g2_host import bn254_g2_mul
from spectre_tpu.poly import kzg


BN_G2 = (
    (10857046999023057135944570762232829481370756359578518086990519993285655852781,
     11559732032986387107991004021392285783925812861821192530917403151452391805634),
    (8495653923123431417604973247489272438418190587263600148770280649306958101930,
     4082367875863433681332203403145435568316851327593401208105741076214120093531),
)


def test_bn254_bilinearity():
    eng = PP.bn254()
    e_ab = eng.pairing(bn254_g1.mul(bn254_g1.gen, 6), bn254_g2_mul(BN_G2, 5))
    e = eng.pairing(bn254_g1.gen, BN_G2)
    assert e_ab == eng.T.pow12(e, 30)
    assert not eng.T.is_one(e)


def test_bls_bilinearity():
    eng = PP.bls12_381()
    e_ab = eng.pairing(bls_g1.mul(bls_g1.gen, 3),
                       bls_g2_host.mul(BLS12_381_G2_GEN, 4))
    e = eng.pairing(bls_g1.gen, BLS12_381_G2_GEN)
    assert e_ab == eng.T.pow12(e, 12)
    assert not eng.T.is_one(e)


def test_kzg_pairing_verify(rng):
    srs = kzg.test_srs(4)
    coeffs = [rng.randrange(BN254_FR) for _ in range(8)]
    C = kzg.commit_coeff_host(srs, coeffs)
    z = rng.randrange(BN254_FR)
    v, W = kzg.open_at_host(srs, coeffs, z)
    assert kzg.verify_open_pairing(srs, C, z, v, W)
    assert kzg.verify_open_trapdoor(srs, C, z, v, W)
    # wrong value rejected
    assert not kzg.verify_open_pairing(srs, C, z, (v + 1) % BN254_FR, W)


@pytest.mark.slow
def test_golden_witness_bls_signature():
    """Verify the reference's actual aggregate signature — cross-validates
    SSZ roots, domain, decompression, hash-to-curve and the pairing against
    the reference chain in one check."""
    from spectre_tpu.witness.step import SyncStepArgs
    from spectre_tpu.specs import TESTNET
    from spectre_tpu.ssz import compute_signing_root
    from spectre_tpu.curves.host import g1_from_uncompressed, g2_decompress
    from spectre_tpu.curves.pairing import bls_verify_aggregate

    args = SyncStepArgs.from_file(
        "/root/reference/test_data/sync_step_512.json", TESTNET)
    signing_root = compute_signing_root(
        args.attested_header.hash_tree_root(), args.domain)
    pubkeys = [g1_from_uncompressed(pk) for pk, bit
               in zip(args.pubkeys_uncompressed, args.pariticipation_bits)
               if bit]
    sig = g2_decompress(args.signature_compressed)
    assert bls_verify_aggregate(pubkeys, sig, signing_root, args.spec.dst)
