"""EVM layer vs EXTERNAL artifacts (VERDICT r2 weak #9 / next #7).

Round 2's EVM chain of custody was circular: generated verifier → own
interpreter → own gas model, with every expectation produced by this repo.
These tests pin the interpreter against independently published values:

  * alt_bn128 precompile outputs from the canonical go-ethereum /
    ethereum/tests vectors (the famous "chfast" cases: G+G = 2G, 2·G, 3·G)
    — the expected bytes below are transcribed LITERALS, not computed here;
  * precompile gas per EIP-1108 (150 / 6000 / 34000·k + 45000) and
    EIP-2565 (modexp) on concrete inputs;
  * SHA-256 / Keccak-256 of the empty string (FIPS-180 / Keccak known
    answers);
  * Yellow-Paper opcode gas accounting on hand-traced straight-line
    programs.

The interpreter's trust anchor in the reference is revm
(util/circuit.rs:213-215); this is the closest offline equivalent.
"""
import pytest

from spectre_tpu.evm.interp import _precompile, execute
from spectre_tpu.evm.asm import Asm


# --- canonical alt_bn128 vectors (go-ethereum core/vm testdata literals) ---

G1 = (1, 2)
# 2G — bn256Add "chfast1"-family doubling result
TWO_G_X = 0x030644e72e131a029b85045b68181585d97816a916871ca8d3c208c16d87cfd3
TWO_G_Y = 0x15ed738c0e0a7c92e7845f96b2ae9c0a68a6a449e3538fc7ff3ebf7a5a18a2c4
# 3G — bn256ScalarMul by 3
THREE_G_X = 0x0769bf9ac56bea3ff40232bcb1b6bd159315d84715b8e679f2d355961915abf0
THREE_G_Y = 0x2ab799bee0489429554fdb7c8d086475319e63b40b9c5b57cdf1ff3dd9fe2261


def be32(v: int) -> bytes:
    return int(v).to_bytes(32, "big")


def test_ecadd_published_vector():
    data = be32(1) + be32(2) + be32(1) + be32(2)
    ok, out, gas = _precompile(6, data)
    assert ok
    assert out == be32(TWO_G_X) + be32(TWO_G_Y)
    assert gas == 150                      # EIP-1108


def test_ecadd_identity_and_short_input():
    # adding the zero point; input implicitly zero-padded (spec behavior)
    ok, out, gas = _precompile(6, be32(1) + be32(2))
    assert ok and out == be32(1) + be32(2) and gas == 150


def test_ecmul_published_vectors():
    ok, out, gas = _precompile(7, be32(1) + be32(2) + be32(2))
    assert ok and gas == 6000              # EIP-1108
    assert out == be32(TWO_G_X) + be32(TWO_G_Y)
    ok, out, _ = _precompile(7, be32(1) + be32(2) + be32(3))
    assert ok and out == be32(THREE_G_X) + be32(THREE_G_Y)


def test_ecpairing_gas_and_empty_input():
    # EIP-197: empty input is valid and returns 1; EIP-1108 base gas 45000
    ok, out, gas = _precompile(8, b"")
    assert ok and out == be32(1) and gas == 45000


def test_ecpairing_bilinearity_check():
    """e(G1, G2) · e(-G1, G2) == 1 — pairing-soundness through the
    precompile encoding (EIP-197 byte order: x_im before x_re)."""
    from spectre_tpu.curves import host as H
    from spectre_tpu.poly.kzg import test_srs
    g2 = test_srs(2).g2
    neg_g1 = H.bn254_g1.neg(G1)

    def enc_pair(p, q):
        (xr, xi), (yr, yi) = q
        return (be32(p[0]) + be32(p[1]) + be32(xi) + be32(xr)
                + be32(yi) + be32(yr))

    data = enc_pair(G1, g2) + enc_pair(neg_g1, g2)
    ok, out, gas = _precompile(8, data)
    assert ok and out == be32(1)
    assert gas == 45000 + 34000 * 2        # EIP-1108 per-pair pricing
    # and a non-degenerate NON-pair must fail the check
    data2 = enc_pair(G1, g2) + enc_pair(G1, g2)
    ok, out, _ = _precompile(8, data2)
    assert ok and out == be32(0)


def test_modexp_eip2565_gas():
    """EIP-2565 gas on concrete cases, formula evaluated independently."""
    def eip2565_gas(bsize, esize, msize, exponent):
        words = (max(bsize, msize) + 7) // 8
        mult = words * words
        if esize <= 32:
            it = max(exponent.bit_length() - 1, 0)
        else:
            it = 8 * (esize - 32) + max(
                (exponent % (1 << 256)).bit_length() - 1, 0)
        return max(200, mult * max(it, 1) // 3)

    cases = [
        (1, 1, 1, 3, 5, 7),                      # tiny: floor gas 200
        (32, 32, 32, 3, (1 << 255) + 1, (1 << 256) - 189),
        (64, 40, 64, 1 << 500, (1 << 300) - 7, (1 << 512) - 569),
    ]
    for bsize, esize, msize, B, E, M in cases:
        data = (be32(bsize) + be32(esize) + be32(msize)
                + B.to_bytes(bsize, "big") + E.to_bytes(esize, "big")
                + M.to_bytes(msize, "big"))
        ok, out, gas = _precompile(5, data)
        assert ok
        assert out == pow(B, E, M).to_bytes(msize, "big")
        assert gas == eip2565_gas(bsize, esize, msize, E), (
            bsize, esize, msize)


def test_sha256_precompile_fips_vector():
    ok, out, gas = _precompile(2, b"")
    assert ok and gas == 60                # yellow paper: 60 + 12*ceil(0)
    assert out.hex() == ("e3b0c44298fc1c149afbf4c8996fb924"
                         "27ae41e4649b934ca495991b7852b855")
    ok, out, gas = _precompile(2, b"abc")
    assert ok and gas == 72
    assert out.hex() == ("ba7816bf8f01cfea414140de5dae2223"
                         "b00361a396177a9cb410ff61f20015ad")


def test_keccak256_known_answer_through_opcode():
    """KECCAK256 of empty memory range — the famous
    c5d2...a470 constant — via an executed program."""
    a = Asm()
    a.push(0).push(0).op("KECCAK256")
    a.push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    res = execute(a.assemble(), b"")
    assert res.success
    assert res.returndata.hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")


def test_yellow_paper_gas_accounting():
    """Hand-traced gas for straight-line programs (Gverylow=3, Gbase=2,
    Gmemory=3/word, KECCAK256 30+6/word) on top of the 21000 intrinsic
    transaction gas the interpreter charges (Gtransaction)."""
    TX = 21000
    # PUSH1 2, PUSH1 3, ADD, STOP → 3 + 3 + 3 + 0
    a = Asm()
    a.push(2).push(3).op("ADD").op("STOP")
    assert execute(a.assemble(), b"").gas_used == TX + 9

    # PUSH0, PUSH0, MSTORE → 2 + 2 + (3 + 3·1 memory word); push(0)
    # assembles to PUSH0 (EIP-3855, Gbase=2)
    a = Asm()
    a.push(0).push(0).op("MSTORE").op("STOP")
    assert execute(a.assemble(), b"").gas_used == TX + 10

    # PUSH1 32, PUSH0, KECCAK256 → 3 + 2 + (30 + 6·1 + 3·1 memory)
    a = Asm()
    a.push(32).push(0).op("KECCAK256").op("STOP")
    assert execute(a.assemble(), b"").gas_used == TX + 44
