"""EVM layer end-to-end: assembler/interpreter sanity, then a real
SHPLONK proof (Keccak/EVM transcript) verified by a GENERATED EVM
verifier program running in the from-scratch interpreter — the
gen_evm_verifier_shplonk + evm_verify capability
(util/circuit.rs:182-215, contract-tests analog)."""
import pytest

from spectre_tpu.fields.params import BN254_FR as FR
from spectre_tpu.evm.asm import Asm
from spectre_tpu.evm.interp import execute
from spectre_tpu.evm.calldata import encode_calldata


def test_interp_arith_and_keccak():
    # (3 + 4) * 5 via ADDMOD/MULMOD mod r, returned as a word
    a = Asm()
    a.push(FR).push(4).push(3).op("ADDMOD")
    a.push(FR).op("SWAP1").push(5).op("MULMOD")
    a.push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    r = execute(a.assemble())
    assert r.success and int.from_bytes(r.returndata, "big") == 35

    # keccak256("") matches the host implementation
    from spectre_tpu.hashes.keccak import keccak256
    a = Asm()
    a.push(0).push(0).op("KECCAK256")
    a.push(0).op("MSTORE")
    a.push(32).push(0).op("RETURN")
    r = execute(a.assemble())
    assert r.returndata == keccak256(b"")


def test_interp_ec_precompiles():
    from spectre_tpu.curves import host as H
    g = H.bn254_g1.gen
    g2pt = H.bn254_g1.add(g, g)
    a = Asm()
    # ecAdd(G, G) -> memory, return 64 bytes
    for i, v in enumerate((g[0], g[1], g[0], g[1])):
        a.push(int(v)).push(32 * i).op("MSTORE")
    a.push(64).push(0x100).push(128).push(0).push(6).op("GAS", "STATICCALL")
    a.push(0).op("MSTORE8")  # drop success into byte (non-zero check below)
    a.push(64).push(0x100).op("RETURN")
    r = execute(a.assemble())
    assert r.success
    x = int.from_bytes(r.returndata[:32], "big")
    y = int.from_bytes(r.returndata[32:], "big")
    assert (x, y) == (int(g2pt[0]), int(g2pt[1]))


def _toy_proof(k=5, transcript="keccak"):
    """Small flex-gate + lookup circuit, real SHPLONK prove."""
    from spectre_tpu.circuits.builder import CircuitBuilder
    from spectre_tpu.circuits.range_chip import RangeChip
    from spectre_tpu.plonk.keygen import keygen
    from spectre_tpu.plonk.prover import create_proof
    from spectre_tpu.poly import kzg

    b = CircuitBuilder()
    rc = RangeChip(b, 3)
    ctx = b.main()
    x = ctx.assign(5)
    y = ctx.assign(7)
    s = ctx.add(x, y)
    p = ctx.mul(s, s)
    rc.range_check(ctx, x, 3)
    b.expose_public(p)
    cs, fixed, advice, instances = b.compile(k)
    srs = kzg.test_srs(k)
    pk = keygen(cs, k, fixed, srs)
    proof = create_proof(pk, srs, advice, instances, seed=b"evm-test",
                         transcript=transcript)
    return pk, srs, proof, instances


@pytest.fixture(scope="module")
def toy():
    return _toy_proof()


def test_keccak_proof_native_verify(toy):
    from spectre_tpu.plonk.verifier import verify_proof
    pk, srs, proof, instances = toy
    assert verify_proof(pk.vk, srs, proof, instances, transcript="keccak")
    # wrong transcript flavor must fail
    assert not verify_proof(pk.vk, srs, proof, instances)


def test_generated_evm_verifier_accepts(toy):
    from spectre_tpu.evm.verifier_gen import gen_evm_verifier
    pk, srs, proof, instances = toy
    code = gen_evm_verifier(pk.vk, srs, [len(c) for c in instances])
    cd = encode_calldata(instances, proof.data)
    r = execute(code, cd)
    assert r.success, f"EVM verify failed: {r.error}"
    assert int.from_bytes(r.returndata, "big") == 1
    assert r.gas_used > 0


def test_generated_evm_verifier_rejects(toy):
    from spectre_tpu.evm.verifier_gen import gen_evm_verifier
    pk, srs, proof, instances = toy
    code = gen_evm_verifier(pk.vk, srs, [len(c) for c in instances])
    # tampered instance
    bad_inst = [[(v + 1) % FR for v in instances[0]]]
    r = execute(code, encode_calldata(bad_inst, proof.data))
    assert not r.success
    # tampered proof byte (a scalar eval deep in the proof)
    bad = bytearray(proof.data)
    bad[-40] ^= 1
    r = execute(code, encode_calldata(instances, bytes(bad)))
    assert not r.success


def test_looped_evm_verifier_accepts_and_rejects(toy):
    """The deployable looped generator must accept/reject identically to
    the straight-line one, in dramatically less code (VERDICT r3 next #3:
    2.76 MB straight-line aggregation verifier vs EIP-170's 24,576 B)."""
    from spectre_tpu.evm.verifier_gen import gen_evm_verifier
    from spectre_tpu.evm.verifier_loop import gen_evm_verifier_looped
    pk, srs, proof, instances = toy
    shape = [len(c) for c in instances]
    straight = gen_evm_verifier(pk.vk, srs, shape)
    looped = gen_evm_verifier_looped(pk.vk, srs, shape)
    assert len(looped) < len(straight)
    cd = encode_calldata(instances, proof.data)
    r = execute(looped, cd)
    assert r.success, f"looped EVM verify failed: {r.error}"
    assert int.from_bytes(r.returndata, "big") == 1

    bad_inst = [[(v + 1) % FR for v in instances[0]]]
    assert not execute(looped, encode_calldata(bad_inst, proof.data)).success
    bad = bytearray(proof.data)
    bad[-40] ^= 1
    assert not execute(looped, encode_calldata(instances, bytes(bad))).success
    # every 32-byte word of the proof matters: flip one bit per region
    for off in (0, 64, len(proof.data) // 2):
        bad = bytearray(proof.data)
        bad[off] ^= 1
        assert not execute(
            looped, encode_calldata(instances, bytes(bad))).success


def test_deployable_evm_verifier_split(toy):
    """EIP-170 split (VERDICT r4 next #5): verifier code under the
    24,576-byte deploy cap, constant tables in 0x00-guarded data
    contracts loaded via EXTCODECOPY; accept/reject identical to the
    single-blob looped verifier."""
    from spectre_tpu.evm.interp import World
    from spectre_tpu.evm.verifier_loop import (EIP170_MAX,
                                               gen_evm_verifier_deployable,
                                               gen_evm_verifier_looped)
    pk, srs, proof, instances = toy
    shape = [len(c) for c in instances]
    dep = gen_evm_verifier_deployable(pk.vk, srs, shape)
    assert len(dep.code) <= EIP170_MAX, len(dep.code)
    for dc in dep.data_contracts:
        assert len(dc) <= EIP170_MAX
        assert dc[0] == 0  # execution guard
    # data split must carry exactly the looped blob's data segment
    looped = gen_evm_verifier_looped(pk.vk, srs, shape)
    data = b"".join(dc[1:] for dc in dep.data_contracts)
    assert looped.endswith(data)

    world = World()
    addr = dep.deploy(world, 0x1000)
    cd = encode_calldata(instances, proof.data)
    r = world.call(addr, cd)
    assert r.success, f"deployable EVM verify failed: {r.error}"
    assert int.from_bytes(r.returndata, "big") == 1
    # gas parity with the single-blob verifier (allow the EXTCODECOPY
    # cold-access + copy overhead, a few thousand gas)
    r_blob = execute(looped, cd)
    assert abs(r.gas_used - r_blob.gas_used) < 20_000

    bad_inst = [[(v + 1) % FR for v in instances[0]]]
    assert not world.call(addr, encode_calldata(bad_inst,
                                                proof.data)).success
    bad = bytearray(proof.data)
    bad[-40] ^= 1
    assert not world.call(addr, encode_calldata(instances,
                                                bytes(bad))).success
