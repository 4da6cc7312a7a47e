"""AppCircuit lifecycle end-to-end over a toy circuit: create_pk caching +
pinning, gen_proof/verify, and the EVM output stages added for the
reference's snark/EVM lifecycle (util/circuit.rs:119-137, 163-271):
gen_snark (Poseidon transcript), gen_evm_proof (Keccak transcript),
gen_evm_verifier + evm_verify in the in-process interpreter, calldata."""
import os

import pytest

from spectre_tpu.circuits.app import AppCircuit, Pinning
from spectre_tpu.circuits.builder import CircuitBuilder
from spectre_tpu.circuits.range_chip import RangeChip
from spectre_tpu.poly import kzg

K = 5


class ToyCircuit(AppCircuit):
    """(x + w)^2 with a small range check; instance = the square."""

    @classmethod
    def build(cls, witness, spec) -> CircuitBuilder:
        b = CircuitBuilder()
        rc = RangeChip(b, 3)
        ctx = b.main()
        x = ctx.assign(witness["x"])
        w = ctx.assign(witness["w"])
        s = ctx.add(x, w)
        p = ctx.mul(s, s)
        rc.range_check(ctx, x, 6)
        b.expose_public(p)
        return b

    @classmethod
    def default_witness(cls, spec):
        return {"x": 5, "w": 7}


@pytest.fixture(scope="module")
def srs():
    return kzg.test_srs(K)


def test_create_pk_caches_and_pins(tmp_path, srs):
    pk_path = str(tmp_path / "toy_pk.pkl")
    pin_path = str(tmp_path / "toy.json")
    pk = ToyCircuit.create_pk(None, K, srs, pk_path=pk_path,
                              pinning_path=pin_path)
    assert os.path.exists(pk_path) and os.path.exists(pin_path)
    pin = Pinning.from_path(pin_path)
    assert pin.k == K and pin.n_advice == len(pk.vk.cs.advice)
    # reload path: existing pk reused, pinning untouched
    mtime = os.path.getmtime(pin_path)
    pk2 = ToyCircuit.create_pk(None, K, srs, pk_path=pk_path,
                               pinning_path=pin_path)
    assert os.path.getmtime(pin_path) == mtime
    assert pk2.vk.k == pk.vk.k


def test_full_evm_lifecycle(tmp_path, srs):
    pk = ToyCircuit.create_pk(None, K, srs)
    w = ToyCircuit.default_witness(None)

    proof, instances = ToyCircuit.gen_proof(pk, None, srs, w)
    assert ToyCircuit.verify(pk, srs, proof, instances)

    snark, _ = ToyCircuit.gen_snark(pk, None, srs, w)
    assert snark.data != proof.data  # different transcript flavor

    evm_proof, inst2 = ToyCircuit.gen_evm_proof(pk, None, srs, w)
    code = ToyCircuit.gen_evm_verifier(
        pk, srs, [len(c) for c in inst2],
        path=str(tmp_path / "verifier.bin"))
    assert os.path.getsize(tmp_path / "verifier.bin") == len(code)

    ok, gas = ToyCircuit.evm_verify(code, inst2, evm_proof)
    assert ok and gas > 0

    data = ToyCircuit.write_calldata(inst2, evm_proof,
                                     path=str(tmp_path / "calldata.hex"))
    assert data.startswith(b"".join(
        v.to_bytes(32, "big") for col in inst2 for v in col))


def test_pinning_round_trip_and_tamper(tmp_path, srs):
    """Keygen writes the full layout pinning; prover-mode compile verifies
    it (Halo2ConfigPinning round-trip, util/circuit.rs:26-52) and a
    tampered pinning fails loudly."""
    import json as _json
    from spectre_tpu.circuits.builder import PinningMismatch

    pin_path = str(tmp_path / "toy_pin.json")
    pk = ToyCircuit.create_pk(None, K, srs, pinning_path=pin_path)
    pin = Pinning.from_path(pin_path)
    assert pin.break_points and pin.layout_hash and pin.n_fixed is not None

    # good pinning: prove + verify passes
    proof, inst = ToyCircuit.gen_proof(pk, None, srs, {"x": 5, "w": 7},
                                       pinning=pin)
    assert ToyCircuit.verify(pk, srs, proof, inst)

    # tampered break points: loud failure
    with open(pin_path) as f:
        d = _json.load(f)
    d["break_points"] = [v + 1 for v in d["break_points"]]
    with open(pin_path, "w") as f:
        _json.dump(d, f)
    bad = Pinning.from_path(pin_path)
    with pytest.raises(PinningMismatch):
        ToyCircuit.gen_proof(pk, None, srs, {"x": 5, "w": 7}, pinning=bad)

    # tampered layout hash: loud failure
    d["break_points"] = pin.break_points
    d["layout_hash"] = "0" * 32
    with open(pin_path, "w") as f:
        _json.dump(d, f)
    with pytest.raises(PinningMismatch):
        ToyCircuit.gen_proof(pk, None, srs, {"x": 5, "w": 7},
                             pinning=Pinning.from_path(pin_path))
