"""Preprocessor transforms on synthetic beacon fixtures + service surfaces."""
import asyncio
import json

import pytest

from spectre_tpu.specs import MINIMAL, TESTNET
from spectre_tpu import ssz
from spectre_tpu.curves import host as H
from spectre_tpu.preprocessor.step import step_args_from_finality_update
from spectre_tpu.preprocessor.rotation import rotation_args_from_update
from spectre_tpu.preprocessor.domain import compute_domain, DOMAIN_SYNC_COMMITTEE
from spectre_tpu.witness import sync_step_instances, committee_update_instances


def _hx(b: bytes) -> str:
    return "0x" + bytes(b).hex()


def _committee(n, rng):
    pts = [H.bls_g1.mul(H.bls_g1.gen, rng.randrange(1, 1 << 64))
           for _ in range(n)]
    return [H.g1_compress(p) for p in pts]


def _mk_header(state_root=b"\x00" * 32, body_root=b"\x00" * 32, slot=7):
    return {
        "slot": str(slot), "proposer_index": "0",
        "parent_root": _hx(b"\x00" * 32),
        "state_root": _hx(state_root),
        "body_root": _hx(body_root),
    }


def test_rotation_transform_synthetic(rng):
    spec = MINIMAL
    pubkeys = _committee(spec.sync_committee_size, rng)
    agg = H.g1_compress(H.bls_g1.mul(H.bls_g1.gen, 999))
    pk_root = ssz.sync_committee_pubkeys_root(pubkeys)
    branch = [ssz.bls_pubkey_root(agg)] + [
        bytes([rng.randrange(256) for _ in range(32)]) for _ in range(5)]
    state_root = ssz.mock_root(pk_root, branch,
                               spec.sync_committee_pubkeys_root_index)
    update = {
        "attested_header": {"beacon": _mk_header(state_root=state_root)},
        "finalized_header": {"beacon": _mk_header(slot=5)},
        "next_sync_committee": {
            "pubkeys": [_hx(pk) for pk in pubkeys],
            "aggregate_pubkey": _hx(agg),
        },
        "next_sync_committee_branch": [_hx(b) for b in branch[1:]],
    }
    args = rotation_args_from_update(update, spec)
    assert len(args.pubkeys_compressed) == spec.sync_committee_size
    assert args.sync_committee_branch[0] == ssz.bls_pubkey_root(agg)
    inst = committee_update_instances(args)
    assert len(inst[0]) == 3


def test_step_transform_synthetic(rng):
    spec = MINIMAL
    pubkeys = _committee(spec.sync_committee_size, rng)
    execution = ssz.ExecutionPayloadHeader(block_number=123,
                                           extra_data=b"spectre")
    exec_root = execution.hash_tree_root()
    exec_branch = [bytes([rng.randrange(256) for _ in range(32)])
                   for _ in range(spec.execution_state_root_depth)]
    body_root = ssz.mock_root(exec_root, exec_branch,
                              spec.execution_state_root_index)
    finalized = ssz.BeaconBlockHeader(slot=64, body_root=body_root)
    fin_branch = [bytes([rng.randrange(256) for _ in range(32)])
                  for _ in range(spec.finalized_header_depth)]
    attested_state = ssz.mock_root(finalized.hash_tree_root(), fin_branch,
                                   spec.finalized_header_index)
    sig = H.g2_compress(H.bls_g2_host.mul(H.P.BLS12_381_G2_GEN, 12345))
    bits = bytes([0xFF] * (spec.sync_committee_size // 8))
    exec_json = {
        "parent_hash": _hx(b"\x00" * 32), "fee_recipient": _hx(b"\x00" * 20),
        "state_root": _hx(b"\x00" * 32), "receipts_root": _hx(b"\x00" * 32),
        "logs_bloom": _hx(b"\x00" * 256), "prev_randao": _hx(b"\x00" * 32),
        "block_number": "123", "gas_limit": "0", "gas_used": "0",
        "timestamp": "0", "extra_data": _hx(b"spectre"),
        "base_fee_per_gas": "0", "block_hash": _hx(b"\x00" * 32),
        "transactions_root": _hx(b"\x00" * 32),
        "withdrawals_root": _hx(b"\x00" * 32),
    }
    fu = {
        "attested_header": {
            "beacon": _mk_header(state_root=attested_state, slot=96)},
        "finalized_header": {
            "beacon": finalized.to_json(),
            "execution": exec_json,
            "execution_branch": [_hx(b) for b in exec_branch],
        },
        "finality_branch": [_hx(b) for b in fin_branch],
        "sync_aggregate": {
            "sync_committee_bits": _hx(bits),
            "sync_committee_signature": _hx(sig),
        },
    }
    domain = compute_domain(DOMAIN_SYNC_COMMITTEE, bytes(4), b"\x00" * 32)
    args = step_args_from_finality_update(fu, pubkeys, domain, spec)
    assert sum(args.pariticipation_bits) == spec.sync_committee_size
    inst = sync_step_instances(args)
    assert inst[0][0] < 1 << 253

    # tampered branch must be rejected fail-fast
    fu_bad = json.loads(json.dumps(fu))
    fu_bad["finality_branch"][0] = _hx(b"\x11" * 32)
    with pytest.raises(AssertionError, match="Finality merkle proof"):
        step_args_from_finality_update(fu_bad, pubkeys, domain, spec)


def test_rpc_handler_surface():
    from spectre_tpu.service.rpc import ProverState, handle_request

    async def run():
        state = ProverState(MINIMAL, 1)
        # unknown method
        out = await handle_request(state, json.dumps({
            "jsonrpc": "2.0", "id": 1, "method": "nope", "params": []}).encode())
        resp = json.loads(out)
        assert resp["error"]["code"] == -32601
        # malformed json
        out = await handle_request(state, b"{")
        assert json.loads(out)["error"]["code"] == -32700
        return True

    assert asyncio.run(run())


def test_cli_committee_poseidon(tmp_path, capsys):
    from spectre_tpu.service.cli import main
    rc = main(["utils", "committee-poseidon",
               "--pubkeys", "/root/reference/test_data/committee_pubkeys_512.json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_pubkeys"] == 512
    assert out["committee_poseidon"].startswith("0x")

    # setup/prove/gen-verifier are wired to the real lifecycle (exercised
    # in the heavy prove scripts / test_evm_verifier); here just pin the
    # argument surface (incl. --estimate-gas, cli.rs:259-268 analog)
    from spectre_tpu.service.cli import build_parser
    ns = build_parser().parse_args(
        ["circuit", "committee-update", "gen-verifier", "-k", "13",
         "--estimate-gas"])
    assert ns.estimate_gas and ns.command == "gen-verifier"
    with pytest.raises(SystemExit):   # argparse rejects unknown circuits
        main(["circuit", "not-a-circuit", "gen-verifier"])


def test_cli_gen_verifier_estimate_gas(tmp_path, capsys, monkeypatch):
    """End-to-end gen-verifier --estimate-gas over a cheap k=5 circuit:
    generates real verifier bytecode, proves the dummy witness, runs the
    in-process EVM, and reports gas (cli.rs:259-268 analog)."""
    import json
    from spectre_tpu.service import cli
    from tests.test_app_lifecycle import ToyCircuit

    monkeypatch.setattr(cli, "_circuit_cls", lambda proof: ToyCircuit)
    monkeypatch.setenv("PARAMS_DIR", str(tmp_path / "params"))
    rc = cli.main([
        "circuit", "committee-update", "gen-verifier", "-k", "5",
        "--spec", "minimal", "--build-dir", str(tmp_path),
        "--config-path", str(tmp_path), "--estimate-gas"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0, out
    assert out["status"] == "ok" and out["evm_ok"] is True
    assert out["gas"] > 0
    assert out["bytecode_bytes"] > 0
