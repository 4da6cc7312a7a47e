"""RPC server <-> client SDK round trip over a real local socket: the
asyncio HTTP/JSON-RPC server (service/rpc.py) serves in a thread, the
typed Client (rpc_client.rs analog) calls it through urllib. The prover
is stubbed at the ProverState boundary so the wire path, method dispatch,
error mapping, and concurrency admission all run for real."""
import asyncio
import json
import threading
import time

import pytest

from spectre_tpu.service import rpc as rpcmod
from spectre_tpu.service.rpc_client import Client
from spectre_tpu.specs import MINIMAL


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    state = rpcmod.ProverState(MINIMAL, concurrency=2)
    loop = asyncio.new_event_loop()
    ready = threading.Event()
    port_box = {}

    async def serve():
        async def client(reader, writer):
            try:
                header = await reader.readuntil(b"\r\n\r\n")
                length = 0
                for line in header.split(b"\r\n"):
                    if line.lower().startswith(b"content-length:"):
                        length = int(line.split(b":")[1])
                body = await reader.readexactly(length) if length else b""
                out = await rpcmod.handle_request(state, body)
                writer.write(
                    b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: application/json\r\n"
                    + f"Content-Length: {len(out)}\r\n\r\n".encode() + out)
                await writer.drain()
            finally:
                writer.close()

        srv = await asyncio.start_server(client, "127.0.0.1", 0)
        port_box["port"] = srv.sockets[0].getsockname()[1]
        ready.set()
        async with srv:
            await srv.serve_forever()

    t = threading.Thread(target=lambda: loop.run_until_complete(serve()),
                         daemon=True)
    t.start()
    assert ready.wait(10)
    yield f"http://127.0.0.1:{port_box['port']}", state
    loop.call_soon_threadsafe(loop.stop)


def test_unknown_method_maps_to_error(server):
    url, _ = server
    c = Client(url)
    with pytest.raises(RuntimeError, match="-32601"):
        c.call("nope", [])


def test_malformed_witness_maps_to_internal_error(server):
    url, _ = server
    c = Client(url)
    with pytest.raises(RuntimeError):
        c.gen_evm_proof_committee_update({"bogus": True})


def test_stubbed_prove_roundtrip(server, monkeypatch):
    """Full wire path with the circuit layer stubbed: the handler's
    witness transform + scheduler + response shape all execute."""
    url, state = server

    class FakeCircuit:
        @classmethod
        def gen_snark(cls, pk, spec, srs, args, pinning=None):
            from spectre_tpu.witness.rotation import (
                committee_update_instances)
            return type("P", (), {"data": b"\x01\x02"})(), \
                committee_update_instances(args)

    def fake_compress(state, kind, pk, inner_proof, inner_inst):
        # aggregation instance layout: 12 accumulator limbs then the
        # flattened inner instances (rpc.rs:106 extraction contract)
        flat = [v for col in inner_inst for v in col]
        return bytes(inner_proof.data), [list(range(12)) + flat]

    monkeypatch.setattr(rpcmod.ProverState, "_circuit",
                        staticmethod(lambda kind: FakeCircuit))
    monkeypatch.setattr(rpcmod.ProverState, "pk", lambda self, kind: None)
    monkeypatch.setattr(rpcmod.ProverState, "srs", lambda self, k: None)
    monkeypatch.setattr(rpcmod, "_compress", fake_compress)

    # synthetic but structurally valid light-client update (the same
    # construction the preprocessor tests use)
    import random
    from spectre_tpu import ssz
    from spectre_tpu.curves import host as H
    rng = random.Random(9)
    spec = MINIMAL
    pts = [H.bls_g1.mul(H.bls_g1.gen, rng.randrange(1, 1 << 64))
           for _ in range(spec.sync_committee_size)]
    pubkeys = [H.g1_compress(p) for p in pts]
    agg = H.g1_compress(H.bls_g1.mul(H.bls_g1.gen, 999))
    pk_root = ssz.sync_committee_pubkeys_root(pubkeys)
    branch = [ssz.bls_pubkey_root(agg)] + [
        bytes([rng.randrange(256) for _ in range(32)]) for _ in range(5)]
    state_root = ssz.mock_root(pk_root, branch,
                               spec.sync_committee_pubkeys_root_index)

    def hx(b):
        return "0x" + bytes(b).hex()

    update = {
        "attested_header": {"beacon": {
            "slot": "7", "proposer_index": "0",
            "parent_root": hx(b"\x00" * 32),
            "state_root": hx(state_root),
            "body_root": hx(b"\x00" * 32)}},
        "finalized_header": {"beacon": {
            "slot": "5", "proposer_index": "0",
            "parent_root": hx(b"\x00" * 32),
            "state_root": hx(b"\x00" * 32),
            "body_root": hx(b"\x00" * 32)}},
        "next_sync_committee": {
            "pubkeys": [hx(pk) for pk in pubkeys],
            "aggregate_pubkey": hx(agg),
        },
        "next_sync_committee_branch": [hx(b) for b in branch[1:]],
    }
    c = Client(url)
    out = c.gen_evm_proof_committee_update(update)
    assert out["proof"] == [1, 2]           # calldata bytes
    # 12 accumulator limbs + the 3 inner instances
    assert len(out["instances"][0]) == 15
    # committee_poseidon = instances[0][12] (rpc.rs:106)
    assert out["committee_poseidon"] == out["instances"][0][12]
