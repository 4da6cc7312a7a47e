#!/usr/bin/env python3
"""UNSTUBBED RPC end-to-end: serve one real genEvmProof_CommitteeUpdateCompressed.

The production pipeline of prover/src/rpc.rs:144-160, with no circuit or
compression stubs (VERDICT r3 next #4): the asyncio server boots a
ProverState (thin committee inner — the aggregation-affordable layout),
the typed Client posts a structurally-valid light-client update, and the
handler runs witness transform → inner snark (Poseidon transcript) →
AggregationCircuit EVM proof (Keccak) → self-verify → calldata. The script
then generates the looped EVM verifier from the aggregation VK and runs
the returned calldata through the in-repo interpreter — the full
relayer-visible contract.

Defaults (nano, k_committee=18 thin — 16-advice inner VK, k_agg=17) are sized for one real TPU
window; PKs disk-cache under build/ so reruns are warm.

Usage: python scripts/rpc_e2e.py [--k-committee 18] [--k-agg 17]
"""
import argparse
import asyncio
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_update(spec, seed: int = 42):
    """Structurally-valid light-client update for `spec` (the construction
    of preprocessor tests / unit_test_gen.rs's mock_root forging)."""
    import random
    from spectre_tpu import ssz
    from spectre_tpu.curves import host as H
    rng = random.Random(seed)
    pts = [H.bls_g1.mul(H.bls_g1.gen, rng.randrange(1, 1 << 64))
           for _ in range(spec.sync_committee_size)]
    pubkeys = [H.g1_compress(p) for p in pts]
    agg = H.g1_compress(H.bls_g1.mul(H.bls_g1.gen, 999))
    pk_root = ssz.sync_committee_pubkeys_root(pubkeys)
    branch = [ssz.bls_pubkey_root(agg)] + [
        bytes([rng.randrange(256) for _ in range(32)])
        for _ in range(spec.sync_committee_depth)]
    state_root = ssz.mock_root(pk_root, branch,
                               spec.sync_committee_pubkeys_root_index)

    def hx(b):
        return "0x" + bytes(b).hex()

    return {
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="nano")
    ap.add_argument("--k-committee", type=int, default=18)
    ap.add_argument("--k-agg", type=int, default=17)
    ap.add_argument("--impl", default="thin", choices=["thin", "wide"])
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    t_start = time.time()

    def log(m):
        print(f"[{time.time()-t_start:7.1f}s] {m}", flush=True)

    from spectre_tpu.jax_cache import enable as _enable_cache
    _enable_cache()
    from spectre_tpu.service import rpc as rpcmod
    from spectre_tpu.service.rpc_client import Client
    from spectre_tpu.specs import BY_NAME

    spec = BY_NAME[args.spec]
    state = rpcmod.ProverState(
        spec, concurrency=1, k_committee=args.k_committee, k_agg=args.k_agg,
        committee_impl=args.impl)
    log(f"ProverState: spec={spec.name} k_committee={state.k_committee} "
        f"k_agg={state.k_agg} impl={state.committee_impl}")

    # boot the server on an ephemeral port in a thread
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
            except Exception as e:   # noqa: BLE001 — malformed header /
                # framing error: answer 500 instead of a silent close that
                # leaves the client blocked on its timeout (ADVICE r4)
                log(f"handler error: {e!r}")
                try:
                    msg = repr(e).encode()
                    writer.write(
                        b"HTTP/1.1 500 Internal Server Error\r\n"
                        + f"Content-Length: {len(msg)}\r\n\r\n".encode()
                        + msg)
                    await writer.drain()
                except Exception:
                    pass
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
    url = f"http://127.0.0.1:{port_box['port']}"
    log(f"server up at {url}")

    update = synthetic_update(spec)
    client = Client(url, timeout=6 * 3600)
    log("posting genEvmProof_CommitteeUpdateCompressed (unstubbed)...")
    out = client.gen_evm_proof_committee_update(update)
    t_req = time.time() - t_start
    calldata = bytes(out["proof"])
    log(f"response: {len(calldata)} calldata bytes, "
        f"committee_poseidon={out['committee_poseidon'][:18]}..., "
        f"{t_req:.1f}s")

    # relayer-side check: the generated looped verifier accepts the calldata
    from spectre_tpu.circuits.aggregation import ACC_INDICES
    from spectre_tpu.evm.interp import execute
    from spectre_tpu.evm.verifier_loop import gen_evm_verifier_looped
    agg_pk = state.agg_pk("committee")
    srs_a = state.srs(state.k_agg)
    instances = [[int(v, 16) for v in col] for col in out["instances"]]
    code = gen_evm_verifier_looped(agg_pk.vk, srs_a,
                                   [len(c) for c in instances],
                                   accumulator_indices=ACC_INDICES)
    log(f"looped verifier: {len(code)} bytes "
        f"({'<=' if len(code) <= 24576 else 'OVER'} EIP-170)")
    res = execute(code, calldata)
    ok = res.success and res.returndata == (1).to_bytes(32, "big")
    gas = res.gas_used
    log(f"EVM verify: ok={ok} gas={gas}")

    # the on-chain artifact: EIP-170 split (code + data contracts),
    # deployed and called through the in-repo World (VERDICT r4 next #5)
    from spectre_tpu.evm.interp import World
    from spectre_tpu.evm.verifier_loop import (EIP170_MAX,
                                               gen_evm_verifier_deployable)
    dep = gen_evm_verifier_deployable(agg_pk.vk, srs_a,
                                      [len(c) for c in instances],
                                      accumulator_indices=ACC_INDICES)
    eip170_ok = (len(dep.code) <= EIP170_MAX
                 and all(len(d) <= EIP170_MAX for d in dep.data_contracts))
    world = World()
    addr = dep.deploy(world, 0x1000)
    res_d = world.call(addr, calldata)
    dep_ok = res_d.success and res_d.returndata == (1).to_bytes(32, "big")
    log(f"deployable verifier: code={len(dep.code)}B data="
        f"{[len(d) for d in dep.data_contracts]} eip170_ok={eip170_ok} "
        f"ok={dep_ok} gas={res_d.gas_used}")

    rec = {
        "metric": "rpc_compressed_e2e_unstubbed",
        "spec": spec.name, "impl": args.impl,
        "k_committee": state.k_committee, "k_agg": state.k_agg,
        "calldata_bytes": len(calldata),
        "request_wall_s": round(t_req, 1),
        "verifier_bytes": len(code), "evm_ok": bool(ok), "gas": gas,
        "deployable_code_bytes": len(dep.code),
        "deployable_data_bytes": [len(d) for d in dep.data_contracts],
        "eip170_ok": bool(eip170_ok),
        "deployable_evm_ok": bool(dep_ok),
        "deployable_gas": res_d.gas_used,
        "committee_poseidon": out["committee_poseidon"],
    }
    print(json.dumps(rec), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
