"""spectre-tpu prover CLI — mirrors the reference CLI surface
(prover/src/args.rs:10-160, prover/src/cli.rs):

  spectre-tpu circuit {sync-step,sync-step-compressed,committee-update}
      {setup,gen-verifier} [-k N] [--spec {minimal,testnet,mainnet}] ...
  spectre-tpu utils committee-poseidon (--beacon-api URL | --pubkeys FILE)
  spectre-tpu rpc --port N --concurrency N

Circuit lifecycle stages that depend on the not-yet-landed app circuits
report their status explicitly instead of silently no-oping.
"""
from __future__ import annotations

import argparse
import json
import sys


def _cmd_committee_poseidon(args) -> int:
    from ..hashes.poseidon import (
        poseidon_committee_commitment_from_compressed)
    from ..ssz import sync_committee_pubkeys_root, _hex

    if args.pubkeys:
        with open(args.pubkeys) as f:
            data = json.load(f)
        pubkeys = [bytes(pk) if isinstance(pk, list) else _hex(pk)
                   for pk in data]
        # accept either compressed (48B) or uncompressed (96B) entries
        if len(pubkeys[0]) == 96:
            from ..curves.host import g1_from_uncompressed, g1_compress
            pubkeys = [g1_compress(g1_from_uncompressed(pk)) for pk in pubkeys]
        else:
            # some fixtures (test_data/committee_pubkeys_512.json) store the
            # 48 bytes little-endian; detect by attempting BE decompression
            from ..curves.host import g1_decompress
            try:
                for pk in pubkeys:
                    g1_decompress(pk)
            except AssertionError:
                pubkeys = [pk[::-1] for pk in pubkeys]
                for pk in pubkeys:
                    g1_decompress(pk)
    else:
        from ..preprocessor.beacon import BeaconClient
        client = BeaconClient(args.beacon_api)
        root = client.block_root("head")
        bootstrap = client.light_client_bootstrap(root)
        pubkeys = [_hex(pk) for pk in
                   bootstrap["current_sync_committee"]["pubkeys"]]

    commitment = poseidon_committee_commitment_from_compressed(pubkeys)
    ssz_root = sync_committee_pubkeys_root(pubkeys)
    print(json.dumps({
        "committee_poseidon": hex(commitment),
        "ssz_root": "0x" + ssz_root.hex(),
        "n_pubkeys": len(pubkeys),
    }))
    return 0


def _spec_of(name: str):
    from ..specs import MINIMAL, TESTNET, MAINNET
    return {"minimal": MINIMAL, "testnet": TESTNET, "mainnet": MAINNET}[name]


def _circuit_cls(proof: str):
    if proof == "committee-update":
        from ..circuits.committee_update import CommitteeUpdateCircuit
        return CommitteeUpdateCircuit
    if proof in ("sync-step", "sync-step-compressed"):
        from ..circuits.sync_step import StepCircuit
        return StepCircuit
    raise KeyError(proof)


def _cmd_circuit(args) -> int:
    """circuit {proof} {setup,prove,gen-verifier} — the cli.rs spec_app
    analog (prover/src/cli.rs:25-232)."""
    import os
    from ..poly import kzg
    from ..circuits.app import Pinning

    try:
        cls = _circuit_cls(args.proof)
    except (KeyError, ImportError) as e:
        print(json.dumps({"status": "unavailable", "detail": str(e)}))
        return 3
    spec = _spec_of(args.spec)
    os.makedirs(args.build_dir, exist_ok=True)
    pk_path = os.path.join(args.build_dir,
                           f"{args.proof}_{args.spec}_pk.pkl")
    pin_path = os.path.join(args.config_path,
                            f"{args.proof}_{args.spec}.json")
    compressed = args.proof.endswith("-compressed")

    if args.command == "setup":
        srs = kzg.cached_srs(args.k)
        pk = cls.create_pk(spec, args.k, srs, pk_path=pk_path,
                           pinning_path=pin_path)
        out = {
            "status": "ok", "k": args.k, "pk": pk_path, "pinning": pin_path,
            "n_advice": len(pk.vk.cs.advice),
            "n_fixed": len(pk.vk.cs.fixed),
            "n_lookups": len(pk.vk.cs.lookups),
        }
        if compressed:
            # aggregation keygen from a dummy inner snark (cli.rs:164-205)
            from ..circuits.aggregation import (AggregationCircuit,
                                                AggregationInput)
            srs_a = kzg.cached_srs(args.agg_k)
            dummy = AggregationCircuit.dummy_input(
                cls, spec, args.k, srs, pk_path=pk_path)
            agg_pk_path = os.path.join(
                args.build_dir, f"{args.proof}_{args.spec}_agg_pk.pkl")
            agg_pin = os.path.join(
                args.config_path, f"{args.proof}_verifier_{args.spec}.json")
            AggregationCircuit.create_pk(
                spec, args.agg_k, srs_a, pk_path=agg_pk_path,
                pinning_path=agg_pin, witness=dummy)
            out.update(agg_k=args.agg_k, agg_pk=agg_pk_path,
                       agg_pinning=agg_pin)
        print(json.dumps(out))
        return 0

    if args.command == "prove":
        import time
        srs = kzg.cached_srs(args.k)
        if args.witness:
            from ..witness.rotation import CommitteeUpdateArgs
            from ..witness.step import SyncStepArgs
            wcls = (CommitteeUpdateArgs if args.proof == "committee-update"
                    else SyncStepArgs)
            witness = wcls.from_file(args.witness, spec)
        else:
            witness = cls.default_witness(spec)
        pk = cls.create_pk(spec, args.k, srs, pk_path=pk_path,
                           pinning_path=pin_path, witness=witness)
        # prover-mode layout reproducibility: read the committed pinning
        # and fail loudly if the derived layout drifted (util/circuit.rs
        # Halo2ConfigPinning round-trip)
        pinning = Pinning.from_path(pin_path) if os.path.exists(pin_path) \
            else None
        t0 = time.time()
        if compressed:
            # production shape (rpc.rs:144-160): inner snark -> aggregation
            # EVM proof -> calldata
            from ..circuits.aggregation import (AggregationCircuit,
                                                AggregationInput)
            srs_a = kzg.cached_srs(args.agg_k)
            inner_proof, inner_inst = cls.gen_snark(pk, spec, srs, witness,
                                                    pinning=pinning)
            agg_in = AggregationInput(pk.vk, inner_proof.data, inner_inst)
            agg_pk_path = os.path.join(
                args.build_dir, f"{args.proof}_{args.spec}_agg_pk.pkl")
            agg_pk = AggregationCircuit.create_pk(
                spec, args.agg_k, srs_a, pk_path=agg_pk_path,
                witness=agg_in)
            proof, instances = AggregationCircuit.gen_evm_proof(
                agg_pk, spec, srs_a, agg_in)
            dt = time.time() - t0
            from ..plonk.verifier import verify_proof as _vp
            from ..circuits.aggregation import ACC_INDICES
            ok = _vp(agg_pk.vk, srs_a, proof, instances,
                     transcript="keccak", accumulator_indices=ACC_INDICES)
            calldata = AggregationCircuit.write_calldata(
                instances, proof,
                path=args.out or os.path.join(
                    args.build_dir, f"{args.proof}_{args.spec}.calldata"))
            out = {"status": "ok" if ok else "verify-failed",
                   "proof_bytes": len(proof.data),
                   "calldata_bytes": len(calldata),
                   "prove_seconds": round(dt, 2),
                   "instances": [[hex(v) for v in col]
                                 for col in instances]}
            print(json.dumps(out))
            return 0 if ok else 4
        proof, instances = cls.gen_proof(pk, spec, srs, witness,
                                          pinning=pinning)
        dt = time.time() - t0
        ok = cls.verify(pk, srs, proof, instances)
        out = {"status": "ok" if ok else "verify-failed",
               "proof_bytes": len(proof.data),
               "prove_seconds": round(dt, 2),
               "instances": [[hex(v) for v in col] for col in instances]}
        if args.out:
            with open(args.out, "wb") as f:
                f.write(proof.data)
            out["proof"] = args.out
        print(json.dumps(out))
        return 0 if ok else 4

    if args.command == "gen-verifier":
        # EVM verifier bytecode from the cached PK (cli.rs:244-271 analog);
        # compressed circuits emit the AGGREGATION verifier (the on-chain
        # artifact) with accumulator folding
        srs = kzg.cached_srs(args.k)
        pk = cls.create_pk(spec, args.k, srs, pk_path=pk_path,
                           pinning_path=pin_path)
        acc = None
        if compressed:
            from ..circuits.aggregation import (ACC_INDICES,
                                                AggregationCircuit)
            srs_a = kzg.cached_srs(args.agg_k)
            dummy = AggregationCircuit.dummy_input(
                cls, spec, args.k, srs, pk_path=pk_path)
            agg_pk_path = os.path.join(
                args.build_dir, f"{args.proof}_{args.spec}_agg_pk.pkl")
            pk = AggregationCircuit.create_pk(
                spec, args.agg_k, srs_a, pk_path=agg_pk_path, witness=dummy)
            builder = AggregationCircuit.build(dummy, spec)
            srs, cls_, acc = srs_a, AggregationCircuit, ACC_INDICES
        else:
            cls_ = cls
            builder = cls.build(cls.default_witness(spec), spec)
        inst_shape = [len(c) for c in builder.instances()]
        out_path = args.out or os.path.join(
            args.build_dir, f"{args.proof}_{args.spec}_verifier.bin")
        style = "deployable" if args.deployable else "looped"
        code = cls_.gen_evm_verifier(pk, srs, inst_shape, path=out_path,
                                     accumulator_indices=acc, style=style)
        if args.deployable:
            out = {
                "status": "ok", "verifier": out_path,
                "bytecode_bytes": len(code.code),
                "data_contracts": [len(d) for d in code.data_contracts],
                "eip170_ok": len(code.code) <= 24576 and all(
                    len(d) <= 24576 for d in code.data_contracts),
                "inst_shape": inst_shape,
            }
        else:
            out = {
                "status": "ok", "verifier": out_path,
                "bytecode_bytes": len(code),
                "inst_shape": inst_shape,
            }
        if args.estimate_gas:
            # prove the dummy witness and run the verifier in the in-process
            # EVM to report gas (cli.rs:259-268 --estimate-gas analog)
            if compressed:
                proof, instances = cls_.gen_evm_proof(pk, spec, srs, dummy)
            else:
                proof, instances = cls_.gen_evm_proof(
                    pk, spec, srs, cls_.default_witness(spec))
            if args.deployable:
                from ..evm.interp import World
                from ..evm.calldata import encode_calldata
                world = World()
                addr = code.deploy(world, 0x1000)
                res = world.call(addr,
                                 encode_calldata(instances, proof.data))
                ok = res.success and res.returndata == (1).to_bytes(
                    32, "big")
                gas = res.gas_used
            else:
                ok, gas = cls_.evm_verify(code, instances, proof)
            out.update(evm_ok=bool(ok), gas=gas)
            if not ok:
                # the reference cli.rs propagates a verify failure as an
                # error; match the prove path's exit code
                out["status"] = "verify-failed"
                print(json.dumps(out))
                return 4
        print(json.dumps(out))
        return 0

    print(json.dumps({"status": "unknown-command"}))
    return 3


def _cmd_rpc(args) -> int:
    from .rpc import run_rpc
    run_rpc(port=args.port, concurrency=args.concurrency,
            spec_name=args.spec, k_step=args.k_step,
            k_committee=args.k_committee, k_agg=args.k_agg,
            committee_impl=args.impl)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spectre-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("circuit", help="circuit lifecycle commands")
    c.add_argument("proof", choices=[
        "sync-step", "sync-step-compressed", "committee-update"])
    c.add_argument("command", choices=["setup", "prove", "gen-verifier"])
    c.add_argument("-k", type=int, default=20)
    c.add_argument("-K", "--agg-k", type=int, default=17,
                   help="aggregation circuit degree (compressed proofs)")
    c.add_argument("--spec", default="testnet",
                   choices=["minimal", "testnet", "mainnet"])
    c.add_argument("--config-path", default="./config")
    c.add_argument("--build-dir", default="./build")
    c.add_argument("--witness", help="witness JSON (default: dummy witness)")
    c.add_argument("--out", help="write raw proof bytes here")
    c.add_argument("--deployable", action="store_true",
                   help="gen-verifier: emit the EIP-170 split artifact "
                        "(verifier code + 0x00-guarded data contracts, "
                        "EXTCODECOPY-linked) instead of one blob")
    c.add_argument("--estimate-gas", action="store_true",
                   help="gen-verifier: prove the dummy witness and report "
                        "in-process EVM verify gas (cli.rs:259-268)")
    c.set_defaults(fn=_cmd_circuit)

    u = sub.add_parser("utils", help="utility commands")
    us = u.add_subparsers(dest="util", required=True)
    cp = us.add_parser("committee-poseidon")
    cp.add_argument("--beacon-api", help="beacon node URL")
    cp.add_argument("--pubkeys", help="JSON file with pubkey byte arrays")
    cp.set_defaults(fn=_cmd_committee_poseidon)

    r = sub.add_parser("rpc", help="run the JSON-RPC prover server")
    r.add_argument("--port", type=int, default=3000)
    r.add_argument("--concurrency", type=int, default=1)
    r.add_argument("--spec", default="testnet")
    r.add_argument("--k-step", type=int, default=0,
                   help="step circuit degree (0 = per-spec default)")
    r.add_argument("--k-committee", type=int, default=0,
                   help="committee circuit degree (0 = per-spec default)")
    r.add_argument("--impl", choices=["thin", "wide"], default="thin",
                   help="committee circuit: thin (flex-SHA, agg-affordable"
                        " VK — default since r4) or wide (123-col SHA, "
                        "fastest standalone; the pre-r4 server default)")
    r.add_argument("--k-agg", type=int, default=0,
                   help="aggregation degree (0 = per-spec default)")
    r.set_defaults(fn=_cmd_rpc)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
