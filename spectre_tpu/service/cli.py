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


def _cmd_circuit(args) -> int:
    known = {"committee-update", "sync-step", "sync-step-compressed"}
    if args.proof not in known:
        print(f"unknown circuit {args.proof}", file=sys.stderr)
        return 2
    print(json.dumps({
        "status": "unimplemented",
        "detail": f"{args.proof}/{args.command}: application circuits land "
                  "in the next milestones (gadget stack: poseidon done; "
                  "sha256/bls pending)",
    }))
    return 3


def _cmd_rpc(args) -> int:
    from .rpc import run_rpc
    run_rpc(port=args.port, concurrency=args.concurrency,
            spec_name=args.spec)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spectre-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("circuit", help="circuit lifecycle commands")
    c.add_argument("proof", choices=[
        "sync-step", "sync-step-compressed", "committee-update"])
    c.add_argument("command", choices=["setup", "gen-verifier"])
    c.add_argument("-k", type=int, default=20)
    c.add_argument("--spec", default="testnet",
                   choices=["minimal", "testnet", "mainnet"])
    c.add_argument("--config-path", default="./config")
    c.add_argument("--build-dir", default="./build")
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
    r.set_defaults(fn=_cmd_rpc)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
