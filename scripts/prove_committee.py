#!/usr/bin/env python3
"""End-to-end CommitteeUpdateCircuit real prove (BASELINE config #3 driver).

Usage: python scripts/prove_committee.py [--spec nano|minimal] [--k K]
       [--platform cpu|tpu] [--trace]

Builds the circuit from a witness (synthetic for nano, dummy-default for
minimal), compiles the layout, keygens (disk-cached SRS), proves on the
default device, verifies with the batched pairing check, and prints one
JSON summary line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="nano",
                    choices=["nano", "minimal", "testnet"])
    ap.add_argument("--witness", default=None,
                    help="witness JSON (testnet default: the reference's "
                         "golden test_data/rotation_512.json)")
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--repeat", type=int, default=1,
                    help="prove N times; later runs measure the warm path "
                         "(programs loaded — the RPC server's steady state)")
    ap.add_argument("--budget-only", action="store_true",
                    help="print the static per-phase HBM budget and exit "
                         "(no keygen/prove)")
    ap.add_argument("--transcript", default="blake2b",
                    choices=["blake2b", "keccak"],
                    help="keccak = EVM flavor; its artifact feeds "
                         "scripts/evm_gas.py (gen_evm_proof analog)")
    args = ap.parse_args()

    if args.trace:
        os.environ["SPECTRE_TRACE"] = "1"
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from spectre_tpu.jax_cache import enable as _enable_cache
    _enable_cache()

    import random
    from spectre_tpu.specs import Spec, MINIMAL
    from spectre_tpu import ssz
    from spectre_tpu.curves import host as H
    from spectre_tpu.witness.rotation import (CommitteeUpdateArgs,
                                              committee_update_instances)
    from spectre_tpu.circuits.committee_update import CommitteeUpdateCircuit
    from spectre_tpu.plonk.keygen import keygen
    from spectre_tpu.plonk.prover import create_proof
    from spectre_tpu.plonk.verifier import verify_proof
    from spectre_tpu.poly import kzg

    t_start = time.time()

    def log(m):
        print(f"[{time.time()-t_start:7.1f}s] {m}", flush=True)

    if args.spec == "nano":
        spec = Spec(name="nano", sync_committee_size=4)
        rng = random.Random(42)
        pts = [H.bls_g1.mul(H.bls_g1.gen, rng.randrange(1, 1 << 64))
               for _ in range(spec.sync_committee_size)]
        pubkeys = [H.g1_compress(p) for p in pts]
        pk_root = ssz.sync_committee_pubkeys_root(pubkeys)
        branch = [bytes([rng.randrange(256) for _ in range(32)])
                  for _ in range(spec.sync_committee_pubkeys_depth)]
        state_root = ssz.mock_root(pk_root, branch,
                                   spec.sync_committee_pubkeys_root_index)
        header = ssz.BeaconBlockHeader(slot=1234, state_root=state_root)
        witness = CommitteeUpdateArgs(
            pubkeys_compressed=pubkeys, finalized_header=header,
            sync_committee_branch=branch, spec=spec)
    elif args.spec == "minimal":
        spec = MINIMAL
        witness = CommitteeUpdateArgs.default(spec)
    else:
        from spectre_tpu.specs import TESTNET
        spec = TESTNET
        path = args.witness or \
            "/root/reference/test_data/rotation_512.json"
        witness = CommitteeUpdateArgs.from_file(path, spec)

    log(f"building circuit ({spec.name}, {spec.sync_committee_size} keys)")
    builder = CommitteeUpdateCircuit.build(witness, spec)
    log(f"built: {len(builder.main().cells)} cells")
    want_inst = committee_update_instances(witness)
    assert builder.instances() == want_inst, "instance parity"

    cs, fixed, advice, instances = builder.compile(args.k)
    log(f"compiled k={args.k}: advice={len(cs.advice)} fixed={len(cs.fixed)} "
        f"lookups={len(cs.lookups)} copies={len(cs.copies)}")
    from spectre_tpu.plonk import membudget
    print(membudget.report(cs, args.k), flush=True)
    if args.budget_only:
        return 0
    membudget.assert_fits(cs, args.k)
    if args.spec == "testnet":
        # commit the layout pinning like the reference's
        # lightclient-circuits/config/committee_update_testnet.json
        from spectre_tpu.circuits.app import Pinning
        pin_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "config", "committee_update_testnet.json")
        Pinning.from_layout(builder.last_layout,
                            meta={"circuit": "CommitteeUpdateCircuit",
                                  "spec": "testnet"}).write(pin_path)
        log(f"pinning written: {pin_path}")

    t0 = time.time()
    srs = kzg.cached_srs(args.k)
    t_srs = time.time() - t0
    log(f"srs ready ({t_srs:.1f}s)")

    import pickle
    pk_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "build", f"committee_{spec.name}_k{args.k}_pk.pkl")
    t0 = time.time()
    if os.path.exists(pk_path):
        with open(pk_path, "rb") as f:
            pk = pickle.load(f)
        t_kg = time.time() - t0
        log(f"pk loaded from cache ({t_kg:.1f}s)")
    else:
        pk = keygen(cs, args.k, fixed, srs, checkpoint=pk_path + ".ckpt")
        t_kg = time.time() - t0
        with open(pk_path, "wb") as f:
            pickle.dump(pk, f)
        log(f"keygen done ({t_kg:.1f}s)")

    t_proves = []
    for it in range(max(1, args.repeat)):
        t0 = time.time()
        proof = create_proof(pk, srs, advice, instances,
                             transcript=args.transcript)
        t_proves.append(time.time() - t0)
        log(f"prove[{it}] done ({t_proves[-1]:.1f}s, {len(proof.data)} bytes)")
    t_prove = t_proves[-1]

    t0 = time.time()
    ok = verify_proof(pk.vk, srs, proof, instances,
                      transcript=args.transcript)
    t_ver = time.time() - t0
    log(f"verify: {ok} ({t_ver:.1f}s)")

    if ok:   # persist the artifact so EVM-verifier gas can be measured
        try:   # on the real proof without re-proving (cli.rs:259-268 analog)
            import pickle as _pkl
            sfx = "_proof.pkl" if args.transcript == "blake2b" else "_evmproof.pkl"
            apath = pk_path.replace("_pk.pkl", sfx)
            with open(apath, "wb") as f:
                _pkl.dump({"proof": proof.data, "instances": instances,
                           "transcript": args.transcript}, f)
            log(f"proof artifact: {apath}")
        except Exception as e:   # noqa: BLE001 — artifact is optional
            log(f"proof artifact save failed: {e!r}")

    print(json.dumps({
        "circuit": "committee-update", "spec": spec.name, "k": args.k,
        "cells": len(builder.main().cells),
        "n_advice": len(cs.advice),
        "proof_bytes": len(proof.data),
        "srs_s": round(t_srs, 1), "keygen_s": round(t_kg, 1),
        "prove_s": round(t_prove, 1),
        "prove_s_all": [round(x, 1) for x in t_proves],
        "verify_s": round(t_ver, 1),
        "verified": bool(ok),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
