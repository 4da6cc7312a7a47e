#!/usr/bin/env python3
"""Measure EVM-verifier bytecode sizes + verify gas on a REAL proof.

The reference prints verifier size at gen-verifier time and estimates gas
with --estimate-gas (prover/src/cli.rs:244-271); here we execute the
generated verifier in the in-repo EVM over encode_calldata output from a
persisted proof artifact (written by scripts/prove_{committee,step}.py
after a verified TPU prove) and record exact gas.

Usage: python scripts/evm_gas.py --pk build/committee_nano_k13_pk.pkl \
           --artifact build/committee_nano_k13_proof.pkl --k 13
Prints one JSON line: looped/deployable sizes, EIP-170 fit, gas used.
"""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pk", required=True, help="proving-key pickle")
    ap.add_argument("--artifact", required=True,
                    help="proof artifact pickle ({proof, instances})")
    ap.add_argument("--k", type=int, required=True)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from spectre_tpu.poly import kzg
    from spectre_tpu.evm.calldata import encode_calldata
    from spectre_tpu.evm.interp import World, execute
    from spectre_tpu.evm.verifier_loop import (EIP170_MAX,
                                               gen_evm_verifier_deployable,
                                               gen_evm_verifier_looped)

    with open(args.pk, "rb") as f:
        pk = pickle.load(f)
    with open(args.artifact, "rb") as f:
        art = pickle.load(f)
    proof, instances = art["proof"], art["instances"]
    flavor = art.get("transcript", "blake2b")
    assert flavor == "keccak", (
        "EVM verifiers check Keccak-transcript proofs; re-prove with "
        f"--transcript keccak (artifact has {flavor!r})")
    shape = [len(c) for c in instances]
    srs = kzg.cached_srs(args.k)

    looped = gen_evm_verifier_looped(pk.vk, srs, shape)
    dep = gen_evm_verifier_deployable(pk.vk, srs, shape)

    cd = encode_calldata(instances, proof)
    r_blob = execute(looped, cd)
    assert r_blob.success, f"looped verifier rejected: {r_blob.error}"
    world = World()
    addr = dep.deploy(world, 0x1000)
    r_dep = world.call(addr, cd)
    assert r_dep.success, f"deployable verifier rejected: {r_dep.error}"

    print(json.dumps({
        "pk": os.path.basename(args.pk), "k": args.k,
        "proof_bytes": len(proof), "calldata_bytes": len(cd),
        "looped_bytes": len(looped),
        "deployable_code_bytes": len(dep.code),
        "deployable_data_contracts": [len(d) for d in dep.data_contracts],
        "eip170_max": EIP170_MAX,
        "eip170_fits": len(dep.code) <= EIP170_MAX,
        "gas_looped": r_blob.gas_used,
        "gas_deployable": r_dep.gas_used,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
