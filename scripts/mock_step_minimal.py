#!/usr/bin/env python3
"""StepCircuit MockProver at the MINIMAL spec (32 validators) over a
generated consensus-spec-style fixture — the reference CI's
test_eth2_spec_mock_1 analog (tests.yml:50-55). Prints one JSON line."""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import _force_cpu  # noqa: F401 — must not touch the real chip
    t0 = time.time()
    from spectre_tpu.specs import MINIMAL
    from spectre_tpu.test_utils import (generate_spec_test_fixture,
                                        read_test_files_and_gen_witness)
    from spectre_tpu.witness.step import sync_step_instances
    from spectre_tpu.circuits.sync_step import StepCircuit
    from spectre_tpu.fields import limb as L
    from spectre_tpu.plonk.mock import MockProver

    d = tempfile.mkdtemp()
    generate_spec_test_fixture(d, MINIMAL)
    wit, _ = read_test_files_and_gen_witness(d, MINIMAL)
    print(f"[{time.time()-t0:.0f}s] fixture + witness ready", flush=True)

    builder = StepCircuit.build(wit, MINIMAL)
    print(f"[{time.time()-t0:.0f}s] built: {len(builder.main().cells)} cells",
          flush=True)
    want = sync_step_instances(wit)
    got = builder.instances()
    assert got == want, "instance parity"
    print(f"[{time.time()-t0:.0f}s] instances match native mirror", flush=True)

    k = 16
    while True:
        try:
            cs, fixed, advice, inst_cols = builder.compile(k)
            break
        except AssertionError:
            k += 1
    print(f"[{time.time()-t0:.0f}s] compiled k={k} advice={len(cs.advice)}",
          flush=True)

    spec = L.fr_spec
    n = 1 << k
    cols = []
    fi = ai = ii = 0
    for col in cs.columns:
        if col.kind == "fixed":
            cols.append(spec.encode_batch(fixed[fi])); fi += 1
        elif col.kind == "advice":
            cols.append(spec.encode_batch(advice[ai])); ai += 1
        else:
            cols.append(spec.encode_batch(inst_cols[ii])); ii += 1
    failures = MockProver(cs, n, cols).verify()
    print(json.dumps({
        "circuit": "sync-step", "spec": "minimal", "k": k,
        "cells": len(builder.main().cells),
        "mock_failures": len(failures),
        "instance_parity": True,
        "wall_s": round(time.time() - t0, 1),
    }))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
