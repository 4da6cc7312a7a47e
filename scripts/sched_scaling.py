#!/usr/bin/env python3
"""Data-parallel proof-throughput scaling over the device pool
(SURVEY §2c axis 3; BASELINE "scaling efficiency ... N>=2").

Runs a fixed batch of independent toy proofs through ProofScheduler at
worker counts 1/2/4/8 on the virtual CPU mesh (or real devices when
present) and prints one JSON line with proofs/s and parallel efficiency.

Usage: python scripts/sched_scaling.py [--jobs N] [--k K]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import _force_cpu  # noqa: F401,E402 — CPU mesh only, never the real chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=8)
    ap.add_argument("--k", type=int, default=0,
                    help="0 = per-task default (toy_prove: 5, "
                         "committee_prove: 13 — the nano circuit needs "
                         "k>=13; the old shared default of 5 failed "
                         "keygen deep into the run, ADVICE r4)")
    ap.add_argument("--hosts", action="store_true",
                    help="measure MULTI-PROCESS (one JAX runtime per "
                         "'host', DCN-analog sockets) scaling instead of "
                         "the in-process device pool")
    ap.add_argument("--task", default="toy_prove",
                    choices=["toy_prove", "committee_prove"],
                    help="hostpool task: k=5 toy or the REAL nano "
                         "committee circuit (VERDICT r3 next #10)")
    ap.add_argument("--host-counts", default="1,2,4",
                    help="comma-separated worker counts for --hosts")
    args = ap.parse_args()
    if not args.k:
        args.k = {"toy_prove": 5, "committee_prove": 13}[args.task]

    if args.hosts:
        return main_hosts(args)

    import jax
    from spectre_tpu.poly import kzg
    from spectre_tpu.service.scheduler import ProofScheduler
    from tests.test_app_lifecycle import ToyCircuit

    srs = kzg.test_srs(args.k)
    pk = ToyCircuit.create_pk(None, args.k, srs)

    def prove(x):
        proof, inst = ToyCircuit.gen_proof(pk, None, srs, {"x": x, "w": 7})
        assert ToyCircuit.verify(pk, srs, proof, inst)
        return len(proof.data)

    # warm the devices that will actually run (largest worker count used),
    # concurrently through a throwaway scheduler — serial first-touch proves
    # cost minutes each on the CPU mesh
    devs = jax.devices()
    n_warm = max(nw for nw in (1, 2, 4, 8) if nw <= len(devs))
    warm_sched = ProofScheduler(devices=devs[:n_warm])
    try:
        jids = [warm_sched.submit("warm", lambda: prove(1))
                for _ in range(n_warm)]
        for j in jids:
            warm_sched.wait(j, timeout=1200)
    finally:
        warm_sched.stop()

    results = []
    base = None
    for nw in (1, 2, 4, 8):
        if nw > len(devs):
            break
        sched = ProofScheduler(devices=devs[:nw])
        try:
            t0 = time.time()
            jids = [sched.submit("toy", lambda x=x: prove(x))
                    for x in range(1, args.jobs + 1)]
            for j in jids:
                sched.wait(j, timeout=1200)
            dt = time.time() - t0
        finally:
            sched.stop()
        thr = args.jobs / dt
        if base is None:
            base = thr
        results.append({
            "workers": nw,
            "proofs_per_s": round(thr, 3),
            "speedup": round(thr / base, 3),
            "efficiency": round(thr / base / nw, 3),
        })
    print(json.dumps({"k": args.k, "jobs": args.jobs, "scaling": results}))
    return 0


def main_hosts(args):
    """Proof-throughput scaling over worker PROCESSES (BASELINE #5's
    multi-host axis): each worker owns a full JAX runtime; the coordinator
    feeds a FIFO over local sockets (the DCN stand-in)."""
    from spectre_tpu.service.hostpool import HostPool

    results = []
    base = None
    task = getattr(args, "task", "toy_prove")
    counts = [int(c) for c in
              getattr(args, "host_counts", "1,2,4").split(",")]
    for nh in counts:
        pool = HostPool(nh)
        try:
            # warm every worker's per-process pk/compile caches
            warm = [pool.submit(task, {"k": args.k, "x": 1, "seed": 42})
                    for _ in range(nh)]
            for j in warm:
                pool.wait(j, timeout=7200)
            t0 = time.time()
            jids = [pool.submit(task, {"k": args.k, "x": x, "seed": 42})
                    for x in range(1, args.jobs + 1)]
            for j in jids:
                pool.wait(j, timeout=7200)
            dt = time.time() - t0
        finally:
            pool.stop()
        thr = args.jobs / dt
        if base is None:
            base = thr
        results.append({
            "hosts": nh,
            "proofs_per_s": round(thr, 3),
            "speedup": round(thr / base, 3),
            "efficiency": round(thr / base / nh, 3),
        })
    print(json.dumps({"k": args.k, "jobs": args.jobs, "mode": "hosts",
                      "task": task, "scaling": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
