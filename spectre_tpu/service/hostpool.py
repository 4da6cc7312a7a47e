"""Multi-host data parallelism across proofs (BASELINE config #5 sketch,
SURVEY §2c axis 3 "multiple proofs in flight across hosts (DCN)").

The in-process ProofScheduler covers chips of ONE host. This module covers
the multi-host axis: a pool of worker PROCESSES, each with its own JAX
runtime (its own devices, compile cache, memory) — the honest single-box
analog of one prover process per host — connected to the coordinator over
TCP sockets (the DCN stand-in; the wire protocol is newline-delimited JSON
and would be unchanged across real hosts).

Jobs are NAMED TASKS (a registry, since callables don't cross process
boundaries): workers execute `TASKS[name](params)` and stream the JSON
result back. `scripts/sched_scaling.py --hosts` measures proofs/s scaling
at N = 1/2/4 workers.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import threading
import time
import queue
from typing import Any, Callable, Dict, List, Optional

TASKS: Dict[str, Callable[[dict], Any]] = {}


def register_task(name: str):
    def deco(fn):
        TASKS[name] = fn
        return fn
    return deco


@register_task("toy_prove")
def _toy_prove(params: dict):
    """Keygen-once-per-process toy proof (the sched_scaling workload)."""
    from ..poly import kzg
    from ..circuits.app import AppCircuit
    from ..circuits.builder import CircuitBuilder
    from ..circuits.range_chip import RangeChip

    class Toy(AppCircuit):
        @classmethod
        def build(cls, witness, spec):
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

    k = int(params.get("k", 5))
    srs = kzg.test_srs(k)
    cache = _toy_prove.__dict__.setdefault("pk_cache", {})
    if k not in cache:
        cache[k] = Toy.create_pk(None, k, srs,
                                 witness={"x": 1, "w": 7})
    pk = cache[k]
    proof, inst = Toy.gen_proof(pk, None, srs,
                                {"x": int(params["x"]), "w": 7})
    assert Toy.verify(pk, srs, proof, inst)
    return {"proof_bytes": len(proof.data)}


@register_task("committee_prove")
def _committee_prove(params: dict):
    """Real committee-update prove (nano spec) — the production workload
    shape for multi-host scaling runs on real pods."""
    import random
    from ..specs import Spec
    from .. import ssz
    from ..curves import host as H
    from ..witness.rotation import CommitteeUpdateArgs
    from ..circuits.committee_update import CommitteeUpdateCircuit
    from ..poly import kzg

    k = int(params.get("k", 13))
    spec = Spec(name="nano", sync_committee_size=4)
    rng = random.Random(int(params.get("seed", 42)))
    pts = [H.bls_g1.mul(H.bls_g1.gen, rng.randrange(1, 1 << 64))
           for _ in range(spec.sync_committee_size)]
    pubkeys = [H.g1_compress(p) for p in pts]
    pk_root = ssz.sync_committee_pubkeys_root(pubkeys)
    branch = [bytes([rng.randrange(256) for _ in range(32)])
              for _ in range(spec.sync_committee_pubkeys_depth)]
    state_root = ssz.mock_root(pk_root, branch,
                               spec.sync_committee_pubkeys_root_index)
    header = ssz.BeaconBlockHeader(slot=1234, state_root=state_root)
    wit = CommitteeUpdateArgs(pubkeys_compressed=pubkeys,
                              finalized_header=header,
                              sync_committee_branch=branch, spec=spec)
    srs = kzg.cached_srs(k)
    cache = _committee_prove.__dict__.setdefault("pk_cache", {})
    if k not in cache:
        cache[k] = CommitteeUpdateCircuit.create_pk(
            spec, k, srs, witness=wit)
    pk = cache[k]
    proof, inst = CommitteeUpdateCircuit.gen_proof(pk, spec, srs, wit)
    assert CommitteeUpdateCircuit.verify(pk, srs, proof, inst)
    return {"proof_bytes": len(proof.data)}


# ----------------------------- worker side -----------------------------

def worker_main(port: int) -> int:
    """One 'host': serve tasks over a socket until EOF."""
    from ..jax_cache import enable as _enable_cache
    _enable_cache()     # share compiled programs across worker processes
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", port))
    srv.listen(1)
    # readiness handshake: the coordinator connects and sends jobs
    conn, _ = srv.accept()
    f = conn.makefile("rwb")
    while True:
        line = f.readline()
        if not line:
            return 0
        req = json.loads(line)
        t0 = time.time()
        try:
            result = TASKS[req["task"]](req.get("params", {}))
            resp = {"ok": True, "result": result,
                    "secs": round(time.time() - t0, 3)}
        except Exception as e:  # noqa: BLE001 — surfaced to coordinator
            resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        f.write(json.dumps(resp).encode() + b"\n")
        f.flush()


# --------------------------- coordinator side ---------------------------

def worker_env(platform: str, base: Optional[dict] = None) -> dict:
    """Build the spawn environment for a worker 'host'.

    JAX_PLATFORMS=cpu alone is NOT enough to keep a worker off the real
    chip: the axon sitecustomize (injected via PYTHONPATH) force-registers
    the tunnel TPU and overrides jax_platforms programmatically, so every
    'cpu' worker would silently contend for the ONE chip through the
    tunnel (the original sched_scaling --hosts timeout). For cpu workers,
    scrub .axon_site from PYTHONPATH exactly like tests/conftest does."""
    env = dict(os.environ if base is None else base)
    env["JAX_PLATFORMS"] = platform
    if platform == "cpu":
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p)
    return env


class HostPool:
    """N worker processes + a FIFO: the multi-host ProofScheduler."""

    def __init__(self, n_hosts: int, base_port: int = 19876,
                 platform: str = "cpu"):
        self.procs: List[subprocess.Popen] = []
        self.socks = []
        self._q: "queue.Queue" = queue.Queue()
        self._results: Dict[int, dict] = {}
        self._lock = threading.Lock()
        self._next_id = 0
        env = worker_env(platform)
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        for i in range(n_hosts):
            port = base_port + i
            self.procs.append(subprocess.Popen(
                [sys.executable, "-m", "spectre_tpu.service.hostpool",
                 str(port)], env=env, cwd=repo))
        # connect (retry while workers boot)
        for i in range(n_hosts):
            port = base_port + i
            for _ in range(600):
                try:
                    s = socket.create_connection(("127.0.0.1", port), 1)
                    s.settimeout(None)      # jobs run for minutes
                    break
                except OSError:
                    time.sleep(0.1)
            else:
                raise RuntimeError(f"worker {i} never came up")
            self.socks.append(s.makefile("rwb"))
        self._threads = [
            threading.Thread(target=self._pump, args=(f,), daemon=True)
            for f in self.socks]
        for t in self._threads:
            t.start()

    def submit(self, task: str, params: dict) -> int:
        with self._lock:
            jid = self._next_id
            self._next_id += 1
        self._q.put((jid, task, params))
        return jid

    def wait(self, jid: int, timeout: float = 3600) -> dict:
        deadline = time.time() + timeout
        while True:
            with self._lock:
                if jid in self._results:
                    r = self._results.pop(jid)
                    if not r.get("ok"):
                        raise RuntimeError(r.get("error"))
                    return r
            if time.time() > deadline:
                raise TimeoutError(jid)
            time.sleep(0.02)

    def _pump(self, f):
        while True:
            item = self._q.get()
            if item is None:
                return
            jid, task, params = item
            try:
                f.write(json.dumps(
                    {"task": task, "params": params}).encode() + b"\n")
                f.flush()
                resp = json.loads(f.readline())
            except Exception as e:  # noqa: BLE001
                resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            with self._lock:
                self._results[jid] = resp

    def stop(self):
        for _ in self._threads:
            self._q.put(None)
        for fobj in self.socks:
            try:
                fobj.close()
            except OSError:
                pass
        for p in self.procs:
            try:
                p.terminate()
                p.wait(timeout=10)
            except Exception:   # noqa: BLE001 — best-effort teardown
                p.kill()


if __name__ == "__main__":
    sys.exit(worker_main(int(sys.argv[1])))
