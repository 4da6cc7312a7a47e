"""Two-stage prove pipeline: app snark → aggregation, OVERLAPPED.

SURVEY §2c axis 4 (pipeline parallelism). The reference proves the two
stages sequentially inside one request handler — inner app snark, then
the aggregation EVM proof (prover/src/rpc.rs:144-158) — so with several
requests in flight the aggregation stage idles while the next inner
proof runs and vice versa. Here each stage gets its own device pool
(ProofScheduler): job N+1's inner prove runs while job N aggregates, so
steady-state makespan per job is max(stage times), not their sum.

On a pod slice the two pools are disjoint chip sets of one mesh; on the
CPU test mesh they are disjoint virtual devices, which exercises the
same scheduling without hardware.
"""
from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from .scheduler import ProofScheduler


@dataclass
class PipelineJob:
    job_id: str
    stage: str = "inner"              # inner | aggregate | done | failed
    inner_result: Any = None
    result: Any = None
    error: Optional[str] = None
    submitted_at: float = field(default_factory=time.time)
    inner_s: Optional[float] = None
    aggregate_s: Optional[float] = None
    finished_at: Optional[float] = None

    def to_json(self) -> dict:
        return {
            "job_id": self.job_id, "stage": self.stage,
            "error": self.error, "inner_s": self.inner_s,
            "aggregate_s": self.aggregate_s,
            "total_s": (round(self.finished_at - self.submitted_at, 3)
                        if self.finished_at else None),
        }


class ProvePipeline:
    """Chains two ProofSchedulers: stage-1 `inner_fn(witness)` produces a
    snark, stage-2 `aggregate_fn(snark)` compresses it. A watcher thread
    forwards each finished inner job to the aggregation pool immediately,
    so the pools run concurrently across jobs."""

    def __init__(self, inner_fn: Callable[[Any], Any],
                 aggregate_fn: Callable[[Any], Any],
                 inner_devices: Optional[List] = None,
                 aggregate_devices: Optional[List] = None):
        import jax
        devs = list(jax.devices())
        if inner_devices is None or aggregate_devices is None:
            half = max(1, len(devs) // 2)
            inner_devices = inner_devices or devs[:half]
            aggregate_devices = aggregate_devices or (devs[half:] or devs)
        self.inner_fn = inner_fn
        self.aggregate_fn = aggregate_fn
        self._inner = ProofScheduler(devices=inner_devices)
        self._agg = ProofScheduler(devices=aggregate_devices)
        self.jobs: Dict[str, PipelineJob] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._watch = threading.Thread(target=self._watcher, daemon=True)
        # job_id -> (scheduler job id, stage) being watched
        self._pending: Dict[str, str] = {}
        self._watch.start()

    # ---- API ----
    def submit(self, witness: Any) -> str:
        w = witness
        jid = self._inner.submit("inner", lambda: self.inner_fn(w))
        job = PipelineJob(job_id=jid)
        with self._lock:
            self.jobs[jid] = job
            self._pending[jid] = "inner"
        return jid

    def status(self, job_id: str) -> dict:
        return self.jobs[job_id].to_json()

    def wait(self, job_id: str, timeout: float = 3600):
        deadline = time.time() + timeout
        job = self.jobs[job_id]
        while job.stage not in ("done", "failed"):
            if time.time() > deadline:
                raise TimeoutError(job_id)
            time.sleep(0.02)
        if job.stage == "failed":
            raise RuntimeError(f"pipeline job {job_id} failed: {job.error}")
        return job.result

    def stop(self):
        self._stop.set()
        self._watch.join(timeout=5)
        self._inner.stop()
        self._agg.stop()

    # ---- watcher: forward inner completions to the aggregation pool ----
    def _watcher(self):
        while not self._stop.is_set():
            with self._lock:
                pending = dict(self._pending)
            for jid, stage in pending.items():
                sched = self._inner if stage == "inner" else self._agg
                # stage-2 jobs are tracked under their own scheduler id
                sid = jid if stage == "inner" else self.jobs[jid]._agg_id
                sjob = sched.jobs[sid]
                if sjob.status in ("queued", "running"):
                    continue
                job = self.jobs[jid]
                if sjob.status == "failed":
                    job.error = sjob.error
                    job.stage = "failed"
                    job.finished_at = time.time()
                    with self._lock:
                        self._pending.pop(jid, None)
                elif stage == "inner":
                    job.inner_result = sjob.result
                    job.inner_s = round(sjob.finished_at - sjob.started_at, 3)
                    snark = sjob.result
                    agg_id = self._agg.submit(
                        "aggregate", lambda s=snark: self.aggregate_fn(s))
                    job._agg_id = agg_id
                    job.stage = "aggregate"
                    with self._lock:
                        self._pending[jid] = "aggregate"
                else:
                    job.result = sjob.result
                    job.aggregate_s = round(
                        sjob.finished_at - sjob.started_at, 3)
                    job.stage = "done"
                    job.finished_at = time.time()
                    with self._lock:
                        self._pending.pop(jid, None)
            time.sleep(0.01)
