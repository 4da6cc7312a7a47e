"""Proof-job scheduler: data parallelism ACROSS proofs (SURVEY §2c axis 3).

The reference bounds concurrency with one tokio semaphore in a single
process (prover/src/rpc.rs:68-75). The TPU-native equivalent schedules
independent proofs over a device pool: each worker thread pins a JAX
device (chips of a slice, or processes across hosts via DCN — the same
queue shape either way) and drains a FIFO of proof jobs. On the CPU test
mesh the pool is the 8 virtual devices, so multi-device scheduling is
exercised without hardware.
"""
from __future__ import annotations

import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from ..metrics import log


@dataclass
class ProofJob:
    job_id: str
    kind: str
    status: str = "queued"            # queued | running | done | failed
    device: Optional[str] = None
    result: Any = None
    error: Optional[str] = None
    submitted_at: float = field(default_factory=time.time)
    started_at: Optional[float] = None
    finished_at: Optional[float] = None

    def to_json(self) -> dict:
        return {
            "job_id": self.job_id, "kind": self.kind,
            "status": self.status, "device": self.device,
            "error": self.error,
            "queued_s": round((self.started_at or time.time())
                              - self.submitted_at, 3),
            "run_s": (round(self.finished_at - self.started_at, 3)
                      if self.finished_at and self.started_at else None),
        }


class ProofScheduler:
    """FIFO proof queue over a device pool; one worker thread per device."""

    def __init__(self, devices: Optional[List] = None,
                 n_workers: Optional[int] = None):
        import jax
        devs = list(devices) if devices is not None else list(jax.devices())
        if n_workers is not None:
            devs = (devs * n_workers)[:n_workers]
        self.devices = devs
        self._q: "queue.Queue" = queue.Queue()
        self.jobs: Dict[str, ProofJob] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, args=(d,), daemon=True)
            for d in devs]
        for t in self._threads:
            t.start()

    # ---- API ----
    def submit(self, kind: str, fn: Callable[[], Any]) -> str:
        job = ProofJob(job_id=uuid.uuid4().hex[:12], kind=kind)
        with self._lock:
            self.jobs[job.job_id] = job
        self._q.put((job, fn))
        return job.job_id

    def status(self, job_id: str) -> dict:
        return self.jobs[job_id].to_json()

    def wait(self, job_id: str, timeout: float = 3600):
        deadline = time.time() + timeout
        job = self.jobs[job_id]
        while job.status in ("queued", "running"):
            if time.time() > deadline:
                raise TimeoutError(job_id)
            time.sleep(0.02)
        if job.status == "failed":
            raise RuntimeError(f"job {job_id} failed: {job.error}")
        return job.result

    def stop(self):
        self._stop.set()
        for _ in self._threads:
            self._q.put(None)
        for t in self._threads:
            t.join(timeout=5)

    # ---- worker ----
    def _worker(self, device):
        import jax
        while not self._stop.is_set():
            item = self._q.get()
            if item is None:
                return
            job, fn = item
            job.status = "running"
            job.device = str(device)
            job.started_at = time.time()
            try:
                with jax.default_device(device):
                    job.result = fn()
                job.status = "done"
            except Exception as e:  # noqa: BLE001 — surfaced via status
                job.error = f"{type(e).__name__}: {e}"
                job.status = "failed"
                log.warning("proof job %s failed on %s: %s",
                            job.job_id, device, job.error)
            finally:
                job.finished_at = time.time()
