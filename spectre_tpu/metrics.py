"""Phase timing + metrics (the ark-std start_timer!/end_timer! +
tracing_subscriber analog, SURVEY §5 aux subsystems).

- PhaseRecorder: wall-clock per named phase; prints when SPECTRE_TRACE=1,
  always logs at DEBUG to the "spectre_tpu" logger, and keeps the
  measurements so callers (RPC/CLI) can surface them.
- publish()/last_report(): the most recent report per task name, queryable
  in-process (the RPC server attaches prover timings to responses).
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional, Tuple

log = logging.getLogger("spectre_tpu")

_TRACE = os.environ.get("SPECTRE_TRACE", "") not in ("", "0")
_LAST: Dict[str, dict] = {}


def _hbm() -> str:
    """' [hbm=X.XG]' when the backend reports memory stats (TPU), else ''.
    Trace-only: one stats call per phase boundary."""
    try:
        import jax
        st = jax.local_devices()[0].memory_stats()
        if st and "bytes_in_use" in st:
            return f" [hbm={st['bytes_in_use'] / 1e9:.2f}G]"
    except Exception:   # noqa: BLE001 — tracing aid only
        pass
    if os.environ.get("SPECTRE_TRACE_LIVE", "") not in ("", "0"):
        return live_arrays_report()
    return ""


def live_arrays_report(top: int = 4) -> str:
    """' [live=X.XG top=...]': exact Python-side live device-buffer
    accounting via jax.live_arrays() — the residency probe for backends
    (axon tunnel) whose memory_stats() is None. Enable with
    SPECTRE_TRACE_LIVE=1 (costs a walk over live arrays per phase)."""
    try:
        import jax
        from collections import Counter
        arrs = jax.live_arrays()
        total = 0
        by_shape: Counter = Counter()
        for a in arrs:
            nb = a.size * a.dtype.itemsize
            total += nb
            by_shape[(str(a.dtype), a.shape)] += nb
        tops = ", ".join(
            f"{d}{list(s)}={b / 1e9:.2f}G"
            for (d, s), b in by_shape.most_common(top))
        return f" [live={total / 1e9:.2f}G n={len(arrs)} top: {tops}]"
    except Exception:   # noqa: BLE001 — tracing aid only
        return ""


class PhaseRecorder:
    def __init__(self, task: str = "task"):
        self.task = task
        self.t0 = time.time()
        self.last = self.t0
        self.phases: List[Tuple[str, float]] = []

    def __call__(self, phase: str):
        now = time.time()
        dt = now - self.last
        self.phases.append((phase, dt))
        if _TRACE:
            print(f"[{self.task} +{now - self.t0:7.1f}s] {phase} "
                  f"(+{dt:.1f}s){_hbm()}", flush=True)
        log.debug("%s: %s took %.2fs", self.task, phase, dt)
        self.last = now

    def report(self) -> dict:
        return {
            "task": self.task,
            "total_s": round(time.time() - self.t0, 3),
            "phases": {p: round(dt, 3) for p, dt in self.phases},
        }

    def publish(self) -> dict:
        r = self.report()
        _LAST[self.task] = r
        return r


def last_report(task: str) -> Optional[dict]:
    return _LAST.get(task)
