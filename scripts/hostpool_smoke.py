#!/usr/bin/env python3
"""Single-worker HostPool smoke: brings up one worker process, runs two
toy proves (cold + warm), prints timings. Diagnoses the sched_scaling
--hosts TimeoutError without burning the full 1/2/4 sweep."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

from spectre_tpu.service.hostpool import HostPool  # noqa: E402

t0 = time.time()
pool = HostPool(1)
print("pool up", round(time.time() - t0, 1), flush=True)
j = pool.submit("toy_prove", {"k": 5, "x": 1})
r = pool.wait(j, timeout=1800)
print("job1 (cold)", r, round(time.time() - t0, 1), flush=True)
j2 = pool.submit("toy_prove", {"k": 5, "x": 2})
print("job2 (warm)", pool.wait(j2, timeout=600),
      round(time.time() - t0, 1), flush=True)
pool.stop()
print("ok", flush=True)
