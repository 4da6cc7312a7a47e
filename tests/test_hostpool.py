"""HostPool (multi-host data parallelism, BASELINE #5 axis) unit tests.

The full worker-process round trip lives in scripts/hostpool_smoke.py and
scripts/sched_scaling.py --hosts (cold worker boot is minutes); here we
pin the pieces that broke in round 3 without spawning JAX runtimes."""
import os

from spectre_tpu.service.hostpool import TASKS, worker_env


def test_worker_env_cpu_scrubs_axon_sitecustomize():
    """JAX_PLATFORMS=cpu alone does not keep a worker off the real chip:
    the axon sitecustomize on PYTHONPATH overrides jax_platforms
    programmatically, so un-scrubbed 'cpu' workers all contend for the one
    TPU through the tunnel (the round-2 sched_scaling --hosts timeout)."""
    base = dict(os.environ)
    base["PYTHONPATH"] = os.pathsep.join(
        ["/opt/.axon_site", "/root/repo", "/opt/.axon_site/lib"])
    env = worker_env("cpu", base)
    assert env["JAX_PLATFORMS"] == "cpu"
    parts = env["PYTHONPATH"].split(os.pathsep)
    assert parts == ["/root/repo"]


def test_worker_env_tpu_keeps_pythonpath():
    base = {"PYTHONPATH": "/opt/.axon_site:/root/repo"}
    env = worker_env("axon", base)
    assert env["JAX_PLATFORMS"] == "axon"
    assert "/opt/.axon_site" in env["PYTHONPATH"]


def test_task_registry_has_production_workloads():
    """The named-task registry (callables don't cross process boundaries)
    carries both the scaling toy and the real committee workload."""
    assert "toy_prove" in TASKS and "committee_prove" in TASKS
