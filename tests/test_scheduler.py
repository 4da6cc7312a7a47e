"""Proof scheduler over the 8-virtual-device CPU mesh (SURVEY §2c axis 3:
data parallelism across proofs). Three independent toy proofs run
concurrently on distinct devices and all verify; failures are isolated."""
import jax
import pytest

from spectre_tpu.circuits.app import AppCircuit
from spectre_tpu.poly import kzg
from spectre_tpu.service.scheduler import ProofScheduler
from tests.test_app_lifecycle import ToyCircuit, K


def test_parallel_proofs_on_device_pool():
    srs = kzg.test_srs(K)
    pk = ToyCircuit.create_pk(None, K, srs)
    sched = ProofScheduler(devices=jax.devices()[:3])
    try:
        jids = []
        for x in (1, 2, 3):
            w = {"x": x, "w": 7}
            jids.append(sched.submit(
                "toy", lambda w=w: ToyCircuit.gen_proof(pk, None, srs, w)))
        seen_devices = set()
        for jid, x in zip(jids, (1, 2, 3)):
            proof, inst = sched.wait(jid, timeout=600)
            assert ToyCircuit.verify(pk, srs, proof, inst)
            assert inst == [[(x + 7) ** 2]]
            st = sched.status(jid)
            assert st["status"] == "done" and st["run_s"] is not None
            seen_devices.add(st["device"])
        assert len(seen_devices) >= 2      # actually spread over the pool
    finally:
        sched.stop()


def test_failed_job_isolated():
    sched = ProofScheduler(n_workers=2)
    try:
        bad = sched.submit("boom", lambda: 1 / 0)
        good = sched.submit("ok", lambda: 42)
        assert sched.wait(good) == 42
        with pytest.raises(RuntimeError, match="ZeroDivisionError"):
            sched.wait(bad)
        assert sched.status(bad)["status"] == "failed"
    finally:
        sched.stop()
