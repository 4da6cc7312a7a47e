"""Two-stage prove pipeline overlap (SURVEY §2c axis 4).

The reference runs inner snark → aggregation sequentially per request
(prover/src/rpc.rs:144-158); ProvePipeline overlaps job N+1's inner
stage with job N's aggregation across two device pools.
"""
import time

import jax

from spectre_tpu.service.pipeline import ProvePipeline


def test_pipeline_overlaps_stages():
    D = 0.25

    def inner(w):
        time.sleep(D)
        return w * 10

    def agg(s):
        time.sleep(D)
        return s + 1

    devs = jax.devices()
    pipe = ProvePipeline(inner, agg,
                         inner_devices=devs[:1], aggregate_devices=devs[1:2])
    try:
        t0 = time.time()
        jids = [pipe.submit(w) for w in (1, 2, 3)]
        results = [pipe.wait(j, timeout=60) for j in jids]
        wall = time.time() - t0
        assert results == [11, 21, 31]
        # sequential = 6*D; pipelined steady state = (n+1)*D = 4*D.
        # assert strictly better than sequential with slack for CI jitter
        assert wall < 5.4 * D, wall
        st = pipe.status(jids[0])
        assert st["stage"] == "done"
        assert st["inner_s"] is not None and st["aggregate_s"] is not None
    finally:
        pipe.stop()


def test_pipeline_inner_failure_isolated():
    def inner(w):
        if w == "bad":
            raise ValueError("boom")
        return w

    pipe = ProvePipeline(inner, lambda s: s)
    try:
        bad = pipe.submit("bad")
        good = pipe.submit("ok")
        assert pipe.wait(good, timeout=60) == "ok"
        try:
            pipe.wait(bad, timeout=60)
            raise AssertionError("expected failure")
        except RuntimeError as e:
            assert "boom" in str(e)
        assert pipe.status(bad)["stage"] == "failed"
    finally:
        pipe.stop()


def test_pipeline_aggregate_failure_isolated():
    def agg(s):
        if s == 2:
            raise ValueError("agg boom")
        return s

    pipe = ProvePipeline(lambda w: w, agg)
    try:
        ok = pipe.submit(1)
        bad = pipe.submit(2)
        assert pipe.wait(ok, timeout=60) == 1
        try:
            pipe.wait(bad, timeout=60)
            raise AssertionError("expected failure")
        except RuntimeError as e:
            assert "agg boom" in str(e)
    finally:
        pipe.stop()
