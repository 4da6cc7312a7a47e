"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Env vars must be set before jax initializes a backend — AND the axon
sitecustomize force-registers the tunnel TPU and sets
jax_platforms="axon,cpu" programmatically, which overrides JAX_PLATFORMS
from the environment. Override it back via jax.config so the suite runs on
the CPU mesh (running unit tests over the TPU tunnel is both slow and
contends with real benchmarking).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Drop the axon sitecustomize for CPU test runs entirely: its
# get_backend hook initializes the tunnel TPU client even under
# JAX_PLATFORMS=cpu, and hangs the whole suite if the tunnel is down.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p)
sys.modules.pop("axon", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: most suite wall-clock is XLA CPU
# compiles of the same prover/kernel programs; the cache makes re-runs
# compile-free (safe under xdist — entries are written atomically).
from spectre_tpu.jax_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

# Smaller traced graphs (scan-based Montgomery REDC) compile ~4x faster on
# CPU; runtime loss is irrelevant at test sizes. TPU bench paths keep the
# unrolled default.
import spectre_tpu.fields.limb as _limb

_limb.REDC_UNROLL = False

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(1234)
