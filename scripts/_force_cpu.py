"""Import FIRST to force JAX onto the host CPU backend.

The axon sitecustomize force-registers the tunnel TPU and sets
jax_platforms="axon,cpu" programmatically, which overrides JAX_PLATFORMS
from the environment (see tests/conftest.py). Ad-hoc scripts that must not
touch the real chip (oracle checks, CPU-mesh runs) import this module
before anything that imports jax.

Usage:  import _force_cpu  # noqa: F401  (from scripts/)
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p)
sys.modules.pop("axon", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
