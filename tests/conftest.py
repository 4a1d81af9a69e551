"""Test harness config: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (the 'fake multi-node'
mechanism; SURVEY.md §4).

jax may already be imported at interpreter startup (site hook), so plain
env-var setting is too late for jax's config — use jax.config.update before
any backend is initialized. XLA_FLAGS is still read from the environment at
backend-init time, so setting it here works.
"""

import os
import sys

# The tests are CPU-only; drop the TPU plugin's injected site dir so a
# wedged device tunnel can never hang plugin registration (observed:
# jax backend init blocking indefinitely during tunnel outages).
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if p and ".axon_site" not in p
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable the persistent compilation cache here — XLA:CPU
# AOT cache entries round-trip through a machine-feature-checked loader
# that both warns and (observed) re-enters a pathologically slow
# compile path under the virtual 8-device platform. The expensive
# library jits warm themselves through ops.rs_decode._PrecompiledJit
# instead.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")


@pytest.fixture(scope="session")
def golden():
    """Reference-stage golden vectors: 4 consecutive fields, every boundary."""
    return np.load(GOLDEN_PATH)
