"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; the TPU-world equivalent of a
fake NCCL backend (SURVEY.md §4) is XLA's host-platform device multiplexing.
Must run before jax initializes its backends.
"""

import os
import sys

# NB: the harness pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon,
# so env vars set here are too late — use jax.config, which takes effect
# until the backend is actually initialized (lazily, at first op).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
