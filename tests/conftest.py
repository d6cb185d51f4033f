"""Test configuration: force an 8-device virtual CPU platform.

The reference pipeline (quinlanW/PLA-GNN) has no tests at all (SURVEY.md §4);
this suite is built from scratch.  Multi-chip sharding tests run against a
virtual 8-device CPU mesh (the standard
``--xla_force_host_platform_device_count`` trick) so they validate the same
`shard_map` programs that run on a real TPU pod slice.
"""
import os
import sys

# Must be set before jax is imported anywhere.  Force-override: the ambient
# environment pins JAX_PLATFORMS to the real TPU ('axon'), but the test suite
# always runs on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The ambient TPU plugin (sitecustomize) force-sets jax_platforms at
# interpreter startup, overriding the env var; undo it before the first
# backend initialization so tests run on the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(70)
