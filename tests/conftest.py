"""Test configuration: force an 8-device virtual CPU platform.

The reference pipeline (quinlanW/PLA-GNN) has no tests at all (SURVEY.md §4);
this suite is built from scratch.  Multi-chip sharding tests run against a
virtual 8-device CPU mesh (the standard
``--xla_force_host_platform_device_count`` trick) so they validate the same
`shard_map` programs that run on a real TPU pod slice.
"""
import os
import sys

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(70)
