"""Multi-host bring-up.

The reference is strictly single-process (SURVEY.md §2.3).  For pod slices
spanning hosts, JAX needs one ``jax.distributed.initialize`` per process
before any backend use; after that, ``jax.devices()`` spans the slice and the
same ``shard_map`` programs in ``parallel.sharded`` run unchanged — XLA
routes the halo all-to-all over ICI within a host and DCN across hosts.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX when running under a launcher.

    With no arguments, relies on the TPU metadata auto-detection
    (``jax.distributed.initialize()`` no-ops on single-process setups where
    no cluster env is present).  Returns the process count.
    """
    env_addr = os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address or env_addr or os.environ.get("TPU_WORKER_HOSTNAMES"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address or env_addr,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count()
