"""Opt-in hardware test: compiled Pallas kernels on the real TPU.

The regular suite runs on the CPU-pinned virtual mesh (conftest), where
interpret mode can't catch Mosaic lowering bugs.  Set PLAGNN_TPU_TESTS=1 to
run benchmarks/hw_correctness.py in a real-TPU subprocess (the TPU is
single-tenant — don't run this concurrently with other TPU work)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.environ.get("PLAGNN_TPU_TESTS"),
    reason="real-TPU test; set PLAGNN_TPU_TESTS=1 (single-tenant chip)",
)
def test_pallas_kernels_on_hardware():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "hw_correctness.py")],
        capture_output=True, timeout=3000, env=env, text=True,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "HW_CORRECTNESS_OK" in proc.stdout
