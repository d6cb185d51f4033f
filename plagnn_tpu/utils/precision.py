"""Matmul precision policy.

JAX's DEFAULT matmul precision runs f32 matmuls through bf16 passes on
TPU-class backends (~1e-2 error on O(1) activations), which breaks parity
with the reference's fp32-end-to-end training (utils.py:46-48 keeps
everything float32).  The framework therefore pins HIGHEST precision for all
parameterized matmuls by default and exposes a switch for throughput runs
(bf16 mode trades the parity ladder for MXU-native speed).
"""
from __future__ import annotations

import jax

_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_matmul_precision(p) -> None:
    """p ∈ {'default', 'high', 'highest'} or a jax.lax.Precision."""
    global _MATMUL_PRECISION
    if isinstance(p, str):
        p = {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[p.lower()]
    _MATMUL_PRECISION = p


def matmul_precision():
    return _MATMUL_PRECISION


_AGG_DTYPE = None  # None = keep input dtype (f32 parity); jnp.bfloat16 = perf


def set_aggregation_dtype(dtype) -> None:
    """dtype for neighborhood-aggregation messages: None keeps f32 (parity);
    'bfloat16' halves the gather traffic of the SpMM hot loop (max is
    order-preserving in bf16; values round to 8-bit mantissa)."""
    global _AGG_DTYPE
    if isinstance(dtype, str):
        import jax.numpy as jnp

        dtype = {"float32": None, "bfloat16": jnp.bfloat16,
                 "none": None}[dtype.lower()]
    _AGG_DTYPE = dtype


def aggregation_dtype():
    return _AGG_DTYPE
