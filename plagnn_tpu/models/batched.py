"""Fold-batched model application (the Pallas-kernel training path).

The ensemble's folds share the graph and the input features; only the
parameters differ.  This module applies GNN32 with the fold axis INSIDE the
feature layout — x (N, B, F), params leaves (B, ...) — so neighborhood
aggregation runs once over fold-packed rows (one DMA per edge for all folds,
see ops/pallas/spmm_kernels.py) and the dense layers become batched matmuls
(``einsum('nbf,bfg->nbg')``) that keep the MXU busy across the ensemble.

Numerics are identical to vmapping ``models.gnn32_apply`` over folds (same
ops, same reduction order per fold).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.precision import matmul_precision

AggFn = Callable[[jax.Array], jax.Array]  # (N, B, F_pad) -> (N, B, F_pad)


def _pad_features_to(x: jax.Array, f_pad: int) -> jax.Array:
    f = x.shape[-1]
    if f == f_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, f_pad - f)))


def _bmm(x: jax.Array, w: jax.Array) -> jax.Array:
    """x (N, B, F) · w (B, F, G) → (N, B, G)."""
    return jnp.einsum(
        "nbf,bfg->nbg", x, w,
        preferred_element_type=jnp.float32, precision=matmul_precision(),
    )


def sage_conv_batched(params, agg: AggFn, x: jax.Array, f_agg_pad: int) -> jax.Array:
    """SAGE-pool over fold-batched features.

    params leaves carry a leading fold axis; ``agg`` aggregates (N, B, F_pad)
    fold-packed rows (padding columns carry garbage that is sliced away —
    per-feature aggregation keeps real columns exact).
    """
    f_in = x.shape[-1]
    pooled = jax.nn.relu(_bmm(x, params["w_pool"]) + params["b_pool"][None])
    m = agg(_pad_features_to(pooled, f_agg_pad))[..., :f_in]
    return (
        _bmm(x, params["w_self"])
        + _bmm(m, params["w_neigh"])
        + params["bias"][None]
    )


def gnn32_apply_batched(params, agg: AggFn, x: jax.Array, f_agg_pad: int = 512):
    """GNN32 forward with fold-batched params.

    x: (N, F_in) shared input features (identical across folds, as in the
    reference where every fold trains on the same graph/features) or
    (N, B, F_in) if already batched.  Returns (N, B, num_classes).
    """
    b = jax.tree.leaves(params)[0].shape[0]
    if x.ndim == 2:
        x = jnp.broadcast_to(x[:, None, :], (x.shape[0], b, x.shape[1]))
    h = sage_conv_batched(params["conv1"], agg, x, f_agg_pad)
    h = jax.nn.leaky_relu(h)
    h = sage_conv_batched(params["conv2"], agg, h, f_agg_pad)
    h = jax.nn.leaky_relu(h)
    h = sage_conv_batched(params["conv3"], agg, h, f_agg_pad)
    h = jax.nn.leaky_relu(h)
    h = _bmm(h, params["liner1"]["weight"]) + params["liner1"]["bias"][None]
    h = jax.nn.leaky_relu(h)
    h = _bmm(h, params["liner2"]["weight"]) + params["liner2"]["bias"][None]
    return jax.nn.sigmoid(h)
