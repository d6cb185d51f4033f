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

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.precision import matmul_precision

AggFn = Callable[[jax.Array], jax.Array]  # (N, B, F_pad) -> (N, B, F_pad)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_features_to(x: jax.Array, f_pad: int) -> jax.Array:
    f = x.shape[-1]
    if f == f_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, f_pad - f)))


def packed_stride(b: int, f: int, align: int = 1024) -> int:
    """Per-node stride ``_agg_packed`` will use for a (·, b, f) input at the
    given alignment (1024 for f32 kernels, 2048 for bf16 messages)."""
    step = align // math.gcd(b, align)
    f_pf = _round_up(f, step)
    flat_pad = _round_up(b * f, align)
    return min(flat_pad, b * f_pf)


def _agg_packed(agg: AggFn, x: jax.Array) -> jax.Array:
    """Aggregate (N, B, F) through ``agg`` at the smallest padded stride.

    The kernels require the per-node stride B·F_pad to be a multiple of the
    Mosaic row tile — 1024 elements for f32 messages, 2048 for bf16 (an agg
    fn carrying bf16 messages advertises ``agg.align = 2048``); they are
    layout-agnostic over the feature axis (per-position max).  Two packings
    satisfy that: per-fold padding (B, F→F') and flat packing ((B·F,) → one
    pseudo-fold).  For B=10 folds, per-fold padding forces F'=512, so the
    400/300-dim hidden layers would move 28-71%% extra bytes per edge; flat
    packing pads 4000→4096 and 3000→3072 instead.  Pick whichever strides
    less.
    """
    align = getattr(agg, "align", 1024)
    n, b, f = x.shape
    step = align // math.gcd(b, align)
    f_pf = _round_up(f, step)
    flat_pad = _round_up(b * f, align)
    if flat_pad < b * f_pf:
        xf = x.reshape(n, b * f)
        if flat_pad != b * f:
            xf = jnp.pad(xf, ((0, 0), (0, flat_pad - b * f)))
        out = agg(xf.reshape(n, 1, flat_pad))
        return out.reshape(n, flat_pad)[:, : b * f].reshape(n, b, f)
    return agg(_pad_features_to(x, f_pf))[..., :f]


def _bmm(x: jax.Array, w: jax.Array) -> jax.Array:
    """x (N, B, F) · w (B, F, G) → (N, B, G)."""
    return jnp.einsum(
        "nbf,bfg->nbg", x, w,
        preferred_element_type=jnp.float32, precision=matmul_precision(),
    )


def sage_conv_batched(params, agg: AggFn, x: jax.Array) -> jax.Array:
    """SAGE-pool over fold-batched features.

    params leaves carry a leading fold axis; ``agg`` aggregates fold-packed
    rows at the smallest legal stride (padding columns carry garbage that is
    sliced away — per-feature aggregation keeps real columns exact).
    """
    pooled = jax.nn.relu(_bmm(x, params["w_pool"]) + params["b_pool"][None])
    m = _agg_packed(agg, pooled)
    return (
        _bmm(x, params["w_self"])
        + _bmm(m, params["w_neigh"])
        + params["bias"][None]
    )


def gnn32_apply_batched(params, agg: AggFn, x: jax.Array):
    """GNN32 forward with fold-batched params.

    x: (N, F_in) shared input features (identical across folds, as in the
    reference where every fold trains on the same graph/features) or
    (N, B, F_in) if already batched.  Returns (N, B, num_classes).
    """
    b = jax.tree.leaves(params)[0].shape[0]
    if x.ndim == 2:
        x = jnp.broadcast_to(x[:, None, :], (x.shape[0], b, x.shape[1]))
    h = sage_conv_batched(params["conv1"], agg, x)
    h = jax.nn.leaky_relu(h)
    h = sage_conv_batched(params["conv2"], agg, h)
    h = jax.nn.leaky_relu(h)
    h = sage_conv_batched(params["conv3"], agg, h)
    h = jax.nn.leaky_relu(h)
    h = _bmm(h, params["liner1"]["weight"]) + params["liner1"]["bias"][None]
    h = jax.nn.leaky_relu(h)
    h = _bmm(h, params["liner2"]["weight"]) + params["liner2"]["bias"][None]
    return jax.nn.sigmoid(h)
