"""Graph-convolution layers (functional, pure-pytree parameters).

Re-implements the layer semantics the reference gets from
``dgl.nn.pytorch.SAGEConv(..., 'pool')`` (/root/reference/code/model.py:13-15)
and DGL ``GraphConv``, on top of the scatter-free TPU aggregation ops.

Parameters are plain dicts of ``jnp`` arrays (weights stored ``(in, out)``),
so models vmap/shard trivially — the round/fold ensemble of the reference
(10×10 sequential runs, train.py:162-195) becomes a vmapped parameter batch.

DGL 0.8.x ``SAGEConv`` pool semantics (SURVEY.md §2.2):
    h_pool_j = relu(W_pool · h_j + b_pool)
    m_i      = max_{j ∈ N_in(i)} h_pool_j          (0 if no in-edges)
    out_i    = W_self · h_i + W_neigh · m_i + bias
with Xavier-uniform(gain=√2) weight init, torch-Linear-default init for
``b_pool``, and a zero-initialised shared output bias.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.graph_format import Graph
from ..ops.spmm import gcn_propagate, spmm_max, spmm_mean, spmm_sum
from ..utils.precision import aggregation_dtype, matmul_precision

Params = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# Initializers (torch-distribution parity; see SURVEY.md §7 "hard part 2").
# ---------------------------------------------------------------------------


def xavier_uniform(key, in_feats: int, out_feats: int, gain: float) -> jax.Array:
    """torch.nn.init.xavier_uniform_ on a (out, in) torch weight, stored
    transposed as (in, out)."""
    bound = gain * math.sqrt(6.0 / (in_feats + out_feats))
    return jax.random.uniform(
        key, (in_feats, out_feats), jnp.float32, -bound, bound
    )


def torch_linear_init(key, in_feats: int, out_feats: int) -> Tuple[jax.Array, jax.Array]:
    """torch.nn.Linear default init: kaiming_uniform(a=√5) ⇒
    U(-1/√fan_in, 1/√fan_in) for both weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_feats)
    w = jax.random.uniform(kw, (in_feats, out_feats), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (out_feats,), jnp.float32, -bound, bound)
    return w, b


# ---------------------------------------------------------------------------
# SAGEConv (pool / mean / gcn aggregators).
# ---------------------------------------------------------------------------

_RELU_GAIN = math.sqrt(2.0)


def init_sage_conv(
    key, in_feats: int, out_feats: int, aggregator: str = "pool"
) -> Params:
    ks = jax.random.split(key, 4)
    params: Params = {
        "w_self": xavier_uniform(ks[0], in_feats, out_feats, _RELU_GAIN),
        "w_neigh": xavier_uniform(ks[1], in_feats, out_feats, _RELU_GAIN),
        "bias": jnp.zeros((out_feats,), jnp.float32),
    }
    if aggregator == "pool":
        # fc_pool is a full torch Linear (in→in): Xavier(√2) weight, default
        # uniform bias.
        params["w_pool"] = xavier_uniform(ks[2], in_feats, in_feats, _RELU_GAIN)
        bound = 1.0 / math.sqrt(in_feats)
        params["b_pool"] = jax.random.uniform(
            ks[3], (in_feats,), jnp.float32, -bound, bound
        )
    return params


def sage_conv(
    params: Params, graph: Graph, x: jax.Array, aggregator: str = "pool"
) -> jax.Array:
    """DGL 0.8.x SAGEConv forward (feat_drop=0, no norm/activation — the
    reference uses the defaults, model.py:13-15)."""
    if aggregator == "pool":
        pooled = jax.nn.relu(
            jnp.dot(x, params["w_pool"], preferred_element_type=jnp.float32,
                precision=matmul_precision())
            + params["b_pool"]
        )
        agg_dt = aggregation_dtype()
        if agg_dt is not None:
            m = spmm_max(graph, pooled.astype(agg_dt)).astype(x.dtype)
        else:
            m = spmm_max(graph, pooled)
    elif aggregator == "mean":
        m = spmm_mean(graph, x)
    elif aggregator == "sum":
        m = spmm_sum(graph, x)
    else:
        raise ValueError(f"unknown aggregator {aggregator!r}")
    out = (
        jnp.dot(x, params["w_self"], preferred_element_type=jnp.float32,
                precision=matmul_precision())
        + jnp.dot(m, params["w_neigh"], preferred_element_type=jnp.float32,
                precision=matmul_precision())
        + params["bias"]
    )
    return out


# ---------------------------------------------------------------------------
# GraphConv (DGL GCN semantics, norm='both').
# ---------------------------------------------------------------------------


def init_graph_conv(key, in_feats: int, out_feats: int) -> Params:
    # DGL GraphConv: xavier_uniform weight (gain 1), zero bias.
    return {
        "weight": xavier_uniform(key, in_feats, out_feats, 1.0),
        "bias": jnp.zeros((out_feats,), jnp.float32),
    }


def graph_conv(
    params: Params, graph: Graph, x: jax.Array, norm: str = "both"
) -> jax.Array:
    """DGL GraphConv: ``out = D̃^{-1/2} Ã D̃^{-1/2} X W + b`` (norm='both').

    Multiplies by W first when it reduces the width (DGL's mat-mul ordering
    optimization), which is also the MXU-friendly order."""
    in_feats = x.shape[-1]
    out_feats = params["weight"].shape[-1]
    if in_feats > out_feats:
        x = jnp.dot(x, params["weight"], preferred_element_type=jnp.float32,
                precision=matmul_precision())
        h = gcn_propagate(graph, x, norm=norm)
    else:
        h = gcn_propagate(graph, x, norm=norm)
        h = jnp.dot(h, params["weight"], preferred_element_type=jnp.float32,
                precision=matmul_precision())
    return h + params["bias"]


# ---------------------------------------------------------------------------
# Dense layer (torch.nn.Linear parity).
# ---------------------------------------------------------------------------


def init_linear(key, in_feats: int, out_feats: int) -> Params:
    w, b = torch_linear_init(key, in_feats, out_feats)
    return {"weight": w, "bias": b}


def linear(params: Params, x: jax.Array) -> jax.Array:
    return (
        jnp.dot(x, params["weight"], preferred_element_type=jnp.float32,
                precision=matmul_precision())
        + params["bias"]
    )
