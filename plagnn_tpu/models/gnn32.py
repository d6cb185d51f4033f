"""Model zoo: the PLA-GNN flagship ``GNN32`` and a GCN variant.

``GNN32`` reproduces /root/reference/code/model.py:10-31 exactly:
three SAGEConv('pool') layers (503→400→300→200) with leaky_relu (torch
default slope 0.01) after each, a 200→100 Linear + leaky_relu, a 100→12
Linear + sigmoid.  The reference's ``dropout`` constructor argument is
accepted but unused, as in the reference (model.py:11 — no dropout layer is
ever created); we keep that quirk so hyperparameter configs port 1:1.

``GCN2`` is the 2-layer GraphConv model named in BASELINE.json's config list
("2-layer GCN, control-state PPI graph").
"""
from __future__ import annotations

import jax

from ..ops.graph_format import Graph
from . import layers

DEFAULT_DIMS = (400, 300, 200, 100)
NUM_CLASSES = 12


def init_gnn32(
    key,
    in_feats: int,
    h1: int = 400,
    h2: int = 300,
    h3: int = 200,
    h4: int = 100,
    num_classes: int = NUM_CLASSES,
    dropout: float = 0.5,  # accepted-but-unused, like the reference
):
    del dropout
    ks = jax.random.split(key, 5)
    return {
        "conv1": layers.init_sage_conv(ks[0], in_feats, h1, "pool"),
        "conv2": layers.init_sage_conv(ks[1], h1, h2, "pool"),
        "conv3": layers.init_sage_conv(ks[2], h2, h3, "pool"),
        "liner1": layers.init_linear(ks[3], h3, h4),
        "liner2": layers.init_linear(ks[4], h4, num_classes),
    }


def gnn32_apply(params, graph: Graph, x: jax.Array) -> jax.Array:
    """Forward pass; returns sigmoid probabilities (N_pad, num_classes)."""
    h = layers.sage_conv(params["conv1"], graph, x, "pool")
    h = jax.nn.leaky_relu(h)
    h = layers.sage_conv(params["conv2"], graph, h, "pool")
    h = jax.nn.leaky_relu(h)
    h = layers.sage_conv(params["conv3"], graph, h, "pool")
    h = jax.nn.leaky_relu(h)
    h = layers.linear(params["liner1"], h)
    h = jax.nn.leaky_relu(h)
    h = layers.linear(params["liner2"], h)
    return jax.nn.sigmoid(h)


def gnn32_activations(params, graph: Graph, x: jax.Array):
    """Per-layer activations for the parity 'allclose ladder'
    (SURVEY.md §7 hard part 2)."""
    acts = {}
    h = layers.sage_conv(params["conv1"], graph, x, "pool")
    acts["conv1"] = h
    h = jax.nn.leaky_relu(h)
    h = layers.sage_conv(params["conv2"], graph, h, "pool")
    acts["conv2"] = h
    h = jax.nn.leaky_relu(h)
    h = layers.sage_conv(params["conv3"], graph, h, "pool")
    acts["conv3"] = h
    h = jax.nn.leaky_relu(h)
    h = layers.linear(params["liner1"], h)
    acts["liner1"] = h
    h = jax.nn.leaky_relu(h)
    h = layers.linear(params["liner2"], h)
    acts["liner2"] = h
    acts["out"] = jax.nn.sigmoid(h)
    return acts


def init_gcn2(key, in_feats: int, hidden: int, num_classes: int = NUM_CLASSES):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": layers.init_graph_conv(k1, in_feats, hidden),
        "conv2": layers.init_graph_conv(k2, hidden, num_classes),
    }


def gcn2_apply(params, graph: Graph, x: jax.Array) -> jax.Array:
    h = layers.graph_conv(params["conv1"], graph, x)
    h = jax.nn.relu(h)
    h = layers.graph_conv(params["conv2"], graph, h)
    return jax.nn.sigmoid(h)


MODEL_REGISTRY = {
    "gnn32": (init_gnn32, gnn32_apply),
    "gcn2": (init_gcn2, gcn2_apply),
}
