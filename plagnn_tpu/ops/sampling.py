"""Neighbor sampling (optional mini-batch path).

The reference trains strictly full-batch; BASELINE.json's north star names
"optional neighbor sampling" as a core op.  The sampler draws, per
destination node, up to ``k`` uniform in-neighbors without replacement
(GraphSAGE-style fan-out) and emits a fixed-width single-block ELL — i.e. a
statically-shaped subgraph that drops straight into ``spmm_*`` via a
one-block ``MultiEll``.  Sampling runs on host numpy (a per-epoch, cheap,
data-loading concern, like DGL's samplers which live in C++ on the host
side); the returned Graph is device-ready.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .graph_format import Graph, build_graph


def sample_neighbors(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    fanout: int,
    seed: int = 0,
    *,
    seeds: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform fan-out sampling of in-edges, fully vectorized.

    seeds: destination nodes to sample for (all nodes when None).
    Returns (src', dst') of the sampled edge set; nodes with ≤ fanout
    in-edges keep all of them.

    Without-replacement uniformity comes from one random key per edge: a
    (dst, key) lexsort permutes each destination row uniformly, and taking
    the first ``fanout`` positions of each row is then a uniform
    k-subset — O(E log E) total instead of a Python loop over every
    destination (the loop costs O(N) host iterations *per epoch*).
    """
    rng = np.random.default_rng(seed)
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    if seeds is not None:
        sel_mask = np.zeros(n_nodes, bool)
        sel_mask[np.asarray(seeds, np.int64)] = True
        keep = sel_mask[dst]
        src, dst = src[keep], dst[keep]
    if not len(dst):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort((rng.random(len(dst)), dst))
    src, dst = src[order], dst[order]
    counts = np.bincount(dst, minlength=n_nodes)
    row_start = np.zeros(n_nodes, np.int64)
    np.cumsum(counts[:-1], out=row_start[1:])
    pos_in_row = np.arange(len(dst)) - row_start[dst]
    keep = pos_in_row < fanout
    return src[keep], dst[keep]


def sampled_graph(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    fanout: int,
    seed: int = 0,
    *,
    add_self_loops: bool = True,
    **graph_kwargs,
) -> Graph:
    """Sample then build a device Graph.  With a fixed fanout the sampled
    edge count is bounded by ``n_nodes·(fanout+1)``, so successive epochs'
    samples bucket to the same compiled shapes (pass matching
    ``edge_multiple``)."""
    s, d = sample_neighbors(src, dst, n_nodes, fanout, seed)
    graph_kwargs.setdefault("edge_multiple", n_nodes * (fanout + 1))
    return build_graph(
        s, d, n_nodes, add_self_loops=add_self_loops, **graph_kwargs
    )
