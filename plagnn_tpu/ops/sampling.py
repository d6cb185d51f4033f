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
    """Uniform fan-out sampling of in-edges.

    seeds: destination nodes to sample for (all nodes when None).
    Returns (src', dst') of the sampled edge set; nodes with ≤ fanout
    in-edges keep all of them.
    """
    rng = np.random.default_rng(seed)
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(dst, minlength=n_nodes)
    indptr = np.zeros(n_nodes + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])

    if seeds is None:
        seeds = np.flatnonzero(counts)
    out_s, out_d = [], []
    for d in seeds:
        s, e = indptr[d], indptr[d + 1]
        deg = e - s
        if deg == 0:
            continue
        if deg <= fanout:
            sel = np.arange(s, e)
        else:
            sel = s + rng.choice(deg, size=fanout, replace=False)
        out_s.append(src[sel])
        out_d.append(np.full(len(sel), d, np.int64))
    if not out_s:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_s), np.concatenate(out_d)


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
