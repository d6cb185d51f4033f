"""Graph reordering for DMA coalescing (BASELINE.md lever 3).

The Pallas SpMM kernels issue one row DMA per edge; the scalar-core issue
rate (~38 ns/edge) and the ~520-600 GB/s random-row DMA rate are the binding
constraints past the bf16 plateau.  When a destination's G=8-edge group has
STRICTLY CONSECUTIVE source ids, the kernel can fetch all eight rows with a
single 8x-wider DMA — fewer descriptors and a sequential burst the memory
controller can stream near peak.

This module owns the host side: node relabelings that maximize the number
of consecutive-run groups, and diagnostics measuring how many groups each
ordering makes coalescible.  Whether any ordering helps is topology-bound:
a configuration-model graph (data/synthetic.powerlaw_ppi — neighbor sets
are uniform random) admits essentially no runs by construction, while
community-structured graphs (protein complexes are near-cliques, the real
PPI regime per data_preprocess.py:74-110) do.  See clustered_ppi in
data/synthetic.py for the measurement topology.

A permutation ``perm`` maps NEW id -> OLD id; features/labels/masks reorder
as ``x[perm]`` and results restore as ``out[inv_perm]``.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

G = 8  # edges per kernel group (ops/pallas/spmm_kernels.G)


def relabel_edges(
    src: np.ndarray, dst: np.ndarray, perm: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Apply a NEW->OLD permutation to an edge list: node OLD gets id
    ``inv_perm[OLD]``."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv[src], inv[dst]


def rcm_order(src: np.ndarray, dst: np.ndarray, n_nodes: int) -> np.ndarray:
    """Reverse Cuthill-McKee ordering (bandwidth-minimizing BFS), NEW->OLD."""
    a = sp.coo_matrix(
        (np.ones(len(src), np.int8), (src, dst)), shape=(n_nodes, n_nodes)
    ).tocsr()
    a = a + a.T
    return np.asarray(
        sp.csgraph.reverse_cuthill_mckee(a, symmetric_mode=True), np.int64)


def greedy_coalesce_order(
    src: np.ndarray, dst: np.ndarray, n_nodes: int
) -> np.ndarray:
    """Destination-major consecutive assignment, NEW->OLD.

    Visit destinations by descending in-degree; append each destination's
    not-yet-assigned sources (ascending) to the ordering.  The hottest rows'
    source lists become contiguous id ranges wherever their members weren't
    already claimed by a hotter row; overlapping neighborhoods (community
    structure) then make MANY destinations' groups coalescible because they
    share the same contiguous members.
    """
    a = sp.coo_matrix(
        (np.ones(len(src), np.int8), (src, dst)), shape=(n_nodes, n_nodes)
    ).tocsc()
    a.sum_duplicates()
    indeg = np.diff(a.indptr)
    order_dst = np.argsort(-indeg, kind="stable")
    assigned = np.zeros(n_nodes, bool)
    perm = np.empty(n_nodes, np.int64)
    k = 0
    indptr, indices = a.indptr, a.indices
    for d in order_dst:
        for s in indices[indptr[d]:indptr[d + 1]]:
            if not assigned[s]:
                assigned[s] = True
                perm[k] = s
                k += 1
    rest = np.flatnonzero(~assigned)
    perm[k:] = rest
    return perm


def group_runs(
    src: np.ndarray, dst: np.ndarray
) -> tuple[int, int]:
    """(n_coalescible_groups, n_groups): how many G-edge groups of the
    (dst, src)-sorted, per-row G-padded edge list have strictly consecutive
    source ids — exactly the condition under which build_blocked_csr marks a
    group for the single wide DMA.  Mirrors the kernel's grouping: each
    row's edge list padded to a multiple of G with dummy slots (dummy slots
    break consecutiveness except when they extend a run onto the dummy id,
    which the kernel fetches identically either way — counted NOT
    coalescible here to stay conservative)."""
    order = np.lexsort((src, dst))
    s, d = src[order], dst[order]
    counts = np.bincount(d)
    counts = counts[counts > 0]
    padded = ((counts + G - 1) // G) * G
    n_groups = int(padded.sum()) // G
    # positions of each edge inside its padded row
    row_end = np.cumsum(counts)
    row_start = row_end - counts
    pad_start = np.cumsum(padded) - padded
    pos = pad_start.repeat(counts) + (np.arange(len(s)) - row_start.repeat(counts))
    grid = np.full(n_groups * G, -(10 * G), np.int64)  # breaks any run
    grid[pos] = s
    grp = grid.reshape(-1, G)
    consec = (np.diff(grp, axis=1) == 1).all(axis=1)
    return int(consec.sum()), n_groups


def coalesce_report(
    src: np.ndarray, dst: np.ndarray, n_nodes: int
) -> dict:
    """Coalescible-group fraction under identity / RCM / greedy orderings,
    for BOTH kernel directions (forward: groups share dst; backward:
    transpose groups share src)."""
    out = {}
    for name, perm in (
        ("identity", np.arange(n_nodes, dtype=np.int64)),
        ("rcm", rcm_order(src, dst, n_nodes)),
        ("greedy", greedy_coalesce_order(src, dst, n_nodes)),
    ):
        s, d = relabel_edges(src, dst, perm)
        cf, nf = group_runs(s, d)
        cb, nb = group_runs(d, s)
        out[name] = {
            "fwd": cf / max(nf, 1),
            "bwd": cb / max(nb, 1),
            "n_groups_fwd": nf,
        }
    return out
