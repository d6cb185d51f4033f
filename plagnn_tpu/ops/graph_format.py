"""Device-resident sparse graph containers (TPU-first).

The reference (quinlanW/PLA-GNN) keeps its graph in a DGL ``DGLGraph`` whose
COO→CSR conversion and segment kernels live in libdgl C++/CUDA
(``/root/reference/code/utils.py:44-45``).  Here the graph is a static-shape
JAX pytree designed for XLA/Pallas on TPU.

Design
------
TPU XLA scatters with duplicate indices serialize badly, so the aggregation
format is built to need **no scatter at all**, in either the forward or the
backward pass:

* **Bucketed, row-split padded ELL** (``MultiEll``): destination rows are
  grouped into degree classes; each class stores its in-edges as a dense
  ``(rows, width)`` int32 index block (pow-2 widths, padded with ``-1``).
  Rows above the cap width are *split* into several virtual rows whose
  partial results are combined by a tiny dense gather+reduce (max/sum are
  associative so splitting is exact).  Aggregation is then
  ``gather → dense reduce over axis 1 → unique-index gather`` — pure
  VPU-friendly work.
* The **transpose adjacency** is stored as a second ``MultiEll`` so backward
  passes are the same gather+reduce pattern over reversed edges (the VJP of a
  gather is a duplicate-scatter; routing it through the transpose graph
  avoids that).
* **Sorted COO + CSR** (``src``/``dst`` sorted by destination, ``indptr``)
  feed the Pallas kernels and debugging paths.

All shapes are padded to static tile multiples so one compiled executable
serves every condition (SURVEY.md §7, hard part 4: the three PPI_inter
topologies bucket to the same shapes).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Padding sentinel for ELL index slots with no edge.
NO_EDGE = -1

# Fine-grained pow-2 degree classes: measured 1.38x padded-slot overhead on a
# power-law PPI graph vs 1.95x for coarse (8,32,128,512) buckets — gather
# volume is the SpMM cost driver on TPU.
DEFAULT_WIDTHS = (2, 4, 8, 16, 32, 64, 128, 256, 512)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "idx", "val"],
    meta_fields=["n_rows", "width"],
)
@dataclasses.dataclass(frozen=True)
class EllBlock:
    """One degree-class of the bucketed ELL.

    rows: (R,)   int32 — destination node id per virtual row (dummy for pad).
    idx:  (R, W) int32 — source node ids; ``NO_EDGE`` marks empty slots.
    val:  (R, W) f32 or None — optional edge values (same layout as idx).
    """

    rows: jax.Array
    idx: jax.Array
    val: Optional[jax.Array]
    n_rows: int
    width: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "gather_perm", "split_part_idx"],
    meta_fields=["n_partial_rows", "n_split"],
)
@dataclasses.dataclass(frozen=True)
class MultiEll:
    """Bucketed row-split ELL adjacency with scatter-free assembly.

    After reducing every block, partial results are concatenated into
    ``P`` of ``n_partial_rows`` rows (block order).  Split-node partials are
    combined by gathering ``split_part_idx`` (positions into P, ``-1`` pad)
    and reducing; combined rows sit at positions
    ``n_partial_rows + [0, n_split)`` of the extended buffer, followed by one
    zeros row.  ``gather_perm`` maps every (padded) node id to its row in the
    extended buffer; zero-degree and padding nodes map to the zeros row,
    matching DGL's convention that max/sum over an empty neighborhood is 0.
    """

    blocks: Tuple[EllBlock, ...]
    gather_perm: jax.Array      # (N_pad,) int32
    split_part_idx: jax.Array   # (S_pad, C) int32, -1 padded
    n_partial_rows: int
    n_split: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "src", "dst", "indptr", "in_degree", "out_degree", "ell", "ell_t",
    ],
    meta_fields=["n_nodes", "n_real_nodes", "n_edges", "n_pad_edges"],
)
@dataclasses.dataclass(frozen=True)
class Graph:
    """Static-shape device graph.

    src/dst:   (E_pad,) int32, edges sorted by ``dst`` then ``src``; padded
               edges point at the dummy node ``n_nodes - 1``.
    indptr:    (n_nodes + 1,) int32 CSR row pointers over the padded edges.
    in_degree/out_degree: (n_nodes,) int32 true degrees (0 for pad nodes).
    ell:       bucketed ELL over in-edges (forward aggregation).
    ell_t:     bucketed ELL over out-edges (transpose; backward aggregation).
    """

    src: jax.Array
    dst: jax.Array
    indptr: jax.Array
    in_degree: jax.Array
    out_degree: jax.Array
    ell: MultiEll
    ell_t: MultiEll
    n_nodes: int
    n_real_nodes: int
    n_edges: int
    n_pad_edges: int

    @property
    def dummy_node(self) -> int:
        return self.n_nodes - 1


def multi_ell_dims(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    *,
    widths: Tuple[int, ...] = DEFAULT_WIDTHS,
    row_multiple: int = 8,
) -> dict:
    """Compute the static dims a build_multi_ell call would produce — used by
    the partitioner to harmonize per-chip graphs to one executable shape."""
    widths = tuple(sorted(widths))
    cap = widths[-1]
    counts = np.bincount(np.asarray(dst, np.int64), minlength=n_nodes).astype(np.int64)
    deg_class = np.minimum(
        np.searchsorted(np.asarray(widths), counts, side="left"), len(widths) - 1
    )
    vrows = np.where(counts > cap, -(-counts // cap), (counts > 0).astype(np.int64))
    split_nodes = np.flatnonzero(counts > cap)
    block_rows = []
    for wi, w in enumerate(widths):
        members = np.flatnonzero((deg_class == wi) & (counts > 0))
        n_vrows = int(vrows[members].sum()) if len(members) else 0
        block_rows.append(max(_round_up(max(n_vrows, 1), row_multiple), row_multiple))
    return {
        "block_rows": tuple(block_rows),
        "split_rows": max(_round_up(max(len(split_nodes), 1), row_multiple), row_multiple),
        "split_parts": int(vrows[split_nodes].max()) if len(split_nodes) else 1,
    }


def merge_ell_dims(dims_list) -> dict:
    """Element-wise max of several multi_ell_dims results."""
    return {
        "block_rows": tuple(
            max(d["block_rows"][i] for d in dims_list)
            for i in range(len(dims_list[0]["block_rows"]))
        ),
        "split_rows": max(d["split_rows"] for d in dims_list),
        "split_parts": max(d["split_parts"] for d in dims_list),
    }


def build_multi_ell(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    *,
    widths: Tuple[int, ...] = DEFAULT_WIDTHS,
    val: Optional[np.ndarray] = None,
    row_multiple: int = 8,
    force_dims: Optional[dict] = None,
) -> MultiEll:
    """Build the bucketed row-split ELL (host side, numpy).

    ``n_nodes`` is the padded node count; the last node is the dummy.
    Edges need not be pre-sorted.  ``force_dims`` (from multi_ell_dims /
    merge_ell_dims) pads block/split tables to the given static dims so that
    differently-shaped graphs (e.g. per-chip partitions, or the three
    PPI_inter conditions) share one compiled executable.
    """
    widths = tuple(sorted(widths))
    cap = widths[-1]
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    if val is not None:
        val = np.asarray(val, np.float32)[order]

    counts = np.bincount(dst, minlength=n_nodes).astype(np.int64)
    indptr = np.zeros(n_nodes + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])

    # Degree-class of every node (index into widths); split nodes use cap.
    deg_class = np.searchsorted(np.asarray(widths), counts, side="left")
    deg_class = np.minimum(deg_class, len(widths) - 1)

    # Virtual rows per node (1 unless split).
    vrows = np.where(counts > cap, -(-counts // cap), (counts > 0).astype(np.int64))

    split_nodes = np.flatnonzero(counts > cap)
    max_parts = int(vrows[split_nodes].max()) if len(split_nodes) else 1
    n_split = len(split_nodes)
    s_pad = max(_round_up(max(n_split, 1), row_multiple), row_multiple)
    if force_dims is not None:
        if force_dims["split_rows"] < s_pad or force_dims["split_parts"] < max_parts:
            raise ValueError("force_dims smaller than required split dims")
        s_pad = force_dims["split_rows"]
        max_parts = force_dims["split_parts"]

    blocks = []
    # Positions of every virtual row in the concatenated partial buffer P,
    # per node: node -> (first partial position, n partials).
    part_pos = np.full(n_nodes, -1, np.int64)
    part_cnt = np.zeros(n_nodes, np.int64)
    offset = 0
    for wi, w in enumerate(widths):
        is_cap = wi == len(widths) - 1
        if is_cap:
            members = np.flatnonzero((deg_class == wi) & (counts > 0))
        else:
            members = np.flatnonzero((deg_class == wi) & (counts > 0) & (counts <= cap))
        n_vrows = int(vrows[members].sum()) if len(members) else 0
        r_pad = max(_round_up(max(n_vrows, 1), row_multiple), row_multiple)
        if force_dims is not None:
            if force_dims["block_rows"][wi] < r_pad:
                raise ValueError("force_dims smaller than required block rows")
            r_pad = force_dims["block_rows"][wi]
        rows = np.full(r_pad, n_nodes - 1, np.int32)
        idx = np.full((r_pad, w), NO_EDGE, np.int32)
        vals = np.zeros((r_pad, w), np.float32) if val is not None else None
        if len(members):
            # Virtual-row base position per member (within this block).
            m_vrows = vrows[members]
            vr_base = np.zeros(len(members), np.int64)
            np.cumsum(m_vrows[:-1], out=vr_base[1:])
            part_pos[members] = offset + vr_base
            part_cnt[members] = m_vrows
            # Edge placement, fully vectorized over this block's edges.
            starts = indptr[members]
            ends = indptr[members + 1]
            lens = ends - starts
            tot = int(lens.sum())
            edge_node = np.repeat(np.arange(len(members)), lens)
            cum = np.cumsum(lens)
            rank = np.arange(tot, dtype=np.int64) - np.repeat(cum - lens, lens)
            edge_pos = starts[edge_node] + rank
            vr = vr_base[edge_node] + rank // w
            slot = rank % w
            idx[vr, slot] = src[edge_pos]
            rows[vr] = dst[edge_pos]
            if vals is not None:
                vals[vr, slot] = val[edge_pos]
        blocks.append(
            EllBlock(
                rows=jnp.asarray(rows),
                idx=jnp.asarray(idx),
                val=jnp.asarray(vals) if vals is not None else None,
                n_rows=r_pad,
                width=w,
            )
        )
        offset += r_pad

    n_partial_rows = offset
    zeros_row = n_partial_rows + s_pad

    # Split-combine gather table.
    split_part_idx = np.full((s_pad, max_parts), -1, np.int64)
    for i, node in enumerate(split_nodes):
        k = part_cnt[node]
        split_part_idx[i, :k] = part_pos[node] + np.arange(k)

    # Node → extended-buffer row.
    gather_perm = np.full(n_nodes, zeros_row, np.int64)
    unsplit = np.flatnonzero((counts > 0) & (counts <= cap))
    gather_perm[unsplit] = part_pos[unsplit]
    gather_perm[split_nodes] = n_partial_rows + np.arange(n_split)

    return MultiEll(
        blocks=tuple(blocks),
        gather_perm=jnp.asarray(gather_perm, jnp.int32),
        split_part_idx=jnp.asarray(split_part_idx, jnp.int32),
        n_partial_rows=n_partial_rows,
        n_split=s_pad,
    )


def build_graph(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    *,
    add_self_loops: bool = False,
    node_multiple: int = 128,
    edge_multiple: int = 1024,
    widths: Tuple[int, ...] = DEFAULT_WIDTHS,
    edge_val: Optional[np.ndarray] = None,
    build_transpose: bool = True,
    force_ell_dims: Optional[dict] = None,
    force_ell_t_dims: Optional[dict] = None,
) -> Graph:
    """Host-side graph construction — the TPU analogue of
    ``dgl.graph(...) + dgl.add_self_loop`` (/root/reference/code/utils.py:44-45).

    Appends self-loop edges explicitly when requested, pads node/edge counts
    to static tile multiples, sorts edges by destination, and materializes
    CSR pointers plus forward and transpose bucketed ELLs.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    if edge_val is not None:
        edge_val = np.asarray(edge_val, np.float32)
    if add_self_loops:
        loops = np.arange(n_nodes, dtype=np.int64)
        src = np.concatenate([src, loops])
        dst = np.concatenate([dst, loops])
        if edge_val is not None:
            edge_val = np.concatenate([edge_val, np.ones(n_nodes, np.float32)])

    n_real_nodes = n_nodes
    # +1 guarantees a dedicated dummy node even when n_nodes is already a
    # multiple of node_multiple.
    n_pad_nodes = _round_up(n_nodes + 1, node_multiple)
    n_edges = len(src)
    n_pad_edges = max(_round_up(max(n_edges, 1), edge_multiple), edge_multiple)

    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    if edge_val is not None:
        edge_val = edge_val[order]

    dummy = n_pad_nodes - 1
    pad = n_pad_edges - n_edges
    src_p = np.concatenate([src, np.full(pad, dummy, np.int64)]).astype(np.int32)
    dst_p = np.concatenate([dst, np.full(pad, dummy, np.int64)]).astype(np.int32)

    counts = np.bincount(dst_p, minlength=n_pad_nodes)
    indptr = np.zeros(n_pad_nodes + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])

    in_deg = np.bincount(dst, minlength=n_pad_nodes).astype(np.int32)
    out_deg = np.bincount(src, minlength=n_pad_nodes).astype(np.int32)

    ell = build_multi_ell(
        src, dst, n_pad_nodes, widths=widths, val=edge_val,
        force_dims=force_ell_dims,
    )
    ell_t = (
        build_multi_ell(
            dst, src, n_pad_nodes, widths=widths, val=edge_val,
            force_dims=force_ell_t_dims,
        )
        if build_transpose
        else ell
    )

    return Graph(
        src=jnp.asarray(src_p),
        dst=jnp.asarray(dst_p),
        indptr=jnp.asarray(indptr, jnp.int32),
        in_degree=jnp.asarray(in_deg),
        out_degree=jnp.asarray(out_deg),
        ell=ell,
        ell_t=ell_t,
        n_nodes=n_pad_nodes,
        n_real_nodes=n_real_nodes,
        n_edges=n_edges,
        n_pad_edges=n_pad_edges,
    )


def from_scipy_coo(mat, **kwargs) -> Graph:
    """Build a Graph from a scipy sparse matrix, matching the reference
    ingestion path ``dgl.graph((ppi.row, ppi.col), ...)``."""
    coo = mat.tocoo()
    return build_graph(coo.row, coo.col, mat.shape[0], **kwargs)


def pad_features(x: np.ndarray, n_pad_nodes: int) -> np.ndarray:
    """Zero-pad a (N, F) feature matrix to the padded node count."""
    n, f = x.shape
    out = np.zeros((n_pad_nodes, f), x.dtype)
    out[:n] = x
    return out
