"""Edge/destination-block graph partitioning with halo exchange metadata.

The reference holds the entire graph on one device (SURVEY.md §2.3: no
parallelism of any kind).  The TPU-native scaling axis for this model family
is the *graph*: a 1-D partition of the CSR adjacency by contiguous
destination-node blocks, with boundary ("halo") source-node features
exchanged all-to-all over ICI each layer — the GNN analogue of sequence
parallelism (SURVEY.md §5 "long-context" note; BASELINE.json north star).

Layout per chip p (P chips, own block size C):
  * owns global nodes [pC, (p+1)C) — their features and incoming edges;
  * local gather space = [own C rows | P·S halo slots | build padding/dummy],
    where halo slot (q, k) at position C + q·S + k receives row
    ``send_idx[q, p, k]`` of chip q (static tables, padded with -1);
  * a *local* Graph (forward + transpose bucketed ELL) over locally
    re-indexed edges, harmonized across chips to identical static shapes so
    one executable serves every chip under shard_map.

Max/sum reductions compose associatively, so cutting edges at block
boundaries is exact; halo slots replicate remote rows rather than partial
reductions, keeping the argmax-routed backward valid chip-locally.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.graph_format import (
    DEFAULT_WIDTHS,
    Graph,
    build_graph,
    merge_ell_dims,
    multi_ell_dims,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["local", "interior", "boundary", "send_idx",
                 "in_degree", "out_degree", "pallas_local",
                 "pallas_interior", "pallas_boundary", "row_map",
                 "node_row"],
    meta_fields=["n_chips", "own_rows", "halo_per_peer", "n_real_nodes",
                 "n_edges"],
)
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Stacked per-chip local graphs + halo exchange tables.

    local:      Graph whose array fields carry a leading (P,) axis (sharded
                over the mesh 'graph' axis; meta fields are the common
                harmonized dims).
    interior/boundary: the same local edge set split into edges whose source
                is OWNED (interior) vs a halo slot (boundary).  Aggregating
                interior edges needs no communication, so XLA's scheduler
                overlaps it with the halo all_to_all; partial max/sum results
                combine associatively (ring-attention-style overlap, the
                north-star requirement).  None when built with overlap=False.
    send_idx:   (P, P, S) int32 — send_idx[p, q, k] is the own-row index
                (0..C) chip p sends to chip q's k-th halo slot; -1 = none.
    in_degree/out_degree: (P, C) int32 — *global* degrees of owned nodes
                (needed for GCN normalization; the local graph's degrees only
                count local edges).
    pallas_local/pallas_interior/pallas_boundary: stacked per-chip
                PallasGraph (fold-batched grouped-CSR DMA kernels) over the
                same local edge sets/gather space, built when
                ``pallas_rows_per_block`` is given — the fast per-chip SpMM
                inside the sharded step.  None otherwise.
    row_map/node_row: balanced-partition permutation tables (None = identity
                layout, rows [0, n_real) are node ids).  row_map (P·C,) int32
                gives the node id stored in each global row (-1 = padding);
                node_row (n_real,) int32 gives each node's global row.
                Features/labels/masks shard by row_map gathers; results
                restore to node order via node_row.
    """

    local: Graph
    interior: Optional[Graph]
    boundary: Optional[Graph]
    send_idx: jax.Array
    in_degree: jax.Array
    out_degree: jax.Array
    n_chips: int
    own_rows: int
    halo_per_peer: int
    n_real_nodes: int
    n_edges: int
    pallas_local: Optional[object] = None
    pallas_interior: Optional[object] = None
    pallas_boundary: Optional[object] = None
    row_map: Optional[jax.Array] = None
    node_row: Optional[jax.Array] = None


def _stack_pallas_graphs(edge_sets, n_pad_nodes: int, rows_per_block: int,
                         hub_k: int = 0, hub_k_bwd: int = 0):
    """Per-chip PallasGraph over harmonized local gather spaces, array fields
    stacked with a leading chip axis (meta dims forced equal: arrays padded
    to the max length with dummy edge slots the kernels never dereference).
    ``hub_k``/``hub_k_bwd`` stack per-chip VMEM hub caches too — the builder
    emits exactly k slots per chip, so the HubStream pytrees line up."""
    from ..ops.pallas.spmm_kernels import (
        BlockedCsr, HubStream, PallasGraph, build_blocked_csr,
    )

    dummy = n_pad_nodes - 1

    def stack_blocked(pairs, hk):
        csrs = [
            build_blocked_csr(s, d, n_pad_nodes, rows_per_block, hub_k=hk)
            for s, d in pairs
        ]
        ln = max(c.src.shape[0] for c in csrs)

        def pad1(a, fill, n):
            a = np.asarray(a)
            return np.pad(a, (0, n - len(a)), constant_values=fill)

        hub = None
        if hk > 0:
            hln = max(c.hub.slot.shape[0] for c in csrs)
            hub = HubStream(
                blk_ptr=jnp.asarray(
                    np.stack([np.asarray(c.hub.blk_ptr) for c in csrs])),
                slot=jnp.asarray(
                    np.stack([pad1(c.hub.slot, hk, hln) for c in csrs])),
                dstl=jnp.asarray(np.stack(
                    [pad1(c.hub.dstl, rows_per_block, hln) for c in csrs])),
                ids=jnp.asarray(
                    np.stack([np.asarray(c.hub.ids) for c in csrs])),
                k=hk,
            )

        return BlockedCsr(
            blk_ptr=jnp.asarray(np.stack([np.asarray(c.blk_ptr) for c in csrs])),
            src=jnp.asarray(np.stack([pad1(c.src, dummy, ln) for c in csrs])),
            dst_local=jnp.asarray(np.stack(
                [pad1(c.dst_local, rows_per_block, ln) for c in csrs])),
            n_blocks=csrs[0].n_blocks,
            rows_per_block=rows_per_block,
            n_pad_nodes=n_pad_nodes,
            n_edges=max(c.n_edges for c in csrs),
            hub=hub,
        )

    return PallasGraph(
        fwd=stack_blocked([(s, d) for s, d in edge_sets], hub_k),
        bwd=stack_blocked([(d, s) for s, d in edge_sets], hub_k_bwd),
    )


def partition_graph(
    src: np.ndarray,
    dst: np.ndarray,
    n_real: int,
    n_chips: int,
    *,
    add_self_loops: bool = False,
    node_multiple: int = 8,
    widths: Tuple[int, ...] = DEFAULT_WIDTHS,
    overlap: bool = True,
    pallas_rows_per_block: Optional[int] = None,
    pallas_hub_k: int = 0,
    pallas_hub_k_bwd: int = 0,
    balance: bool = False,
) -> PartitionedGraph:
    """Host-side 1-D destination-block partitioner.

    overlap=True additionally materializes interior/boundary edge-set splits
    for communication/compute overlap.  pallas_rows_per_block additionally
    builds per-chip fold-batched PallasGraph structures over the local
    gather spaces (choose it via ops.pallas.spmm_kernels.pick_rows_per_block
    at the training stride).

    balance=True relabels nodes before blocking so every chip owns ~E/P
    incoming edges: on power-law PPI topology (reference
    data_preprocess.py:74-110) contiguous id blocks can be pathologically
    skewed (hub ids cluster), and the SPMD barrier at the gradient psum makes
    the WORST chip's edge count the step time.  Snake-order dealing of
    nodes sorted by in-degree bounds the imbalance by one node's degree.
    The permutation is recorded in row_map/node_row; shard_features and the
    sharded runners apply it transparently."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    if add_self_loops:
        loops = np.arange(n_real, dtype=np.int64)
        src = np.concatenate([src, loops])
        dst = np.concatenate([dst, loops])

    p = n_chips
    c = _round_up(-(-n_real // p), node_multiple)  # own rows per chip

    row_map = node_row = None
    if balance:
        deg = np.bincount(dst, minlength=n_real).astype(np.int64)
        order = np.argsort(-deg, kind="stable")  # hubs first
        k = np.arange(n_real)
        rnd, j = k // p, k % p
        block = np.where(rnd % 2 == 0, j, p - 1 - j)  # snake dealing
        node_row = np.empty(n_real, np.int64)
        node_row[order] = block * c + rnd
        row_map = np.full(p * c, -1, np.int32)
        row_map[node_row] = np.arange(n_real)
        # relabel every edge endpoint into row space; all later block math
        # (owner = id // c) operates on rows
        src = node_row[src]
        dst = node_row[dst]

    in_deg = np.bincount(dst, minlength=p * c).astype(np.int32)
    out_deg = np.bincount(src, minlength=p * c).astype(np.int32)

    owner_dst = dst // c
    owner_src = src // c

    # Halo tables, fully vectorized: the naive per-(consumer, owner) double
    # loop re-masks the whole edge array P^2 times (O(P^2 * E), painful at
    # the 10M-edge scaling sweep).  One sorted unique pass over cross-owner
    # edges yields every (consumer pp, owner q) group's needed source rows;
    # per-edge slot assignment is a searchsorted against the same table.
    cross = owner_src != owner_dst
    trip = np.unique(
        np.stack([owner_dst[cross], owner_src[cross], src[cross]], axis=1),
        axis=0,
    )  # sorted rows: (consumer pp, owner q, global src)
    grp_key = trip[:, 0] * p + trip[:, 1]
    bounds = np.searchsorted(grp_key, np.arange(p * p + 1))
    s_max = max(int(np.diff(bounds).max()) if len(trip) else 0, 1)
    s_pad = _round_up(s_max, 8)

    send_idx = np.full((p, p, s_pad), -1, np.int32)
    # Position of each global halo row in consumer pp's gather space.
    for pp in range(p):
        for q in range(p):
            lo, hi = bounds[pp * p + q], bounds[pp * p + q + 1]
            if q == pp or lo == hi:
                continue
            send_idx[q, pp, : hi - lo] = trip[lo:hi, 2] - q * c

    n_local = c + p * s_pad  # + dummy/padding added by build_graph

    # Re-index every edge's source into its consumer's gather space in one
    # vectorized pass: own edges map into the local block, cross edges to
    # (halo base + owner block + slot-within-group) via the trip table.
    n_key = int(src.max()) + 1 if len(src) else 1
    key_trip = grp_key * n_key + trip[:, 2]
    key_edge = (owner_dst[cross] * p + owner_src[cross]) * n_key + src[cross]
    slot = (np.searchsorted(key_trip, key_edge)
            - bounds[owner_dst[cross] * p + owner_src[cross]])
    s_l_all = np.empty_like(src)
    s_l_all[~cross] = src[~cross] - owner_dst[~cross] * c
    s_l_all[cross] = c + owner_src[cross] * s_pad + slot
    d_l_all = dst - owner_dst * c

    order_e = np.argsort(owner_dst, kind="stable")
    chip_bounds = np.searchsorted(owner_dst[order_e], np.arange(p + 1))
    chip_edges = [
        (s_l_all[order_e[chip_bounds[pp]:chip_bounds[pp + 1]]],
         d_l_all[order_e[chip_bounds[pp]:chip_bounds[pp + 1]]])
        for pp in range(p)
    ]

    # Harmonize static dims across chips.  The pallas kernels additionally
    # need the padded node count to divide into rows_per_block blocks.
    node_pad_mult = (
        8 if pallas_rows_per_block is None else max(8, pallas_rows_per_block)
    )
    n_pad_nodes = _round_up(n_local + 1, node_pad_mult)

    def build_harmonized(edge_sets):
        e_max = max(max(len(s), 1) for s, _ in edge_sets)
        e_pad = _round_up(e_max, 256)
        fwd_dims, bwd_dims = [], []
        for s_l, d_l in edge_sets:
            fwd_dims.append(multi_ell_dims(s_l, d_l, n_pad_nodes, widths=widths))
            bwd_dims.append(multi_ell_dims(d_l, s_l, n_pad_nodes, widths=widths))
        fwd_dims = merge_ell_dims(fwd_dims)
        bwd_dims = merge_ell_dims(bwd_dims)
        return [
            build_graph(
                s_l, d_l, n_local,
                add_self_loops=False,
                node_multiple=node_pad_mult,
                edge_multiple=e_pad,
                widths=widths,
                force_ell_dims=fwd_dims,
                force_ell_t_dims=bwd_dims,
            )
            for s_l, d_l in edge_sets
        ]

    graphs = build_harmonized(chip_edges)
    interior_graphs = boundary_graphs = None
    interior_edges = boundary_edges = None
    if overlap:
        interior_edges, boundary_edges = [], []
        for s_l, d_l in chip_edges:
            own = s_l < c
            interior_edges.append((s_l[own], d_l[own]))
            boundary_edges.append((s_l[~own], d_l[~own]))
        interior_graphs = build_harmonized(interior_edges)
        boundary_graphs = build_harmonized(boundary_edges)

    pallas_local = pallas_interior = pallas_boundary = None
    if pallas_rows_per_block is not None:
        r_pb = pallas_rows_per_block
        hk, hkb = pallas_hub_k, pallas_hub_k_bwd
        pallas_local = _stack_pallas_graphs(
            chip_edges, n_pad_nodes, r_pb, hub_k=hk, hub_k_bwd=hkb)
        if overlap:
            # the interior carries the bulk of the edges; the boundary
            # stream is small, so its hub cache would not pay for itself
            pallas_interior = _stack_pallas_graphs(
                interior_edges, n_pad_nodes, r_pb, hub_k=hk, hub_k_bwd=hkb)
            pallas_boundary = _stack_pallas_graphs(
                boundary_edges, n_pad_nodes, r_pb)
    # All meta dims now match; stack arrays with a leading chip axis.
    metas = {f.name: getattr(graphs[0], f.name)
             for f in dataclasses.fields(Graph)
             if f.name in ("n_nodes", "n_real_nodes", "n_edges", "n_pad_edges")}
    for g in graphs[1:]:
        for k in ("n_nodes", "n_pad_edges"):
            assert getattr(g, k) == metas[k], "harmonization failed"
    # n_edges differs per chip; the stacked pytree must share meta, so record
    # the max (only used for bookkeeping on the stacked object).
    metas["n_edges"] = max(g.n_edges for g in graphs)
    metas["n_real_nodes"] = n_local

    def stack_graphs(glist):
        def stack(field):
            return jnp.stack([getattr(g, field) for g in glist])

        def stack_tree(field):
            return jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[getattr(g, field) for g in glist])

        # Padded-edge validity differs per chip; segment reference paths are
        # not used on partitioned graphs, so COO arrays are stacked as-is.
        return Graph(
            src=stack("src"),
            dst=stack("dst"),
            indptr=stack("indptr"),
            in_degree=stack("in_degree"),
            out_degree=stack("out_degree"),
            ell=stack_tree("ell"),
            ell_t=stack_tree("ell_t"),
            n_nodes=glist[0].n_nodes,
            n_real_nodes=n_local,
            n_edges=max(g.n_edges for g in glist),
            n_pad_edges=glist[0].n_pad_edges,
        )

    stacked = stack_graphs(graphs)

    return PartitionedGraph(
        local=stacked,
        interior=stack_graphs(interior_graphs) if interior_graphs else None,
        boundary=stack_graphs(boundary_graphs) if boundary_graphs else None,
        send_idx=jnp.asarray(send_idx),
        in_degree=jnp.asarray(in_deg.reshape(p, c)),
        out_degree=jnp.asarray(out_deg.reshape(p, c)),
        n_chips=p,
        own_rows=c,
        halo_per_peer=s_pad,
        n_real_nodes=n_real,
        n_edges=len(src),
        pallas_local=pallas_local,
        pallas_interior=pallas_interior,
        pallas_boundary=pallas_boundary,
        row_map=jnp.asarray(row_map) if row_map is not None else None,
        node_row=jnp.asarray(node_row, jnp.int32)
        if node_row is not None else None,
    )


def shard_features(x: np.ndarray, pgraph: PartitionedGraph) -> np.ndarray:
    """(N, F) host features → (P, C, F) owner-block shards (zero padded),
    applying the balanced-partition permutation when one is recorded."""
    p, c = pgraph.n_chips, pgraph.own_rows
    f = x.shape[1]
    out = np.zeros((p * c, f), x.dtype)
    if pgraph.row_map is not None:
        rm = np.asarray(pgraph.row_map)
        valid = rm >= 0
        out[valid] = np.asarray(x)[rm[valid]]
    else:
        out[: len(x)] = x
    return out.reshape(p, c, f)


def unshard_rows(x: np.ndarray, pgraph: PartitionedGraph) -> np.ndarray:
    """(P, C, F) shards → (N_real, F), undoing any balanced permutation."""
    p, c = pgraph.n_chips, pgraph.own_rows
    flat = np.asarray(x).reshape(p * c, -1)
    if pgraph.node_row is not None:
        return flat[np.asarray(pgraph.node_row)]
    return flat[: pgraph.n_real_nodes]
