"""shard_map programs: halo exchange, sharded layers, sharded train step.

Replaces the reference's nothing (no distributed backend exists there,
SURVEY.md §2.3) with JAX collectives over ICI/DCN: a named mesh, all_to_all
halo exchange, psum gradient/loss reductions — XLA inserts the transfers.

Mesh axes:
  'graph' — destination-block partition of the PPI graph (halo all-to-all).
  'fold'  — data-parallel axis over the round/fold ensemble (the reference's
            embarrassingly-parallel 10×10 experiment structure,
            train.py:162-178).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import layers as L
from ..ops.graph_format import Graph
from ..ops.spmm import spmm_max, spmm_sum
from ..utils.precision import matmul_precision
from .partition import PartitionedGraph

GRAPH_AXIS = "graph"
FOLD_AXIS = "fold"


def make_mesh(n_graph: int, n_fold: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_graph * n_fold, "not enough devices"
    devs = devices.reshape(-1)[: n_graph * n_fold].reshape(n_fold, n_graph)
    return Mesh(devs, (FOLD_AXIS, GRAPH_AXIS))


# ---------------------------------------------------------------------------
# Halo exchange (runs inside shard_map, one chip's view).
# ---------------------------------------------------------------------------


def halo_exchange(x_own: jax.Array, send_idx_p: jax.Array) -> jax.Array:
    """Exchange boundary rows with every peer.

    x_own:       (C, ...) — this chip's owned feature rows (any trailing
                 shape: (C, F) per-fold or (C, B, F) fold-batched).
    send_idx_p:  (P, S) — rows of x_own to send to each peer (-1 pad).
    Returns (P·S, ...): the halo buffer, slot (q, k) = row k requested from
    peer q (zeros in padding slots).
    """
    pp, s = send_idx_p.shape
    valid = (send_idx_p >= 0).reshape(pp, s, *([1] * (x_own.ndim - 1)))
    buf = jnp.where(
        valid, x_own[jnp.maximum(send_idx_p, 0)],
        jnp.zeros((), x_own.dtype),
    )  # (P, S, ...)
    recv = jax.lax.all_to_all(
        buf, GRAPH_AXIS, split_axis=0, concat_axis=0, tiled=False
    )
    return recv.reshape(pp * s, *x_own.shape[1:])


def gather_space(
    x_own: jax.Array, halo: jax.Array, n_pad_nodes: int
) -> jax.Array:
    """Assemble the local gather space [own | halo | padding/dummy]."""
    c = x_own.shape[0]
    h = halo.shape[0]
    pad = n_pad_nodes - c - h
    z = jnp.zeros((pad, *x_own.shape[1:]), x_own.dtype)
    return jnp.concatenate([x_own, halo, z], axis=0)


# ---------------------------------------------------------------------------
# Sharded layers (mirror models/layers.py on one chip's shard).
# ---------------------------------------------------------------------------


def sharded_sage_conv(
    params, local_graph: Graph, send_idx_p, x_own, aggregator: str = "pool",
    interior: Graph = None, boundary: Graph = None, degenerate: bool = False,
):
    """SAGEConv over a destination-block shard.

    With interior/boundary edge splits, the interior aggregation has no data
    dependence on the all_to_all, so XLA's latency-hiding scheduler overlaps
    the halo exchange with local compute; −inf-filled partial maxima combine
    exactly (interior includes the self-loop, and pooled features are
    relu-nonnegative, so tie-split gradients at zero maxima die at relu').

    degenerate=True (graph mesh axis of size 1): every edge is interior, so
    the halo all_to_all, the boundary kernel pass, and the partial-maximum
    merge are pure structure tax — skip them and run the single local
    stream (identical results by construction; VERDICT r3 weak #2).
    """
    c = x_own.shape[0]
    overlap = (interior is not None and boundary is not None
               and not degenerate)
    if degenerate:
        def aggregate(xp, reduce_fn):
            z = jnp.zeros((local_graph.n_nodes - c, xp.shape[-1]), xp.dtype)
            return reduce_fn(jnp.concatenate([xp, z], axis=0))[:c]

        if aggregator == "pool":
            pooled = jax.nn.relu(
                jnp.dot(x_own, params["w_pool"],
                        preferred_element_type=jnp.float32,
                        precision=matmul_precision())
                + params["b_pool"]
            )
            m = aggregate(pooled, lambda xl: spmm_max(local_graph, xl))
        elif aggregator == "sum":
            m = aggregate(x_own, lambda xl: spmm_sum(local_graph, xl))
        else:
            raise ValueError(aggregator)
        return (
            jnp.dot(x_own, params["w_self"],
                    preferred_element_type=jnp.float32,
                    precision=matmul_precision())
            + jnp.dot(m, params["w_neigh"],
                      preferred_element_type=jnp.float32,
                      precision=matmul_precision())
            + params["bias"]
        )
    if aggregator == "pool":
        pooled = jax.nn.relu(
            jnp.dot(x_own, params["w_pool"], preferred_element_type=jnp.float32,
                    precision=matmul_precision())
            + params["b_pool"]
        )
        if overlap:
            zeros_halo = jnp.zeros(
                (local_graph.n_nodes - c, pooled.shape[-1]), pooled.dtype)
            xl_int = jnp.concatenate([pooled, zeros_halo], axis=0)
            m_int = spmm_max(interior, xl_int, empty_value=-jnp.inf)[:c]
            halo = halo_exchange(pooled, send_idx_p)
            xl_bnd = gather_space(pooled, halo, local_graph.n_nodes)
            m_bnd = spmm_max(boundary, xl_bnd, empty_value=-jnp.inf)[:c]
            m = jnp.maximum(m_int, m_bnd)
            m = jnp.where(jnp.isneginf(m), 0.0, m)
        else:
            halo = halo_exchange(pooled, send_idx_p)
            xl = gather_space(pooled, halo, local_graph.n_nodes)
            m = spmm_max(local_graph, xl)[:c]
    elif aggregator == "sum":
        if overlap:
            zeros_halo = jnp.zeros(
                (local_graph.n_nodes - c, x_own.shape[-1]), x_own.dtype)
            xl_int = jnp.concatenate([x_own, zeros_halo], axis=0)
            m_int = spmm_sum(interior, xl_int)[:c]
            halo = halo_exchange(x_own, send_idx_p)
            xl_bnd = gather_space(x_own, halo, local_graph.n_nodes)
            m = m_int + spmm_sum(boundary, xl_bnd)[:c]
        else:
            halo = halo_exchange(x_own, send_idx_p)
            xl = gather_space(x_own, halo, local_graph.n_nodes)
            m = spmm_sum(local_graph, xl)[:c]
    else:
        raise ValueError(aggregator)
    return (
        jnp.dot(x_own, params["w_self"], preferred_element_type=jnp.float32,
                precision=matmul_precision())
        + jnp.dot(m, params["w_neigh"], preferred_element_type=jnp.float32,
                  precision=matmul_precision())
        + params["bias"]
    )


def sharded_gcn_propagate(
    local_graph: Graph, send_idx_p, x_own, in_deg_own, out_deg_own,
    norm: str = "both",
):
    """Degree-normalized propagation over a shard using *global* degrees."""
    c = x_own.shape[0]
    if norm in ("both", "left"):
        d_out = jnp.maximum(out_deg_own, 1).astype(x_own.dtype)
        scale = jax.lax.rsqrt(d_out) if norm == "both" else 1.0 / d_out
        x_own = x_own * scale[:, None]
    halo = halo_exchange(x_own, send_idx_p)
    xl = gather_space(x_own, halo, local_graph.n_nodes)
    s = spmm_sum(local_graph, xl)[:c]
    if norm in ("both", "right"):
        d_in = jnp.maximum(in_deg_own, 1).astype(x_own.dtype)
        scale = jax.lax.rsqrt(d_in) if norm == "both" else 1.0 / d_in
        s = s * scale[:, None]
    return s


def sharded_gnn32_apply(params, local_graph, send_idx_p, x_own,
                        interior=None, boundary=None,
                        degenerate: bool = False):
    """GNN32 forward on one graph shard (mirrors models.gnn32_apply)."""
    kw = dict(interior=interior, boundary=boundary, degenerate=degenerate)
    h = sharded_sage_conv(params["conv1"], local_graph, send_idx_p, x_own, **kw)
    h = jax.nn.leaky_relu(h)
    h = sharded_sage_conv(params["conv2"], local_graph, send_idx_p, h, **kw)
    h = jax.nn.leaky_relu(h)
    h = sharded_sage_conv(params["conv3"], local_graph, send_idx_p, h, **kw)
    h = jax.nn.leaky_relu(h)
    h = L.linear(params["liner1"], h)
    h = jax.nn.leaky_relu(h)
    h = L.linear(params["liner2"], h)
    return jax.nn.sigmoid(h)


def make_sharded_pallas_agg(
    pallas_local, pallas_interior, pallas_boundary, send_idx_p,
    own_rows: int, *, agg_dt=None, interpret: bool = False,
    degenerate: bool = False,
):
    """Fold-batched neighborhood aggregation for one chip's shard, running
    the grouped-CSR Pallas DMA kernels over the local gather space
    [own | halo | dummy] — the per-chip SOL SpMM inside the multi-chip
    program (north-star requirement: BASELINE.json; VERDICT r1 missing #1).

    Returns an AggFn (C, B, F) → (C, B, F) suitable for
    models.batched.sage_conv_batched.  With the interior/boundary split, the
    interior kernel has no data dependence on the all_to_all so XLA overlaps
    the halo exchange with it; partial maxima compose exactly for relu'd
    pooled inputs (interior includes the self-loop, so its row max is a real
    >= 0 value, and an empty boundary row's 0 never exceeds it; tie-split
    gradients at zero maxima die at relu' — same argument as
    sharded_sage_conv).  agg_dt=bfloat16 additionally halves both the halo
    all_to_all and every edge DMA."""
    from ..ops.pallas.spmm_kernels import pallas_spmm_max

    c = own_rows
    overlap = pallas_interior is not None and not degenerate
    n_pad_local = (pallas_interior if overlap else pallas_local).fwd.n_pad_nodes

    def agg(xp):  # (C, B', F'), stride already legal for the mode
        if agg_dt is not None:
            xp = xp.astype(agg_dt)
        if degenerate:
            # graph axis of size 1: every edge is local — no halo
            # all_to_all, no boundary pass, no partial-max merge
            z = jnp.zeros((n_pad_local - c, *xp.shape[1:]), xp.dtype)
            gs = jnp.concatenate([xp, z], axis=0)
            return pallas_spmm_max(
                pallas_local, gs, interpret=interpret)[:c].astype(jnp.float32)
        if overlap:
            z = jnp.zeros((n_pad_local - c, *xp.shape[1:]), xp.dtype)
            gs_int = jnp.concatenate([xp, z], axis=0)
            m_int = pallas_spmm_max(pallas_interior, gs_int,
                                    interpret=interpret)[:c]
            halo = halo_exchange(xp, send_idx_p)
            gs_bnd = gather_space(xp, halo, n_pad_local)
            m_bnd = pallas_spmm_max(pallas_boundary, gs_bnd,
                                    interpret=interpret)[:c]
            m = jnp.maximum(m_int, m_bnd)
        else:
            halo = halo_exchange(xp, send_idx_p)
            gs = gather_space(xp, halo, n_pad_local)
            m = pallas_spmm_max(pallas_local, gs, interpret=interpret)[:c]
        return m.astype(jnp.float32)

    agg.align = 2048 if agg_dt == jnp.bfloat16 else 1024
    return agg


# ---------------------------------------------------------------------------
# Sharded forward / train step factories.
# ---------------------------------------------------------------------------


def make_sharded_forward(mesh: Mesh, pgraph: PartitionedGraph):
    """jit'd forward: params replicated, features/output row-sharded.
    Uses overlapped interior/boundary aggregation when the partition
    carries the edge split."""
    has_overlap = pgraph.interior is not None
    degenerate = mesh.shape[GRAPH_AXIS] == 1

    def fwd_shard(local_graph, send_idx, x_own, params, *split):
        x_own = x_own[0]          # strip the size-1 'graph'-sharded lead axis
        send_idx_p = send_idx[0]
        lg = jax.tree.map(lambda a: a[0], local_graph)
        if split:
            interior = jax.tree.map(lambda a: a[0], split[0])
            boundary = jax.tree.map(lambda a: a[0], split[1])
        else:
            interior = boundary = None
        out = sharded_gnn32_apply(params, lg, send_idx_p, x_own,
                                  interior=interior, boundary=boundary,
                                  degenerate=degenerate)
        return out[None]

    extra_specs = (P(GRAPH_AXIS), P(GRAPH_AXIS)) if has_overlap else ()
    f = jax.shard_map(
        fwd_shard,
        mesh=mesh,
        in_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS), P()) + extra_specs,
        out_specs=P(GRAPH_AXIS),
    )
    extra = (pgraph.interior, pgraph.boundary) if has_overlap else ()
    # partition arrays ride as jit ARGUMENTS (closure arrays would be baked
    # as constants and constant-folded at compile — see _sharded_xla_step)
    gdata = (pgraph.local, pgraph.send_idx) + extra
    jitted = jax.jit(lambda gd, params, x_shards: f(
        gd[0], gd[1], x_shards, params, *gd[2:]
    ))
    return lambda params, x_shards: jitted(gdata, params, x_shards)


def _sharded_xla_step(mesh: Mesh, pgraph: PartitionedGraph, tx, class_weight):
    """Raw (unjitted) full training step over a ('fold', 'graph') mesh.

    Inputs (global shapes):
      params/opt_state leaves: (B_folds, ...) — sharded over 'fold';
      x/labels shards: (P, C, F) — sharded over 'graph', replicated over 'fold';
      train/val masks: (B_folds, P, C) — sharded over ('fold', 'graph').
    The masked weighted-BCE loss is psum'd over 'graph' (global mean over
    masked rows, matching train.py:89-108 on the full graph); gradients are
    psum'd over 'graph'; each fold's Adam update runs replicated within its
    fold group so fold-sharded params stay in sync.
    Returns (params, opt_state, loss (B_folds,), probs (B_folds, P, C, cls)).
    """
    w = jnp.asarray(class_weight, jnp.float32)
    has_overlap = pgraph.interior is not None
    degenerate = mesh.shape[GRAPH_AXIS] == 1

    def step_shard(local_graph, send_idx, x_own, labels_own,
                   params, opt_state, tr_mask_own, *split):
        lg = jax.tree.map(lambda a: a[0], local_graph)  # strip graph lead axis
        send_idx_p = send_idx[0]
        x = x_own[0]
        y = labels_own[0]
        tr = tr_mask_own[:, 0, :]  # (B_local, C)
        if split:
            interior = jax.tree.map(lambda a: a[0], split[0])
            boundary = jax.tree.map(lambda a: a[0], split[1])
        else:
            interior = boundary = None

        def fold_step(p, o, trm):
            def loss_fn(pp):
                probs = sharded_gnn32_apply(pp, lg, send_idx_p, x,
                                            interior=interior,
                                            boundary=boundary,
                                            degenerate=degenerate)
                m = trm.astype(probs.dtype)
                n_total = jax.lax.psum(jnp.sum(m), GRAPH_AXIS)
                wb = w[None, :]
                ll = (
                    y * jnp.log(jnp.clip(probs, 1e-9, 10.0)) * wb
                    + (1.0 - y) * jnp.log(jnp.clip(1.0 - probs, 1e-9, 10.0))
                ) / (wb + 1.0) * 2.0
                local = -jnp.sum(ll * m[:, None])
                total = jax.lax.psum(local, GRAPH_AXIS) / jnp.maximum(n_total, 1.0)
                return total, probs

            (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            grads = jax.lax.psum(grads, GRAPH_AXIS)
            updates, o = tx.update(grads, o, p)
            p = jax.tree.map(lambda a, u: a + u, p, updates)
            return p, o, loss, probs

        params_f, opt_f, loss_f, probs_f = jax.vmap(fold_step)(params, opt_state, tr)
        return params_f, opt_f, loss_f, probs_f[:, None]

    extra_specs = (P(GRAPH_AXIS), P(GRAPH_AXIS)) if has_overlap else ()
    step = jax.shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(
            P(GRAPH_AXIS),                # local graph arrays (lead axis P)
            P(GRAPH_AXIS),                # send_idx (P, P, S)
            P(GRAPH_AXIS),                # x shards (P, C, F)
            P(GRAPH_AXIS),                # label shards (P, C, cls)
            P(FOLD_AXIS),                 # params (B_folds, ...)
            P(FOLD_AXIS),                 # opt state
            P(FOLD_AXIS, GRAPH_AXIS),     # train masks (B_folds, P, C)
        ) + extra_specs,
        out_specs=(
            P(FOLD_AXIS), P(FOLD_AXIS), P(FOLD_AXIS),
            P(FOLD_AXIS, GRAPH_AXIS),
        ),
    )
    extra = (pgraph.interior, pgraph.boundary) if has_overlap else ()
    # gdata is threaded through the caller's jit as ARGUMENTS: closing over
    # the partition arrays would bake them into the executable as constants,
    # and XLA then constant-folds gathers/argmax-reduces over the padding
    # regions at compile time — minutes of HLO-evaluator time on small
    # graphs, and a bigger executable everywhere.
    gdata = (pgraph.local, pgraph.send_idx) + extra

    def call(gdata, params, opt_state, x_shards, label_shards, tr_masks):
        local, send_idx, *extra_g = gdata
        return step(
            local, send_idx, x_shards, label_shards,
            params, opt_state, tr_masks, *extra_g,
        )

    return call, gdata


def make_sharded_train_step(mesh: Mesh, pgraph: PartitionedGraph, tx, class_weight):
    """jit'd one-shot wrapper over :func:`_sharded_xla_step` (see there for
    the shapes/semantics contract)."""
    call, gdata = _sharded_xla_step(mesh, pgraph, tx, class_weight)
    jitted = jax.jit(call)
    return lambda params, opt_state, x, y, tr: jitted(
        gdata, params, opt_state, x, y, tr)


def _sharded_pallas_step(
    mesh: Mesh, pgraph: PartitionedGraph, tx, class_weight,
    *, agg_dt=None, interpret: bool = False,
):
    """Raw (unjitted) full training step over a ('fold', 'graph') mesh with
    the per-chip fold-batched Pallas SpMM kernels as the aggregation engine —
    the fast single-chip path (ops/pallas) and the edge-partitioned
    multi-chip path (this module) in ONE program.

    Same contract as _sharded_xla_step, except each chip's fold group
    is packed into the feature layout (models/batched.py) instead of
    vmapped, so one edge DMA serves all local folds:
      params/opt leaves (B_folds, ...) sharded over 'fold';
      x/labels shards (P, C, F); train masks (B_folds, P, C).
    Requires pgraph built with pallas_rows_per_block (see
    parallel.partition.partition_graph).
    """
    from ..models.batched import gnn32_apply_batched

    assert pgraph.pallas_local is not None, (
        "build the partition with pallas_rows_per_block to use the pallas "
        "sharded step"
    )
    w = jnp.asarray(class_weight, jnp.float32)
    has_overlap = pgraph.pallas_interior is not None
    degenerate = mesh.shape[GRAPH_AXIS] == 1
    c_rows = pgraph.own_rows

    def step_shard(pal_local, pal_int, pal_bnd, send_idx, x_own, labels_own,
                   params, opt_state, tr_mask_own):
        send_idx_p = send_idx[0]
        x = x_own[0]                      # (C, F)
        y = labels_own[0]                 # (C, cls)
        tr = tr_mask_own[:, 0, :]         # (B_local, C)
        pal_local_ = jax.tree.map(lambda a: a[0], pal_local)
        pal_int_ = (jax.tree.map(lambda a: a[0], pal_int)
                    if has_overlap else None)
        pal_bnd_ = (jax.tree.map(lambda a: a[0], pal_bnd)
                    if has_overlap else None)
        agg = make_sharded_pallas_agg(
            pal_local_, pal_int_, pal_bnd_, send_idx_p, c_rows,
            agg_dt=agg_dt, interpret=interpret, degenerate=degenerate,
        )

        def loss_fn(p):
            probs_nbc = gnn32_apply_batched(p, agg, x)   # (C, B_local, cls)
            probs = jnp.moveaxis(probs_nbc, 1, 0)        # (B_local, C, cls)
            m = tr.astype(probs.dtype)                   # (B_local, C)
            n_total = jax.lax.psum(jnp.sum(m, axis=1), GRAPH_AXIS)  # (B,)
            wb = w[None, None, :]
            ll = (
                y[None] * jnp.log(jnp.clip(probs, 1e-9, 10.0)) * wb
                + (1.0 - y[None]) * jnp.log(jnp.clip(1.0 - probs, 1e-9, 10.0))
            ) / (wb + 1.0) * 2.0
            local = -jnp.sum(ll * m[:, :, None], axis=(1, 2))   # (B,)
            losses = jax.lax.psum(local, GRAPH_AXIS) / jnp.maximum(n_total, 1.0)
            # per-fold params are independent: grad of the sum = per-fold grads
            return jnp.sum(losses), (losses, probs)

        (_, (losses, probs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.lax.psum(grads, GRAPH_AXIS)
        # per-fold Adam states (vmapped init convention, count (B,)) so the
        # opt state round-trips through the fold-sharded in/out specs
        updates, opt_state = jax.vmap(tx.update)(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        return params, opt_state, losses, probs[:, None]

    step = jax.shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(
            P(GRAPH_AXIS),                # pallas local (stacked PallasGraph)
            P(GRAPH_AXIS) if has_overlap else P(),
            P(GRAPH_AXIS) if has_overlap else P(),
            P(GRAPH_AXIS),                # send_idx (P, P, S)
            P(GRAPH_AXIS),                # x shards (P, C, F)
            P(GRAPH_AXIS),                # label shards (P, C, cls)
            P(FOLD_AXIS),                 # params (B_folds, ...)
            P(FOLD_AXIS),                 # opt state
            P(FOLD_AXIS, GRAPH_AXIS),     # train masks (B_folds, P, C)
        ),
        out_specs=(
            P(FOLD_AXIS), P(FOLD_AXIS), P(FOLD_AXIS),
            P(FOLD_AXIS, GRAPH_AXIS),
        ),
        # pallas_call outputs carry no varying-mesh-axes metadata; skip the
        # vma check (shardings are still enforced by the in/out specs).
        check_vma=False,
    )
    pal_int = pgraph.pallas_interior if has_overlap else 0
    pal_bnd = pgraph.pallas_boundary if has_overlap else 0
    # threaded as jit arguments by the caller — see _sharded_xla_step's note
    # on constant baking
    gdata = (pgraph.pallas_local, pal_int, pal_bnd, pgraph.send_idx)

    def call(gdata, params, opt_state, x_shards, label_shards, tr_masks):
        pal_local, p_int, p_bnd, send_idx = gdata
        return step(
            pal_local, p_int, p_bnd, send_idx,
            x_shards, label_shards, params, opt_state, tr_masks,
        )

    return call, gdata


def make_sharded_pallas_train_step(
    mesh: Mesh, pgraph: PartitionedGraph, tx, class_weight,
    *, agg_dt=None, interpret: bool = False,
):
    """jit'd one-shot wrapper over :func:`_sharded_pallas_step` (see there
    for the shapes/semantics contract)."""
    call, gdata = _sharded_pallas_step(
        mesh, pgraph, tx, class_weight, agg_dt=agg_dt, interpret=interpret)
    jitted = jax.jit(call)
    return lambda params, opt_state, x, y, tr: jitted(
        gdata, params, opt_state, x, y, tr)


# ---------------------------------------------------------------------------
# Production multi-chip training runner (engine contract).
# ---------------------------------------------------------------------------


def make_sharded_fold_runner(
    mesh: Mesh, pgraph: PartitionedGraph, feats, labels, class_weight, cfg,
    val_width=None,
):
    """Multi-epoch, multi-fold training runner over a ('fold', 'graph') mesh
    with the SAME contract as ``train.engine.make_fold_runner`` — the
    production edge-partitioned training loop (reference contract:
    train.py:141-358; VERDICT r2 missing #2).

    One jit'd program scans all epochs: each epoch runs the shard_map'd
    train step (halo all_to_all + psum'd loss/grads; XLA or per-chip Pallas
    aggregation per ``cfg.spmm_impl``), then computes val loss, adaptive
    threshold, AIM/COV/mlACC and sampled AUC on the *global* (still
    graph-sharded) probability array with plain jnp ops — XLA's SPMD
    partitioner inserts the collectives, and the values are identical to the
    single-chip engine's because the functions are the same.

    feats/labels: (n_real, F) / (n_real, cls) unsharded host arrays.
    run(params_batch, opt_batch, train_masks, val_masks, alpha, n_epochs):
      masks arrive in the engine's single-chip row layout (B, N_any >=
      n_real); they are re-laid out to the partition's (P, C) owner blocks.
      B must be a multiple of the mesh's fold-axis size.
    Returns (params, opt, probs (B, P*C, cls), history) — history leaves
    (B, E), identical keys to the single-chip runners, so the engine's
    artifact writers work unchanged.
    """
    import optax

    from ..train.losses import multi_loss
    from ..train.metrics import (
        aim_cov_acc, macro_auc, macro_f1, micro_auc, micro_f1)
    from ..train.postprocess import protein_loc_correction
    from .partition import shard_features

    p, c = pgraph.n_chips, pgraph.own_rows
    n_rows = p * c
    n_real = pgraph.n_real_nodes
    n_fold_ax = mesh.shape[FOLD_AXIS]
    tx = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    w = jnp.asarray(class_weight, jnp.float32)
    v_pad = int(val_width or n_rows)
    auc_every = max(int(getattr(cfg, "auc_every", 1) or 1), 1)

    if cfg.spmm_impl == "pallas":
        from ..utils.precision import aggregation_dtype

        step, gdata = _sharded_pallas_step(
            mesh, pgraph, tx, class_weight,
            agg_dt=aggregation_dtype(), interpret=cfg.pallas_interpret,
        )
    else:
        step, gdata = _sharded_xla_step(mesh, pgraph, tx, class_weight)

    # Multi-process (multi-host) mode: every process runs this same program
    # over the GLOBAL mesh (jax.distributed.initialize fuses the device
    # sets).  All host-side inputs are kept as numpy/uncommitted values —
    # each process holds the identical full copy, which multi-controller
    # jit accepts as implicitly-replicated global inputs; committing them to
    # a process-local device first would make them single-process arrays
    # the global computation rejects.  Outputs are replicated (out_shardings
    # below) so every process can fetch them and the engine's process-0
    # artifact writer sees the full result (VERDICT r4 next-step 3).
    multiprocess = jax.process_count() > 1
    _asarray = np.asarray if multiprocess else jnp.asarray

    feats = np.asarray(feats, np.float32)[:n_real]
    labels = np.asarray(labels, np.float32)[:n_real]
    x_shards = _asarray(shard_features(feats, pgraph))
    y_shards = _asarray(shard_features(labels, pgraph))
    # Balanced partitions interleave padding rows per block; validity and all
    # node-indexed inputs/outputs go through the permutation tables.
    balanced = pgraph.row_map is not None
    row_map = pgraph.row_map if balanced else None
    node_valid = (row_map >= 0) if balanced else jnp.arange(n_rows) < n_real

    def epoch_step(gd, x_sh, y_sh, labels_g, carry, e_idx, total_epochs):
        params, opt_state, tr_s, va_g, alpha, last_auc = carry
        params, opt_state, train_losses, probs_s = step(
            gd, params, opt_state, x_sh, y_sh, tr_s)
        nb = train_losses.shape[0]
        probs = probs_s.reshape(nb, n_rows, labels_g.shape[-1])
        val_losses = jax.vmap(
            lambda pr, m: multi_loss(pr, labels_g, m, w))(probs, va_g)
        preds = jax.vmap(
            lambda pr: protein_loc_correction(pr, alpha, node_valid))(probs)
        tr_g = tr_s.reshape(nb, n_rows)
        tr_m = jax.vmap(lambda pd, m: aim_cov_acc(labels_g, pd, m))(preds, tr_g)
        va_m = jax.vmap(lambda pd, m: aim_cov_acc(labels_g, pd, m))(preds, va_g)
        va_f1 = jax.vmap(
            lambda pd, m: (micro_f1(labels_g, pd, m), macro_f1(labels_g, pd, m))
        )(preds, va_g)
        metrics = {
            "train": {"aim": tr_m[0], "cov": tr_m[1], "acc": tr_m[2],
                      "loss": train_losses},
            "val": {"aim": va_m[0], "cov": va_m[1], "acc": va_m[2],
                    "loss": val_losses,
                    "f1_micro": va_f1[0], "f1_macro": va_f1[1]},
            "pred_num": jax.vmap(
                lambda pd: jnp.sum(
                    jnp.where(node_valid[:, None], pd, 0.0), axis=0
                ).astype(jnp.int32)
            )(preds),
        }
        if cfg.compute_auc:
            # same cadence/cond structure as the single-chip runners: the
            # predicate is fold-independent, so off epochs skip the sort
            def calc_all(_):
                def one(pr, m):
                    sel = jnp.argsort(1 - m.astype(jnp.int32))[:v_pad]
                    valid = jnp.arange(v_pad) < jnp.sum(m)
                    return (micro_auc(pr[sel], labels_g[sel], valid),
                            macro_auc(pr[sel], labels_g[sel], valid))

                return jax.vmap(one)(probs, va_g)

            from ..train.engine import _auc_sample_now

            last_auc = jax.lax.cond(
                _auc_sample_now(e_idx, total_epochs, auc_every), calc_all,
                lambda _: last_auc, 0)
            metrics["val"]["auc_micro"] = last_auc[0]
            metrics["val"]["auc_macro"] = last_auc[1]
        return (params, opt_state, tr_s, va_g, alpha, last_auc), (metrics, probs)

    if multiprocess:
        # graph/partition arrays were built as (uncommitted) device arrays;
        # hand multi-controller jit plain numpy so they read as replicated
        gdata = jax.tree.map(np.asarray, gdata)

    def _run_impl(gd, x_sh, y_sh, params, opt_state, tr_s, va_g, alpha,
                  epoch_offset, total_epochs, n_epochs):
        labels_g = y_sh.reshape(n_rows, y_sh.shape[-1])
        nb = tr_s.shape[0]
        probs0 = jnp.zeros((nb, n_rows, y_sh.shape[-1]), jnp.float32)
        auc0 = (jnp.full((nb,), 0.5, jnp.float32),
                jnp.full((nb,), 0.5, jnp.float32))

        def body(carry, x):
            state, _ = carry
            state, (metrics, probs) = epoch_step(
                gd, x_sh, y_sh, labels_g, state, x, total_epochs)
            return (state, probs), metrics

        (state, last_probs), history = jax.lax.scan(
            body,
            ((params, opt_state, tr_s, va_g, alpha, auc0), probs0),
            jnp.arange(n_epochs) + epoch_offset,  # GLOBAL epoch indices
        )
        history = jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1), history)
        return state[0], state[1], last_probs, history

    if multiprocess:
        # replicate every output so each process can read the full result
        # (device_get on a fully-replicated global array uses its local copy)
        run_impl = jax.jit(
            _run_impl, static_argnames=("n_epochs",),
            out_shardings=jax.sharding.NamedSharding(mesh, P()))
    else:
        run_impl = jax.jit(_run_impl, static_argnames=("n_epochs",))

    def run(params_batch, opt_batch, train_masks, val_masks, alpha,
            n_epochs=None, epoch_offset: int = 0, total_epochs=None):
        if opt_batch is None:
            opt_batch = jax.vmap(tx.init)(params_batch)
        if multiprocess:
            # numpy in, so every process presents identical replicated
            # inputs (chunk 2+ feeds back the replicated global outputs,
            # which are equally valid — this also covers fresh host inits)
            params_batch = jax.tree.map(np.asarray, params_batch)
            opt_batch = jax.tree.map(np.asarray, opt_batch)
        b = jax.tree.leaves(params_batch)[0].shape[0]
        assert b % n_fold_ax == 0, (
            f"fold batch {b} must be a multiple of the mesh fold axis "
            f"{n_fold_ax} (the engine pads job chunks to guarantee this)"
        )

        def to_rows(m):
            m = np.asarray(m)[:, :n_real]
            if balanced:
                rm = np.asarray(row_map)
                return np.where(rm[None, :] >= 0,
                                m[:, np.maximum(rm, 0)], False)
            pad = n_rows - n_real
            return np.pad(m, ((0, 0), (0, pad))) if pad else m

        tr_s = _asarray(to_rows(train_masks).reshape(b, p, c))
        va_g = _asarray(to_rows(val_masks))
        n_run = n_epochs or cfg.epoch_num
        params_batch, opt_batch, probs, history = run_impl(
            gdata, x_shards, y_shards, params_batch, opt_batch,
            tr_s, va_g, np.float32(alpha), np.int32(epoch_offset),
            np.int32(total_epochs or (epoch_offset + n_run)),
            n_epochs=n_run)
        if balanced:
            # restore the engine's node-id row order (rows past n_real are
            # padding the engine never reads); numpy-side so it works on
            # replicated multi-process outputs too
            gather = np.concatenate([
                np.asarray(pgraph.node_row),
                np.zeros(n_rows - n_real, np.int32),
            ])
            probs = np.asarray(jax.device_get(probs))[:, gather]
        return params_batch, opt_batch, probs, history

    run.init_opt = lambda pb: jax.vmap(tx.init)(pb)
    return run, tx
