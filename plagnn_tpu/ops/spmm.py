"""Sparse neighborhood-aggregation ops (SpMM / SDDMM) for TPU.

These replace DGL's generalized SpMM C++/CUDA kernels that the reference
invokes through ``SAGEConv('pool')`` — ``update_all(copy_u, max)`` — and
through GCN-style propagation (/root/reference/code/model.py:13-15; SURVEY.md
§2.2).  Reduction semantics match DGL 0.8.x:

* ``spmm_max``:  ``out[i] = max_{j ∈ N_in(i)} x[j]``, 0 for empty rows.
* ``spmm_sum``:  ``out[i] = Σ_{j ∈ N_in(i)} (v_ji ·) x[j]``.
* ``spmm_mean``: sum / in-degree.
* ``gcn_propagate``: symmetric-normalized propagation
  ``D^{-1/2} A D^{-1/2} x`` (DGL GraphConv ``norm='both'``).
* ``sddmm_dot``: per-edge ``<x[src], y[dst]>`` (attention scores etc.).

Every op is scatter-free on TPU: forwards are gather + dense reduce over the
bucketed ELL (see ``graph_format.MultiEll``); backwards are the same pattern
over the transpose ELL via ``jax.custom_vjp`` (the max VJP scatters gradients
to the recorded argmax source, reproducing DGL's GSpMM autograd bridge,
SURVEY.md §2.2 "DGL autograd bridge").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .graph_format import Graph, MultiEll

_NEG_INF = -jnp.inf


# ---------------------------------------------------------------------------
# Core bucketed-ELL reductions (no scatter).
# ---------------------------------------------------------------------------


def _extend_and_gather(ell: MultiEll, parts, split_combine, zeros_like_row):
    """Concatenate block partials, combine split-node partials, and gather
    the per-node rows (scatter-free assembly)."""
    p = jnp.concatenate(parts, axis=0)  # (R_total, F)
    sp_idx = ell.split_part_idx  # (S, C)
    sp_valid = sp_idx >= 0
    sp = p[jnp.maximum(sp_idx, 0)]  # (S, C, F)
    combined = split_combine(sp, sp_valid[..., None])  # (S, F)
    zeros = zeros_like_row[None]  # (1, F)
    ext = jnp.concatenate([p, combined, zeros], axis=0)
    return ext[ell.gather_perm]


def ell_reduce_max(
    ell: MultiEll, x: jax.Array, *, with_argmax: bool = False,
    empty_value: float = 0.0,
):
    """Max-reduce source features over the bucketed ELL.

    Returns ``(out, argsrc)`` where ``argsrc[i, f]`` is the source node id
    achieving the max (first hit on ties; -1 where the row is empty).
    ``empty_value`` fills empty rows (0 = DGL semantics; −inf for partial
    reductions that are max-combined later, e.g. halo overlap).
    """
    f = x.shape[-1]
    parts, argparts = [], []
    for blk in ell.blocks:
        valid = blk.idx >= 0
        g = x[jnp.maximum(blk.idx, 0)]  # (R, W, F)
        g = jnp.where(valid[..., None], g, _NEG_INF)
        parts.append(jnp.max(g, axis=1))
        if with_argmax:
            # First-max source via argmax + slot-compare + masked sum; a
            # take_along_axis here lowers to a pathologically slow TPU
            # gather (>10x the cost of the whole reduce).
            am = jnp.argmax(g, axis=1)  # (R, F) slot ids, first max
            iota = jnp.arange(blk.width, dtype=am.dtype)
            eqslot = am[:, None, :] == iota[None, :, None]
            src_at = jnp.sum(
                jnp.where(eqslot, blk.idx[:, :, None], 0), axis=1
            )  # (R, F)
            argparts.append(src_at)

    def combine_max(sp, valid):
        return jnp.max(jnp.where(valid, sp, _NEG_INF), axis=1)

    fill = jnp.full((f,), empty_value, x.dtype)
    out = _extend_and_gather(ell, parts, combine_max, fill)
    if not with_argmax:
        return out, None

    # Combine argmax the same way: pick the partial achieving the max.
    p = jnp.concatenate(parts, axis=0)
    a = jnp.concatenate(argparts, axis=0)
    sp_idx = ell.split_part_idx
    sp_valid = (sp_idx >= 0)[..., None]
    sp = jnp.where(sp_valid, p[jnp.maximum(sp_idx, 0)], _NEG_INF)  # (S, C, F)
    sel = jnp.argmax(sp, axis=1)  # (S, F)
    sa = a[jnp.maximum(sp_idx, 0)]  # (S, C, F)
    c = sp.shape[1]
    iota_c = jnp.arange(c, dtype=sel.dtype)
    eqslot_c = sel[:, None, :] == iota_c[None, :, None]
    comb_arg = jnp.sum(jnp.where(eqslot_c, sa, 0), axis=1)
    neg1 = jnp.full((1, f), -1, jnp.int32)
    ext_a = jnp.concatenate([a, comb_arg, neg1], axis=0)
    argsrc = ext_a[ell.gather_perm]
    return out, argsrc


def ell_reduce_sum(
    ell: MultiEll, x: jax.Array, *, use_val: bool = False
) -> jax.Array:
    """Sum-reduce (optionally edge-value-weighted) source features."""
    f = x.shape[-1]
    parts = []
    for blk in ell.blocks:
        valid = blk.idx >= 0
        g = x[jnp.maximum(blk.idx, 0)]  # (R, W, F)
        if use_val:
            if blk.val is None:
                raise ValueError("graph has no edge values")
            g = g * blk.val[..., None]
        g = jnp.where(valid[..., None], g, 0.0)
        parts.append(jnp.sum(g, axis=1))

    def combine_sum(sp, valid):
        return jnp.sum(jnp.where(valid, sp, 0.0), axis=1)

    zeros = jnp.zeros((f,), x.dtype)
    return _extend_and_gather(ell, parts, combine_sum, zeros)


def ell_masked_sum_eq(
    ell: MultiEll, g: jax.Array, argsrc: jax.Array
) -> jax.Array:
    """Backward helper for max: for each node s (a row of the transpose ELL),
    sum g[n, f] over out-neighbors n where ``argsrc[n, f] == s``."""
    f = g.shape[-1]
    parts = []
    for blk in ell.blocks:
        valid = blk.idx >= 0  # (R, W)
        safe = jnp.maximum(blk.idx, 0)
        gn = g[safe]  # (R, W, F)
        an = argsrc[safe]  # (R, W, F)
        hit = an == blk.rows[:, None, None]
        gn = jnp.where(hit & valid[..., None], gn, 0.0)
        parts.append(jnp.sum(gn, axis=1))

    def combine_sum(sp, valid):
        return jnp.sum(jnp.where(valid, sp, 0.0), axis=1)

    zeros = jnp.zeros((f,), g.dtype)
    return _extend_and_gather(ell, parts, combine_sum, zeros)


# ---------------------------------------------------------------------------
# Public ops with custom VJPs.
# ---------------------------------------------------------------------------


def spmm_max(graph: Graph, x: jax.Array, empty_value: float = 0.0) -> jax.Array:
    """``out[i] = max_{j ∈ N_in(i)} x[j]`` (``empty_value`` for empty
    neighborhoods; 0 matches DGL's ``update_all(fn.copy_u, fn.max)`` — the
    hottest kernel of the reference's forward pass, SURVEY.md §3.1; −inf
    yields a partial reduction that max-combines exactly).  The VJP scatters
    each output gradient to its recorded argmax source, routed through the
    transpose ELL so the backward pass is also scatter-free.
    """

    @jax.custom_vjp
    def _f(x):
        out, _ = ell_reduce_max(graph.ell, x, empty_value=empty_value)
        return out

    def _fwd(x):
        out, argsrc = ell_reduce_max(
            graph.ell, x, with_argmax=True, empty_value=empty_value)
        return out, argsrc

    def _bwd(argsrc, g):
        # For each source s, gather its out-neighbors' grads and keep those
        # whose argmax is s.
        return (ell_masked_sum_eq(graph.ell_t, g, argsrc),)

    _f.defvjp(_fwd, _bwd)
    return _f(x)


def spmm_sum(graph: Graph, x: jax.Array, use_val: bool = False) -> jax.Array:
    """``out[i] = Σ_{j ∈ N_in(i)} v_ji · x[j]`` (v = 1 when ``use_val`` is
    False).  Edge values are treated as constants (no gradient).  The VJP is
    the same weighted sum over the transpose ELL."""

    @jax.custom_vjp
    def _f(x):
        return ell_reduce_sum(graph.ell, x, use_val=use_val)

    def _fwd(x):
        return ell_reduce_sum(graph.ell, x, use_val=use_val), None

    def _bwd(_, g):
        return (ell_reduce_sum(graph.ell_t, g, use_val=use_val),)

    _f.defvjp(_fwd, _bwd)
    return _f(x)


def spmm_mean(graph: Graph, x: jax.Array) -> jax.Array:
    """Mean aggregation: sum / in-degree (degree-0 rows stay 0)."""
    s = spmm_sum(graph, x)
    deg = jnp.maximum(graph.in_degree, 1).astype(x.dtype)
    return s / deg[:, None]


def gcn_propagate(graph: Graph, x: jax.Array, norm: str = "both") -> jax.Array:
    """Degree-normalized GCN propagation (DGL GraphConv semantics).

    norm='both':  D_out^{-1/2} applied to sources, D_in^{-1/2} to outputs.
    norm='right': divide by in-degree (mean).
    norm='left':  divide sources by out-degree.
    norm='none':  plain sum.
    """
    if norm == "both":
        d_out = jnp.maximum(graph.out_degree, 1).astype(x.dtype)
        x = x * jax.lax.rsqrt(d_out)[:, None]
    elif norm == "left":
        d_out = jnp.maximum(graph.out_degree, 1).astype(x.dtype)
        x = x / d_out[:, None]
    s = spmm_sum(graph, x)
    if norm == "both":
        d_in = jnp.maximum(graph.in_degree, 1).astype(x.dtype)
        s = s * jax.lax.rsqrt(d_in)[:, None]
    elif norm == "right":
        d_in = jnp.maximum(graph.in_degree, 1).astype(x.dtype)
        s = s / d_in[:, None]
    return s


def sddmm_dot(graph: Graph, x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-edge dot products ``e = <x[src_e], y[dst_e]>`` over the padded,
    dst-sorted edge list (padded edges produce the dummy-node product)."""
    return jnp.sum(x[graph.src] * y[graph.dst], axis=-1)


# ---------------------------------------------------------------------------
# Plain segment-op reference implementations (for correctness diffing only —
# they lower to XLA scatters and are NOT the TPU hot path).
# ---------------------------------------------------------------------------


def segment_spmm_max(graph: Graph, x: jax.Array) -> jax.Array:
    # Padded edges all point dummy→dummy; mask them so the dummy row stays 0.
    valid = (jnp.arange(graph.n_pad_edges) < graph.n_edges)[:, None]
    msgs = jnp.where(valid, x[graph.src], _NEG_INF)
    out = jax.ops.segment_max(
        msgs, graph.dst, num_segments=graph.n_nodes, indices_are_sorted=True
    )
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_spmm_sum(graph: Graph, x: jax.Array) -> jax.Array:
    # Padded edges all point dummy→dummy; mask them so the dummy row stays 0.
    valid = (jnp.arange(graph.n_pad_edges) < graph.n_edges)[:, None]
    msgs = jnp.where(valid, x[graph.src], 0.0)
    return jax.ops.segment_sum(
        msgs, graph.dst, num_segments=graph.n_nodes, indices_are_sorted=True
    )
