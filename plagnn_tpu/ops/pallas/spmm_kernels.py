"""Pallas TPU kernels: fold-batched segment-max/sum SpMM over blocked CSR.

Why a custom kernel: XLA's row gather on TPU is *latency-bound* (~10 ns per
gathered row regardless of row width — measured on v5e), so the ensemble
workload (10 CV folds × full-graph aggregation, train.py:162-195) pays the
per-row cost once per fold.  These kernels stream ONE DMA per edge covering
the features of ALL folds at once (node stride B·F, 1024-f32 aligned for
Mosaic's 1-D tiling), turning the aggregation bandwidth-bound and amortizing
the per-edge scalar work across the fold batch.

Layout:
  x:    (N_pad, B, F_pad) float32, viewed by the kernel as
        (N_pad·8, B·F_pad/8) so that one node row is an 8-sublane-aligned
        (8, lanes) tile slice (Mosaic's DMA alignment rule); the node stride
        B·F_pad must be a multiple of 1024 (even B with F_pad=512, or
        F_pad=1024 for B=1).
  CSR:  edges sorted by destination, grouped into destination-row blocks of
        R rows; each block's edge list is padded to a multiple of T_E=1024
        (padded edges point at the dummy node and carry dst_local=R, which
        the accumulate predicate skips).

Forward max also records the argmax *source node id* per (node, fold,
feature) — strict-> updates keep the FIRST maximum in (dst, src) sorted
order, matching DGL's tie behavior and the XLA path.  The backward masked
sum runs the same structure over the transpose blocked CSR.

Replaces (TPU-natively) the libdgl gspmm(copy_lhs, max) CUDA kernel invoked
by the reference through SAGEConv('pool') — SURVEY.md §2.2.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_E = 1024          # edges per index chunk (matches int32 1-D tile)
NBUF = 16           # feature-row DMAs in flight
DEFAULT_R = 128     # destination rows per block


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["blk_ptr", "src", "dst_local"],
    meta_fields=["n_blocks", "rows_per_block", "n_pad_nodes", "n_edges"],
)
@dataclasses.dataclass(frozen=True)
class BlockedCsr:
    """Destination-blocked, chunk-padded CSR (host product)."""

    blk_ptr: jax.Array     # (n_blocks + 1,) int32, multiples of T_E
    src: jax.Array         # (E_pad,) int32 source node ids (dummy for pad)
    dst_local: jax.Array   # (E_pad,) int32 dst row within block (R for pad)
    n_blocks: int
    rows_per_block: int
    n_pad_nodes: int
    n_edges: int


def build_blocked_csr(
    src: np.ndarray,
    dst: np.ndarray,
    n_pad_nodes: int,
    rows_per_block: int = DEFAULT_R,
) -> BlockedCsr:
    """Group (sorted-by-dst) edges into R-row destination blocks, padding
    each block's edge list to a multiple of T_E."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    r = rows_per_block
    assert n_pad_nodes % r == 0, "pad node count to a multiple of rows_per_block"
    n_blocks = n_pad_nodes // r
    blk_of = dst // r
    counts = np.bincount(blk_of, minlength=n_blocks)
    padded = np.maximum(_round_up(1, T_E), ((counts + T_E - 1) // T_E) * T_E)
    padded[counts == 0] = T_E  # every block gets ≥1 chunk (simplifies grid)
    blk_ptr = np.zeros(n_blocks + 1, np.int64)
    np.cumsum(padded, out=blk_ptr[1:])
    e_pad = int(blk_ptr[-1])

    dummy = n_pad_nodes - 1
    src_p = np.full(e_pad, dummy, np.int32)
    dstl_p = np.full(e_pad, r, np.int32)  # R ⇒ skip
    starts = np.zeros(n_blocks, np.int64)
    starts[:] = blk_ptr[:-1]
    pos = starts[blk_of] + (np.arange(len(src)) - np.concatenate(
        [[0], np.cumsum(counts)])[blk_of])
    src_p[pos] = src
    dstl_p[pos] = dst - blk_of * r

    return BlockedCsr(
        blk_ptr=jnp.asarray(blk_ptr, jnp.int32),
        src=jnp.asarray(src_p),
        dst_local=jnp.asarray(dstl_p),
        n_blocks=n_blocks,
        rows_per_block=r,
        n_pad_nodes=n_pad_nodes,
        n_edges=len(src),
    )


def _spmm_kernel(
    blk_ptr_ref,          # scalar prefetch (n_blocks+1,)
    src_hbm, dstl_hbm, x_hbm,     # ANY inputs
    out_ref,              # (R, S) VMEM output block
    arg_ref,              # (R, S) int32 VMEM output block (argmax) or None
    acc, argacc, ring, idx_src, idx_dstl, sems, idx_sems,
    *, reduce: str, with_argmax: bool, stride: int, r: int,
):
    i = pl.program_id(0)
    e0 = blk_ptr_ref[i]
    e1 = blk_ptr_ref[i + 1]
    n_chunks = (e1 - e0) // T_E
    neg = jnp.float32(-jnp.inf) if reduce == "max" else jnp.float32(0.0)
    acc[...] = jnp.full(acc.shape, neg, jnp.float32)
    if with_argmax:
        argacc[...] = jnp.full(argacc.shape, -1, jnp.int32)

    def row_dma(slot, e_global_srcid):
        start = pl.multiple_of(e_global_srcid * 8, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, 8)], ring.at[slot], sems.at[slot]
        )

    def chunk_body(c, _):
        base = e0 + c * T_E
        # Fetch this chunk's edge indices into SMEM.
        cp_s = pltpu.make_async_copy(
            src_hbm.at[pl.ds(pl.multiple_of(base, T_E), T_E)],
            idx_src, idx_sems.at[0])
        cp_d = pltpu.make_async_copy(
            dstl_hbm.at[pl.ds(pl.multiple_of(base, T_E), T_E)],
            idx_dstl, idx_sems.at[1])
        cp_s.start()
        cp_d.start()
        cp_s.wait()
        cp_d.wait()

        def warm(k, _):
            row_dma(k, idx_src[k]).start()
            return 0

        jax.lax.fori_loop(0, NBUF, warm, 0)

        def edge(k, _):
            slot = k % NBUF
            row_dma(slot, idx_src[k]).wait()
            d = idx_dstl[k]

            @pl.when(d < r)
            def _():
                row = ring[slot]
                d8 = pl.multiple_of(d * 8, 8)
                cur = acc[pl.ds(d8, 8), :]
                if reduce == "max":
                    if with_argmax:
                        upd = row > cur
                        s_id = idx_src[k]
                        cur_arg = argacc[pl.ds(d8, 8), :]
                        argacc[pl.ds(d8, 8), :] = jnp.where(upd, s_id, cur_arg)
                    acc[pl.ds(d8, 8), :] = jnp.maximum(cur, row)
                else:
                    acc[pl.ds(d8, 8), :] = cur + row

            @pl.when(k + NBUF < T_E)
            def _():
                row_dma(slot, idx_src[k + NBUF]).start()
            return 0

        # Every in-flight DMA is waited by its own edge iteration (edge k
        # waits slot k%NBUF; starts are gated by k+NBUF < T_E), so nothing
        # is outstanding at chunk end.
        jax.lax.fori_loop(0, T_E, edge, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    if reduce == "max":
        out_ref[...] = jnp.where(jnp.isfinite(acc[...]), acc[...], 0.0)
    else:
        out_ref[...] = acc[...]
    if with_argmax:
        arg_ref[...] = argacc[...]


def _run_spmm(
    blocked: BlockedCsr, x: jax.Array, *, reduce: str, with_argmax: bool,
    interpret: bool = False,
):
    n_pad, b, f_pad = x.shape
    stride = b * f_pad
    assert stride % 1024 == 0, (
        f"fold-batch×features ({b}×{f_pad}) must be a multiple of 1024"
    )
    lane = stride // 8
    r = blocked.rows_per_block
    x_flat = x.reshape(n_pad * 8, lane)

    out_shapes = [jax.ShapeDtypeStruct((n_pad * 8, lane), jnp.float32)]
    out_specs = [pl.BlockSpec((r * 8, lane), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM)]
    if with_argmax:
        out_shapes.append(jax.ShapeDtypeStruct((n_pad * 8, lane), jnp.int32))
        out_specs.append(pl.BlockSpec((r * 8, lane), lambda i, *_: (i, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _spmm_kernel if with_argmax else _spmm_kernel_noarg_adapter,
        reduce=reduce, with_argmax=with_argmax, stride=stride, r=r,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(blocked.n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(out_specs) if with_argmax else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((r * 8, lane), jnp.float32),
            pltpu.VMEM((r * 8, lane), jnp.int32)
            if with_argmax else pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((NBUF, 8, lane), jnp.float32),
            pltpu.SMEM((T_E,), jnp.int32),
            pltpu.SMEM((T_E,), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes) if with_argmax else out_shapes[0],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    res = fn(blocked.blk_ptr, blocked.src, blocked.dst_local, x_flat)
    if with_argmax:
        out, arg = res
        return out.reshape(n_pad, b, f_pad), arg.reshape(n_pad, b, f_pad)
    return res.reshape(n_pad, b, f_pad)


def _spmm_kernel_noarg_adapter(
    blk_ptr_ref, src_hbm, dstl_hbm, x_hbm, out_ref,
    acc, argacc, ring, idx_src, idx_dstl, sems, idx_sems, **kw,
):
    _spmm_kernel(
        blk_ptr_ref, src_hbm, dstl_hbm, x_hbm, out_ref, None,
        acc, argacc, ring, idx_src, idx_dstl, sems, idx_sems, **kw,
    )


def _masked_bwd_kernel(
    blk_ptr_ref,
    dst_hbm, srcl_hbm, g_hbm, arg_hbm,
    dx_ref,
    acc, ring_g, ring_a, idx_dst, idx_srcl, sems_g, sems_a, idx_sems,
    *, stride: int, r: int,
):
    """dx[s] = Σ_{edges s→n} where(argsrc[n] == s, g[n], 0) over the
    transpose blocked CSR (blocks of source rows)."""
    i = pl.program_id(0)
    e0 = blk_ptr_ref[i]
    e1 = blk_ptr_ref[i + 1]
    n_chunks = (e1 - e0) // T_E
    acc[...] = jnp.zeros(acc.shape, jnp.float32)
    base_node = i * r

    def g_dma(slot, node):
        start = pl.multiple_of(node * 8, 8)
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(start, 8)], ring_g.at[slot], sems_g.at[slot])

    def a_dma(slot, node):
        start = pl.multiple_of(node * 8, 8)
        return pltpu.make_async_copy(
            arg_hbm.at[pl.ds(start, 8)], ring_a.at[slot], sems_a.at[slot])

    def chunk_body(c, _):
        base = e0 + c * T_E
        cp_s = pltpu.make_async_copy(
            dst_hbm.at[pl.ds(pl.multiple_of(base, T_E), T_E)],
            idx_dst, idx_sems.at[0])
        cp_d = pltpu.make_async_copy(
            srcl_hbm.at[pl.ds(pl.multiple_of(base, T_E), T_E)],
            idx_srcl, idx_sems.at[1])
        cp_s.start()
        cp_d.start()
        cp_s.wait()
        cp_d.wait()

        def warm(k, _):
            g_dma(k, idx_dst[k]).start()
            a_dma(k, idx_dst[k]).start()
            return 0

        jax.lax.fori_loop(0, NBUF, warm, 0)

        def edge(k, _):
            slot = k % NBUF
            g_dma(slot, idx_dst[k]).wait()
            a_dma(slot, idx_dst[k]).wait()
            sl = idx_srcl[k]

            @pl.when(sl < r)
            def _():
                s_global = base_node + sl
                hit = ring_a[slot] == s_global
                contrib = jnp.where(hit, ring_g[slot], 0.0)
                sl8 = pl.multiple_of(sl * 8, 8)
                acc[pl.ds(sl8, 8), :] = acc[pl.ds(sl8, 8), :] + contrib

            @pl.when(k + NBUF < T_E)
            def _():
                g_dma(slot, idx_dst[k + NBUF]).start()
                a_dma(slot, idx_dst[k + NBUF]).start()
            return 0

        jax.lax.fori_loop(0, T_E, edge, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    dx_ref[...] = acc[...]


def _run_masked_bwd(
    blocked_t: BlockedCsr, g: jax.Array, argsrc: jax.Array,
    interpret: bool = False,
):
    n_pad, b, f_pad = g.shape
    stride = b * f_pad
    lane = stride // 8
    r = blocked_t.rows_per_block
    kernel = functools.partial(_masked_bwd_kernel, stride=stride, r=r)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(blocked_t.n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((r * 8, lane), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r * 8, lane), jnp.float32),
            pltpu.VMEM((NBUF, 8, lane), jnp.float32),
            pltpu.VMEM((NBUF, 8, lane), jnp.int32),
            pltpu.SMEM((T_E,), jnp.int32),
            pltpu.SMEM((T_E,), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad * 8, lane), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    dx = fn(blocked_t.blk_ptr, blocked_t.src, blocked_t.dst_local,
            g.reshape(n_pad * 8, lane), argsrc.reshape(n_pad * 8, lane))
    return dx.reshape(n_pad, b, f_pad)


# ---------------------------------------------------------------------------
# Public API with custom VJP.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "bwd"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PallasGraph:
    """Forward + transpose blocked CSR for the pallas kernels."""

    fwd: BlockedCsr
    bwd: BlockedCsr


def build_pallas_graph(
    src: np.ndarray, dst: np.ndarray, n_pad_nodes: int,
    rows_per_block: int = DEFAULT_R,
) -> PallasGraph:
    return PallasGraph(
        fwd=build_blocked_csr(src, dst, n_pad_nodes, rows_per_block),
        bwd=build_blocked_csr(dst, src, n_pad_nodes, rows_per_block),
    )


def pallas_spmm_max(
    pgraph: PallasGraph, x: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Fold-batched segment-max; x (N_pad, B, F_pad) with B·F_pad % 1024 == 0.
    Differentiable (argmax-routed VJP, both directions as pallas kernels)."""

    @jax.custom_vjp
    def _f(x):
        return _run_spmm(pgraph.fwd, x, reduce="max", with_argmax=False,
                         interpret=interpret)

    def _fwd(x):
        out, arg = _run_spmm(pgraph.fwd, x, reduce="max", with_argmax=True,
                             interpret=interpret)
        return out, arg

    def _bwd(arg, g):
        return (_run_masked_bwd(pgraph.bwd, g, arg, interpret=interpret),)

    _f.defvjp(_fwd, _bwd)
    return _f(x)


def pallas_spmm_sum(
    pgraph: PallasGraph, x: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Fold-batched segment-sum; VJP = sum over the transpose."""

    @jax.custom_vjp
    def _f(x):
        return _run_spmm(pgraph.fwd, x, reduce="sum", with_argmax=False,
                         interpret=interpret)

    def _fwd(x):
        return _f(x), None

    def _bwd(_, g):
        return (_run_spmm(pgraph.bwd, g, reduce="sum", with_argmax=False,
                          interpret=interpret),)

    _f.defvjp(_fwd, _bwd)
    return _f(x)
