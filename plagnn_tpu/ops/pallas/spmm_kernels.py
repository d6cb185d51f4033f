"""Pallas TPU kernels: fold-batched, group-vectorized segment SpMM.

Why a custom kernel: XLA's row gather on TPU is latency-bound (~9-14 ns per
gathered row, ceiling ~290 GB/s regardless of batching — measured on v5e),
and a naive per-edge Pallas loop costs ~330 ns *per scalar-loop iteration*
regardless of its content.  These kernels attack both constants:

* **fold batching** — one DMA per edge moves the features of ALL B ensemble
  folds (node stride B*F; the reference's 10-fold CV becomes a batch axis,
  train.py:162-195), and
* **edge grouping** — each loop iteration processes a GROUP of G=8 edges
  that share one destination row (the host pads every row's edge list to a
  multiple of G), so the scalar-loop overhead is amortized 8x and the
  combine runs as a static VPU reduction tree.

Scalar-core DMA issue rate is the binding constraint (~38 ns per
start+wait pair measured on v5e), so the layout minimizes descriptor
count, not just bytes:

* block edge lists are G-aligned, not chunk-aligned — the last index chunk
  of each block is partial (loop bounds, no padded-slot DMAs);
* each ring slot's G copies share ONE byte-counting semaphore and are
  retired by a single whole-slot wait;
* the backward fuses gradient + argmax lanes per node row so each transpose
  edge costs ONE DMA instead of two, and packs the argmax ids as int16
  pairs (node ids < 2^15), shrinking that DMA from 2.0x to 1.5-1.6x the
  gradient width for lane counts >= 256 (at the 128-lane minimum stride,
  B*F_pad = 1024, ``arg_lane`` is clamped to the 128-lane tile and the DMA
  stays 2.0x — no shrink).

Layout: x (N_pad, B, F_pad) viewed as (N_pad*sub, B*F_pad/sub): a node row
is a sub-sublane-aligned (sub, lanes) slice (Mosaic's DMA alignment rule),
where sub = 8 for f32 (tile (8, 128); B*F_pad % 1024 == 0) and sub = 16 for
bf16 (tile (16, 128); B*F_pad % 2048 == 0).

bf16 message mode (opt-in via --agg-dtype bfloat16) halves every edge DMA:
max is order-preserving in bf16 so the forward is exact over the rounded
inputs; the backward fuses the bf16 gradient with int16 argmax lanes at
EQUAL width (4 B per element vs the packed-f32 path's 5.6 B), hit-tests in
the int16 domain, and tree-sums hits with an f32 upcast before the f32
accumulator (dx is returned in bf16, the input dtype).

Hub cache (``hub_k``/``hub_k_bwd``): on power-law PPI topology the top-k
most-fetched rows cover a large edge fraction (top-128 ≈ 21% on the 24k-node
bench graph) — those rows are preloaded once per kernel call into a
persistent VMEM arena and their edges stream separately (HubStream), served
with zero per-edge DMA.  Hub groups are STOLEN between regular DMA-stream
groups in proportion to progress, so their pure-VPU cost hides inside the
DMA service time the ring is waiting on (a serial hub phase measured as a
wash at large strides: ~345 ns/group of naked arena reads ≈ the DMA service
saved).  Applies to fwd max/sum and both masked backwards.

Semantics match DGL 0.8.x gspmm (SURVEY.md 2.2): max reduce with 0 for
empty rows; argmax records the FIRST maximum in (dst, src) sorted order
(within-group descending-select, cross-group strict-greater; with a hub
stream interleaved, ties resolve explicitly by smaller source id — the
same order).  The backward masked sum routes gradients to the recorded
argmax source over the transpose blocked CSR.

Edge-list contract: (src, dst) pairs must be UNIQUE (the pipeline's edge
sets are, data/biogrid.py).  On duplicate pairs the id-based backward
routes the gradient to every copy of the argmax edge while the positional
backward routes to exactly one (DGL's edge-argmax behavior); both are
self-consistent but differ from each other.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_E = 1024          # edges per index chunk (int32 1-D tile)
G = 8               # edges per group (share one destination row)
NG = 8              # group DMA slots in flight
# Groups retired per scalar-loop iteration. >1 was tried and is NOT a win:
# the kernels run at ~520 GB/s effective HBM rate (the achievable ceiling for
# 20-40 KB random-row DMAs on v5e), so loop overhead is already hidden — and
# Mosaic compile time explodes on the unrolled body (>10 min remote).
U = 1
# 64 rows/block keeps the argmax variant inside VMEM: double-buffered
# out+argmax blocks + acc/argacc/ring ≈ 10 MB at B·F=5120 (R=128 needs ~17MB
# and crashes the compiler).
DEFAULT_R = 64

# bf16 backward hit-test lowering: "cmp32" (int32-extended compare) or
# "mask16" (pure int16 arithmetic mask, no compare/extension — attacks the
# VPU-bound bf16 retirement gap).  Module-level so benchmarks can A/B both
# lowerings (read at trace time); the default is set by hardware
# measurement + benchmarks/hw_correctness.py exactness.
_BWD16_HIT = os.environ.get("PLAGNN_BWD16_HIT", "cmp32")

# Positional-argmax rank cap: max in-edges per destination row before the
# mega-row split kicks in (ranks must fit positive int16).  Module-level so
# tests can exercise the split machinery on small graphs.
POS_RANK_CAP = (1 << 15) - 1

_NEG = float(-jnp.inf)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_rows_per_block_budget(
    stride: int, budget_bytes: int = 12 << 20, arena_bytes: int = 0
) -> int:
    """Largest rows-per-block <= DEFAULT_R whose argmax-variant VMEM
    footprint fits ``budget_bytes``, ignoring node-count divisibility — for
    callers that pad the node count to the block size afterwards (the graph
    partitioner pads every chip's gather space to a multiple of the chosen
    block).  Footprint estimate: r*stride*4 bytes for each of {acc, argacc,
    2x out, 2x arg out} plus the NG*G-row DMA ring, plus ``arena_bytes``
    of persistent hub-cache arena (hub_k > 0 paths)."""
    ring = NG * G * stride * 4
    r = DEFAULT_R
    while r > 8 and r * stride * 4 * 6 + ring + arena_bytes > budget_bytes:
        r //= 2
    return r


def pick_hub_sizes(hub_cache, stride: int, esize: int):
    """Measured hub-cache policy (BASELINE.md round 3) → (hub_k, hub_k_bwd).

    The forward hub pays in the DMA-issue-bound regime (node row < 16 KB:
    the ~38 ns/edge scalar issue floor binds, and arena-served groups skip
    it entirely); at byte-bound strides the argmax-variant hub body costs
    about what its DMA saves, so the forward hub stays off and the BACKWARD
    hub (fused grad+arg rows, 2/3 of the traffic) takes the arena instead.
    k is halved until the arena fits beside the kernel working set
    (v5e VMEM ~16 MB: bwd k=128 at stride 16384 fits, k=192 does not)."""
    if hub_cache in ("off", "0", 0, None):
        return 0, 0
    row = stride * esize
    if hub_cache == "auto":
        kf, kb = (256, 0) if row < 16384 else (0, 128)
    else:
        k = int(hub_cache)
        kf, kb = (k, 0) if row < 16384 else (0, k)
    while kf and (kf + 1) * stride * esize > (6 << 20):
        kf //= 2
    while kb and (kb + 1) * stride * 2 * esize > (9 << 20):
        kb //= 2
    return kf, kb


def pick_rows_per_block(
    n_pad_nodes: int, stride: int, budget_bytes: int = 12 << 20,
    arena_bytes: int = 0,
) -> int:
    """Largest rows-per-block <= DEFAULT_R that divides ``n_pad_nodes`` and
    keeps the argmax variant's VMEM footprint under ``budget_bytes``.

    Never returns more than DEFAULT_R: R=128 at B*F >= 4096 overflows VMEM
    (~17 MB: acc + argacc + double-buffered out/arg blocks) and crashes the
    Mosaic compiler — a measured dead end (BASELINE.md).
    """
    r = pick_rows_per_block_budget(stride, budget_bytes, arena_bytes)
    while r > 8 and n_pad_nodes % r:
        r //= 2
    if n_pad_nodes % r:
        raise ValueError(
            f"n_pad_nodes={n_pad_nodes} is not a multiple of {r}; pad the "
            "node count to a multiple of 8"
        )
    return r


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["blk_ptr", "slot", "dstl", "ids"],
    meta_fields=["k"],
)
@dataclasses.dataclass(frozen=True)
class HubStream:
    """Arena-served edge stream (the hub cache).

    The top-k hottest source rows of a blocked stream are preloaded once per
    kernel call into a persistent VMEM arena; edges whose source is one of
    them are split out of the DMA stream and processed straight from VMEM —
    no per-edge DMA issue, no HBM bytes.  On power-law PPI topology
    (data_preprocess.py:74-110 in the reference) the top-128 rows cover
    ~21% of all edges, so this trims the byte-bound kernels' HBM traffic by
    that fraction at the cost of a short compute-only tail phase per block.
    Layout mirrors BlockedCsr; ``slot`` indexes the arena (k = identity pad
    row), ``ids[slot]`` maps back to the global node id (``ids[k]`` is the
    dummy node)."""

    blk_ptr: jax.Array   # (n_blocks + 1,) int32, multiples of G
    slot: jax.Array      # (Eh_pad + 2*T_E,) int32 arena slot (k for pad)
    dstl: jax.Array      # (Eh_pad + 2*T_E,) int32 dst row within block (R for pad)
    ids: jax.Array       # (k + 1,) int32 global node id per slot
    k: int


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["rows", "subs"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class SplitTable:
    """Mega-row split for positional argmax (rows whose in-degree exceeds
    the int16 rank cap).  Each such row's in-edges are reassigned to
    ``subs`` virtual sub-rows (unused padding node slots, <= 2^15 - 1 edges
    each, sorted-source chunks in ascending sub-row order); the kernel
    treats them as ordinary rows.  A small XLA post-combine maxes the
    sub-rows back into the real row and records the WINNING SUB-ROW INDEX
    per element in the real row's argmax slot; the backward pre-scatters
    the masked cotangent into the sub-row slots (whose fused rows the
    transpose stream actually fetches)."""

    rows: jax.Array   # (S,) int32 — the real mega rows
    subs: jax.Array   # (S, K) int32 sub-row slot ids, -1 pad


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["blk_ptr", "src", "dst_local", "hub", "pos", "split"],
    meta_fields=["n_blocks", "rows_per_block", "n_pad_nodes", "n_edges"],
)
@dataclasses.dataclass(frozen=True)
class BlockedCsr:
    """Destination-blocked, row-group-padded CSR (block lists G-aligned)."""

    blk_ptr: jax.Array     # (n_blocks + 1,) int32, multiples of G
    src: jax.Array         # (E_pad + 2*T_E,) int32 source ids (dummy for pad)
    dst_local: jax.Array   # (E_pad + 2*T_E,) int32 dst row within block (R for pad)
    n_blocks: int
    rows_per_block: int
    n_pad_nodes: int
    n_edges: int
    hub: HubStream | None = None
    # positional-argmax payload (big graphs, node ids past int16): per-slot
    # rank of the edge within its FORWARD destination row (-1 for pads).
    # The forward stream records this instead of the global source id, so
    # the backward's fused rows stay int16 at ANY node count.
    pos: jax.Array | None = None
    # mega-row split table (positional mode, rows past the rank cap)
    split: SplitTable | None = None


def _build_stream(
    src_vals: np.ndarray,
    dst: np.ndarray,
    n_pad_nodes: int,
    r: int,
    pad_src: int,
    sort_key: np.ndarray | None = None,
    mix_tails: bool = False,
    aux: np.ndarray | None = None,
):
    """Core blocked-stream layout: sort edges by (dst, sort_key or value),
    group rows into R-row blocks.  Block edge lists stay G-aligned (the
    kernel's last index chunk per block is partial); the arrays carry 2*T_E
    trailing pad slots so the T_E-aligned 2*T_E-wide index-window DMAs may
    overrun the final block.  Returns (blk_ptr, src_arr, dstl_arr).

    mix_tails=False: every destination row's edge list is padded to a
    multiple of G (the original layout — ~1.116x padded slots on the PPI
    degree distribution, each one a wasted full-row DMA).

    mix_tails=True: each row contributes floor(deg/G) full groups inline
    and its deg%G tail edges are CONCATENATED across the block's rows into
    shared mixed groups at the block's end (only the final mixed group per
    block carries pad slots, <G of them).  Within a mixed group slots carry
    their own dst_local; (dst, src) sort order is preserved per row
    (full groups first, then that row's tail — the tail holds the row's
    LARGEST source ids), so first-maximum argmax semantics are unchanged.
    The kernel detects a mixed group exactly: sorted order makes a group
    uniform iff its first and last slot share one destination.

    ``aux`` (optional, one value per input edge) is permuted and placed
    exactly like ``src_vals`` (pad slots -1) — the positional-argmax rank
    payload.  Returned as a 4th array (None when aux is None)."""
    order = np.lexsort((src_vals if sort_key is None else sort_key, dst))
    src_vals, dst = src_vals[order], dst[order]
    if aux is not None:
        aux = np.asarray(aux)[order]

    counts = np.bincount(dst, minlength=n_pad_nodes)
    if mix_tails:
        full = (counts // G) * G              # per-row full-group edges
        tail = counts - full                  # per-row leftover (< G)
        n_blocks = n_pad_nodes // r
        blk_full = full.reshape(n_blocks, r).sum(1)
        blk_tail = tail.reshape(n_blocks, r).sum(1)
        blk_tail_pad = ((blk_tail + G - 1) // G) * G
        blk_sizes = blk_full + blk_tail_pad   # all multiples of G
        blk_ptr = np.zeros(n_blocks + 1, np.int64)
        np.cumsum(blk_sizes, out=blk_ptr[1:])
        e_rows = int(blk_ptr[-1])
        src_r = np.full(e_rows + 2 * T_E, pad_src, np.int32)
        dst_r = np.full(e_rows + 2 * T_E, r, np.int32)
        # destination slot of each sorted edge: the row's full-part segment
        # for its first `full` edges, the block's packed tail region for the
        # rest — both from exclusive per-block cumsums
        fs = np.zeros((n_blocks, r), np.int64)
        fs[:, 1:] = np.cumsum(full.reshape(n_blocks, r), axis=1)[:, :-1]
        full_start = blk_ptr[:-1][:, None] + fs
        ts = np.zeros((n_blocks, r), np.int64)
        ts[:, 1:] = np.cumsum(tail.reshape(n_blocks, r), axis=1)[:, :-1]
        tail_start = (blk_ptr[:-1] + blk_full)[:, None] + ts
        full_start = full_start.reshape(-1)
        tail_start = tail_start.reshape(-1)
        orig_start = np.zeros(n_pad_nodes, np.int64)
        np.cumsum(counts[:-1], out=orig_start[1:])
        k = np.arange(len(src_vals)) - orig_start[dst]  # rank within row
        in_full = k < full[dst]
        pos = np.where(in_full,
                       full_start[dst] + k,
                       tail_start[dst] + (k - full[dst]))
        src_r[pos] = src_vals
        dst_r[pos] = dst % r
        aux_r = None
        if aux is not None:
            aux_r = np.full(len(src_r), -1, np.int32)
            aux_r[pos] = aux
        return blk_ptr, src_r, dst_r, aux_r

    padded_counts = ((counts + G - 1) // G) * G
    row_start = np.zeros(n_pad_nodes + 1, np.int64)
    np.cumsum(padded_counts, out=row_start[1:])
    e_rows = int(row_start[-1])
    src_r = np.full(e_rows + 2 * T_E, pad_src, np.int32)
    dst_r = np.full(e_rows + 2 * T_E, r, np.int32)
    dst_r[:e_rows] = np.repeat(
        np.arange(n_pad_nodes) % r, padded_counts)
    orig_start = np.zeros(n_pad_nodes, np.int64)
    np.cumsum(counts[:-1], out=orig_start[1:])
    pos = row_start[dst] + (np.arange(len(src_vals)) - orig_start[dst])
    src_r[pos] = src_vals
    aux_r = None
    if aux is not None:
        aux_r = np.full(len(src_r), -1, np.int32)
        aux_r[pos] = aux

    blk_ptr = row_start[:: r].copy()  # (n_blocks + 1,), G-aligned
    return blk_ptr, src_r, dst_r, aux_r


def build_blocked_csr(
    src: np.ndarray,
    dst: np.ndarray,
    n_pad_nodes: int,
    rows_per_block: int = DEFAULT_R,
    hub_k: int = 0,
    mix_tails: bool = True,
    aux: np.ndarray | None = None,
) -> BlockedCsr:
    """Blocked grouped-CSR build; see _build_stream for the layout.

    ``aux``: optional per-edge int payload carried as a third index stream
    (the positional-argmax ranks, see build_pallas_graph ``positional``).
    Unsupported together with ``hub_k`` (the hub stream does not carry it).

    ``mix_tails`` (default on) packs per-row leftover edges into shared
    mixed groups at each block's end instead of padding every row to a
    multiple of G — this removes the ~1.116x padded-row DMA waste on the
    PPI degree distribution (VERDICT r4 next-step 1a).  The hub stream
    keeps the per-row padding: its pad slots read the VMEM arena, not HBM,
    so they cost no DMA.

    ``hub_k`` > 0 splits edges whose source is one of the ``hub_k`` most
    frequently fetched rows into a separate arena-served HubStream (see
    HubStream docstring).  Both streams keep (dst, src)-sorted order within
    each destination row, so first-maximum argmax semantics are preserved:
    the kernel merges the hub phase with a (value, then smaller-id) tie rule."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    r = rows_per_block
    assert n_pad_nodes % r == 0, "pad node count to a multiple of rows_per_block"
    dummy = n_pad_nodes - 1
    n_edges = len(src)
    if n_edges:
        assert src.max() < dummy and dst.max() < dummy, (
            "node id n_pad_nodes-1 is reserved for the padding dummy"
        )

    hub = None
    if hub_k > 0:
        assert aux is None, "positional streams don't support the hub cache"
        # k is always exactly hub_k (unused slots map to the dummy row and
        # are never referenced) so per-chip hub streams share one pytree
        # structure and stack cleanly in the mesh partitioner.
        if n_edges:
            fetch_counts = np.bincount(src, minlength=n_pad_nodes)
            top = np.argsort(-fetch_counts, kind="stable")[:hub_k]
            top = top[fetch_counts[top] > 0]
        else:
            top = np.zeros(0, np.int64)
        k = hub_k
        ids = np.full(k + 1, dummy, np.int64)
        ids[: len(top)] = top
        slot_of = np.full(n_pad_nodes, -1, np.int64)
        slot_of[top] = np.arange(len(top))
        is_hub = slot_of[src] >= 0 if n_edges else np.zeros(0, bool)
        hsrc, hdst = src[is_hub], dst[is_hub]
        hb, hs, hd, _ = _build_stream(
            slot_of[hsrc], hdst, n_pad_nodes, r, pad_src=k,
            sort_key=hsrc)
        hub = HubStream(
            blk_ptr=jnp.asarray(hb, jnp.int32),
            slot=jnp.asarray(hs),
            dstl=jnp.asarray(hd),
            ids=jnp.asarray(ids.astype(np.int32)),
            k=k,
        )
        src, dst = src[~is_hub], dst[~is_hub]

    blk_ptr, src_r, dst_r, aux_r = _build_stream(src, dst, n_pad_nodes, r,
                                                 pad_src=dummy,
                                                 mix_tails=mix_tails,
                                                 aux=aux)
    return BlockedCsr(
        blk_ptr=jnp.asarray(blk_ptr, jnp.int32),
        src=jnp.asarray(src_r),
        dst_local=jnp.asarray(dst_r),
        n_blocks=n_pad_nodes // r,
        rows_per_block=r,
        n_pad_nodes=n_pad_nodes,
        n_edges=n_edges,
        hub=hub,
        pos=jnp.asarray(aux_r) if aux_r is not None else None,
    )


def _hub_machinery(
    he0, he1, hslot_hbm, hdstl_hbm, idx_hslot, idx_hdstl, hidx_sems,
    group_fn,
):
    """Chunked walk over a block's hub stream, callable ONE GROUP AT A TIME
    so the caller can steal hub work in between regular DMA-stream groups
    (the hub phase is pure VPU work; interleaving hides it under the DMA
    service time the regular stream is bound by).

    Returns (prefetch0, hub_one, hub_n):
      * prefetch0() starts the first index-window DMA (call once, early);
      * hub_one(h) processes hub group ``h`` (0-based within the block),
        retiring/prefetching T_E index windows at chunk boundaries — groups
        MUST be visited in order, each exactly once;
      * hub_n: number of hub groups in this block (traced int32).
    ``group_fn(off)`` does the kernel-specific work for the group whose
    first edge sits at SMEM-window offset ``off``."""
    hub_n = (he1 - he0) // G

    def hidx_copies(c, b):
        aligned = pl.multiple_of(((he0 + c * T_E) // T_E) * T_E, T_E)
        return (
            pltpu.make_async_copy(
                hslot_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_hslot.at[pl.ds(b * 2 * T_E, 2 * T_E)],
                hidx_sems.at[b, 0]),
            pltpu.make_async_copy(
                hdstl_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_hdstl.at[pl.ds(b * 2 * T_E, 2 * T_E)],
                hidx_sems.at[b, 1]),
        )

    def prefetch0():
        @pl.when(hub_n > 0)
        def _():
            for cp in hidx_copies(0, 0):
                cp.start()

    def hub_one(h):
        base_in = h * G  # edge offset within the block's hub stream
        ch = base_in // T_E

        @pl.when(base_in - ch * T_E < G)  # first group of its index chunk
        def _():
            for cp in hidx_copies(ch, ch % 2):
                cp.wait()

            @pl.when((ch + 1) * T_E < he1 - he0)
            def _():
                for cp in hidx_copies(ch + 1, 1 - ch % 2):
                    cp.start()

        aligned = ((he0 + ch * T_E) // T_E) * T_E
        group_fn((ch % 2) * 2 * T_E + he0 + base_in - aligned)

    return prefetch0, hub_one, hub_n


def _make_steal(hub_one, hub_n, reg_n):
    """Bresenham-paced stealing: each regular group accumulates ``hub_n``
    into an error term; whenever it reaches ``reg_n``, one hub group is
    processed.  Add/compare only — a per-group scalar division here
    measured ~55 ns/group, a real tax on issue-bound shapes.  Carry is
    (hub cursor, error term), init (0, 0); leftovers drain after the
    regular loop."""

    def steal(carry):
        hc, err = carry
        err = err + hub_n

        def body(state):
            h, e = state
            hub_one(h)
            return h + 1, e - reg_n

        return jax.lax.while_loop(lambda s: s[1] >= reg_n, body, (hc, err))

    return steal


def _spmm_fwd_kernel(
    blk_ptr_ref, *refs,
    reduce: str, with_argmax: bool, with_hub: bool = False, r: int,
    dummy: int, sub: int = 8, unroll: int = U, positional: bool = False,
):
    rest = list(refs)
    hub_blk_ptr_ref = rest.pop(0) if with_hub else None
    hub_map_ref = rest.pop(0) if with_hub else None
    src_hbm, dstl_hbm = rest.pop(0), rest.pop(0)
    pos_hbm = rest.pop(0) if positional else None
    x_hbm = rest.pop(0)
    if with_hub:
        hslot_hbm, hdstl_hbm, xhub_hbm = (
            rest.pop(0), rest.pop(0), rest.pop(0))
    out_ref = rest.pop(0)
    arg_ref = rest.pop(0) if with_argmax else None
    acc, argacc, ring, idx_src, idx_dstl, sems, idx_sems = (
        rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0),
        rest.pop(0), rest.pop(0))
    idx_pos = rest.pop(0) if positional else None
    if with_hub:
        arena, idx_hslot, idx_hdstl, hub_sem, hidx_sems = (
            rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0))
    assert not rest, f"{len(rest)} unconsumed kernel refs"
    # positional mode: the recorded "argmax" value is the edge's rank within
    # its destination row (int16-safe for any node count) instead of the
    # global source id; tie ordering is identical (rank order == src order).
    idx_arg = idx_pos if positional else idx_src

    i = pl.program_id(0)
    e0 = blk_ptr_ref[i]
    e1 = blk_ptr_ref[i + 1]
    n_chunks = (e1 - e0 + T_E - 1) // T_E

    if with_hub:
        # The arena persists across grid steps (scratch is allocated once
        # per kernel call; TPU grids run sequentially): preload the hub
        # rows with a single contiguous DMA on the first block.
        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(xhub_hbm, arena, hub_sem.at[0])
            cp.start()
            cp.wait()

    def idx_copies(c, b):
        # index arrays are 1024-tiled in HBM: DMA a T_E-aligned 2*T_E window
        # covering [base, base + T_E) into double-buffer half b.  The SMEM
        # buffers are 1-D (two 2*T_E halves): Mosaic tiles 2-D int32 SMEM as
        # (2, 128) and rejects single-row dim-0 slices.
        aligned = pl.multiple_of(((e0 + c * T_E) // T_E) * T_E, T_E)
        copies = [
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_src.at[pl.ds(b * 2 * T_E, 2 * T_E)], idx_sems.at[b, 0]),
            pltpu.make_async_copy(
                dstl_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_dstl.at[pl.ds(b * 2 * T_E, 2 * T_E)], idx_sems.at[b, 1]),
        ]
        if positional:
            copies.append(pltpu.make_async_copy(
                pos_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_pos.at[pl.ds(b * 2 * T_E, 2 * T_E)], idx_sems.at[b, 2]))
        return copies

    # prefetch chunk 0's window while the accumulators initialize
    @pl.when(n_chunks > 0)
    def _():
        for cp in idx_copies(0, 0):
            cp.start()

    ident = _NEG if reduce == "max" else 0.0
    acc[...] = jnp.full(acc.shape, ident, acc.dtype)
    if with_argmax:
        argacc[...] = jnp.full(argacc.shape, -1, jnp.int32)

    if with_hub:
        # Arena-served (hub) group: every source row comes from the
        # persistent VMEM arena (slot-indexed) — no per-edge DMA.  Merges
        # into the accumulator with a (greater value, then smaller source
        # id) rule, which together with both streams being (dst, src)-sorted
        # preserves the exact first-maximum-in-sorted-order argmax semantics
        # of the single-stream kernel (ties are common: relu zeros).
        def hub_group(off):
            d = idx_hdstl[off]

            @pl.when(d < r)
            def _():
                slots = [idx_hslot[off + j] for j in range(G)]
                rows = [
                    arena[pl.ds(pl.multiple_of(s * sub, sub), sub), :]
                    for s in slots
                ]
                d8 = pl.multiple_of(d * sub, sub)
                cur = acc[pl.ds(d8, sub), :]
                if reduce == "sum":
                    m = rows[0].astype(acc.dtype)
                    for j in range(1, G):
                        m = m + rows[j].astype(acc.dtype)
                    acc[pl.ds(d8, sub), :] = cur + m
                    return
                m = rows[0]
                for j in range(1, G):
                    m = jnp.maximum(m, rows[j])
                if with_argmax:
                    # Compares in f32 (no 16-bit cmp lowering on v5e;
                    # identity casts on the f32 path).  Pad slots read the
                    # arena's identity row (-inf) and hub_map maps them to
                    # the dummy id; they only hit when m is -inf, where
                    # `dummy < cur_arg` never holds.
                    m32 = m.astype(jnp.float32)
                    ag = jnp.full(m.shape, -1, jnp.int32)
                    for j in range(G - 1, -1, -1):
                        hit = rows[j].astype(jnp.float32) == m32
                        ag = jnp.where(hit, hub_map_ref[slots[j]], ag)
                    cur32 = cur.astype(jnp.float32)
                    cur_arg = argacc[pl.ds(d8, sub), :]
                    upd = (m32 > cur32) | ((m32 == cur32) & (ag < cur_arg))
                    argacc[pl.ds(d8, sub), :] = jnp.where(upd, ag, cur_arg)
                    acc[pl.ds(d8, sub), :] = jnp.where(upd, m, cur)
                else:
                    acc[pl.ds(d8, sub), :] = jnp.maximum(cur, m)

        hub_pre, hub_one, hub_n = _hub_machinery(
            hub_blk_ptr_ref[i], hub_blk_ptr_ref[i + 1],
            hslot_hbm, hdstl_hbm, idx_hslot, idx_hdstl, hidx_sems,
            hub_group)
        hub_pre()
        reg_n = jnp.maximum((e1 - e0) // G, 1)
        steal = _make_steal(hub_one, hub_n, reg_n)
    else:
        def steal(hc):
            return hc

    def edge_dma(slot, j, node):
        # ring slot holds G node-rows of ``sub`` sublanes each; all G copies
        # of a slot share one byte-counting semaphore.
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(node * sub, sub), sub)],
            ring.at[slot, pl.ds(j * sub, sub)],
            sems.at[slot],
        )

    def chunk_body(c, hcur):
        base = e0 + c * T_E
        n_groups = jnp.minimum(e1 - base, T_E) // G
        bsel = c % 2
        # offset of this chunk's first edge within the 1-D double buffer
        off = bsel * 2 * T_E + base - (base // T_E) * T_E
        for cp in idx_copies(c, bsel):
            cp.wait()
        # prefetch the NEXT chunk's index window behind this chunk's edge
        # DMAs (each boundary otherwise drains the pipeline for the fetch)
        @pl.when(c + 1 < n_chunks)
        def _():
            for cp in idx_copies(c + 1, 1 - bsel):
                cp.start()

        def start_group(gi, slot):
            for j in range(G):
                edge_dma(slot, j, idx_src[off + gi * G + j]).start()

        def wait_group(gi, slot):
            # one wait retires the slot's G copies (byte-counting semaphore)
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, G * sub)], ring.at[slot], sems.at[slot]
            ).wait()

        def warm(gi, _):
            start_group(gi, gi % NG)
            return 0

        jax.lax.fori_loop(0, jnp.minimum(NG, n_groups), warm, 0)

        def group_body(gi):
            slot = gi % NG
            wait_group(gi, slot)
            d = idx_dstl[off + gi * G]
            d_last = idx_dstl[off + gi * G + (G - 1)]

            # Sorted slots make the uniformity test exact: a group is
            # single-destination iff its first and last slot agree.  Full
            # per-row groups (the bulk) take the tree-reduce body; the
            # block-tail mixed groups (per-slot destinations, _build_stream
            # mix_tails=True) scatter slot by slot.
            @pl.when((d < r) & (d == d_last))
            def _():
                # Full groups carry no padded slots under mix_tails (and
                # under the legacy layout pads DMA the dummy node's row,
                # host-filled with the reduction identity — see _run_spmm),
                # so no per-row masking is needed: reduce the whole slot
                # with a log-depth static tree.
                buf = ring[slot]  # (G*sub, lane)
                if reduce == "sum" and buf.dtype != acc.dtype:
                    buf = buf.astype(acc.dtype)  # bf16 messages, f32 acc
                h = G * sub
                while h > sub:
                    half = h // 2
                    top = buf[half:h, :]
                    if reduce == "max":
                        buf = jnp.maximum(buf[:half, :], top)
                    else:
                        buf = buf[:half, :] + top
                    h = half
                m = buf  # (sub, lane)
                d8 = pl.multiple_of(d * sub, sub)
                cur = acc[pl.ds(d8, sub), :]
                if reduce == "max":
                    if with_argmax:
                        # Compares run in f32 (identity casts on the f32
                        # path): Mosaic's v5e cmpf/cmpi have no 16-bit
                        # lowering, and bf16→f32 upcast-compare is exact.
                        m32 = m.astype(jnp.float32)
                        # first-in-group on ties: descending overwrite
                        ag = jnp.full(m.shape, -1, jnp.int32)
                        for j in range(G - 1, -1, -1):
                            hit = (
                                ring[slot, pl.ds(j * sub, sub), :]
                                .astype(jnp.float32) == m32
                            )
                            ag = jnp.where(
                                hit, idx_arg[off + gi * G + j], ag)
                        cur_arg = argacc[pl.ds(d8, sub), :]
                        upd = m32 > cur.astype(jnp.float32)
                        if with_hub:
                            # Stolen hub groups may have landed first, and
                            # hub ids aren't ordered relative to this stream:
                            # ties must resolve to the smaller source id
                            # (first in (dst, src) order).  Without a hub the
                            # stream's sort order makes strict-greater
                            # sufficient, so the extra compare is hub-only.
                            upd = upd | (
                                (m32 == cur.astype(jnp.float32))
                                & (ag < cur_arg))
                        argacc[pl.ds(d8, sub), :] = jnp.where(upd, ag, cur_arg)
                    acc[pl.ds(d8, sub), :] = jnp.maximum(cur, m)
                else:
                    acc[pl.ds(d8, sub), :] = cur + m

            def mixed_slot(j):
                dj = idx_dstl[off + gi * G + j]

                @pl.when(dj < r)
                def _():
                    row = ring[slot, pl.ds(j * sub, sub), :]
                    d8 = pl.multiple_of(dj * sub, sub)
                    cur = acc[pl.ds(d8, sub), :]
                    if reduce == "sum":
                        acc[pl.ds(d8, sub), :] = cur + row.astype(acc.dtype)
                        return
                    if with_argmax:
                        m32 = row.astype(jnp.float32)
                        cur32 = cur.astype(jnp.float32)
                        cur_arg = argacc[pl.ds(d8, sub), :]
                        ag = idx_arg[off + gi * G + j]
                        # slots run in (dst, src) order and a row's tail
                        # follows its full groups, so strict-greater keeps
                        # the first maximum; the tie rule is hub-only (as
                        # in the uniform body)
                        upd = m32 > cur32
                        if with_hub:
                            upd = upd | ((m32 == cur32) & (ag < cur_arg))
                        argacc[pl.ds(d8, sub), :] = jnp.where(
                            upd, ag, cur_arg)
                        acc[pl.ds(d8, sub), :] = jnp.where(upd, row, cur)
                    else:
                        acc[pl.ds(d8, sub), :] = jnp.maximum(cur, row)

            @pl.when((d < r) & (d != d_last))
            def _():
                for j in range(G):
                    mixed_slot(j)

            @pl.when(gi + NG < n_groups)
            def _():
                start_group(gi + NG, slot)

        # scalar fori_loop iterations cost ~300 ns each regardless of body —
        # retire U groups per iteration, then a short remainder loop.  Hub
        # groups are stolen in proportion to regular progress: their pure
        # VPU work hides under the DMA service time the ring is waiting on.
        def group_u(it, hc):
            for u in range(unroll):
                group_body(it * unroll + u)
            return steal(hc)

        def group_1(gi, hc):
            group_body(gi)
            return steal(hc)

        n_iter = n_groups // unroll
        hc = jax.lax.fori_loop(0, n_iter, group_u, hcur)
        hc = jax.lax.fori_loop(n_iter * unroll, n_groups, group_1, hc)
        return hc

    hcur = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (jnp.int32(0), jnp.int32(0)))

    if with_hub:
        # Drain whatever the steal schedule left (always everything when
        # the block has no regular groups at all).
        def drain(h, carry):
            hub_one(h)
            return carry

        jax.lax.fori_loop(hcur[0], hub_n, drain, 0)

    if reduce == "max":
        # empty rows still hold the -inf identity; zero them (DGL empty-row
        # semantics).  The test upcasts to f32 and compares == -inf:
        # Mosaic's isfinite (tpu.weird) and all 16-bit compares are
        # f32-only on v5e, and the upcast is exact/identity.
        a = acc[...]
        empty = a.astype(jnp.float32) == _NEG
        out_ref[...] = jnp.where(empty, jnp.zeros_like(a), a)
    else:
        out_ref[...] = acc[...].astype(out_ref.dtype)
    if with_argmax:
        # int16 target when the recorded values fit (positional ranks /
        # small-graph ids): halves the argmax output array — at the
        # 10M-edge B=8 shape the int32 version alone is 5.4 GB and OOMs
        arg_ref[...] = argacc[...].astype(arg_ref.dtype)


def _run_spmm(
    blocked: BlockedCsr, x: jax.Array, *, reduce: str, with_argmax: bool,
    interpret: bool = False,
):
    n_pad, b, f_pad = x.shape
    stride = b * f_pad
    dt = x.dtype
    sub = 16 if dt == jnp.bfloat16 else 8  # Mosaic tile sublanes per row
    assert stride % (128 * sub) == 0, (
        f"fold-batch x features ({b}x{f_pad}) must be a multiple of "
        f"{128 * sub} for dtype {dt}"
    )
    lane = stride // sub
    r = blocked.rows_per_block
    # sum in bf16 would accumulate rounding per edge; keep an f32 accumulator
    # and round once at the output (max is exact in any dtype).
    acc_dt = jnp.float32 if reduce == "sum" else dt
    x_flat = x.reshape(n_pad * sub, lane)
    # Identity-fill the dummy node's rows: padded edge slots point at it, so
    # their DMA'd rows vanish in the reduction without any masking.
    dummy = blocked.n_pad_nodes - 1
    ident = _NEG if reduce == "max" else 0.0
    x_flat = jax.lax.dynamic_update_slice(
        x_flat,
        jnp.full((sub, lane), ident, dt),
        (dummy * sub, 0),
    )
    hub = blocked.hub
    with_hub = hub is not None
    positional = with_argmax and blocked.pos is not None
    n_pad_nodes_small = blocked.n_pad_nodes <= (1 << 15)

    out_shapes = [jax.ShapeDtypeStruct((n_pad * sub, lane), dt)]
    out_specs = [pl.BlockSpec((r * sub, lane), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM)]
    if with_argmax:
        # recorded values < 2^15 (positional ranks or small-graph ids) ride
        # out at int16 — half the HBM of the int32 array
        arg_dt = (jnp.int16 if positional or n_pad_nodes_small
                  else jnp.int32)
        out_shapes.append(jax.ShapeDtypeStruct((n_pad * sub, lane), arg_dt))
        out_specs.append(pl.BlockSpec((r * sub, lane), lambda i, *_: (i, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _spmm_fwd_kernel,
        reduce=reduce, with_argmax=with_argmax, with_hub=with_hub, r=r,
        dummy=blocked.n_pad_nodes - 1, sub=sub,
        unroll=1 if interpret else U,  # interpret-mode unroll is pure waste
        positional=positional,
    )

    scalar_args = [blocked.blk_ptr]
    ins = [blocked.src, blocked.dst_local]
    if positional:
        ins.append(blocked.pos)
    ins.append(x_flat)
    scratch = [
        pltpu.VMEM((r * sub, lane), acc_dt),
        pltpu.VMEM((r * sub, lane), jnp.int32)
        if with_argmax else pltpu.VMEM((8, 128), jnp.int32),
        pltpu.VMEM((NG, G * sub, lane), dt),
        pltpu.SMEM((4 * T_E,), jnp.int32),
        pltpu.SMEM((4 * T_E,), jnp.int32),
        pltpu.SemaphoreType.DMA((NG,)),
        pltpu.SemaphoreType.DMA((2, 3) if positional else (2, 2)),
    ]
    if positional:
        scratch.append(pltpu.SMEM((4 * T_E,), jnp.int32))
    if with_hub:
        k = hub.k
        # Arena = hub rows gathered AFTER the identity fill, with the dummy
        # row appended as slot k: pad slots of the hub stream read the
        # identity and never win the merge.
        x_hub = x_flat.reshape(blocked.n_pad_nodes, sub, lane)[
            hub.ids].reshape((k + 1) * sub, lane)
        scalar_args += [hub.blk_ptr, hub.ids]
        ins += [hub.slot, hub.dstl, x_hub]
        scratch += [
            pltpu.VMEM(((k + 1) * sub, lane), dt),
            pltpu.SMEM((4 * T_E,), jnp.int32),
            pltpu.SMEM((4 * T_E,), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalar_args),
        grid=(blocked.n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(ins),
        out_specs=tuple(out_specs) if with_argmax else out_specs[0],
        scratch_shapes=scratch,
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes) if with_argmax else out_shapes[0],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    res = fn(*scalar_args, *ins)
    split = blocked.split
    if with_argmax:
        out, arg = res
        out = out.reshape(n_pad, b, f_pad)
        arg = arg.reshape(n_pad, b, f_pad)
        if split is not None:
            out, win = _split_combine(split, out, reduce)
            # the real mega row's argmax slot holds the WINNING SUB-ROW
            # index (its own row has no direct edges, so the transpose
            # stream never fetches it — the slot is free for this)
            arg = arg.at[split.rows].set(win.astype(arg.dtype))
        return out, arg
    out = res.reshape(n_pad, b, f_pad)
    if split is not None:
        out, _ = _split_combine(split, out, reduce)
    return out


def _split_combine(split: SplitTable, out: jax.Array, reduce: str):
    """Combine mega-row sub-rows back into their real rows (see SplitTable).
    Returns (out, win) — win (S, b, f) is the first-maximum winning sub-row
    index (ascending sub-row order == ascending source order, so argmax's
    first-occurrence tie rule preserves global first-max semantics)."""
    subs = split.subs                       # (S, K), -1 pad
    valid = subs >= 0
    sub_vals = out[jnp.maximum(subs, 0)]    # (S, K, b, f)
    if reduce == "sum":
        vals = jnp.where(valid[:, :, None, None], sub_vals,
                         jnp.zeros((), out.dtype))
        comb = jnp.sum(vals.astype(jnp.float32), axis=1).astype(out.dtype)
        win = jnp.zeros(comb.shape, jnp.int32)
    else:
        neg = jnp.asarray(-jnp.inf, out.dtype)
        vals = jnp.where(valid[:, :, None, None], sub_vals, neg)
        comb = jnp.max(vals, axis=1)
        win = jnp.argmax(vals, axis=1).astype(jnp.int32)
    out = out.at[split.rows].set(comb)
    # restore the empty-row contract at the sub-row slots (they are padding
    # rows from the caller's point of view); invalid (-1) slots re-zero a
    # valid sibling, which is being zeroed anyway
    tgt = jnp.where(valid, subs, subs[:, :1])
    out = out.at[tgt.reshape(-1)].set(jnp.zeros((), out.dtype))
    return out, win


def _masked_bwd_kernel(
    blk_ptr_ref, *refs,
    r: int, dummy: int, arg_lane: int, packed: bool = True,
    unroll: int = U, with_hub: bool = False, positional: bool = False,
):
    """dx[s] = sum_{edges s->n} where(argsrc[n] == s, g[n], 0), grouped over
    the transpose blocked CSR (groups share the source row s).

    ``ga_hbm`` interleaves gradient and PACKED argmax lanes per node row
    (g ‖ arg16x2), so each edge costs ONE DMA whose width is 1.5-1.6x the
    gradient lane count instead of 2x: node ids fit in 15 bits, so argmax
    lanes k and ``arg_lane + k`` share one int32 lane (lo/hi int16 halves).
    The pairing offset equals the padded packed width ``arg_lane`` so every
    hit-test slice stays 128-lane aligned.  This pass is HBM-bytes bound
    (~600 GB/s effective for the 30-40 KB row DMAs on v5e), so the packing
    is a direct ~20% win.  The dummy node's arg row is -1 (it has no
    in-edges) and unused hi halves hold 0xFFFF, so neither ever hits.

    ``packed=False`` is the >2^15-node fallback: full-width int32 argmax
    lanes (``arg_lane == lane``, one whole-lane equality hit test, DMA 2.0x
    the gradient width) — correctness over the last 20% of bytes when ids no
    longer fit in int16 halves."""
    rest = list(refs)
    hub_blk_ptr_ref = rest.pop(0) if with_hub else None
    dst_hbm, srcl_hbm = rest.pop(0), rest.pop(0)
    pos_hbm = rest.pop(0) if positional else None
    ga_hbm = rest.pop(0)
    if with_hub:
        hslot_hbm, hsrcl_hbm, gahub_hbm = (
            rest.pop(0), rest.pop(0), rest.pop(0))
    dx_ref = rest.pop(0)
    acc, ring, idx_dst, idx_srcl, sems, idx_sems = (
        rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0),
        rest.pop(0))
    idx_tpos = rest.pop(0) if positional else None
    if with_hub:
        arena, idx_hslot, idx_hsrcl, hub_sem, hidx_sems = (
            rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0))
    assert not rest, f"{len(rest)} unconsumed kernel refs"

    i = pl.program_id(0)
    e0 = blk_ptr_ref[i]
    e1 = blk_ptr_ref[i + 1]
    n_chunks = (e1 - e0 + T_E - 1) // T_E

    if with_hub:
        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(gahub_hbm, arena, hub_sem.at[0])
            cp.start()
            cp.wait()

    def idx_copies(c, b):
        # index arrays are 1024-tiled in HBM: DMA a T_E-aligned 2*T_E window
        # into 1-D double-buffer half b (see _spmm_fwd_kernel.idx_copies)
        aligned = pl.multiple_of(((e0 + c * T_E) // T_E) * T_E, T_E)
        copies = [
            pltpu.make_async_copy(
                dst_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_dst.at[pl.ds(b * 2 * T_E, 2 * T_E)], idx_sems.at[b, 0]),
            pltpu.make_async_copy(
                srcl_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_srcl.at[pl.ds(b * 2 * T_E, 2 * T_E)], idx_sems.at[b, 1]),
        ]
        if positional:
            copies.append(pltpu.make_async_copy(
                pos_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_tpos.at[pl.ds(b * 2 * T_E, 2 * T_E)], idx_sems.at[b, 2]))
        return copies

    @pl.when(n_chunks > 0)
    def _():
        for cp in idx_copies(0, 0):
            cp.start()

    acc[...] = jnp.zeros(acc.shape, jnp.float32)
    base_node = i * r
    lane = acc.shape[1]
    hi_w = lane - arg_lane

    def hit_sum(get_grad_arg, s_global):
        """Masked gradient of one fused row: hit-test the (packed) argmax
        lanes against ``s_global`` and zero-select the gradient lanes.
        ``get_grad_arg(lo, w)`` reads lanes [lo, lo+w) of the row.  Returns
        the (lo-half, hi-half-or-None) pair — callers reduce and accumulate
        the halves separately, which avoids materializing a concatenated
        copy per edge (pure VPU savings; per-lane add order is unchanged,
        so results are bit-identical)."""
        pk = pltpu.bitcast(get_grad_arg(lane, arg_lane), jnp.int32)
        if packed:
            lo_hit = ((pk ^ s_global) & 0xFFFF) == 0
        else:  # full-width int32 ids (arg_lane == lane)
            lo_hit = pk == s_global
        buf = jnp.where(lo_hit, get_grad_arg(0, arg_lane), 0.0)
        buf_hi = None
        if packed and hi_w > 0:
            hi_hit = ((pk >> 16) & 0xFFFF) == s_global
            buf_hi = jnp.where(
                hi_hit[:, :hi_w], get_grad_arg(arg_lane, hi_w), 0.0)
        return buf, buf_hi

    if with_hub:
        def hub_group(off):
            sl = idx_hsrcl[off]

            @pl.when(sl < r)
            def _():
                s_global = base_node + sl
                lo_bufs, hi_bufs = [], []
                for j in range(G):
                    s = idx_hslot[off + j]
                    row = arena[pl.ds(pl.multiple_of(s * 8, 8), 8), :]
                    lo_b, hi_b = hit_sum(
                        lambda lo, w, row=row: row[:, lo:lo + w], s_global)
                    lo_bufs.append(lo_b)
                    hi_bufs.append(hi_b)
                while len(lo_bufs) > 1:
                    lo_bufs = [a + b_ for a, b_ in
                               zip(lo_bufs[::2], lo_bufs[1::2])]
                sl8 = pl.multiple_of(sl * 8, 8)
                acc[pl.ds(sl8, 8), pl.ds(0, arg_lane)] = (
                    acc[pl.ds(sl8, 8), pl.ds(0, arg_lane)] + lo_bufs[0])
                if hi_bufs[0] is not None:
                    while len(hi_bufs) > 1:
                        hi_bufs = [a + b_ for a, b_ in
                                   zip(hi_bufs[::2], hi_bufs[1::2])]
                    acc[pl.ds(sl8, 8), pl.ds(arg_lane, hi_w)] = (
                        acc[pl.ds(sl8, 8), pl.ds(arg_lane, hi_w)]
                        + hi_bufs[0])

        hub_pre, hub_one, hub_n = _hub_machinery(
            hub_blk_ptr_ref[i], hub_blk_ptr_ref[i + 1],
            hslot_hbm, hsrcl_hbm, idx_hslot, idx_hsrcl, hidx_sems,
            hub_group)
        hub_pre()
        reg_n = jnp.maximum((e1 - e0) // G, 1)
        steal = _make_steal(hub_one, hub_n, reg_n)
    else:
        def steal(hc):
            return hc

    def edge_dma(slot, j, node):
        return pltpu.make_async_copy(
            ga_hbm.at[pl.ds(pl.multiple_of(node * 8, 8), 8)],
            ring.at[slot, pl.ds(j * 8, 8)],
            sems.at[slot])

    def chunk_body(c, hcur):
        base = e0 + c * T_E
        n_groups = jnp.minimum(e1 - base, T_E) // G
        bsel = c % 2
        off = bsel * 2 * T_E + base - (base // T_E) * T_E
        for cp in idx_copies(c, bsel):
            cp.wait()

        @pl.when(c + 1 < n_chunks)
        def _():
            for cp in idx_copies(c + 1, 1 - bsel):
                cp.start()

        def start_group(gi, slot):
            for j in range(G):
                edge_dma(slot, j, idx_dst[off + gi * G + j]).start()

        def wait_group(gi, slot):
            pltpu.make_async_copy(
                ga_hbm.at[pl.ds(0, G * 8)], ring.at[slot], sems.at[slot]
            ).wait()

        def warm(gi, _):
            start_group(gi, gi % NG)
            return 0

        jax.lax.fori_loop(0, jnp.minimum(NG, n_groups), warm, 0)

        def group_body(gi):
            slot = gi % NG
            wait_group(gi, slot)
            sl = idx_srcl[off + gi * G]
            sl_last = idx_srcl[off + gi * G + (G - 1)]

            @pl.when((sl < r) & (sl == sl_last))
            def _():
                def tree(bufs_or_slot):
                    if isinstance(bufs_or_slot, list):
                        bufs = bufs_or_slot
                        while len(bufs) > 1:
                            bufs = [a + b_ for a, b_ in
                                    zip(bufs[::2], bufs[1::2])]
                        return bufs[0]
                    b = bufs_or_slot
                    h = G * 8
                    while h > 8:
                        half = h // 2
                        b = b[:half, :] + b[half:h, :]
                        h = half
                    return b

                if positional:
                    # per-slot hit scalars (each destination row carries its
                    # own rank for this source's edge) + pairwise tree
                    los, his = [], []
                    for j in range(G):
                        lo_b, hi_b = hit_sum(
                            lambda lo, w, j=j: ring[slot, pl.ds(j * 8, 8),
                                                    pl.ds(lo, w)],
                            idx_tpos[off + gi * G + j])
                        los.append(lo_b)
                        his.append(hi_b)
                    lo_sum = tree(los)
                    hi_sum = tree(his) if his[0] is not None else None
                else:
                    s_global = base_node + sl
                    # whole-slot hit test in the packed int16 domain +
                    # log-depth tree sum.  pk lane k holds arg[k] (lo 16)
                    # and arg[arg_lane + k] (hi 16); both comparisons and
                    # both gradient slices are 128-lane aligned by
                    # construction.  The lo/hi halves reduce and accumulate
                    # separately (no per-group concat copy; per-lane add
                    # order identical).
                    lo_buf, hi_buf = hit_sum(
                        lambda lo, w: ring[slot, :, pl.ds(lo, w)], s_global)
                    lo_sum = tree(lo_buf)
                    hi_sum = tree(hi_buf) if hi_buf is not None else None

                sl8 = pl.multiple_of(sl * 8, 8)
                acc[pl.ds(sl8, 8), pl.ds(0, arg_lane)] = (
                    acc[pl.ds(sl8, 8), pl.ds(0, arg_lane)] + lo_sum)
                if hi_sum is not None:
                    acc[pl.ds(sl8, 8), pl.ds(arg_lane, hi_w)] = (
                        acc[pl.ds(sl8, 8), pl.ds(arg_lane, hi_w)]
                        + hi_sum)

            def mixed_slot(j):
                # block-tail mixed group (per-slot source rows): hit-test and
                # accumulate one fetched row at a time
                slj = idx_srcl[off + gi * G + j]

                @pl.when(slj < r)
                def _():
                    lo_b, hi_b = hit_sum(
                        lambda lo, w: ring[slot, pl.ds(j * 8, 8),
                                           pl.ds(lo, w)],
                        idx_tpos[off + gi * G + j] if positional
                        else base_node + slj)
                    sl8 = pl.multiple_of(slj * 8, 8)
                    acc[pl.ds(sl8, 8), pl.ds(0, arg_lane)] = (
                        acc[pl.ds(sl8, 8), pl.ds(0, arg_lane)] + lo_b)
                    if hi_b is not None:
                        acc[pl.ds(sl8, 8), pl.ds(arg_lane, hi_w)] = (
                            acc[pl.ds(sl8, 8), pl.ds(arg_lane, hi_w)] + hi_b)

            @pl.when((sl < r) & (sl != sl_last))
            def _():
                for j in range(G):
                    mixed_slot(j)

            @pl.when(gi + NG < n_groups)
            def _():
                start_group(gi + NG, slot)

        def group_u(it, hc):
            for u in range(unroll):
                group_body(it * unroll + u)
            return steal(hc)

        def group_1(gi, hc):
            group_body(gi)
            return steal(hc)

        n_iter = n_groups // unroll
        hc = jax.lax.fori_loop(0, n_iter, group_u, hcur)
        hc = jax.lax.fori_loop(n_iter * unroll, n_groups, group_1, hc)
        return hc

    hcur = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (jnp.int32(0), jnp.int32(0)))

    if with_hub:
        def drain(h, carry):
            hub_one(h)
            return carry

        jax.lax.fori_loop(hcur[0], hub_n, drain, 0)

    dx_ref[...] = acc[...]


def _masked_bwd16_kernel(
    blk_ptr_ref, *refs,
    r: int, dummy: int, unroll: int = U, with_hub: bool = False,
    positional: bool = False,
):
    """bf16 variant of the masked backward: each node row interleaves the
    bf16 gradient lanes with int16 argmax lanes of EQUAL width, so one edge
    DMA costs 4 B/element vs the f32 path's 5.6 B.

    The fused row is INT16-typed end to end (``ga_hbm``/``ring``): float-
    typed carriers are hazardous for smuggled id bits — node ids 0-127 are
    denormal bf16 patterns and the TPU flushes bf16 denormals to zero on any
    float-typed move (measured: the hit test silently never fired).  Integer
    arrays are never canonicalized.  In-kernel, the gradient lanes bitcast
    back to bf16, hits upcast to f32 before the log-depth tree sum and the
    f32 accumulator; dx_ref is bf16 (the input dtype).  Node ids must fit
    int16 (< 2^15, guarded by the caller); the dummy node's arg row is -1 so
    padded slots never hit.

    ``positional``: big-graph mode (node ids past int16).  The forward
    recorded per-element edge RANKS within each destination row; the
    transpose stream carries each edge's rank as a third index array, so
    the hit scalar varies per slot (one hit16 per slot + pairwise tree)
    and ids never appear in the fused rows — int16 rows at ANY node count."""
    rest = list(refs)
    hub_blk_ptr_ref = rest.pop(0) if with_hub else None
    dst_hbm, srcl_hbm = rest.pop(0), rest.pop(0)
    pos_hbm = rest.pop(0) if positional else None
    ga_hbm = rest.pop(0)
    if with_hub:
        hslot_hbm, hsrcl_hbm, gahub_hbm = (
            rest.pop(0), rest.pop(0), rest.pop(0))
    dx_ref = rest.pop(0)
    acc, ring, idx_dst, idx_srcl, sems, idx_sems = (
        rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0),
        rest.pop(0))
    idx_tpos = rest.pop(0) if positional else None
    if with_hub:
        arena, idx_hslot, idx_hsrcl, hub_sem, hidx_sems = (
            rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0), rest.pop(0))
    assert not rest, f"{len(rest)} unconsumed kernel refs"

    i = pl.program_id(0)
    e0 = blk_ptr_ref[i]
    e1 = blk_ptr_ref[i + 1]
    n_chunks = (e1 - e0 + T_E - 1) // T_E

    if with_hub:
        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(gahub_hbm, arena, hub_sem.at[0])
            cp.start()
            cp.wait()

    def idx_copies(c, b):
        aligned = pl.multiple_of(((e0 + c * T_E) // T_E) * T_E, T_E)
        copies = [
            pltpu.make_async_copy(
                dst_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_dst.at[pl.ds(b * 2 * T_E, 2 * T_E)], idx_sems.at[b, 0]),
            pltpu.make_async_copy(
                srcl_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_srcl.at[pl.ds(b * 2 * T_E, 2 * T_E)], idx_sems.at[b, 1]),
        ]
        if positional:
            copies.append(pltpu.make_async_copy(
                pos_hbm.at[pl.ds(aligned, 2 * T_E)],
                idx_tpos.at[pl.ds(b * 2 * T_E, 2 * T_E)], idx_sems.at[b, 2]))
        return copies

    @pl.when(n_chunks > 0)
    def _():
        for cp in idx_copies(0, 0):
            cp.start()

    acc[...] = jnp.zeros(acc.shape, jnp.float32)
    base_node = i * r
    lane = acc.shape[1]
    sub = 16

    def hit16(pk_i16, grad_i16, s_g):
        if _BWD16_HIT == "mask16":
            # Packed-pair masking: view the int16 lanes as int32 PAIRS
            # (bitcast halves the register count), test both halves against
            # the scalar with int32 compares, assemble a bit mask, and AND
            # it onto the paired gradient bits.  No 16-bit compares or
            # shifts (neither lowers on v5e Mosaic; a plain int16 `>> 15`
            # dies in arith.shrsi).  Which element lands in which half is
            # packing-order-agnostic: both halves test against the same
            # scalar and each masks only its own bits.  Bit-identical
            # result to the cmp32 select (bf16 zero = 0x0000).
            pk32 = pltpu.bitcast(pk_i16, jnp.int32)
            g32 = pltpu.bitcast(grad_i16, jnp.int32)
            s = s_g & 0xFFFF
            lo_hit = (pk32 & 0xFFFF) == s
            hi_hit = jax.lax.shift_right_logical(pk32, 16) == s
            mask = (jnp.where(lo_hit, jnp.int32(0xFFFF), 0)
                    | jnp.where(hi_hit, jnp.int32(-65536), 0))
            sel = pltpu.bitcast(g32 & mask, jnp.bfloat16)
            return sel.astype(jnp.float32)
        # hit test in int32 (extend the int16 lanes): v5e Mosaic has no
        # 16-bit cmpi lowering; ids < 2^15 so sign-extension is harmless
        # and -1 sentinels never match.
        grad = pltpu.bitcast(grad_i16, jnp.bfloat16)
        return jnp.where(
            pk_i16.astype(jnp.int32) == s_g, grad,
            jnp.zeros((), jnp.bfloat16)).astype(jnp.float32)

    if with_hub:
        def hub_group(off):
            sl = idx_hsrcl[off]

            @pl.when(sl < r)
            def _():
                s_g = base_node + sl
                bufs = []
                for j in range(G):
                    s = idx_hslot[off + j]
                    row = arena[pl.ds(pl.multiple_of(s * sub, sub), sub), :]
                    bufs.append(hit16(row[:, lane:], row[:, :lane], s_g))
                while len(bufs) > 1:
                    bufs = [a + b_ for a, b_ in zip(bufs[::2], bufs[1::2])]
                sl16 = pl.multiple_of(sl * sub, sub)
                acc[pl.ds(sl16, sub), :] = acc[pl.ds(sl16, sub), :] + bufs[0]

        hub_pre, hub_one, hub_n = _hub_machinery(
            hub_blk_ptr_ref[i], hub_blk_ptr_ref[i + 1],
            hslot_hbm, hsrcl_hbm, idx_hslot, idx_hsrcl, hidx_sems,
            hub_group)
        hub_pre()
        reg_n = jnp.maximum((e1 - e0) // G, 1)
        steal = _make_steal(hub_one, hub_n, reg_n)
    else:
        def steal(hc):
            return hc

    def edge_dma(slot, j, node):
        return pltpu.make_async_copy(
            ga_hbm.at[pl.ds(pl.multiple_of(node * sub, sub), sub)],
            ring.at[slot, pl.ds(j * sub, sub)],
            sems.at[slot])

    def chunk_body(c, hcur):
        base = e0 + c * T_E
        n_groups = jnp.minimum(e1 - base, T_E) // G
        bsel = c % 2
        off = bsel * 2 * T_E + base - (base // T_E) * T_E
        for cp in idx_copies(c, bsel):
            cp.wait()

        @pl.when(c + 1 < n_chunks)
        def _():
            for cp in idx_copies(c + 1, 1 - bsel):
                cp.start()

        def start_group(gi, slot):
            for j in range(G):
                edge_dma(slot, j, idx_dst[off + gi * G + j]).start()

        def wait_group(gi, slot):
            pltpu.make_async_copy(
                ga_hbm.at[pl.ds(0, G * sub)], ring.at[slot], sems.at[slot]
            ).wait()

        def warm(gi, _):
            start_group(gi, gi % NG)
            return 0

        jax.lax.fori_loop(0, jnp.minimum(NG, n_groups), warm, 0)

        def group_body(gi):
            slot = gi % NG
            wait_group(gi, slot)
            sl = idx_srcl[off + gi * G]
            sl_last = idx_srcl[off + gi * G + (G - 1)]

            @pl.when((sl < r) & (sl == sl_last))
            def _():
                if positional:
                    # per-slot hit scalars (each destination row has its own
                    # rank for this source's edge) + pairwise tree: same
                    # element count as the whole-slot compare
                    bufs = [
                        hit16(
                            ring[slot, pl.ds(j * sub, sub),
                                 pl.ds(lane, lane)],
                            ring[slot, pl.ds(j * sub, sub), pl.ds(0, lane)],
                            idx_tpos[off + gi * G + j])
                        for j in range(G)
                    ]
                    while len(bufs) > 1:
                        bufs = [a + b_ for a, b_ in
                                zip(bufs[::2], bufs[1::2])]
                    buf = bufs[0]
                else:
                    s_g = base_node + sl
                    buf = hit16(
                        ring[slot, :, pl.ds(lane, lane)],
                        ring[slot, :, pl.ds(0, lane)], s_g)
                    h = G * sub
                    while h > sub:
                        half = h // 2
                        buf = buf[:half, :] + buf[half:h, :]
                        h = half
                sl16 = pl.multiple_of(sl * sub, sub)
                acc[pl.ds(sl16, sub), :] = acc[pl.ds(sl16, sub), :] + buf

            def mixed_slot(j):
                # block-tail mixed group: per-slot source rows
                slj = idx_srcl[off + gi * G + j]

                @pl.when(slj < r)
                def _():
                    buf = hit16(
                        ring[slot, pl.ds(j * sub, sub), pl.ds(lane, lane)],
                        ring[slot, pl.ds(j * sub, sub), pl.ds(0, lane)],
                        idx_tpos[off + gi * G + j] if positional
                        else base_node + slj)
                    sl16 = pl.multiple_of(slj * sub, sub)
                    acc[pl.ds(sl16, sub), :] = (
                        acc[pl.ds(sl16, sub), :] + buf)

            @pl.when((sl < r) & (sl != sl_last))
            def _():
                for j in range(G):
                    mixed_slot(j)

            @pl.when(gi + NG < n_groups)
            def _():
                start_group(gi + NG, slot)

        def group_u(it, hc):
            for u in range(unroll):
                group_body(it * unroll + u)
            return steal(hc)

        def group_1(gi, hc):
            group_body(gi)
            return steal(hc)

        n_iter = n_groups // unroll
        hc = jax.lax.fori_loop(0, n_iter, group_u, hcur)
        hc = jax.lax.fori_loop(n_iter * unroll, n_groups, group_1, hc)
        return hc

    hcur = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (jnp.int32(0), jnp.int32(0)))

    if with_hub:
        def drain(h, carry):
            hub_one(h)
            return carry

        jax.lax.fori_loop(hcur[0], hub_n, drain, 0)

    dx_ref[...] = acc[...].astype(dx_ref.dtype)


def _run_masked_bwd16(
    blocked_t: BlockedCsr, g: jax.Array, argsrc: jax.Array,
    interpret: bool = False,
):
    """bf16 gradient routing: ga rows fuse bf16 grad + int16 arg lanes."""
    n_pad, b, f_pad = g.shape
    stride = b * f_pad
    lane = stride // 16
    r = blocked_t.rows_per_block
    positional = blocked_t.pos is not None
    if blocked_t.n_pad_nodes > 1 << 15 and not positional:
        raise ValueError(
            "bf16 backward stores node ids as int16 "
            f"(n_pad_nodes={blocked_t.n_pad_nodes} > 32768); build the "
            "graph with positional argmax (build_pallas_graph positional="
            "True) or shard it (parallel.partition)"
        )
    dummy = blocked_t.n_pad_nodes - 1
    # The dummy node's arg row is already -1 straight out of the forward
    # kernel (argacc initializes to -1; padding slots carry dst_local == r
    # and are skipped, and build_blocked_csr rejects real edges into the
    # dummy), so padded-slot fetches never pass the hit test — no
    # dummy-row rewrite (a full array copy) is needed here.  (Positional
    # mode stores ranks, which are >= 0 for every REAL slot; pad slots of
    # the mixed tail carry src_local == r and are skipped before any hit
    # test, and positional graphs require mix_tails — enforced at build.)
    # int16-typed fused rows (see kernel docstring: bf16-typed carriers
    # flush denormal id patterns to zero on hardware).
    ga = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(
                g.reshape(n_pad * 16, lane), jnp.int16),
            argsrc.reshape(n_pad * 16, lane).astype(jnp.int16),
        ],
        axis=1,
    )
    hub = blocked_t.hub
    kernel = functools.partial(
        _masked_bwd16_kernel, r=r, dummy=dummy,
        unroll=1 if interpret else U, with_hub=hub is not None,
        positional=positional)
    scalar_args = [blocked_t.blk_ptr]
    ins = [blocked_t.src, blocked_t.dst_local]
    if positional:
        ins.append(blocked_t.pos)
    ins.append(ga)
    scratch = [
        pltpu.VMEM((r * 16, lane), jnp.float32),
        pltpu.VMEM((NG, G * 16, 2 * lane), jnp.int16),
        pltpu.SMEM((4 * T_E,), jnp.int32),
        pltpu.SMEM((4 * T_E,), jnp.int32),
        pltpu.SemaphoreType.DMA((NG,)),
        pltpu.SemaphoreType.DMA((2, 3) if positional else (2, 2)),
    ]
    if positional:
        scratch.append(pltpu.SMEM((4 * T_E,), jnp.int32))
    if hub is not None:
        k = hub.k
        # Arena = fused rows of the hub (most-fetched destination) nodes;
        # slot k is the dummy's row, whose argmax lanes are -1 (never hits).
        ga_hub = ga.reshape(blocked_t.n_pad_nodes, 16, 2 * lane)[
            hub.ids].reshape((k + 1) * 16, 2 * lane)
        scalar_args += [hub.blk_ptr]
        ins += [hub.slot, hub.dstl, ga_hub]
        scratch += [
            pltpu.VMEM(((k + 1) * 16, 2 * lane), jnp.int16),
            pltpu.SMEM((4 * T_E,), jnp.int32),
            pltpu.SMEM((4 * T_E,), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalar_args),
        grid=(blocked_t.n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(ins),
        out_specs=pl.BlockSpec((r * 16, lane), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad * 16, lane), jnp.bfloat16),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    dx = fn(*scalar_args, *ins)
    return dx.reshape(n_pad, b, f_pad)


def _run_masked_bwd(
    blocked_t: BlockedCsr, g: jax.Array, argsrc: jax.Array,
    interpret: bool = False, split: SplitTable | None = None,
):
    big = blocked_t.n_pad_nodes > 1 << 15
    positional = blocked_t.pos is not None
    if split is not None:
        # Mega-row split pre-scatter: route each real row's cotangent to
        # the sub-row that won its max (the forward stored the winning
        # sub-row index in the real row's argmax slot); the transpose
        # stream fetches SUB-ROW fused rows, never the real mega row's.
        subs = split.subs                           # (S, K)
        win = argsrc[split.rows].astype(jnp.int32)  # (S, b, f)
        k_ix = jnp.arange(subs.shape[1], dtype=jnp.int32)
        gsel = jnp.where(
            win[:, None] == k_ix[None, :, None, None],
            g[split.rows][:, None], jnp.zeros((), g.dtype))  # (S, K, b, f)
        # invalid (-1) slots write zeros to the dummy row (harmless: its
        # argmax lanes are -1 and never hit)
        tgt = jnp.where(subs >= 0, subs, blocked_t.n_pad_nodes - 1)
        g = g.at[tgt.reshape(-1)].set(
            gsel.reshape(-1, *g.shape[1:]), unique_indices=False)
    if g.dtype == jnp.bfloat16:
        if big and not positional:
            # The bf16 backward stores ids as int16 lanes, which cannot
            # address >2^15 nodes; route through the unpacked-f32 fallback
            # below (both paths accumulate in f32 and round once, so the
            # bf16 result is identical).  Positional graphs store RANKS
            # (always int16-safe) and stay on the fast fused-int16 path.
            dx = _run_masked_bwd(
                blocked_t, g.astype(jnp.float32), argsrc,
                interpret=interpret)
            return dx.astype(jnp.bfloat16)
        return _run_masked_bwd16(blocked_t, g, argsrc, interpret=interpret)
    n_pad, b, f_pad = g.shape
    stride = b * f_pad
    lane = stride // 8
    r = blocked_t.rows_per_block
    dummy = blocked_t.n_pad_nodes - 1
    argsrc = argsrc.astype(jnp.int32).reshape(n_pad * 8, lane)
    if big and not positional:
        # Unpacked int32 fallback: node ids >= 2^15 don't fit int16 halves,
        # so argmax lanes ride at full width (edge DMA 2.0x instead of
        # 1.5-1.6x the gradient width) — generality over the packed path's
        # last ~20% of bytes.  Positional graphs pack ranks instead (below).
        arg_lane = lane
        arg_as_f32 = jax.lax.bitcast_convert_type(argsrc, jnp.float32)
    else:
        # One fused (g ‖ packed-arg) row per node.  Argmax lanes k and
        # ``arg_lane + k`` pack into one int32 lane (node ids < 2^15);
        # unused hi halves carry the 0xFFFF sentinel.  The dummy node's arg
        # row is -1 straight out of the forward kernel (argacc initializes
        # to -1 and nothing writes the dummy row), so padded-slot fetches
        # never pass the hit test — no dummy-row rewrite (a full array
        # copy) is needed.
        arg_lane = _round_up(max(lane // 2, 128), 128)
        hi_w = lane - arg_lane
        lo = argsrc[:, :arg_lane]
        hi = jnp.concatenate(
            [
                argsrc[:, arg_lane:],
                jnp.full((n_pad * 8, arg_lane - hi_w), 0xFFFF, jnp.int32),
            ],
            axis=1,
        ) if hi_w < arg_lane else argsrc[:, arg_lane:]
        packed16 = (lo & 0xFFFF) | (hi << 16)
        arg_as_f32 = jax.lax.bitcast_convert_type(packed16, jnp.float32)
    ga = jnp.concatenate([g.reshape(n_pad * 8, lane), arg_as_f32], axis=1)
    hub = blocked_t.hub
    kernel = functools.partial(
        _masked_bwd_kernel, r=r, dummy=dummy, arg_lane=arg_lane,
        packed=(not big) or positional, unroll=1 if interpret else U,
        with_hub=hub is not None, positional=positional)
    scalar_args = [blocked_t.blk_ptr]
    ins = [blocked_t.src, blocked_t.dst_local]
    if positional:
        ins.append(blocked_t.pos)
    ins.append(ga)
    hub_scratch = []
    if hub is not None:
        k = hub.k
        ga_hub = ga.reshape(blocked_t.n_pad_nodes, 8, lane + arg_lane)[
            hub.ids].reshape((k + 1) * 8, lane + arg_lane)
        scalar_args += [hub.blk_ptr]
        ins += [hub.slot, hub.dstl, ga_hub]
        hub_scratch = [
            pltpu.VMEM(((k + 1) * 8, lane + arg_lane), jnp.float32),
            pltpu.SMEM((4 * T_E,), jnp.int32),
            pltpu.SMEM((4 * T_E,), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalar_args),
        grid=(blocked_t.n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(ins),
        out_specs=pl.BlockSpec((r * 8, lane), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r * 8, lane), jnp.float32),
            pltpu.VMEM((NG, G * 8, lane + arg_lane), jnp.float32),
            pltpu.SMEM((4 * T_E,), jnp.int32),
            pltpu.SMEM((4 * T_E,), jnp.int32),
            pltpu.SemaphoreType.DMA((NG,)),
            pltpu.SemaphoreType.DMA((2, 3) if positional else (2, 2)),
        ] + ([pltpu.SMEM((4 * T_E,), jnp.int32)] if positional else [])
        + hub_scratch,
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad * 8, lane), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    dx = fn(*scalar_args, *ins)
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
    rows_per_block: int = DEFAULT_R, hub_k: int = 0, hub_k_bwd: int = 0,
    rows_per_block_bwd: int | None = None, mix_tails: bool = True,
    positional: bool | None = None,
) -> PallasGraph:
    """``hub_k`` enables the VMEM hub cache on the forward stream (top-k
    most-fetched source rows served from a persistent arena, see HubStream);
    ``hub_k_bwd`` does the same for the transpose stream used by backward
    passes.  Arena VMEM cost is (k+1)*B*F_pad elements forward and ~2x that
    backward (fused grad+arg rows) — account for it per direction via
    pick_rows_per_block(arena_bytes=...) and ``rows_per_block_bwd`` (defaults
    to ``rows_per_block``), so a backward-only arena doesn't shrink the
    forward's blocks.

    ``positional`` (default: automatic, on for > 2^15 padded nodes): record
    argmax as each edge's RANK within its destination row instead of the
    global source id.  Ranks always fit int16 (max in-degree < 32768
    required), so big graphs keep the fused-int16 backward rows — HALF the
    backward DMA bytes and HALF the VJP residual of the old unpacked-int32
    fallback (the 10M-edge config's binding constraints, VERDICT r4
    next-step 2).  Requires mix_tails; the hub cache is not yet supported
    in this mode."""
    if positional is None:
        positional = n_pad_nodes > (1 << 15)
    aux = None
    split = None
    if positional:
        assert mix_tails, "positional argmax requires the mixed-tail layout"
        assert hub_k == 0 and hub_k_bwd == 0, (
            "positional argmax does not support the hub cache yet")
        cap = POS_RANK_CAP    # max edges per destination row (ranks int16)
        src = np.asarray(src, np.int64)
        dst = np.asarray(dst, np.int64)
        counts = np.bincount(dst, minlength=n_pad_nodes)

        def _ranks(counts_, dst_, src_):
            order = np.lexsort((src_, dst_))
            start = np.zeros(n_pad_nodes, np.int64)
            np.cumsum(counts_[:-1], out=start[1:])
            rk = np.empty(len(src_), np.int64)
            rk[order] = np.arange(len(src_)) - start[dst_[order]]
            return rk

        mega = np.flatnonzero(counts > cap)
        if len(mega):
            # Mega-row split: reassign each over-cap row's in-edges to
            # virtual sub-rows claimed from unused padding node slots
            # (sorted-source chunks of <= cap edges, ascending sub-row
            # order == ascending source order, so first-max semantics
            # survive the post-combine).  See SplitTable.
            used = np.zeros(n_pad_nodes, bool)
            used[src] = True
            used[dst] = True
            used[n_pad_nodes - 1] = True   # dummy
            free = np.flatnonzero(~used)
            k_each = -(-counts[mega] // cap)
            total = int(k_each.sum())
            if total > len(free):
                raise ValueError(
                    f"positional mega-row split needs {total} unused node "
                    f"slots but only {len(free)} padded spares exist — "
                    "pad the node count further")
            slots = free[-total:]          # highest ids: the padding region
            k_max = int(k_each.max())
            subs = np.full((len(mega), k_max), -1, np.int64)
            off = 0
            for i, km in enumerate(k_each):
                subs[i, :km] = slots[off:off + km]
                off += km
            rank0 = _ranks(counts, dst, src)
            row_ix = np.full(n_pad_nodes, -1, np.int64)
            row_ix[mega] = np.arange(len(mega))
            is_mega = row_ix[dst] >= 0
            dst = dst.copy()
            dst[is_mega] = subs[row_ix[dst[is_mega]], rank0[is_mega] // cap]
            split = SplitTable(
                rows=jnp.asarray(mega.astype(np.int32)),
                subs=jnp.asarray(subs.astype(np.int32)))
            counts = np.bincount(dst, minlength=n_pad_nodes)
        aux = _ranks(counts, dst, src)
    pg = PallasGraph(
        fwd=build_blocked_csr(src, dst, n_pad_nodes, rows_per_block,
                              hub_k=hub_k, mix_tails=mix_tails, aux=aux),
        bwd=build_blocked_csr(
            dst, src, n_pad_nodes,
            rows_per_block if rows_per_block_bwd is None
            else rows_per_block_bwd,
            hub_k=hub_k_bwd, mix_tails=mix_tails, aux=aux),
    )
    if split is not None:
        # fwd only: _run_spmm's post-combine keys on blocked.split, and the
        # TRANSPOSE stream's output rows are forward SOURCES — combining
        # there would overwrite real rows with empty sub-row zeros.  The
        # backward paths receive the table explicitly from the VJPs.
        pg = PallasGraph(
            fwd=dataclasses.replace(pg.fwd, split=split), bwd=pg.bwd)
    return pg


def pallas_spmm_max(
    pgraph: PallasGraph, x: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Fold-batched segment-max; x (N_pad, B, F_pad), B*F_pad % 1024 == 0.
    Differentiable: argmax-routed VJP, both directions as pallas kernels."""

    @jax.custom_vjp
    def _f(x):
        return _run_spmm(pgraph.fwd, x, reduce="max", with_argmax=False,
                         interpret=interpret)

    # the recorded values (edge ranks in positional mode, node ids < 2^15
    # otherwise) always fit int16 — store the VJP residual at half width.
    # The >2^15-node NON-positional fallback is the one exception.
    small_arg = (pgraph.fwd.pos is not None
                 or pgraph.fwd.n_pad_nodes <= (1 << 15))

    def _fwd(x):
        out, arg = _run_spmm(pgraph.fwd, x, reduce="max", with_argmax=True,
                             interpret=interpret)
        return out, (arg.astype(jnp.int16) if small_arg else arg)

    def _bwd(arg, g):
        return (_run_masked_bwd(pgraph.bwd, g, arg, interpret=interpret,
                                split=pgraph.fwd.split),)

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
        sp = pgraph.fwd.split
        if sp is not None:
            # sum VJP over a mega-row split: every sub-row's cotangent is
            # the real row's (all edges contribute in a sum).  Writes to
            # invalid (-1) slots land on the dummy row, which the kernel
            # identity-fills to 0 before reading.
            k = sp.subs.shape[1]
            tgt = jnp.where(sp.subs >= 0, sp.subs,
                            pgraph.bwd.n_pad_nodes - 1)
            rep = jnp.broadcast_to(
                g[sp.rows][:, None], (sp.rows.shape[0], k, *g.shape[1:]))
            g = g.at[tgt.reshape(-1)].set(rep.reshape(-1, *g.shape[1:]))
        return (_run_spmm(pgraph.bwd, g, reduce="sum", with_argmax=False,
                          interpret=interpret),)

    _f.defvjp(_fwd, _bwd)
    return _f(x)
