"""Mesh planner: pick the (fold, graph) factorization for D devices.

The reference is single-device (main_normal.py:66 moves the one graph to the
one GPU); the framework scales two ways and they compose on a 2-D
('fold', 'graph') mesh:

* 'graph' — destination-block partition of the PPI graph with halo
  all_to_all per layer (parallel/partition.py).  Pays ICI bytes; the
  halo-bytes model here projects its efficiency from measured single-chip
  rates + partition counts.
* 'fold'  — data-parallel axis over the embarrassingly-parallel
  rounds×folds ensemble (reference train.py:162-178).  Pays nothing in
  comm, but (a) shrinks the per-chip fold batch, which de-amortizes the
  per-edge DMA (measured rate falls with B), and (b) can leave slots empty
  when the job count doesn't fill F × b_local × chunks.

Given D devices the planner scores every factorization D = F × P crossed
with the feasible local fold batches and returns the best, with the full
candidate table for the record.  The measured anchors (single-chip bf16
fwd+bwd kernel rates vs fold batch, BASELINE.md rounds 1-3) keep the model
honest; partition counts are exact (same math as partition_graph).

A 2-D (source×destination) graph partition is modeled here too
(``counts_2d``): chips form a √P×√P grid, chip (i,j) owns edges from source
super-block j to destination super-block i, source rows ride a column
all-to-all (only needed rows, halo-style) and partial maxima reduce across
the grid row.  Per-chip comm is bounded by O(N/√P) rows instead of the 1-D
scheme's O(N) — whether that clears the ≥80% target at P=16 is a model
question answered by ``plan_mesh``/``benchmarks/multichip_evidence.py``.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Measured single-chip Pallas bf16 fwd+bwd kernel rates (edge-folds/s) vs
# fold batch on the 24,041-node / 700k-edge PPI workload, v5e (round-4
# chained-differencing sweep, benchmarks/bf16_kernels.py — no hub; the
# production hub adds ~5% at B=32).  The curve is the DMA-amortization
# story: one edge DMA serves the whole fold batch, so bigger B amortizes
# the per-edge issue floor until the byte ceiling.
#
# These baked values are the FALLBACK: plan_mesh first looks for a
# machine-readable anchors file written by the benchmarks
# (benchmarks/results/anchors.json, or $PLAGNN_ANCHORS) so fresh bench
# output flows into every `--mesh auto` decision without hand-editing
# constants (VERDICT r4 next-step 6); MeshPlan records which source won.
MEASURED_BF16_RATES: Dict[int, float] = {
    10: 119.4e6,
    16: 160.5e6,
    20: 171.3e6,
    24: 179.3e6,
    28: 178.9e6,
    32: 179.5e6,
}
# f32 anchors (rounds 1-3): B=10 97.7 M; the engine's f32 B=30 epoch is
# ~1.4x slower than bf16 — planner currently models the bf16 production path.

# Practical single-chip fold-batch ceiling on 16 GB v5e HBM at the full
# 24,041-node PPI graph (B=40 OOMs at compile, B=30 fits — BASELINE.md
# round-3 dead ends).  The fold-packed working set scales with
# per-chip-nodes x fold-batch, so a graph partition (or a smaller graph)
# raises the ceiling proportionally and a bigger graph lowers it.
HBM_FOLD_CEILING_FULL_GRAPH = 30
HBM_REF_NODES = 24041
# Rates beyond the measured plateau are unexplored; don't extrapolate.
MAX_MEASURED_B = 32

# Nominal per-chip ICI egress (aggregate over links, one-way).
ICI_EGRESS = {"v5e": 180e9, "v5p": 540e9}

# Measured shard_map program-structure tax at a degenerate (1,1) mesh after
# the round-4 degenerate fast path (benchmarks/multichip_evidence.py
# --mode hw: 316.8 vs 295.3 ms/epoch).  Applied to every P>1 candidate so
# modeled efficiencies are end-to-end honest (VERDICT r3 next-step 4).
SHARD_STRUCTURE_TAX = 1.073

F_DIM = 503
HIDDEN = (400, 300, 200)

# Measured-anchor file resolution (see MEASURED_BF16_RATES note).
ANCHORS_ENV = "PLAGNN_ANCHORS"
DEFAULT_ANCHORS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "benchmarks", "results", "anchors.json")


def load_anchors(path: Optional[str] = None) -> Dict:
    """Resolve planner anchors: explicit ``path`` → $PLAGNN_ANCHORS →
    benchmarks/results/anchors.json → the baked constants.

    Returns {"rates": {b: edge_folds_per_s}, "tax": float,
    "hbm_ceiling": int, "max_b": int, "source": str}.  A malformed or
    missing file falls through to the next source (the baked constants are
    always valid), so a stale or truncated anchors file can never crash a
    plan — it just loses freshness.  ``path="baked"`` pins the baked
    constants (hermetic tests / reproducing a recorded plan)."""
    if path == "baked":
        path = None
        sources = ()
    else:
        sources = (path, os.environ.get(ANCHORS_ENV), DEFAULT_ANCHORS_PATH)
    for p in sources:
        if not p:
            continue
        try:
            with open(p) as f:
                raw = json.load(f)
            rates = {int(k): float(v) for k, v in raw["bf16_rates"].items()}
            if not rates or any(v <= 0 for v in rates.values()):
                raise ValueError("non-positive rate")
            tax = float(raw.get("structure_tax", SHARD_STRUCTURE_TAX))
            if tax < 1.0:
                raise ValueError("structure_tax < 1")
            ceiling = int(raw.get("hbm_fold_ceiling_full_graph",
                                  HBM_FOLD_CEILING_FULL_GRAPH))
        except (OSError, json.JSONDecodeError, KeyError, TypeError,
                ValueError, AttributeError):
            continue
        return {"rates": rates, "tax": tax, "hbm_ceiling": ceiling,
                "max_b": max(rates), "source": p}
    return {"rates": dict(MEASURED_BF16_RATES), "tax": SHARD_STRUCTURE_TAX,
            "hbm_ceiling": HBM_FOLD_CEILING_FULL_GRAPH,
            "max_b": MAX_MEASURED_B, "source": "baked"}


def rate_single_chip(b: int, rates: Optional[Dict[int, float]] = None) -> float:
    """Interpolated measured single-chip rate (edge-folds/s) at fold batch b.

    Linear between anchors; below the smallest anchor the rate scales ~b
    (issue-floor-bound: per-edge time is constant, folds amortize it);
    above the largest it is flat (byte-bound plateau, measured)."""
    rates = rates or MEASURED_BF16_RATES
    bs = sorted(rates)
    if b <= bs[0]:
        return rates[bs[0]] * b / bs[0]
    if b >= bs[-1]:
        return rates[bs[-1]]
    hi = next(x for x in bs if x >= b)
    lo = bs[bs.index(hi) - 1]
    t = (b - lo) / (hi - lo)
    return rates[lo] * (1 - t) + rates[hi] * t


def _packed_stride(b: int, f: int, align: int) -> int:
    n = b * f
    return ((n + align - 1) // align) * align


def _snake_rows(dst_deg: np.ndarray, p: int, c: int) -> np.ndarray:
    """Degree-snake node→row relabeling (mirrors partition_graph
    balance=True): nodes sorted by in-degree dealt snake-wise over p blocks
    of size c.  Returns node_row (n,)."""
    n = len(dst_deg)
    order = np.argsort(-dst_deg, kind="stable")
    k = np.arange(n)
    rnd, j = k // p, k % p
    block = np.where(rnd % 2 == 0, j, p - 1 - j)
    node_row = np.empty(n, np.int64)
    node_row[order] = block * c + rnd
    return node_row


def counts_1d(src: np.ndarray, dst: np.ndarray, n_real: int, p: int,
              balanced: bool = True) -> Dict[str, np.ndarray]:
    """Halo accounting for the P-way 1-D destination-block partition (same
    block layout as parallel.partition.partition_graph)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    c = -(-n_real // p)
    if balanced and p > 1:
        deg = np.bincount(dst, minlength=n_real).astype(np.int64)
        node_row = _snake_rows(deg, p, c)
        src, dst = node_row[src], node_row[dst]
    owner_dst = dst // c
    owner_src = src // c
    cross = owner_src != owner_dst
    edges_per_chip = np.bincount(owner_dst, minlength=p)
    boundary = np.bincount(owner_dst[cross], minlength=p)
    recv_pairs = np.unique(
        np.stack([owner_dst[cross], src[cross]], axis=1), axis=0)
    recv_rows = np.bincount(recv_pairs[:, 0], minlength=p)
    send_trip = np.unique(np.stack(
        [owner_src[cross], owner_dst[cross], src[cross]], axis=1), axis=0)
    send_rows = np.bincount(send_trip[:, 0], minlength=p)
    return {
        "own_rows": c,
        "edges_per_chip": edges_per_chip,
        "interior_per_chip": edges_per_chip - boundary,
        "boundary_per_chip": boundary,
        "halo_recv_rows": recv_rows,
        "halo_send_rows": send_rows,
    }


def counts_2d(src: np.ndarray, dst: np.ndarray, n_real: int,
              pr: int, pc: int, balanced: bool = True) -> Dict[str, np.ndarray]:
    """Comm accounting for a 2-D (source×destination) edge partition.

    Grid pr×pc: destination super-blocks D_0..D_{pr-1} (size n/pr rows) and
    source super-blocks S_0..S_{pc-1}; chip (i,j) owns edges D_i×S_j.
    Features stay sharded one block per chip (row-major over the grid).
    Per layer, forward:
      * column gather — chip (i,j) needs the distinct source rows of S_j its
        edges touch; they ride an all-to-all within grid column j (halo
        style, only needed rows, from the pc feature owners of S_j).
      * row reduce — chip (i,j) holds partial maxima over the D_i rows its
        edges touch; a reduce(max)-scatter across grid row i lands each
        chip's owned slice.  Counted as rows touched by OTHER chips in the
        row that this chip must receive+combine for its scatter slice, plus
        rows it must send.
    Backward transposes both (counted by the caller's 2x).  Degree-snake
    balancing (on both axes via total degree) bounds the edge skew.
    Returns per-chip arrays shaped (pr*pc,)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    p = pr * pc
    c_dst = -(-n_real // pr)     # dst super-block rows
    c_src = -(-n_real // pc)     # src super-block rows
    if balanced and p > 1:
        deg = (np.bincount(dst, minlength=n_real)
               + np.bincount(src, minlength=n_real)).astype(np.int64)
        # one shared relabeling drives both axes (features are stored once);
        # snake over the finer grid axis bounds both super-block skews
        node_row = _snake_rows(deg, max(pr, pc), -(-n_real // max(pr, pc)))
        order = np.argsort(node_row)   # row -> node rank
        rank = np.empty(n_real, np.int64)
        rank[order] = np.arange(n_real)
        src, dst = rank[src], rank[dst]
    bi = dst // c_dst            # grid row of each edge
    bj = src // c_src            # grid col of each edge
    chip = bi * pc + bj
    edges_per_chip = np.bincount(chip, minlength=p)

    # Column gather: distinct (chip, src) the chip's edges touch, minus rows
    # the chip itself owns (feature owner = row-major chip of the node's
    # 1/p block).
    own_block = -(-n_real // p)
    feat_owner_src = src // own_block
    pairs = np.unique(np.stack([chip, src], axis=1), axis=0)
    pair_owner = pairs[:, 1] // own_block
    gather_recv = np.bincount(
        pairs[pair_owner != pairs[:, 0], 0], minlength=p)
    # gather send: feature owner q sends row to every needing chip in the
    # column group of that row's source super-block
    send_pairs = pairs[pair_owner != pairs[:, 0]]
    gather_send = np.bincount(send_pairs[:, 1] // own_block, minlength=p)

    # Row reduce: distinct (chip, dst) partial rows; each partial row must
    # reach the dst row's feature owner — rows whose owner is another chip
    # are sent; the owner receives one copy per contributing chip.
    rpairs = np.unique(np.stack([chip, dst], axis=1), axis=0)
    rowner = rpairs[:, 1] // own_block
    reduce_send = np.bincount(rpairs[rowner != rpairs[:, 0], 0], minlength=p)
    reduce_recv = np.bincount(rowner[rowner != rpairs[:, 0]], minlength=p)

    return {
        "own_rows": own_block,
        "edges_per_chip": edges_per_chip,
        # interior/boundary split: edges whose source the chip owns
        "interior_per_chip": np.bincount(
            chip[feat_owner_src == chip], minlength=p),
        "boundary_per_chip": np.bincount(
            chip[feat_owner_src != chip], minlength=p),
        "halo_recv_rows": gather_recv + reduce_recv,
        "halo_send_rows": gather_send + reduce_send,
    }


@dataclasses.dataclass
class Candidate:
    mesh_fold: int
    mesh_graph: int
    b_local: int
    fold_batch: int              # global fold batch per chunk (F * b_local)
    scheme: str                  # '1d' | '2d:RxC'
    eff_graph: float             # graph-axis efficiency (overlap model)
    utilization: float           # job-slot fill over the whole run
    efficiency: float            # vs D x best achievable single chip (the
                                 # score; >1 possible when the single-chip
                                 # baseline is HBM-limited on big graphs)
    eff_vs_plateau: float        # vs D x the measured byte-bound plateau
                                 # rate (never >1; cross-graph comparable)
    edge_folds_per_s: float      # modeled mesh throughput
    halo_mb_per_step: float


@dataclasses.dataclass
class MeshPlan:
    n_devices: int
    chosen: Candidate
    table: List[Candidate]
    b_single: int = HBM_FOLD_CEILING_FULL_GRAPH  # single-chip baseline batch
    b_min_measured: int = min(MEASURED_BF16_RATES)
    anchors_source: str = "baked"  # which anchor source scored this plan

    def summary(self) -> str:
        note = ""
        if self.b_single < self.b_min_measured:
            note = (f" [single-chip baseline HBM-limited to "
                    f"b={self.b_single}]")
        lines = [
            f"mesh planner: D={self.n_devices} -> fold={self.chosen.mesh_fold}"
            f" x graph={self.chosen.mesh_graph} (b_local="
            f"{self.chosen.b_local}, fold_batch={self.chosen.fold_batch}, "
            f"modeled efficiency {self.chosen.efficiency:.3f}){note}",
            f"  anchors: {self.anchors_source}",
            "  F xP   scheme b_loc  eff_graph  util   eff   eff_plat"
            "  Medge-folds/s",
        ]
        for c in self.table:
            mark = " *" if c is self.chosen else "  "
            lines.append(
                f"{mark}{c.mesh_fold:>2}x{c.mesh_graph:<3} {c.scheme:>6} "
                f"{c.b_local:>5}  {c.eff_graph:>8.3f}  {c.utilization:>5.3f} "
                f"{c.efficiency:>6.3f}  {c.eff_vs_plateau:>6.3f} "
                f"{c.edge_folds_per_s / 1e6:>9.1f}"
            )
        return "\n".join(lines)


def _graph_axis_model(
    cts: Dict[str, np.ndarray], e_tot: int, b: int, *,
    agg_dtype: str = "bfloat16", part: str = "v5e",
    layer_widths: Sequence[int] = (F_DIM, HIDDEN[0], HIDDEN[1]),
    rates: Optional[Dict[int, float]] = None,
) -> Tuple[float, float]:
    """(efficiency, halo_MB_per_step) of a graph partition at local fold
    batch b — same construction as benchmarks/multichip_evidence.run_model:
    per-edge service time anchored on the measured rate at b, scaled per
    layer by packed-stride ratio; comm egress-bound on the busiest chip;
    interior compute overlaps comm; SPMD barrier takes the worst chip."""
    dt_bytes = 2 if agg_dtype == "bfloat16" else 4
    align = 2048 if agg_dtype == "bfloat16" else 1024
    ici = ICI_EGRESS[part]
    strides = [_packed_stride(b, f, align) for f in layer_widths]
    tau_ref = 1.0 / rate_single_chip(b, rates)
    taus = [tau_ref * s / strides[0] for s in strides]
    t1 = e_tot * b * sum(taus)
    p = len(cts["edges_per_chip"])
    if p == 1:
        return 1.0, 0.0
    t_step = 0.0
    halo_mb = 0.0
    for s_l, tau in zip(strides, taus):
        t_int = cts["interior_per_chip"].max() * b * tau
        t_bnd = cts["boundary_per_chip"].max() * b * tau
        row_bytes = s_l * dt_bytes
        comm_bytes = 2 * row_bytes * max(
            cts["halo_send_rows"].max(), cts["halo_recv_rows"].max())
        halo_mb += comm_bytes / 1e6
        t_step += max(t_int, comm_bytes / ici) + t_bnd
    return t1 / (p * t_step), halo_mb


def _factorizations(d: int):
    return [(f, d // f) for f in range(1, d + 1) if d % f == 0]


def _square_grids(p: int):
    """(pr, pc) grids for the 2-D scheme, closest-to-square first."""
    outs = []
    for pr in range(2, p):
        if p % pr == 0 and p // pr >= 2:
            outs.append((pr, p // pr))
    outs.sort(key=lambda rc: abs(rc[0] - rc[1]))
    return outs


def plan_mesh(
    n_devices: int,
    src: np.ndarray,
    dst: np.ndarray,
    n_real: int,
    *,
    total_jobs: int = 100,
    agg_dtype: str = "bfloat16",
    part: str = "v5e",
    include_2d: bool = False,
    b_candidates: Sequence[int] = (10, 16, 20, 24, 30),
    anchors_path: Optional[str] = None,
    hbm_node_folds: Optional[int] = None,
) -> MeshPlan:
    """Score every (fold, graph) factorization of ``n_devices`` and pick the
    best.  ``total_jobs`` is the run's fold-job count (reference: 10 rounds ×
    10 folds = 100 per condition, train.py:162-178); slots the last chunk
    can't fill count against the candidate (the engine pads by repeating
    jobs — duplicated compute, engine.py job chunking).

    include_2d adds √P-grid 2-D source×destination candidates at pure-graph
    factorizations (model only — used to decide whether the scheme is worth
    implementing; VERDICT r3 next-step 1b)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    e_tot = len(src)
    anc = load_anchors(anchors_path)
    rates, tax = anc["rates"], anc["tax"]
    # per-chip HBM bound: (n_real / P) x b <= hbm_node_folds.  Default is
    # the ENGINE footprint measured at the reference graph (B=30 x 24,041
    # nodes: fold-packed activations of 3 layers + Adam state); pass a
    # measured kernel-only budget (e.g. the 10M-edge config's B=8 x 330k,
    # big_graph_r05.json) when planning raw-kernel sweeps — the two
    # footprints differ ~3.7x.
    budget = hbm_node_folds or anc["hbm_ceiling"] * HBM_REF_NODES
    b_hbm_1 = max(int(budget / n_real), 1)
    best_single = max(
        rate_single_chip(min(b, b_hbm_1), rates) for b in b_candidates)

    table: List[Candidate] = []
    for f, p in _factorizations(n_devices):
        # HBM per chip; rates beyond the largest measured B are unexplored —
        # cap there rather than extrapolate.
        b_max = min(max(b_hbm_1 * p, 1), anc["max_b"])
        schemes = [("1d", None)]
        if include_2d and f == 1:
            schemes += [(f"2d:{pr}x{pc}", (pr, pc))
                        for pr, pc in _square_grids(p)]
        for scheme, grid in schemes:
            if grid is None:
                cts = counts_1d(src, dst, n_real, p, balanced=True)
            else:
                cts = counts_2d(src, dst, n_real, *grid, balanced=True)

            def t_epoch(b):
                """(seconds per epoch for a b-wide local fold batch,
                eff_graph, halo MB) — group throughput is P x eff_g x the
                single-chip rate at b, derated by the measured shard_map
                structure tax when the program actually shards the graph."""
                eff_g, halo_mb = _graph_axis_model(
                    cts, e_tot, b, agg_dtype=agg_dtype, part=part,
                    rates=rates)
                t = tax if p > 1 else 1.0
                return (t * e_tot * b / (p * eff_g * rate_single_chip(b, rates)),
                        eff_g, halo_mb)

            for b in sorted({min(b, b_max) for b in b_candidates}):
                t_b, eff_g, halo_mb = t_epoch(b)
                # Job-chunk schedule (engine.py train driver): full chunks
                # of F x b jobs run at width b; a partial final chunk is
                # padded only to a multiple of F and runs at its own
                # (narrower) width — so tail waste is < F duplicate jobs,
                # not a full-width chunk.
                slots = f * b
                n_full, r = divmod(total_jobs, slots)
                t_total = n_full * t_b
                computed = n_full * slots
                if r:
                    b_tail = -(-r // f)
                    t_total += t_epoch(b_tail)[0]
                    computed += f * b_tail
                util = total_jobs / computed
                rate = total_jobs * e_tot / t_total
                eff = rate / (n_devices * best_single)
                table.append(Candidate(
                    mesh_fold=f, mesh_graph=p, b_local=b,
                    fold_batch=f * b, scheme=scheme,
                    eff_graph=round(eff_g, 4), utilization=round(util, 4),
                    efficiency=round(eff, 4),
                    eff_vs_plateau=round(rate / (
                        n_devices * rate_single_chip(anc["max_b"], rates)), 4),
                    edge_folds_per_s=rate, halo_mb_per_step=round(halo_mb, 1),
                ))
    # deterministic pick: highest end-to-end efficiency, ties to fewer graph
    # chips (less memory inflation), then larger b (fewer chunks)
    impl = [c for c in table if c.scheme == "1d"]
    chosen = max(impl, key=lambda c: (c.efficiency, -c.mesh_graph, c.b_local))
    return MeshPlan(n_devices=n_devices, chosen=chosen, table=table,
                    b_single=min(b_hbm_1, anc["max_b"]),
                    b_min_measured=min(rates),
                    anchors_source=anc["source"])
