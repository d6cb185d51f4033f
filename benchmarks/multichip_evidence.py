"""Multi-chip evidence within a 1-chip hardware budget.

The ≥80% pod-slice scaling target (BASELINE.json north star) cannot be
measured directly in this environment (one real chip; virtual CPU devices
share one host, so their "efficiency" is meaningless by construction).  This
harness produces the three quantitative proxies that ARE measurable:

``--mode hw``      (real TPU, 1 chip) — the sharded fold runner at mesh
                   (fold=1, graph=1) vs the plain single-chip pallas runner
                   on the PPI-scale graph.  graph=1 makes every collective
                   degenerate, so the delta is the pure cost of the
                   shard_map program structure the multi-chip path adds.
``--mode virtual`` (8 virtual CPU devices) — sharded XLA step at graph=2
                   with the interior/boundary overlap split vs without.
                   Correctness-grade timing only (shared host CPU); records
                   that the split does not regress the program.
``--mode model``   (host only) — partitions the PPI-scale graph at
                   P = 2/4/8/16, counts halo rows and interior/boundary
                   edges, converts to per-layer DMA + ICI bytes, and
                   projects pod-slice scaling efficiency from the measured
                   single-chip edge-DMA rate and nominal ICI bandwidth.

Workload being scaled: the reference's full-batch training over the
24,041-node PPI graph (reference train.py:141-358; graph scale
main.py:40, topology data_preprocess.py:74-110).  Results merge into
``benchmarks/results/multichip_evidence_r03.json``.
"""
import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

RESULTS = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "results", "multichip_evidence_r05.json")

# PPI-scale workload (reference main.py:40, utils.py:46-49).
N_NODES = 24041
N_EDGES = 700_000
F_DIM = 503
FOLD_BATCH = 10
HIDDEN = (400, 300, 200, 100)

# Nominal per-chip ICI egress bandwidth (aggregate over links, one-way).
# v5e: 2D torus, 4 links x ~45 GB/s; v5p: 3D torus, 6 links x ~90 GB/s.
ICI_EGRESS = {"v5e": 180e9, "v5p": 540e9}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync_scalar(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


def warm_with_retry(label, fn, attempts=4, backoff=20.0):
    """Compile+warm with retries: the remote-compile service 500s
    intermittently (see bench.py)."""
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:
            log(f"{label}: warm attempt {k + 1}/{attempts} failed: "
                f"{str(e)[:300]}")
            if k + 1 < attempts:
                time.sleep(backoff * (2 ** k))
    raise RuntimeError(f"{label}: compile failed after {attempts} attempts")


def merge_results(section, payload):
    data = {}
    if _os.path.exists(RESULTS):
        with open(RESULTS) as f:
            data = json.load(f)
    data[section] = payload
    _os.makedirs(_os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    log(f"wrote {RESULTS} [{section}]")


def _workload(n_nodes, n_edges):
    from plagnn_tpu.data import synthetic_dataset
    from plagnn_tpu.ops import from_scipy_coo, pad_features

    ppi, feats, loc, label_list = synthetic_dataset(
        n_nodes=n_nodes, n_edges=n_edges, seed=70, feature_dims=(3, 250, 250))
    graph = from_scipy_coo(ppi, add_self_loops=True, node_multiple=128)
    feats_p = pad_features(feats, graph.n_nodes)
    labels_p = pad_features(loc, graph.n_nodes)
    return ppi, graph, feats_p, labels_p, loc, label_list


# ---------------------------------------------------------------------------
# (a) hw: sharded runner at graph=1 vs single-chip runner, real chip.
# ---------------------------------------------------------------------------


def run_hw(epochs: int, agg_dtype: str):
    import jax
    import jax.numpy as jnp

    from plagnn_tpu.models.batched import packed_stride
    from plagnn_tpu.ops.pallas.spmm_kernels import (
        build_pallas_graph, pick_rows_per_block, pick_rows_per_block_budget)
    from plagnn_tpu.parallel import make_mesh, partition_graph
    from plagnn_tpu.parallel.sharded import make_sharded_fold_runner
    from plagnn_tpu.train.engine import (
        TrainConfig, init_fold_params, make_batched_fold_runner)
    from plagnn_tpu.train.kfold import fold_node_masks
    from plagnn_tpu.train.losses import weight_cal
    from plagnn_tpu.utils.precision import set_aggregation_dtype

    dev = jax.devices()[0]
    assert dev.platform != "cpu", "hw mode needs the real TPU"
    set_aggregation_dtype(agg_dtype)
    align = 2048 if agg_dtype == "bfloat16" else 1024

    ppi, graph, feats_p, labels_p, loc, label_list = _workload(
        N_NODES, N_EDGES)
    cfg = TrainConfig(
        fold_batch=FOLD_BATCH, spmm_impl="pallas", compute_auc=True,
        auc_every=5, verbose=False)
    class_weight = weight_cal(loc)
    node_valid = jnp.asarray(np.arange(graph.n_nodes) < graph.n_real_nodes)
    v_max = -(-len(label_list) // cfg.fold_num)
    val_width = min(((v_max + 7) // 8) * 8, graph.n_nodes)

    tr_np, va_np = fold_node_masks(
        label_list, graph.n_nodes, cfg.fold_num, 12)
    tr = jnp.asarray(tr_np[:FOLD_BATCH])
    va = jnp.asarray(va_np[:FOLD_BATCH])
    params = init_fold_params(jax.random.PRNGKey(70), cfg, F_DIM, FOLD_BATCH)

    e = graph.n_edges
    src_np = np.asarray(graph.src)[:e]
    dst_np = np.asarray(graph.dst)[:e]
    stride = max(packed_stride(FOLD_BATCH, f, align)
                 for f in (F_DIM, HIDDEN[0], HIDDEN[1]))

    out = {"device": str(getattr(dev, "device_kind", dev)),
           "epochs": epochs, "fold_batch": FOLD_BATCH,
           "agg_dtype": agg_dtype, "auc_every": cfg.auc_every}

    def time_runner(label, run):
        def once(n):
            r = run(params, None, tr, va, jnp.float32(0.1), n_epochs=n)
            return sync_scalar(r[2])

        warm_with_retry(label, lambda: once(epochs))
        t0 = time.perf_counter()
        once(epochs)
        dt = time.perf_counter() - t0
        log(f"{label}: {epochs} epochs in {dt*1e3:.1f} ms "
            f"-> {dt/epochs*1e3:.2f} ms/epoch")
        return dt / epochs

    # Single-chip pallas fold-batched runner (the engine's production path).
    rpb = pick_rows_per_block(graph.n_nodes, stride)
    pg = build_pallas_graph(src_np, dst_np, graph.n_nodes, rpb)
    run_sc, _ = make_batched_fold_runner(
        graph, pg, jnp.asarray(feats_p), jnp.asarray(labels_p),
        class_weight, node_valid, cfg, val_width=val_width)
    out["single_chip_ms_per_epoch"] = time_runner("single_chip", run_sc) * 1e3

    # Sharded runner at mesh (fold=1, graph=1): degenerate collectives; the
    # delta vs the single-chip runner is the shard_map program overhead.
    cfg_m = TrainConfig(
        fold_batch=FOLD_BATCH, spmm_impl="pallas", compute_auc=True,
        auc_every=5, verbose=False, mesh_fold=1, mesh_graph=1)
    rpb_m = pick_rows_per_block_budget(stride)
    pgraph = partition_graph(
        src_np, dst_np, graph.n_real_nodes, n_chips=1,
        add_self_loops=False, pallas_rows_per_block=rpb_m)
    mesh = make_mesh(n_graph=1, n_fold=1)
    run_sh, _ = make_sharded_fold_runner(
        mesh, pgraph, np.asarray(feats_p)[:graph.n_real_nodes],
        np.asarray(labels_p)[:graph.n_real_nodes],
        class_weight, cfg_m, val_width=val_width)
    out["sharded_graph1_ms_per_epoch"] = time_runner("sharded_g1", run_sh) * 1e3
    out["sharding_overhead"] = (
        out["sharded_graph1_ms_per_epoch"] / out["single_chip_ms_per_epoch"])
    log(f"sharding overhead at graph=1: {out['sharding_overhead']:.3f}x")
    merge_results("hw_graph1_overhead", out)


# ---------------------------------------------------------------------------
# (b) virtual: overlap on/off at graph=2 on the virtual CPU mesh.
# ---------------------------------------------------------------------------


def run_virtual(steps: int):
    _os.environ["JAX_PLATFORMS"] = "cpu"
    flags = _os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        _os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from plagnn_tpu.parallel import (
        make_mesh, make_sharded_train_step, partition_graph, shard_features)
    from plagnn_tpu.train.engine import TrainConfig, init_fold_params
    from plagnn_tpu.train.kfold import fold_node_masks
    from plagnn_tpu.train.losses import weight_cal

    ppi, graph, feats_p, labels_p, loc, label_list = _workload(
        N_NODES, N_EDGES)
    cfg = TrainConfig(fold_batch=2)
    tx = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    w = weight_cal(loc)
    mesh = make_mesh(n_graph=2, n_fold=1)
    params = init_fold_params(jax.random.PRNGKey(70), cfg, F_DIM, 1)

    e = graph.n_edges
    src_np = np.asarray(graph.src)[:e]
    dst_np = np.asarray(graph.dst)[:e]

    out = {"steps": steps, "n_graph": 2, "note":
           "virtual CPU devices share one host - correctness-grade only"}
    for tag, overlap in (("overlap", True), ("no_overlap", False)):
        pgraph = partition_graph(
            src_np, dst_np, graph.n_real_nodes, n_chips=2,
            add_self_loops=False, overlap=overlap)
        tr_np, _ = fold_node_masks(
            label_list, pgraph.n_chips * pgraph.own_rows, cfg.fold_num, 12)
        tr = jnp.asarray(tr_np[:1].reshape(1, pgraph.n_chips, pgraph.own_rows))
        x_sh = jnp.asarray(shard_features(
            np.asarray(feats_p)[:graph.n_real_nodes], pgraph))
        y_sh = jnp.asarray(shard_features(
            np.asarray(labels_p)[:graph.n_real_nodes], pgraph))
        opt = jax.vmap(tx.init)(params)
        step = make_sharded_train_step(mesh, pgraph, tx, w)
        sync_scalar(step(params, opt, x_sh, y_sh, tr)[2])  # warm
        t0 = time.perf_counter()
        for _ in range(steps):
            r = step(params, opt, x_sh, y_sh, tr)
        sync_scalar(r[2])
        out[f"{tag}_ms_per_step"] = (time.perf_counter() - t0) / steps * 1e3
        log(f"{tag}: {out[f'{tag}_ms_per_step']:.1f} ms/step")
    out["overlap_vs_no_overlap"] = (
        out["overlap_ms_per_step"] / out["no_overlap_ms_per_step"])
    merge_results("virtual_overlap", out)


# ---------------------------------------------------------------------------
# (c) model: halo-bytes accounting + projected pod-slice efficiency.
# ---------------------------------------------------------------------------


def balance_rows(src, dst, n_real, p, c):
    """Degree-snake row relabeling (mirrors partition_graph balance=True)."""
    deg = np.bincount(dst, minlength=n_real).astype(np.int64)
    order = np.argsort(-deg, kind="stable")
    k = np.arange(n_real)
    rnd, j = k // p, k % p
    block = np.where(rnd % 2 == 0, j, p - 1 - j)
    node_row = np.empty(n_real, np.int64)
    node_row[order] = block * c + rnd
    return node_row[src], node_row[dst]


def rcm_segment_rows(src, dst, n_real, p):
    """Locality-aware edge-balanced rows: RCM ordering cut into P contiguous
    segments of ~E/P incoming edges each.  Segments keep community locality
    (small halo) while the cuts balance edges; node counts per segment vary,
    so the common block size C is the largest segment (memory inflation is
    the price of locality).  Returns (node_row, c)."""
    from plagnn_tpu.ops.reorder import rcm_order

    perm = rcm_order(src, dst, n_real)          # NEW -> OLD
    deg = np.bincount(dst, minlength=n_real).astype(np.int64)
    cum = np.cumsum(deg[perm])
    targets = cum[-1] * np.arange(1, p) / p
    cuts = np.searchsorted(cum, targets)
    bounds = np.concatenate([[0], cuts, [n_real]])
    c = int(-(-np.diff(bounds).max() // 8) * 8)
    node_row = np.empty(n_real, np.int64)
    for b in range(p):
        seg = perm[bounds[b]:bounds[b + 1]]
        node_row[seg] = b * c + np.arange(len(seg))
    return node_row, c


def partition_counts(src, dst, n_real, p, balanced=False, strategy=None):
    """Host-side halo accounting for a P-way destination-block partition
    (same block layout as parallel.partition.partition_graph).

    strategy overrides ``balanced``: 'contiguous' | 'snake' | 'rcm_seg'."""
    strategy = strategy or ("snake" if balanced else "contiguous")
    c = -(-n_real // p)
    if strategy == "snake":
        src, dst = balance_rows(src, dst, n_real, p, c)
    elif strategy == "rcm_seg":
        node_row, c = rcm_segment_rows(src, dst, n_real, p)
        src, dst = node_row[src], node_row[dst]
    owner_dst = dst // c
    owner_src = src // c
    cross = owner_src != owner_dst
    edges_per_chip = np.bincount(owner_dst, minlength=p)
    boundary_per_chip = np.bincount(owner_dst[cross], minlength=p)
    # halo rows chip pp must RECEIVE: unique (consumer, global src) pairs
    recv_pairs = np.unique(
        np.stack([owner_dst[cross], src[cross]], axis=1), axis=0)
    recv_rows = np.bincount(recv_pairs[:, 0], minlength=p)
    # rows chip q must SEND: unique (owner, consumer, src) triples per owner
    send_trip = np.unique(np.stack(
        [owner_src[cross], owner_dst[cross], src[cross]], axis=1), axis=0)
    send_rows = np.bincount(send_trip[:, 0], minlength=p)
    return {
        "own_rows": c,
        "edges_per_chip": edges_per_chip,
        "interior_per_chip": edges_per_chip - boundary_per_chip,
        "boundary_per_chip": boundary_per_chip,
        "halo_recv_rows": recv_rows,
        "halo_send_rows": send_rows,
    }


def run_model(measured_edge_folds_per_s: float, bytes_per_edge_fold: int,
              agg_dtype: str, part: str, n_nodes: int = N_NODES,
              n_edges: int = N_EDGES, topology: str = "powerlaw",
              strategies=("contiguous", "balanced")):
    from plagnn_tpu.data.synthetic import clustered_ppi, powerlaw_ppi
    from plagnn_tpu.models.batched import packed_stride

    gen = clustered_ppi if topology == "clustered" else powerlaw_ppi
    ppi = gen(n_nodes=n_nodes, n_edges=n_edges, seed=70)
    loops = np.arange(n_nodes, dtype=np.int64)
    src = np.concatenate([np.asarray(ppi.row, np.int64), loops])
    dst = np.concatenate([np.asarray(ppi.col, np.int64), loops])
    e_tot = len(src)
    strategy_of = {"contiguous": "contiguous", "balanced": "snake",
                   "rcm_seg": "rcm_seg"}

    dt_bytes = 2 if agg_dtype == "bfloat16" else 4
    align = 2048 if agg_dtype == "bfloat16" else 1024
    ici = ICI_EGRESS[part]
    # Aggregation runs per layer on pooled widths (in-dims of conv1..3); the
    # measured rate is at the conv1 stride, and per-edge service time is
    # byte-bound, so narrower layers scale by their stride ratio.
    layer_widths = [F_DIM, HIDDEN[0], HIDDEN[1]]
    strides = [packed_stride(FOLD_BATCH, f, align) for f in layer_widths]
    tau_ref = 1.0 / measured_edge_folds_per_s      # s per edge-fold, conv1
    taus = [tau_ref * s / strides[0] for s in strides]
    # 1-chip epoch-aggregation time: all 3 layers over every edge.
    t1 = e_tot * FOLD_BATCH * sum(taus)

    section = ("halo_bytes_model" if n_nodes == N_NODES
               else f"halo_bytes_model_{n_edges // 1_000_000}M")
    if topology != "powerlaw":
        section += f"_{topology}"
    out = {
        "assumptions": {
            "measured_single_chip_edge_folds_per_s": measured_edge_folds_per_s,
            "bytes_per_edge_fold": bytes_per_edge_fold,
            "implied_dma_rate_GBps": round(
                measured_edge_folds_per_s * bytes_per_edge_fold / 1e9, 1),
            "ici_egress_GBps": ici / 1e9,
            "part": part,
            "agg_dtype": agg_dtype,
            "fold_batch": FOLD_BATCH,
            "topology": topology,
            "comm_counted_fwd_and_bwd": True,
            "gemm_time_ignored": "SpMM-dominated model: GEMMs overlap on the MXU",
        },
        "graph": {"n_nodes": n_nodes, "directed_edges_incl_loops": e_tot},
        "per_p": {},
    }
    for p in (2, 4, 8, 16):
        out["per_p"][str(p)] = {}
        for tag in strategies:
            cts = partition_counts(src, dst, n_nodes, p,
                                   strategy=strategy_of[tag])
            t_layers_ov = 0.0
            t_layers_seq = 0.0
            halo_mb = 0.0
            for s_l, tau in zip(strides, taus):
                # worst chip bounds the step (SPMD barrier at the psum)
                t_int = cts["interior_per_chip"].max() * FOLD_BATCH * tau
                t_bnd = cts["boundary_per_chip"].max() * FOLD_BATCH * tau
                row_bytes = s_l * dt_bytes
                # all_to_all fwd + its transpose in bwd: 2x the row bytes;
                # egress-bound on the busiest sender/receiver
                comm_bytes = 2 * row_bytes * max(
                    cts["halo_send_rows"].max(), cts["halo_recv_rows"].max())
                t_comm = comm_bytes / ici
                halo_mb += comm_bytes / 1e6
                t_layers_ov += max(t_int, t_comm) + t_bnd
                t_layers_seq += t_int + t_bnd + t_comm
            eff_ov = t1 / (p * t_layers_ov)
            eff_seq = t1 / (p * t_layers_seq)
            out["per_p"][str(p)][tag] = {
                "own_rows": int(cts["own_rows"]),
                "mem_inflation_rows": round(
                    p * int(cts["own_rows"]) / n_nodes, 3),
                "edges_worst_chip": int(cts["edges_per_chip"].max()),
                "edge_skew_worst_over_mean": round(
                    float(cts["edges_per_chip"].max()
                          / (e_tot / p)), 3),
                "interior_worst": int(cts["interior_per_chip"].max()),
                "boundary_worst": int(cts["boundary_per_chip"].max()),
                "halo_recv_rows_worst": int(cts["halo_recv_rows"].max()),
                "halo_send_rows_worst": int(cts["halo_send_rows"].max()),
                "halo_MB_per_step_worst_chip": round(halo_mb, 1),
                "projected_efficiency_overlap": round(eff_ov, 3),
                "projected_efficiency_sequential": round(eff_seq, 3),
            }
            log(f"P={p} {tag}: skew "
                f"{out['per_p'][str(p)][tag]['edge_skew_worst_over_mean']}x, "
                f"halo {halo_mb:.0f} MB/step, eff overlap {eff_ov:.3f} "
                f"vs sequential {eff_seq:.3f}")
    merge_results(section, out)


# ---------------------------------------------------------------------------
# (d) plan: mesh-planner tables — the production (fold, graph) recipe.
# ---------------------------------------------------------------------------


def run_plan(devices_list, n_nodes, n_edges, jobs, include_2d,
             hbm_node_folds=None):
    """Record the mesh planner's candidate tables: the production answer to
    'how do I run 2 hosts' (VERDICT r3 next-step 1a) plus the modeled 2-D
    source x destination grid numbers (1b — recorded as a dead end unless a
    grid clears 0.80 at pure graph)."""
    from plagnn_tpu.data.synthetic import powerlaw_ppi
    from plagnn_tpu.parallel.planner import plan_mesh

    ppi = powerlaw_ppi(n_nodes=n_nodes, n_edges=n_edges, seed=70)
    loops = np.arange(n_nodes, dtype=np.int64)
    src = np.concatenate([np.asarray(ppi.row, np.int64), loops])
    dst = np.concatenate([np.asarray(ppi.col, np.int64), loops])
    out = {"graph": {"n_nodes": n_nodes, "directed_edges_incl_loops":
                     len(src)}, "total_jobs": jobs, "per_devices": {}}
    for d in devices_list:
        plan = plan_mesh(d, src, dst, n_nodes, total_jobs=jobs,
                         include_2d=include_2d,
                         hbm_node_folds=hbm_node_folds)
        log(plan.summary())
        ch = plan.chosen
        two_d = [c for c in plan.table if c.scheme.startswith("2d:")]
        out["per_devices"][str(d)] = {
            "chosen": vars(ch),
            "best_2d_eff_graph": (max(c.eff_graph for c in two_d)
                                  if two_d else None),
            "table": [vars(c) for c in plan.table],
        }
    section = ("mesh_plan" if n_nodes == N_NODES
               else f"mesh_plan_{n_edges // 1_000_000}M")
    merge_results(section, out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("hw", "virtual", "model", "plan"),
                    required=True)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--agg-dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--measured-rate", type=float, default=113.9e6,
                    help="measured single-chip fwd+bwd edge-folds/s at the "
                         "training shape (B=10 bf16: 113.9 M, BASELINE.md)")
    ap.add_argument("--bytes-per-edge-fold", type=int, default=3328,
                    help="B=10 bf16: fwd 6144*2/10 + bwd 16*2*384*2/10")
    ap.add_argument("--part", default="v5e", choices=tuple(ICI_EGRESS))
    ap.add_argument("--nodes", type=int, default=N_NODES)
    ap.add_argument("--edges", type=int, default=N_EDGES)
    ap.add_argument("--topology", default="powerlaw",
                    choices=("powerlaw", "clustered"))
    ap.add_argument("--strategies", nargs="+",
                    default=["contiguous", "balanced"],
                    choices=("contiguous", "balanced", "rcm_seg"))
    ap.add_argument("--devices", nargs="+", type=int, default=[8, 16, 32],
                    help="plan mode: device counts to plan for")
    ap.add_argument("--jobs", type=int, default=100,
                    help="plan mode: fold jobs (rounds x folds)")
    ap.add_argument("--no-2d", action="store_true")
    ap.add_argument("--hbm-node-folds", type=int, default=None,
                    help="plan mode: per-chip HBM budget in node-folds "
                         "(default: the engine footprint 30 x 24041; pass "
                         "the measured kernel-only 8 x 330304 for 10M-edge "
                         "raw-kernel plans)")
    args = ap.parse_args()
    if args.mode == "hw":
        run_hw(args.epochs, args.agg_dtype)
    elif args.mode == "virtual":
        run_virtual(args.steps)
    elif args.mode == "plan":
        run_plan(args.devices, args.nodes, args.edges, args.jobs,
                 include_2d=not args.no_2d,
                 hbm_node_folds=args.hbm_node_folds)
    else:
        run_model(args.measured_rate, args.bytes_per_edge_fold,
                  args.agg_dtype, args.part, n_nodes=args.nodes,
                  n_edges=args.edges, topology=args.topology,
                  strategies=tuple(args.strategies))


if __name__ == "__main__":
    main()
