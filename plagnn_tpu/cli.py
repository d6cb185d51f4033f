"""Command-line interface.

Mirrors the reference's six entry scripts (README.md:195-218; SURVEY.md §2
L5) as subcommands of one installable CLI:

    plagnn preprocess     ← code/data_preprocess.py
    plagnn train-normal   ← code/main_normal.py  (-data/-lr/-f/-e/-a/-d)
    plagnn train-inter    ← code/main_inter.py
    plagnn score          ← code/main.py
    plagnn performance    ← code/performance.py
    plagnn statistics     ← code/statistics.py
    plagnn figures        ← code/figure.py / utils.fig_and_perf
    plagnn bench          ← (new) SpMM/epoch throughput benchmark
    plagnn synth          ← (new) synthetic dataset materialization

Flag names and defaults match the reference (-data, -lr 5e-5, -f 10, -e 200,
-a [0.1]); ``-d`` is accepted for compatibility (device selection is
implicit in JAX) plus new flags for the TPU-native knobs (fold batch,
mesh shape, precision).
"""
from __future__ import annotations

import argparse
import os
import sys

# Persistent compiled-executable cache: remote-TPU compiles take minutes; a
# cached executable makes repeat CLI invocations (more rounds, the inter
# condition, resume after a crash) start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def _add_train_flags(p: argparse.ArgumentParser):
    p.add_argument("-data", required=True,
                   choices=["GSE30931", "GSE74572", "GSE27182"],
                   help="dataset (GSE30931=Bortezomib, GSE74572=Trichostatin A,"
                        " GSE27182=Tacrolimus)")
    p.add_argument("-lr", type=float, default=0.00005)
    p.add_argument("-f", type=int, default=10, help="fold num")
    p.add_argument("-e", type=int, default=200, help="epoch num")
    p.add_argument("-a", nargs="*", default=[0.1], help="alpha list")
    p.add_argument("-d", type=str, default="tpu",
                   help="accepted for reference compatibility")
    p.add_argument("--data-root", default="data")
    # default None = "not user-set" so --mesh auto can tell an explicit
    # request apart from the default (10) before overriding it
    p.add_argument("--fold-batch", type=int, default=None,
                   help="folds trained simultaneously (vmap/packing width; "
                        "default 10).  Under --mesh auto the planner picks "
                        "the fold batch; an explicit value constrains its "
                        "candidates instead of being silently discarded")
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--seed", type=int, default=70)
    p.add_argument("--no-auc", action="store_true")
    p.add_argument("--auc-every", type=int, default=5,
                   help="AUC sampling cadence in epochs (the on-device AUC "
                        "is sort-based; every epoch costs ~8x a plain "
                        "epoch; the value carries between samples)")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="persist params/opt/history every N epochs for "
                        "mid-round crash resume (0 = round-level resume "
                        "only)")
    p.add_argument("--precision", default="highest",
                   choices=["default", "high", "highest"])
    p.add_argument("--agg-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="aggregation message dtype (bfloat16 halves SpMM "
                        "gather traffic; float32 = reference parity)")
    p.add_argument("--spmm", default="xla", choices=["xla", "pallas"],
                   help="aggregation impl: XLA bucketed ELL, or the "
                        "fold-batched Pallas kernels (TPU)")
    p.add_argument("--pallas-interpret", action="store_true",
                   help="run the pallas kernels in interpret mode (CPU "
                        "verification of the --spmm pallas path)")
    p.add_argument("--hub-cache", default="auto",
                   help="pallas VMEM hub cache: 'auto' (measured policy — "
                        "fwd hub at issue-bound strides, bwd hub at "
                        "byte-bound strides), 'off', or an integer k "
                        "(top-k most-fetched rows served from VMEM)")
    p.add_argument("--mesh", default="fold=1,graph=1",
                   help="multi-chip mesh 'fold=F,graph=P': P chips "
                        "edge-partition the graph (halo all_to_all per "
                        "layer), F groups data-parallelize the fold "
                        "ensemble; needs F*P devices and fold-batch %% F "
                        "== 0 (default: single chip).  'auto' (or 'auto:D') "
                        "runs the mesh planner over the halo-bytes model "
                        "and picks the factorization + fold batch "
                        "(parallel/planner.py)")
    p.add_argument("--no-mesh-balance", action="store_true",
                   help="disable the balanced (degree-snake) edge partition "
                        "and use contiguous node-id blocks (diagnostic; "
                        "power-law graphs can be badly edge-skewed)")


def parse_mesh(spec: str):
    """'fold=F,graph=P' (either key optional) → (mesh_fold, mesh_graph);
    'auto' / 'auto:D' → ('auto', D-or-None) for the mesh planner."""
    s = str(spec).strip()
    if s == "auto" or s.startswith("auto:"):
        n = None
        if ":" in s:
            try:
                n = int(s.split(":", 1)[1])
            except ValueError:
                raise SystemExit(
                    f"invalid --mesh {spec!r}: expected 'auto' or 'auto:D'")
            if n < 1:
                raise SystemExit(
                    f"invalid --mesh {spec!r}: device count must be >= 1")
        return ("auto", n)
    vals = {"fold": 1, "graph": 1}
    for part in str(spec).split(","):
        part = part.strip()
        if not part:
            continue
        try:
            k, v = part.split("=")
            vals[k.strip()] = int(v)
        except (ValueError, KeyError):
            raise SystemExit(
                f"invalid --mesh {spec!r}: expected 'fold=F,graph=P'")
        if k.strip() not in ("fold", "graph"):
            raise SystemExit(
                f"invalid --mesh {spec!r}: unknown axis {k.strip()!r}")
    if vals["fold"] < 1 or vals["graph"] < 1:
        raise SystemExit(f"invalid --mesh {spec!r}: sizes must be >= 1")
    return vals["fold"], vals["graph"]


def _train(args, condition: str):
    import numpy as np

    from .data.artifacts import load_condition, load_label_names
    from .train.engine import TrainConfig, train
    from .train.kfold import FOLD_SEEDS
    from .utils.precision import set_matmul_precision

    from .utils.precision import set_aggregation_dtype

    set_matmul_precision(args.precision)
    set_aggregation_dtype(args.agg_dtype)
    bundle = load_condition(args.data_root, args.data, condition)
    subdir = "normal" if condition == "normal" else "perturbation"
    log_path = os.path.join(args.data_root, "log", args.data, subdir) + os.sep
    os.makedirs(log_path, exist_ok=True)
    print(
        "learning rate:{:.8f}, fold num:{:}, epoch num:{:}, alpha list:{},device:{}".format(
            args.lr, args.f, args.e, list(map(float, args.a)), args.d
        )
    )
    with open(os.path.join(log_path, "txt_log.txt"), "w") as f:
        f.write(
            "learning rate:{:.8f}, fold num:{:}, epoch num:{:}, alpha list:{}, device:{}\n".format(
                args.lr, args.f, args.e, list(map(float, args.a)), args.d
            )
        )
    mesh_spec = parse_mesh(args.mesh)
    fold_batch = args.fold_batch if args.fold_batch is not None else 10
    if mesh_spec[0] == "auto":
        import jax

        from .parallel.planner import plan_mesh

        n_dev = mesh_spec[1] or len(jax.devices())
        g = bundle.graph
        e = g.n_edges
        kw = {}
        if args.fold_batch is not None:
            # honor an explicit --fold-batch: constrain the planner's local
            # fold-batch candidates to divisors consistent with the request
            # so chosen.fold_batch == the requested width whenever some
            # factorization supports it (ADVICE r4)
            kw["b_candidates"] = sorted({
                args.fold_batch // f
                for f in range(1, n_dev + 1)
                if n_dev % f == 0 and args.fold_batch % f == 0
            })
        plan = plan_mesh(
            n_dev, np.asarray(g.src)[:e], np.asarray(g.dst)[:e],
            g.n_real_nodes, total_jobs=args.rounds * args.f, **kw)
        print(plan.summary())
        mesh_fold = plan.chosen.mesh_fold
        mesh_graph = plan.chosen.mesh_graph
        fold_batch = plan.chosen.fold_batch
        if args.fold_batch is not None and fold_batch != args.fold_batch:
            print(
                f"warning: --mesh auto chose fold_batch={fold_batch} "
                f"(mesh fold={mesh_fold} x graph={mesh_graph}); the "
                f"requested --fold-batch {args.fold_batch} is not "
                "achievable at the best factorization"
            )
    else:
        mesh_fold, mesh_graph = mesh_spec
    if args.hub_cache not in ("auto", "off") and not args.hub_cache.isdigit():
        raise SystemExit(
            f"invalid --hub-cache {args.hub_cache!r}: expected 'auto', "
            "'off', or an integer k")
    cfg = TrainConfig(
        lr=args.lr,
        fold_num=args.f,
        epoch_num=args.e,
        alpha_list=tuple(map(float, args.a)),
        fold_seeds=tuple(FOLD_SEEDS[: args.rounds]),
        seed=args.seed,
        fold_batch=fold_batch,
        compute_auc=not args.no_auc,
        auc_every=args.auc_every,
        checkpoint_every=args.checkpoint_every,
        spmm_impl=args.spmm,
        pallas_interpret=args.pallas_interpret,
        hub_cache=args.hub_cache,
        mesh_fold=mesh_fold,
        mesh_graph=mesh_graph,
        mesh_balance=not args.no_mesh_balance,
    )
    train(
        bundle.graph,
        bundle.feats,
        bundle.labels,
        bundle.label_with_loc,
        bundle.loc_mat,
        cfg,
        log_path,
        label_names=load_label_names(args.data_root) or bundle.uniprot,
        device_name=args.d,
    )


def main(argv=None):
    parser = argparse.ArgumentParser(prog="plagnn")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("preprocess", help="materialize graph/feature artifacts")
    p.add_argument("--data-root", default="data")
    p.add_argument("--no-dense-gcn", action="store_true",
                   help="skip the dense PCC .npz artifacts (lean mode)")

    p = sub.add_parser("geo", help="series-matrix → exprSet CSV (data_reader.R port)")
    p.add_argument("series_matrix")
    p.add_argument("probe_map", help="probe_id,uniprot_id CSV")
    p.add_argument("out_csv")

    for name in ("train-normal", "train-inter"):
        p = sub.add_parser(name)
        _add_train_flags(p)

    p = sub.add_parser("score", help="mis-localization ranking (main.py)")
    p.add_argument("--data-root", default="data")

    p = sub.add_parser("performance", help="CV metrics + random baselines")
    p.add_argument("--data-root", default="data")
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--folds", type=int, default=10)

    p = sub.add_parser("statistics", help="topology-change statistics")
    p.add_argument("--data-root", default="data")

    p = sub.add_parser("figures", help="metric curves / distribution figures")
    p.add_argument("--data-root", default="data")
    p.add_argument("--diff-hist", action="store_true",
                   help="also render ΔPCC linked/unlinked histograms "
                        "(figure.py save_diff/fig)")
    p.add_argument("--save-diff", action="store_true",
                   help="persist the ΔPCC artifact triple diff.npy/"
                        "diff_link.npy/diff_unlink.npy + hist_data.json "
                        "(figure.py:10-76 contract; O(N²) on disk)")
    p.add_argument("--alpha-dist", action="store_true",
                   help="also render per-organelle distribution bars + JS "
                        "distance (figure.py fig_alpha)")

    p = sub.add_parser(
        "plan-mesh",
        help="score (fold, graph) mesh factorizations for D devices via the "
             "halo-bytes model and print the production recommendation")
    p.add_argument("--devices", type=int, required=True,
                   help="device count to plan for (e.g. 16 = 2 v5e hosts)")
    p.add_argument("--data-root", default=None,
                   help="plan over this dataset's PPI_normal.npz; default: "
                        "the synthetic PPI-scale graph")
    p.add_argument("--jobs", type=int, default=100,
                   help="fold jobs in the run (rounds x folds; reference "
                        "train.py:162-178 = 100)")
    p.add_argument("--nodes", type=int, default=24041)
    p.add_argument("--edges", type=int, default=700000)
    p.add_argument("--include-2d", action="store_true",
                   help="also model 2-D source x destination grid partitions "
                        "(candidates only; not an implemented runner)")
    p.add_argument("--part", default="v5e", choices=["v5e", "v5p"])

    p = sub.add_parser("synth", help="write a synthetic dataset bundle")
    p.add_argument("--data-root", default="data")
    p.add_argument("--nodes", type=int, default=24041)
    p.add_argument("--edges", type=int, default=700000)
    p.add_argument("--seed", type=int, default=70)

    sub.add_parser("bench", help="run the throughput benchmark")

    args = parser.parse_args(argv)

    if args.cmd == "preprocess":
        from .data.preprocess import preprocess

        preprocess(args.data_root, dense_gcn_artifacts=not args.no_dense_gcn)
    elif args.cmd == "geo":
        from .data.geo import write_expr_set

        write_expr_set(args.series_matrix, args.probe_map, args.out_csv)
    elif args.cmd == "train-normal":
        _train(args, "normal")
    elif args.cmd == "train-inter":
        _train(args, "inter")
    elif args.cmd == "score":
        from .analysis.score import score_all

        score_all(args.data_root)
    elif args.cmd == "performance":
        import json

        from .analysis.performance import mat_merge, performance
        from .data.artifacts import load_condition  # noqa: F401

        gm = os.path.join(args.data_root, "generate_materials")
        with open(os.path.join(gm, "protein_ppi.json")) as f:
            n_nodes = len(json.load(f))
        mat_merge(os.path.join(args.data_root, "log"), n_nodes,
                  rounds=args.rounds, fold_num=args.folds)
        performance(args.data_root, rounds=args.rounds)
    elif args.cmd == "statistics":
        from .analysis.statistics import topology_statistics

        topology_statistics(args.data_root)
    elif args.cmd == "figures":
        import glob

        import numpy as np
        import scipy.sparse as sp

        from .analysis.figures import (
            diff_histogram, fig_alpha, fig_and_perf, hist_data_from_diff,
            plot_diff_histogram, save_diff,
        )
        from .data.expression import pcc_factors

        for fd in glob.glob(os.path.join(args.data_root, "log", "GSE*", "*",
                                         "fig_data_*.json")):
            fig_and_perf(fd, out_dir=os.path.dirname(fd))
        gm = os.path.join(args.data_root, "generate_materials")
        if args.save_diff:
            ppi = sp.load_npz(os.path.join(gm, "PPI_normal.npz"))
            for dsd in glob.glob(os.path.join(gm, "GSE*_data")):
                en = os.path.join(dsd, "expr_normal.npy")
                ei = os.path.join(dsd, "expr_inter.npy")
                if not (os.path.exists(en) and os.path.exists(ei)):
                    continue
                save_diff(pcc_factors(np.load(ei)), pcc_factors(np.load(en)),
                          ppi, dsd)
                hist_data_from_diff(dsd)
        if args.diff_hist:
            ppi = sp.load_npz(os.path.join(gm, "PPI_normal.npz"))
            for dsd in glob.glob(os.path.join(gm, "GSE*_data")):
                en = os.path.join(dsd, "expr_normal.npy")
                ei = os.path.join(dsd, "expr_inter.npy")
                if not (os.path.exists(en) and os.path.exists(ei)):
                    continue
                z_n = pcc_factors(np.load(en))
                z_i = pcc_factors(np.load(ei))
                bins, linked, unlinked = diff_histogram(z_i, z_n, ppi)
                plot_diff_histogram(
                    bins, linked, unlinked, os.path.basename(dsd),
                    os.path.join(dsd, "diff_hist.png"))
        if args.alpha_dist:
            loc = sp.load_npz(os.path.join(gm, "loc_matrix.npz")).toarray()
            label_dist = loc.sum(0) / max(loc.sum(), 1)
            for ld in glob.glob(os.path.join(args.data_root, "log", "GSE*",
                                             "*")):
                if os.path.isdir(ld):
                    fig_alpha(ld, os.path.join(ld, "alpha_dist.png"),
                              label_dist)
    elif args.cmd == "plan-mesh":
        import numpy as np

        from .parallel.planner import plan_mesh

        if args.data_root:
            import scipy.sparse as sp

            ppi = sp.load_npz(os.path.join(
                args.data_root, "generate_materials", "PPI_normal.npz"
            )).tocoo()
            n = ppi.shape[0]
            loops = np.arange(n, dtype=np.int64)
            src = np.concatenate([np.asarray(ppi.row, np.int64), loops])
            dst = np.concatenate([np.asarray(ppi.col, np.int64), loops])
        else:
            from .data.synthetic import powerlaw_ppi

            ppi = powerlaw_ppi(args.nodes, args.edges, seed=70)
            n = args.nodes
            loops = np.arange(n, dtype=np.int64)
            src = np.concatenate([np.asarray(ppi.row, np.int64), loops])
            dst = np.concatenate([np.asarray(ppi.col, np.int64), loops])
        plan = plan_mesh(args.devices, src, dst, n, total_jobs=args.jobs,
                         include_2d=args.include_2d, part=args.part)
        print(plan.summary())
    elif args.cmd == "synth":
        _write_synth(args)
    elif args.cmd == "bench":
        import runpy

        runpy.run_path(
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
            run_name="__main__",
        )
    return 0


def _write_synth(args):
    """Materialize a synthetic dataset under the reference artifact contract
    so the full CLI pipeline runs without the real data blobs."""
    import json

    import numpy as np
    import scipy.sparse as sp

    from .data.synthetic import powerlaw_ppi, synthetic_features, synthetic_loc_matrix

    gm = os.path.join(args.data_root, "generate_materials")
    os.makedirs(gm, exist_ok=True)
    sm = os.path.join(args.data_root, "support_materials")
    os.makedirs(sm, exist_ok=True)
    # the 12 GO CC terms (data/support_materials/cellular_component.txt)
    cc_terms = [
        "GO:0005938", "GO:0005829", "GO:0015629", "GO:0005794",
        "GO:0005783", "GO:0005730", "GO:0005777", "GO:0005739",
        "GO:0005764", "GO:0005813", "GO:0005634", "GO:0005886",
    ]
    with open(os.path.join(sm, "cellular_component.txt"), "w") as f:
        f.write("\n".join(cc_terms) + "\n")
    ppi = powerlaw_ppi(args.nodes, args.edges, args.seed)
    sp.save_npz(os.path.join(gm, "PPI_normal"), ppi)
    protein_list = [f"SYN{i:06d}" for i in range(args.nodes)]
    with open(os.path.join(gm, "protein_ppi.json"), "w") as f:
        json.dump(protein_list, f)
    feats = synthetic_features(args.nodes, args.seed)
    np.save(os.path.join(gm, "ECC_normal_pca"), feats[:, 253:])
    loc, label_list = synthetic_loc_matrix(args.nodes, args.seed)
    sp.save_npz(os.path.join(gm, "loc_matrix"), loc)
    with open(os.path.join(gm, "label_with_loc_list.json"), "w") as f:
        json.dump(label_list, f)
    with open(os.path.join(gm, "label_list.json"), "w") as f:
        json.dump([(u, []) for u in protein_list], f)
    for gse in ("GSE30931", "GSE74572", "GSE27182"):
        d = os.path.join(gm, f"{gse}_data")
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "GCN_normal_pca"), feats[:, 3:253])
        np.save(os.path.join(d, "expr_normal"), feats[:, :3].astype(np.float64))
        sp.save_npz(os.path.join(d, "PPI_inter"), ppi)
        np.save(os.path.join(d, "GCN_inter_pca"), feats[:, 3:253])
        np.save(os.path.join(d, "ECC_inter_pca"), feats[:, 253:])
        np.save(os.path.join(d, "expr_inter"), feats[:, :3].astype(np.float64))
    print(f"synthetic dataset at {gm}")


if __name__ == "__main__":
    sys.exit(main())
