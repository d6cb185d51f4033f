"""Edge-partitioned scaling sweep (BASELINE.json config 5).

Measures sharded-train-step throughput (edges/s) across mesh sizes on a
synthetic 10M-edge PPI-like graph.  On real multi-chip hardware this is the
≥80%-efficiency sweep; on a single host it validates the sharded program and
records the 1-chip baseline (virtual CPU devices give correctness, not
performance — the driver notes which mode ran).

Usage:
    python benchmarks/scaling.py --nodes 1000000 --edges 10000000 \
        --chips 1 2 4 8 [--folds 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--chips", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--folds", type=int, default=1)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--hidden", type=int, nargs=4, default=[64, 48, 32, 16])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu-virtual", type=int, default=0,
                    help="force N virtual CPU devices (validation mode)")
    ap.add_argument("--pallas", action="store_true",
                    help="per-chip fold-batched Pallas aggregation inside "
                         "the sharded step (local gather space must stay "
                         "under the 32768-node int16 argmax ceiling)")
    ap.add_argument("--pallas-interpret", action="store_true")
    ap.add_argument("--balance", action="store_true",
                    help="balanced (degree-snake) edge partition — the "
                         "engine's production default; contiguous blocks "
                         "are edge-skewed on power-law topology")
    args = ap.parse_args()

    if args.cpu_virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_virtual}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.cpu_virtual:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    import optax

    from plagnn_tpu.data import synthetic_dataset
    from plagnn_tpu.models import init_gnn32
    from plagnn_tpu.parallel import (
        make_mesh, make_sharded_pallas_train_step, make_sharded_train_step,
        partition_graph, shard_features,
    )
    from plagnn_tpu.train import weight_cal
    from plagnn_tpu.train.kfold import fold_node_masks

    print(f"devices: {jax.devices()}", file=sys.stderr)
    ppi, feats, loc, label_list = synthetic_dataset(
        n_nodes=args.nodes, n_edges=args.edges, seed=70,
        feature_dims=(3, (args.features - 3) // 2,
                      args.features - 3 - (args.features - 3) // 2),
    )
    w = weight_cal(loc)
    tx = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    results = []
    for p in args.chips:
        if p * args.folds > len(jax.devices()):
            print(f"skip {p} chips (not enough devices)", file=sys.stderr)
            continue
        pg = partition_graph(
            ppi.row, ppi.col, args.nodes, n_chips=p, add_self_loops=True,
            pallas_rows_per_block=8 if args.pallas else None,
            balance=args.balance,
        )
        mesh = make_mesh(n_graph=p, n_fold=args.folds)
        b_folds = args.folds
        keys = jax.random.split(jax.random.PRNGKey(70), b_folds)
        h1, h2, h3, h4 = args.hidden
        params = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[init_gnn32(k, feats.shape[1], h1, h2, h3, h4, 12) for k in keys],
        )
        opt_state = jax.vmap(tx.init)(params)
        tr_np, _ = fold_node_masks(
            label_list, pg.n_chips * pg.own_rows, max(b_folds, 2), 12)
        n_rows = pg.n_chips * pg.own_rows
        if pg.row_map is not None:
            rm = np.asarray(pg.row_map)
            trb = np.zeros((b_folds, n_rows), bool)
            trb[:, rm >= 0] = tr_np[:b_folds][:, rm[rm >= 0]]
        else:
            trb = tr_np[:b_folds, :n_rows]
        tr = jnp.asarray(trb.reshape(b_folds, pg.n_chips, pg.own_rows))
        x = jnp.asarray(shard_features(feats, pg))
        y = jnp.asarray(shard_features(loc, pg))
        if args.pallas:
            step = make_sharded_pallas_train_step(
                mesh, pg, tx, w, interpret=args.pallas_interpret)
        else:
            step = make_sharded_train_step(mesh, pg, tx, w)

        p2, o2, losses, probs = step(params, opt_state, x, y, tr)
        _ = np.asarray(losses)  # hard sync
        t0 = time.perf_counter()
        for _ in range(args.reps):
            p2, o2, losses, probs = step(p2, o2, x, y, tr)
        _ = np.asarray(losses)
        dt = (time.perf_counter() - t0) / args.reps
        e = pg.n_edges
        eps_total = 3 * e * b_folds / dt  # 3 SpMM layers per fwd
        results.append({"chips": p, "step_ms": dt * 1e3,
                        "edges_per_s": eps_total})
        print(f"{p} chips: step {dt*1e3:.1f} ms → {eps_total/1e6:.1f} M "
              f"layer-edges/s (loss {np.asarray(losses).mean():.3f})",
              file=sys.stderr)

    if len(results) > 1:
        base = results[0]
        for r in results[1:]:
            eff = (r["edges_per_s"] / base["edges_per_s"]) / (
                r["chips"] / base["chips"])
            r["scaling_efficiency"] = round(eff, 3)
            print(f"{r['chips']} chips efficiency vs {base['chips']}: "
                  f"{eff:.2%}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
