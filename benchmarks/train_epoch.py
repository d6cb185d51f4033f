"""Measure the ENGINE's fold-batched training epoch at PPI scale on TPU —
the number `plagnn train-normal --spmm pallas` actually delivers, including
the in-scan metrics/threshold/AUC work that bench.py's hand-rolled epoch
excludes (VERDICT r1 weak #5).

Variants: compute_auc on/off x agg dtype f32/bf16, fold batch 10.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from plagnn_tpu.data import synthetic_dataset
    from plagnn_tpu.ops import from_scipy_coo, pad_features
    from plagnn_tpu.train.engine import (
        TrainConfig, init_fold_params, make_batched_fold_runner,
    )
    from plagnn_tpu.train.kfold import fold_node_masks
    from plagnn_tpu.train.losses import weight_cal
    from plagnn_tpu.utils.precision import set_aggregation_dtype
    from plagnn_tpu.models.batched import packed_stride
    from plagnn_tpu.ops.pallas.spmm_kernels import (
        build_pallas_graph, pick_hub_sizes, pick_rows_per_block,
    )

    dev = jax.devices()[0]
    log(f"device: {dev}")
    n_nodes, n_edges = 24041, 700_000
    folds_arg = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    folds = folds_arg
    n_epochs = 8
    ppi, feats, loc, label_list = synthetic_dataset(
        n_nodes=n_nodes, n_edges=n_edges, seed=70, feature_dims=(3, 250, 250))
    graph = from_scipy_coo(ppi, add_self_loops=True, node_multiple=128)
    e_real = graph.n_edges
    src = np.asarray(graph.src)[:e_real]
    dst = np.asarray(graph.dst)[:e_real]
    feats_p = jnp.asarray(pad_features(feats, graph.n_nodes))
    labels_p = jnp.asarray(pad_features(loc, graph.n_nodes))
    node_valid = jnp.asarray(np.arange(graph.n_nodes) < n_nodes)
    w = weight_cal(loc)
    tr_np, va_np = fold_node_masks(label_list, graph.n_nodes, folds, 12)
    tr, va = jnp.asarray(tr_np), jnp.asarray(va_np)

    for agg_dtype in (None, "bfloat16"):
        align = 2048 if agg_dtype else 1024
        stride = max(packed_stride(folds, f, align) for f in (503, 400, 300))
        # Mirror the engine's --hub-cache auto policy (engine.py pallas
        # branch): fwd hub at issue-bound strides, bwd hub at byte-bound.
        esize = 2 if agg_dtype else 4
        kf, kb = pick_hub_sizes("auto", stride, esize)
        rpb = pick_rows_per_block(
            graph.n_nodes, stride,
            arena_bytes=(kf + 1) * stride * esize if kf else 0)
        rpb_b = pick_rows_per_block(
            graph.n_nodes, stride,
            arena_bytes=(kb + 1) * stride * 2 * esize if kb else 0)
        log(f"hub policy: kf={kf} kb={kb} rpb={rpb}/{rpb_b} stride={stride}")
        pg = build_pallas_graph(
            src, dst, graph.n_nodes, rpb, hub_k=kf, hub_k_bwd=kb,
            rows_per_block_bwd=rpb_b)
        set_aggregation_dtype(agg_dtype)
        try:
            for auc in (False, True):
                cfg = TrainConfig(
                    fold_num=folds, epoch_num=n_epochs, compute_auc=auc,
                    verbose=False, spmm_impl="pallas")
                v_max = -(-len(label_list) // folds)
                run, tx = make_batched_fold_runner(
                    graph, pg, feats_p, labels_p, w, node_valid, cfg,
                    val_width=((v_max + 7) // 8) * 8)
                params = init_fold_params(
                    jax.random.PRNGKey(70), cfg, feats.shape[1], folds)
                # warm/compile + sync via host transfer
                out = run(params, None, tr, va, jnp.float32(0.1))
                float(np.asarray(out[3]["val"]["loss"]).ravel()[0])
                t0 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    out = run(params, None, tr, va, jnp.float32(0.1))
                float(np.asarray(out[3]["val"]["loss"]).ravel()[0])
                dt = (time.perf_counter() - t0) / reps / n_epochs
                log(f"engine epoch (B={folds}, agg={agg_dtype or 'f32'}, "
                    f"auc={auc}): {dt*1e3:.1f} ms "
                    f"({dt/folds*1e3:.2f} ms/fold-epoch)")
        finally:
            set_aggregation_dtype(None)


if __name__ == "__main__":
    main()
