"""Fold-batched (pallas-kernel) training path vs the vmapped XLA path:
identical history and logits from identical initial weights."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from plagnn_tpu.data import synthetic_dataset
from plagnn_tpu.ops import from_scipy_coo, pad_features
from plagnn_tpu.train import TrainConfig, weight_cal
from plagnn_tpu.train.engine import (
    init_fold_params,
    make_batched_fold_runner,
    make_fold_runner,
)
from plagnn_tpu.train.kfold import fold_node_masks
from plagnn_tpu.ops.pallas.spmm_kernels import build_pallas_graph

N = 120


@pytest.mark.slow
def test_batched_runner_matches_vmapped(rng):
    ppi, feats, loc, label_list = synthetic_dataset(
        n_nodes=N, n_edges=700, seed=7, feature_dims=(3, 10, 10)
    )
    graph = from_scipy_coo(
        ppi, add_self_loops=True, widths=(4, 16, 64),
        node_multiple=128, edge_multiple=64,
    )
    assert graph.n_nodes == 128
    e = graph.n_edges
    pg = build_pallas_graph(
        np.asarray(graph.src)[:e], np.asarray(graph.dst)[:e],
        graph.n_nodes, rows_per_block=128,
    )
    cfg = TrainConfig(
        lr=1e-3, fold_num=2, epoch_num=3, compute_auc=False, verbose=False,
        # tiny dims: hidden widths shrink; f_agg pad must satisfy B*F%1024
        hidden=(13, 9, 7, 5), pallas_interpret=True,
    )
    w = weight_cal(loc)
    feats_p = jnp.asarray(pad_features(feats, graph.n_nodes))
    labels_p = jnp.asarray(pad_features(loc, graph.n_nodes))
    node_valid = jnp.asarray(np.arange(graph.n_nodes) < N)

    tr_np, va_np = fold_node_masks(label_list, graph.n_nodes, 2, 12)
    key = jax.random.PRNGKey(9)
    params = init_fold_params(key, cfg, feats.shape[1], 2)

    run_x, tx = make_fold_runner(graph, feats_p, labels_p, w, node_valid, cfg)
    run_p, _ = make_batched_fold_runner(
        graph, pg, feats_p, labels_p, w, node_valid, cfg)

    opt = jax.vmap(tx.init)(params)
    tr = jnp.asarray(tr_np)
    va = jnp.asarray(va_np)
    px, _, probs_x, hist_x = run_x(params, opt, tr, va, jnp.float32(0.1))
    pp, _, probs_p, hist_p = run_p(params, None, tr, va, jnp.float32(0.1))

    for k in ("aim", "cov", "acc", "loss"):
        np.testing.assert_allclose(
            np.asarray(hist_p["val"][k]), np.asarray(hist_x["val"][k]),
            rtol=2e-4, atol=1e-5, err_msg=f"val {k} diverged")
        np.testing.assert_allclose(
            np.asarray(hist_p["train"][k]), np.asarray(hist_x["train"][k]),
            rtol=2e-4, atol=1e-5, err_msg=f"train {k} diverged")
    # batched probs are (B, N, C) like the vmapped path
    np.testing.assert_allclose(
        np.asarray(probs_p)[:, :N], np.asarray(probs_x)[:, :N],
        rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_batched_runner_bf16_agg_close_to_f32(rng):
    """--agg-dtype bfloat16 on the pallas path: the fold-batched runner must
    consume the flag (it was silently ignored in round 1) and track the f32
    trajectory within bf16 rounding."""
    from plagnn_tpu.utils.precision import set_aggregation_dtype

    ppi, feats, loc, label_list = synthetic_dataset(
        n_nodes=N, n_edges=700, seed=7, feature_dims=(3, 10, 10)
    )
    graph = from_scipy_coo(
        ppi, add_self_loops=True, widths=(4, 16, 64),
        node_multiple=128, edge_multiple=64,
    )
    e = graph.n_edges
    pg = build_pallas_graph(
        np.asarray(graph.src)[:e], np.asarray(graph.dst)[:e],
        graph.n_nodes, rows_per_block=128,
    )
    cfg = TrainConfig(
        lr=1e-3, fold_num=2, epoch_num=3, compute_auc=False, verbose=False,
        hidden=(13, 9, 7, 5), pallas_interpret=True,
    )
    w = weight_cal(loc)
    feats_p = jnp.asarray(pad_features(feats, graph.n_nodes))
    labels_p = jnp.asarray(pad_features(loc, graph.n_nodes))
    node_valid = jnp.asarray(np.arange(graph.n_nodes) < N)
    tr_np, va_np = fold_node_masks(label_list, graph.n_nodes, 2, 12)
    params = init_fold_params(jax.random.PRNGKey(9), cfg, feats.shape[1], 2)

    run_f32, tx = make_batched_fold_runner(
        graph, pg, feats_p, labels_p, w, node_valid, cfg)
    set_aggregation_dtype("bfloat16")
    try:
        run_bf, _ = make_batched_fold_runner(
            graph, pg, feats_p, labels_p, w, node_valid, cfg)
        tr, va = jnp.asarray(tr_np), jnp.asarray(va_np)
        _, _, probs_f, hist_f = run_f32(params, None, tr, va, jnp.float32(0.1))
        _, _, probs_b, hist_b = run_bf(params, None, tr, va, jnp.float32(0.1))
    finally:
        set_aggregation_dtype(None)

    assert probs_b.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(hist_b["val"]["loss"]), np.asarray(hist_f["val"]["loss"]),
        rtol=2e-2, err_msg="bf16 agg diverged from f32 beyond rounding")
    np.testing.assert_allclose(
        np.asarray(probs_b)[:, :N], np.asarray(probs_f)[:, :N],
        atol=3e-2)


def test_agg_packed_bf16_alignment(rng):
    """An agg fn advertising align=2048 (bf16 messages) must see only
    2048-aligned strides and stay exact."""
    from plagnn_tpu.models.batched import _agg_packed, packed_stride

    n, b, f = 16, 10, 503
    x = jnp.asarray(rng.standard_normal((n, b, f)), jnp.float32)
    perm = np.concatenate([[n - 1], np.arange(n - 1)])
    seen = []

    def agg(xp):
        seen.append(xp.shape[1] * xp.shape[2])
        assert (xp.shape[1] * xp.shape[2]) % 2048 == 0
        return xp[perm]

    agg.align = 2048
    out = _agg_packed(agg, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[perm]))
    assert seen == [packed_stride(b, f, 2048)]


@pytest.mark.parametrize(
    "b,f", [(10, 400), (10, 300), (10, 503), (2, 64), (3, 100)]
)
def test_agg_packed_minimal_stride(rng, b, f):
    """_agg_packed must be exact under BOTH packings (flat fold x feature and
    per-fold feature padding) for a layout-agnostic per-position agg."""
    import math
    from plagnn_tpu.models.batched import _agg_packed, _round_up

    n = 16
    x = jnp.asarray(rng.standard_normal((n, b, f)), jnp.float32)

    perm = np.concatenate([[n - 1], np.arange(n - 1)])

    def agg(xp):  # (N, B', F') -> per-position "aggregation": a row shuffle
        assert (xp.shape[1] * xp.shape[2]) % 1024 == 0
        return xp[perm]

    out = _agg_packed(agg, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[perm]))

    # the chosen stride is the minimum of the two legal packings
    step = 1024 // math.gcd(b, 1024)
    expect = min(b * _round_up(f, step), _round_up(b * f, 1024))
    seen = []

    def probe(xp):
        seen.append(xp.shape[1] * xp.shape[2])
        return xp

    _agg_packed(probe, x)
    assert seen == [expect]
