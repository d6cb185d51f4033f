"""End-to-end engine tests.

1. Per-step parity ladder (SURVEY.md §7): several full epochs of the fused
   jit step (forward → weighted BCE → Adam → threshold → metrics) against a
   torch replication of the reference train loop (train.py:195-214) starting
   from identical weights.
2. Artifact-contract smoke: the train() driver writes the reference's
   artifact set ({round}_{fold}_loc_logits.npy, log.tsv, txt_log.txt,
   fig_data_{round}.json) on a synthetic dataset.
"""
import json
import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
import optax

from plagnn_tpu.data import synthetic_dataset
from plagnn_tpu.ops import from_scipy_coo, pad_features
from plagnn_tpu.train import TrainConfig, train, weight_cal
from plagnn_tpu.train.engine import make_fold_runner
from plagnn_tpu.train.kfold import fold_node_masks

from torch_reference import RefGNN32, adj_lists_from_edges, export_gnn32_params
from test_train_components import (
    torch_multi_loss,
    torch_performances_record,
    torch_protein_loc_correction,
)

N_NODES = 120
EPOCHS = 4
LR = 5e-3


@pytest.fixture(scope="module")
def bundle():
    ppi, feats, loc, label_list = synthetic_dataset(
        n_nodes=N_NODES, n_edges=700, seed=7, feature_dims=(3, 10, 10)
    )
    graph = from_scipy_coo(
        ppi, add_self_loops=True, widths=(4, 16, 64),
        node_multiple=16, edge_multiple=64,
    )
    return ppi, feats, loc, label_list, graph


@pytest.mark.slow
def test_epoch_parity_vs_torch(bundle):
    ppi, feats, loc, label_list, graph = bundle
    torch.manual_seed(7)
    ref_model = RefGNN32(feats.shape[1], 13, 9, 7, 5, 12)
    adj = adj_lists_from_edges(ppi.row, ppi.col, N_NODES)

    w_np = weight_cal(loc)
    tr_mask_np, va_mask_np = fold_node_masks(label_list, graph.n_nodes, 5, 12)
    tr_mask, va_mask = tr_mask_np[0], va_mask_np[0]
    tr_idx = np.flatnonzero(tr_mask[:N_NODES]).tolist()
    va_idx = np.flatnonzero(va_mask[:N_NODES]).tolist()

    # Export the initial weights BEFORE torch training mutates them.
    params0 = export_gnn32_params(ref_model)

    # --- torch replication of the reference loop (train.py:195-214) -------
    xt = torch.from_numpy(feats)
    yt = torch.from_numpy(loc)
    wt = torch.from_numpy(w_np.astype(np.float32))
    opt = torch.optim.Adam(ref_model.parameters(), lr=LR)
    t_hist = []
    for e in range(EPOCHS):
        opt.zero_grad()
        logits = ref_model(adj, xt)
        train_loss = torch_multi_loss(logits[tr_idx], yt[tr_idx], wt)
        train_loss.backward()
        opt.step()
        val_loss = torch_multi_loss(logits[va_idx], yt[va_idx], wt)
        with torch.no_grad():
            pred = torch_protein_loc_correction(logits.detach(), 0.1)
            tr_m = torch_performances_record(yt[tr_idx], pred[tr_idx])
            va_m = torch_performances_record(yt[va_idx], pred[va_idx])
        t_hist.append((float(train_loss), float(val_loss), *tr_m, *va_m))
    t_logits = logits.detach().numpy()  # pre-final-update forward

    # --- our fused engine from the same weights ---------------------------
    cfg = TrainConfig(
        lr=LR, fold_num=5, epoch_num=EPOCHS, alpha_list=(0.1,),
        compute_auc=False, verbose=False,
    )
    feats_p = jnp.asarray(pad_features(feats, graph.n_nodes))
    labels_p = jnp.asarray(pad_features(loc, graph.n_nodes))
    node_valid = jnp.asarray(np.arange(graph.n_nodes) < N_NODES)
    run, tx = make_fold_runner(graph, feats_p, labels_p, w_np, node_valid, cfg)

    params = jax.tree.map(lambda a: jnp.asarray(a)[None], params0)
    opt_state = jax.vmap(tx.init)(params)
    f_params, _f_opt, f_probs, history = run(
        params,
        opt_state,
        jnp.asarray(tr_mask[None]),
        jnp.asarray(va_mask[None]),
        jnp.float32(0.1),
    )
    history = jax.device_get(history)

    for e in range(EPOCHS):
        t_tr_loss, t_va_loss, t_aim, t_cov, t_acc, v_aim, v_cov, v_acc = t_hist[e]
        np.testing.assert_allclose(
            history["train"]["loss"][0, e], t_tr_loss, rtol=2e-3,
            err_msg=f"train loss diverged at epoch {e}")
        np.testing.assert_allclose(
            history["val"]["loss"][0, e], t_va_loss, rtol=2e-3,
            err_msg=f"val loss diverged at epoch {e}")
        np.testing.assert_allclose(history["train"]["aim"][0, e], t_aim, atol=2e-3)
        np.testing.assert_allclose(history["train"]["cov"][0, e], t_cov, atol=2e-3)
        np.testing.assert_allclose(history["train"]["acc"][0, e], t_acc, atol=2e-3)
        np.testing.assert_allclose(history["val"]["aim"][0, e], v_aim, atol=2e-3)
        np.testing.assert_allclose(history["val"]["cov"][0, e], v_cov, atol=2e-3)
        np.testing.assert_allclose(history["val"]["acc"][0, e], v_acc, atol=2e-3)

    # Saved logits = pre-final-update forward (reference quirk, train.py:289).
    np.testing.assert_allclose(
        np.asarray(f_probs)[0, :N_NODES], t_logits, rtol=5e-3, atol=2e-4
    )


@pytest.mark.slow
def test_artifact_contract(tmp_path, bundle):
    ppi, feats, loc, label_list, graph = bundle
    cfg = TrainConfig(
        lr=1e-3, fold_num=3, epoch_num=6, alpha_list=(0.1,),
        fold_seeds=(12, 22), fold_batch=3, compute_auc=True,
        log_every=5, verbose=False,
    )
    path = str(tmp_path / "log") + os.sep
    feats_p = pad_features(feats, graph.n_nodes)
    labels_p = pad_features(loc, graph.n_nodes)
    train(graph, feats_p, labels_p, label_list, loc, cfg, path,
          label_names=[f"P{i:05d}" for i in range(N_NODES)])

    for r in (1, 2):
        for f in (1, 2, 3):
            arr = np.load(os.path.join(path, f"{r}_{f}_loc_logits.npy"))
            assert arr.shape == (N_NODES, 12)
            assert arr.dtype == np.float32
            assert np.all((arr >= 0) & (arr <= 1))
        with open(os.path.join(path, f"fig_data_{r}.json")) as fh:
            fig = json.load(fh)
        assert set(fig) == {"train", "validation"}
        fold_d = fig["validation"]["0.1"]
        assert set(fold_d) == {"1", "2", "3"}
        for v in fold_d.values():
            assert len(v["aim"]) == 6
            assert len(v["auc_micro"]) == 6
            assert all(np.isfinite(v["loss"]))

    with open(os.path.join(path, "log.tsv")) as fh:
        header = fh.readline().strip().split("\t")
    assert header == ["round", "fold", "flag-t0v1", "index", "true label", "predict label"]
    assert os.path.exists(os.path.join(path, "txt_log.txt"))


def test_final_epoch_auc_always_fresh(tmp_path, bundle):
    """The history's final AUC must equal a fresh computation from the saved
    final-epoch probabilities even when epoch_num is off the auc_every
    cadence (VERDICT r3 weak #4: epoch_num=7, auc_every=5 would otherwise
    carry the epoch-5 sample into epochs 6 and 7's slots)."""
    ppi, feats, loc, label_list, graph = bundle
    cfg = TrainConfig(
        lr=1e-3, fold_num=2, epoch_num=7, alpha_list=(0.1,),
        fold_seeds=(12,), fold_batch=2, compute_auc=True, auc_every=5,
        log_every=5, verbose=False,
    )
    path = str(tmp_path / "log") + os.sep
    train(graph, pad_features(feats, graph.n_nodes),
          pad_features(loc, graph.n_nodes), label_list, loc, cfg, path)

    from plagnn_tpu.train.metrics import macro_auc, micro_auc

    _, va_masks = fold_node_masks(label_list, graph.n_nodes, 2, 12)
    with open(os.path.join(path, "fig_data_1.json")) as fh:
        fig = json.load(fh)
    labels_p = jnp.asarray(pad_features(loc, graph.n_nodes))
    for f in (1, 2):
        # saved logits are the probs the final epoch's metrics used
        probs = np.load(os.path.join(path, f"1_{f}_loc_logits.npy"))
        probs_p = jnp.asarray(pad_features(probs, graph.n_nodes))
        mask = jnp.asarray(va_masks[f - 1])
        fresh_mi = float(micro_auc(probs_p, labels_p, mask))
        fresh_ma = float(macro_auc(probs_p, labels_p, mask))
        curve_mi = fig["validation"]["0.1"][str(f)]["auc_micro"]
        curve_ma = fig["validation"]["0.1"][str(f)]["auc_macro"]
        assert len(curve_mi) == 7
        np.testing.assert_allclose(curve_mi[-1], fresh_mi, rtol=1e-5)
        np.testing.assert_allclose(curve_ma[-1], fresh_ma, rtol=1e-5)
