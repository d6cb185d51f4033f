"""Parity tests for loss / threshold / metric math vs torch/numpy references
(the reference repo's exact formulas, re-executed in torch on the same
inputs — SURVEY.md §4(a))."""
import numpy as np
import torch
import jax
import jax.numpy as jnp
from sklearn.metrics import roc_auc_score

from plagnn_tpu.train import (
    aim_cov_acc,
    fold_node_masks,
    macro_auc,
    micro_auc,
    multi_loss,
    protein_loc_correction,
    protein_loc_correction_np,
    weight_cal,
)


# --- torch re-statements of the reference formulas (train.py:19-126) -------


def torch_protein_loc_correction(loc_proba, alpha):
    min_proba = loc_proba.min(dim=0).values
    max_proba = loc_proba.max(dim=0).values
    new_proba = (loc_proba - min_proba) / (max_proba - min_proba)
    sum_proba = new_proba.sum(dim=1).reshape(-1, 1)
    new_proba = new_proba / sum_proba
    loc_pred = torch.zeros(loc_proba.shape)
    thresholds = new_proba.max(dim=1).values - (
        new_proba.max(dim=1).values - new_proba.min(dim=1).values
    ) * alpha
    for row in range(len(loc_proba)):
        loc_pred[row][new_proba[row] > thresholds[row]] = 1.0
    return loc_pred.double()


def torch_multi_loss(input, target, i_weight):
    loss = 0
    for i in range(len(i_weight)):
        scl_input = input[:, i]
        scl_target = target[:, i]
        scl_loss = (
            scl_target * torch.log(torch.clamp(scl_input, 1e-9, 10.0)) * i_weight[i]
            + (1 - scl_target) * torch.log(torch.clamp(1 - scl_input, 1e-9, 10.0))
        ) / (i_weight[i] + 1) * 2
        loss += -scl_loss.sum() / len(input)
    return loss


def torch_performances_record(loc_true, loc_pred):
    loc_true = loc_true.clone().detach().long()
    loc_pred = loc_pred.clone().detach().long()
    aim = cov = acc = 0.0
    for i in range(len(loc_true)):
        and_set = (loc_true[i].bool() & loc_pred[i].bool()).sum().float()
        pred = loc_pred[i].sum().float()
        real = loc_true[i].sum().float()
        or_set = (loc_true[i].bool() | loc_pred[i].bool()).sum().float()
        aim = aim + (and_set / pred if pred != 0 else 0)
        cov = cov + and_set / real
        acc = acc + and_set / or_set
    n = len(loc_true)
    return float(aim / n), float(cov / n), float(acc / n)


def test_protein_loc_correction_parity(rng):
    x = rng.random((200, 12)).astype(np.float32) * 0.9 + 0.05
    ref = torch_protein_loc_correction(torch.from_numpy(x), 0.1).numpy()
    ours = protein_loc_correction(jnp.asarray(x), 0.1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)
    np.testing.assert_allclose(protein_loc_correction_np(x, 0.1), ref, atol=1e-6)


def test_protein_loc_correction_padded_rows(rng):
    x = rng.random((200, 12)).astype(np.float32)
    xp = np.concatenate([x, rng.random((56, 12)).astype(np.float32) * 100])
    valid = jnp.asarray(np.arange(256) < 200)
    ref = torch_protein_loc_correction(torch.from_numpy(x), 0.1).numpy()
    ours = protein_loc_correction(jnp.asarray(xp), 0.1, valid)
    np.testing.assert_allclose(np.asarray(ours)[:200], ref, atol=1e-6)
    assert np.all(np.asarray(ours)[200:] == 0)


def test_multi_loss_parity(rng):
    n, c = 150, 12
    probs = rng.random((n, c)).astype(np.float32) * 0.98 + 0.01
    targets = (rng.random((n, c)) < 0.3).astype(np.float32)
    w = rng.random(c).astype(np.float32) * 20 + 0.5
    ref = float(
        torch_multi_loss(
            torch.from_numpy(probs), torch.from_numpy(targets), torch.from_numpy(w)
        )
    )
    # masked path: embed in a larger padded array
    pad = 50
    probs_p = np.concatenate([probs, rng.random((pad, c)).astype(np.float32)])
    targets_p = np.concatenate([targets, np.zeros((pad, c), np.float32)])
    mask = jnp.asarray(np.arange(n + pad) < n)
    ours = multi_loss(jnp.asarray(probs_p), jnp.asarray(targets_p), mask, jnp.asarray(w))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_weight_cal_parity(rng):
    loc = (rng.random((500, 12)) < 0.2).astype(np.float64)
    loc[rng.random(500) < 0.3] = 0  # some fully-unlabeled rows
    loc[:, 0] = np.maximum(loc[:, 0], (np.arange(500) == 0))  # avoid /0
    w = weight_cal(loc)
    class_num = loc.sum(0)
    sample_num = int((loc.sum(1) > 0).sum())
    np.testing.assert_allclose(w, (sample_num - class_num) / class_num)


def test_aim_cov_acc_parity(rng):
    n, c = 120, 12
    t = (rng.random((n, c)) < 0.3).astype(np.float32)
    t[t.sum(1) == 0, 0] = 1  # every row has ≥1 true label (CV universe)
    p = (rng.random((n, c)) < 0.25).astype(np.float32)
    ref = torch_performances_record(torch.from_numpy(t), torch.from_numpy(p))
    pad = 40
    tp = np.concatenate([t, np.zeros((pad, c), np.float32)])
    pp = np.concatenate([p, np.ones((pad, c), np.float32)])
    mask = jnp.asarray(np.arange(n + pad) < n)
    ours = aim_cov_acc(jnp.asarray(tp), jnp.asarray(pp), mask)
    np.testing.assert_allclose(
        [float(v) for v in ours], list(ref), rtol=1e-5, atol=1e-6
    )


def test_auc_vs_sklearn(rng):
    n, c = 300, 12
    scores = rng.random((n, c)).astype(np.float32)
    labels = (rng.random((n, c)) < 0.3).astype(np.float32)
    labels[:, 3] = 1  # a degenerate single-polarity class for macro handling
    mask_np = rng.random(n) < 0.6
    mask = jnp.asarray(mask_np)
    mi = float(micro_auc(jnp.asarray(scores), jnp.asarray(labels), mask))
    ref_mi = roc_auc_score(
        labels[mask_np].reshape(-1), scores[mask_np].reshape(-1)
    )
    np.testing.assert_allclose(mi, ref_mi, atol=1e-5)

    ma = float(macro_auc(jnp.asarray(scores), jnp.asarray(labels), mask))
    per = []
    for j in range(c):
        lj = labels[mask_np, j]
        if lj.min() == lj.max():
            per.append(0.5)
        else:
            per.append(roc_auc_score(lj, scores[mask_np, j]))
    np.testing.assert_allclose(ma, np.mean(per), atol=1e-5)


def test_kfold_matches_sklearn_directly():
    from sklearn.model_selection import KFold

    label = list(range(0, 977, 7))  # 140 annotated nodes
    n_pad = 1024
    tr, va = fold_node_masks(label, n_pad, 10, 22)
    kf = KFold(n_splits=10, random_state=22, shuffle=True)
    label_arr = np.array(label)
    for f, (tr_idx, va_idx) in enumerate(kf.split(label)):
        assert set(np.flatnonzero(va[f])) == set(label_arr[va_idx])
        assert set(np.flatnonzero(tr[f])) == set(label_arr[tr_idx])
        assert not (tr[f] & va[f]).any()


def test_sampled_auc_matches_full_mask():
    """The val-subset gathered AUC (engine cadence path) equals the
    full-array masked AUC at compute epochs, and carries the last value on
    off epochs."""
    import jax
    import jax.numpy as jnp

    from plagnn_tpu.train.engine import _sampled_auc
    from plagnn_tpu.train.metrics import macro_auc, micro_auc

    rng = np.random.default_rng(8)
    n, c = 64, 12
    probs = jnp.asarray(rng.random((n, c)).astype(np.float32))
    labels = jnp.asarray((rng.random((n, c)) < 0.3).astype(np.float32))
    mask_np = np.zeros(n, bool)
    mask_np[rng.choice(n, 17, replace=False)] = True
    mask = jnp.asarray(mask_np)

    full = (micro_auc(probs, labels, mask), macro_auc(probs, labels, mask))
    last = (jnp.float32(0.25), jnp.float32(0.75))
    got = _sampled_auc(probs, labels, mask, jnp.int32(0), last,
                       v_pad=24, auc_every=5, n_epochs=200)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(full[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(full[1]), rtol=1e-6)
    # off epoch: carries the last sample untouched
    off = _sampled_auc(probs, labels, mask, jnp.int32(3), last,
                       v_pad=24, auc_every=5)
    assert float(off[0]) == 0.25 and float(off[1]) == 0.75
    # the FINAL epoch always samples fresh, even off-cadence (200 % 5 == 0
    # means the last on-cadence sample would otherwise be epoch 195)
    fin = _sampled_auc(probs, labels, mask, jnp.int32(199), last,
                       v_pad=24, auc_every=5, n_epochs=200)
    np.testing.assert_allclose(np.asarray(fin[0]), np.asarray(full[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fin[1]), np.asarray(full[1]), rtol=1e-6)


def test_f1_vs_sklearn():
    """micro/macro F1 (north-star metric; the reference computes neither)
    against sklearn on random multi-label predictions, incl. masked rows and
    an all-negative class (zero_division=0)."""
    import jax.numpy as jnp
    from sklearn.metrics import f1_score

    from plagnn_tpu.train.metrics import macro_f1, micro_f1

    rng = np.random.default_rng(5)
    n, c = 80, 12
    labels = (rng.random((n, c)) < 0.25).astype(np.float32)
    preds = (rng.random((n, c)) < 0.3).astype(np.float32)
    labels[:, 7] = 0.0  # class with no positives
    mask_np = np.zeros(n, bool)
    mask_np[rng.choice(n, 50, replace=False)] = True

    mi = float(micro_f1(jnp.asarray(labels), jnp.asarray(preds),
                        jnp.asarray(mask_np)))
    ma = float(macro_f1(jnp.asarray(labels), jnp.asarray(preds),
                        jnp.asarray(mask_np)))
    ref_mi = f1_score(labels[mask_np], preds[mask_np], average="micro",
                      zero_division=0)
    ref_ma = f1_score(labels[mask_np], preds[mask_np], average="macro",
                      zero_division=0)
    np.testing.assert_allclose(mi, ref_mi, rtol=1e-6)
    np.testing.assert_allclose(ma, ref_ma, rtol=1e-6)
