"""Multi-label metrics as on-device jnp reductions.

AIM / COV / mlACC reproduce /root/reference/code/train.py:43-86 (torch,
per-row Python loop on CPU every epoch) and performance.py:59-90 (numpy twin)
as masked vectorized reductions:

    AIM   = mean_i |T_i ∧ P_i| / |P_i|      (0 when |P_i| = 0)
    COV   = mean_i |T_i ∧ P_i| / |T_i|
    mlACC = mean_i |T_i ∧ P_i| / |T_i ∨ P_i|   (Jaccard)

The numpy reference also *mutates its input in place* (performance.py:73-74)
— a bug we do not reproduce.  AUC is added per BASELINE.json (the reference
imports ``roc_auc_score`` but never calls it, train.py:14): a rank-based
(Mann-Whitney) implementation with sklearn-style tie handling that runs
on-device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def aim_cov_acc(loc_true, loc_pred, mask):
    """Masked AIM/COV/mlACC over rows selected by ``mask`` (N,) bool.

    Rows in the reference call sites always have ≥1 true label (they come
    from label_with_loc_list), so COV's denominator is safe; we clamp anyway
    for padded rows.
    """
    t = loc_true > 0.5
    p = loc_pred > 0.5
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    and_set = jnp.sum(t & p, axis=1).astype(jnp.float32)
    pred = jnp.sum(p, axis=1).astype(jnp.float32)
    real = jnp.sum(t, axis=1).astype(jnp.float32)
    or_set = jnp.sum(t | p, axis=1).astype(jnp.float32)
    aim_i = jnp.where(pred > 0, and_set / jnp.maximum(pred, 1.0), 0.0)
    cov_i = and_set / jnp.maximum(real, 1.0)
    acc_i = jnp.where(or_set > 0, and_set / jnp.maximum(or_set, 1.0), 0.0)
    aim = jnp.sum(aim_i * m) / n
    cov = jnp.sum(cov_i * m) / n
    acc = jnp.sum(acc_i * m) / n
    return aim, cov, acc


def _masked_auc_1d(scores, labels, mask):
    """Binary AUC with average-rank tie handling over masked entries."""
    valid = mask
    # Excluded entries get +inf scores and weight 0: they sit above every
    # real score in the sorted order and never enter the counts below.
    s = jnp.where(valid, scores, jnp.inf)
    pos = jnp.where(valid, labels > 0.5, False)
    neg = jnp.where(valid, labels <= 0.5, False)
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(neg)
    order = jnp.sort(s)
    lo = jnp.searchsorted(order, s, side="left")
    hi = jnp.searchsorted(order, s, side="right")
    ranks = 0.5 * (lo + hi + 1).astype(jnp.float32)  # average 1-based rank
    sum_pos_ranks = jnp.sum(jnp.where(pos, ranks, 0.0))
    np_f = n_pos.astype(jnp.float32)
    nn_f = n_neg.astype(jnp.float32)
    auc = (sum_pos_ranks - np_f * (np_f + 1.0) / 2.0) / jnp.maximum(np_f * nn_f, 1.0)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, 0.5)


def micro_auc(scores, labels, mask):
    """Micro-averaged multi-label AUC over masked rows (all entries pooled)."""
    rm = jnp.broadcast_to(mask[:, None], scores.shape).reshape(-1)
    return _masked_auc_1d(scores.reshape(-1), labels.reshape(-1), rm)


def macro_auc(scores, labels, mask):
    """Macro-averaged AUC: mean of per-class AUCs (classes with one label
    polarity count as 0.5, matching the neutral-prior convention)."""
    per_class = jax.vmap(_masked_auc_1d, in_axes=(1, 1, None))(scores, labels, mask)
    return jnp.mean(per_class)


def micro_f1(loc_true, loc_pred, mask):
    """Micro-averaged multi-label F1 over masked rows (BASELINE.json north
    star names "downstream AUC/F1"; the reference computes neither —
    train.py:14 imports roc_auc_score unused).  Pools all (row, class)
    decisions: F1 = 2·TP / (2·TP + FP + FN), 0 when the denominator is 0 —
    sklearn f1_score(average='micro') semantics."""
    t = (loc_true > 0.5) & mask[:, None]
    p = (loc_pred > 0.5) & mask[:, None]
    tp = jnp.sum(t & p).astype(jnp.float32)
    fp = jnp.sum(p & ~t).astype(jnp.float32)
    fn = jnp.sum(t & ~p).astype(jnp.float32)
    denom = 2.0 * tp + fp + fn
    return jnp.where(denom > 0, 2.0 * tp / jnp.maximum(denom, 1.0), 0.0)


def micro_f1_np(loc_true, loc_pred) -> float:
    """numpy twin of :func:`micro_f1` (callers pre-select rows, so no mask).

    Shared by analysis.performance so the train-time (jnp) and analysis
    (numpy) F1 provably agree — one threshold (0.5) and zero-division
    convention in one place."""
    t = np.asarray(loc_true) > 0.5
    p = np.asarray(loc_pred) > 0.5
    tp = int(np.sum(t & p))
    fp = int(np.sum(p & ~t))
    fn = int(np.sum(t & ~p))
    d = 2 * tp + fp + fn
    return 2.0 * tp / d if d else 0.0


def macro_f1_np(loc_true, loc_pred) -> float:
    """numpy twin of :func:`macro_f1` (zero_division=0 semantics)."""
    t = np.asarray(loc_true) > 0.5
    p = np.asarray(loc_pred) > 0.5
    tp = np.sum(t & p, axis=0)
    fp = np.sum(p & ~t, axis=0)
    fn = np.sum(t & ~p, axis=0)
    d = 2 * tp + fp + fn
    return float(np.mean(np.where(d > 0, 2 * tp / np.maximum(d, 1), 0.0)))


def macro_f1(loc_true, loc_pred, mask):
    """Macro-averaged F1: unweighted mean of per-class F1s (classes with no
    true and no predicted positives contribute 0 — sklearn
    f1_score(average='macro', zero_division=0) semantics)."""
    t = (loc_true > 0.5) & mask[:, None]
    p = (loc_pred > 0.5) & mask[:, None]
    tp = jnp.sum(t & p, axis=0).astype(jnp.float32)
    fp = jnp.sum(p & ~t, axis=0).astype(jnp.float32)
    fn = jnp.sum(t & ~p, axis=0).astype(jnp.float32)
    denom = 2.0 * tp + fp + fn
    f1 = jnp.where(denom > 0, 2.0 * tp / jnp.maximum(denom, 1.0), 0.0)
    return jnp.mean(f1)
