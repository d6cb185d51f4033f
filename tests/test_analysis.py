"""Analysis-layer tests: merge/scaling semantics and performance metrics
against the reference formulas."""
import json
import os

import numpy as np
import pytest

from plagnn_tpu.analysis.performance import (
    mat_merge as perf_merge,
    performances_record,
    random_pred,
)
from plagnn_tpu.analysis.score import mat_merge as score_merge
from plagnn_tpu.train.postprocess import scaling_np


def _write_fold_logits(tmp_path, n=50, c=12, rounds=2, folds=3, seed=0):
    rng = np.random.default_rng(seed)
    base = tmp_path / "log" / "GSE30931" / "normal"
    os.makedirs(base, exist_ok=True)
    mats = {}
    for r in range(1, rounds + 1):
        for f in range(1, folds + 1):
            m = rng.random((n, c)).astype(np.float32)
            np.save(base / f"{r}_{f}_loc_logits.npy", m)
            mats[(r, f)] = m
    return base, mats


def test_performance_mat_merge(tmp_path):
    base, mats = _write_fold_logits(tmp_path)
    perf_merge(str(tmp_path / "log"), n_nodes=50, rounds=2, fold_num=3)
    for r in (1, 2):
        merged = np.load(base / f"normal_{r}_logits.npy")
        expected = sum(mats[(r, f)] for f in (1, 2, 3)) / 3
        np.testing.assert_allclose(merged, expected, atol=1e-6)


def test_score_mat_merge_scaling(tmp_path):
    base, mats = _write_fold_logits(tmp_path)
    os.makedirs(tmp_path / "log" / "GSE30931" / "perturbation", exist_ok=True)
    # perturbation side needs at least the directory; copy the same files
    for (r, f), m in mats.items():
        np.save(tmp_path / "log" / "GSE30931" / "perturbation" /
                f"{r}_{f}_loc_logits.npy", m)
    score_merge(str(tmp_path / "log"), str(tmp_path / "res"), n_nodes=50,
                denom=6.0)
    merged = np.load(tmp_path / "res" / "GSE30931" / "normal_logits.npy")
    expected = sum(scaling_np(m) for m in
                   [mats[(r, f)] for r in (1, 2) for f in (1, 2, 3)]) / 6.0
    np.testing.assert_allclose(merged, expected, atol=1e-6)


def test_scaling_np_reference_semantics(rng):
    # scaling = column min-max, then row-sum normalize (main.py:15-29)
    m = rng.random((30, 12)).astype(np.float32)
    s = scaling_np(m)
    mm = (m - m.min(0)) / (m.max(0) - m.min(0) + 0.0)
    # the reference divides by p_max AFTER subtracting min
    mm = (m - m.min(0))
    mm = mm / mm.max(0)
    mm = mm / mm.sum(1, keepdims=True)
    np.testing.assert_allclose(s, mm, atol=1e-6)
    np.testing.assert_allclose(s.sum(1), 1.0, atol=1e-5)


def test_random_pred_matched_counts(rng):
    pred = (rng.random((40, 12)) < 0.3).astype(float)
    rm = random_pred(pred, setnum=True, seed=1)
    np.testing.assert_array_equal(rm.sum(1), pred.sum(1))


def test_performances_record_no_mutation(rng):
    t = (rng.random((20, 12)) < 0.4).astype(float)
    t[t.sum(1) == 0, 0] = 1
    p = (rng.random((20, 12)) < 0.4).astype(float)
    t0, p0 = t.copy(), p.copy()
    performances_record(t, p)
    # unlike the reference numpy twin (performance.py:73-74), inputs intact
    np.testing.assert_array_equal(t, t0)
    np.testing.assert_array_equal(p, p0)


def test_save_diff_matches_dense_reference(tmp_path):
    """diff.npy/diff_link.npy/diff_unlink.npy (figure.py:10-33 contract):
    blocked factor-form computation == dense (inter - normal) indexing,
    diagonal included in the unlink set."""
    import scipy.sparse as sp

    from plagnn_tpu.analysis.figures import hist_data_from_diff, save_diff
    from plagnn_tpu.data.expression import pcc_dense, pcc_factors

    rng = np.random.default_rng(5)
    n = 37
    expr_n = rng.standard_normal((n, 3))
    expr_i = expr_n + 0.3 * rng.standard_normal((n, 3))
    expr_n[4] = 0.0  # zero-variance row (NaN→0 path)
    rows = rng.integers(0, n, 60)
    cols = rng.integers(0, n, 60)
    keep = rows != cols
    ppi = sp.coo_matrix(
        (np.ones(keep.sum()), (rows[keep], cols[keep])), shape=(n, n))
    ppi = ((ppi + ppi.T) > 0).astype(np.int64)

    save_diff(pcc_factors(expr_i), pcc_factors(expr_n), ppi, str(tmp_path),
              block_rows=8)

    diff_ref = pcc_dense(expr_i) - pcc_dense(expr_n)
    dense_mask = np.asarray(ppi.todense()) == 1
    np.testing.assert_allclose(
        np.load(tmp_path / "diff.npy"), diff_ref.ravel(), atol=1e-12)
    np.testing.assert_allclose(
        np.load(tmp_path / "diff_link.npy"), diff_ref[dense_mask], atol=1e-12)
    np.testing.assert_allclose(
        np.load(tmp_path / "diff_unlink.npy"), diff_ref[~dense_mask],
        atol=1e-12)

    hd = hist_data_from_diff(str(tmp_path))
    assert set(hd) == {"all", "link", "unlink"}
    assert len(hd["all"][0]) == 201 and hd["all"][1][0] == [0, 0]
    assert sum(c for _, c in hd["all"][1]) == n * n
    assert sum(c for _, c in hd["link"][1]) == int(dense_mask.sum())
