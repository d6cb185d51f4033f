"""Perturbation-topology adjustment without dense N² intermediates.

Reproduces ``modify_network_topology`` (/root/reference/code/
data_preprocess.py:217-257): with diff = PCC_inter − PCC_normal (dense,
zero diagonal, NaN rows zeroed) and thresholds mean ± thr·std computed over
the FULL dense matrix (zeros included — a parity-critical detail, SURVEY.md
§7 hard part 5), remove existing edges where diff < l and add absent pairs
where diff > r.

The reference materializes three dense 24041² matrices (~14 GB); here the
mean/std come from closed-form k×k Gram identities over the standardized
factors Z (PCC = Z·Zᵀ), existing-edge diffs are O(E·k) dot products, and
threshold-exceeding absent pairs are found with a blocked O(N²·k) BLAS scan
at O(B·N) memory (C++ scan kernel when available).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp

from . import native_ext
from .expression import pcc_at_edges, pcc_factors


def _dense_sum_stats(z_a: np.ndarray, z_b: np.ndarray) -> Tuple[float, float]:
    """(Σ diff, Σ diff²) over the full dense diff = A − B, A = Za·Zaᵀ,
    B = Zb·Zbᵀ, both with diagonals forced to 0."""
    va = np.einsum("ik,ik->i", z_a, z_a)  # 1 for valid rows, else 0
    vb = np.einsum("ik,ik->i", z_b, z_b)
    s_a = z_a.sum(axis=0)
    s_b = z_b.sum(axis=0)
    sum_a = float(s_a @ s_a - va.sum())
    sum_b = float(s_b @ s_b - vb.sum())

    gaa = z_a.T @ z_a
    gbb = z_b.T @ z_b
    gab = z_a.T @ z_b
    sq_a = float((gaa * gaa).sum() - (va * va).sum())
    sq_b = float((gbb * gbb).sum() - (vb * vb).sum())
    cross = float((gab * gab).sum() - (va * vb).sum())
    return sum_a - sum_b, sq_a - 2.0 * cross + sq_b


def diff_stats(z_inter: np.ndarray, z_nor: np.ndarray) -> Tuple[float, float]:
    """(mean, std) of the dense difference matrix — matches
    np.mean/np.std over the materialized matrix (ddof=0)."""
    n = z_inter.shape[0]
    total = float(n) * float(n)
    s1, s2 = _dense_sum_stats(z_inter, z_nor)
    mean = s1 / total
    var = s2 / total - mean * mean
    return mean, float(np.sqrt(max(var, 0.0)))


def modify_network_topology(
    ppi_net,
    pcc_nor,
    pcc_inter,
    thr: float,
    *,
    block_rows: int = 2048,
) -> sp.coo_matrix:
    """Reference-semantics topology adjustment.

    pcc_nor / pcc_inter may be scipy matrices (dense PCC as saved by the
    reference pipeline) or (N, k) factor matrices from
    ``expression.pcc_factors`` (the lean path).
    """
    ppi = ppi_net.tocsr().astype(np.int8)
    n = ppi.shape[0]

    def as_factors(m):
        a = np.asarray(m.todense()) if sp.issparse(m) else np.asarray(m)
        if a.shape == (n, n):
            # Dense PCC given: fall back to the direct dense path.
            return None
        return a

    z_i = as_factors(pcc_inter)
    z_n = as_factors(pcc_nor)
    if z_i is None or z_n is None:
        return _modify_dense(ppi, pcc_nor, pcc_inter, thr)

    mean, std = diff_stats(z_i, z_n)
    lo = mean - thr * std
    hi = mean + thr * std

    # Existing edges: O(E·k) diff evaluation.
    coo = ppi.tocoo()
    ediff = pcc_at_edges(z_i, coo.row, coo.col) - pcc_at_edges(z_n, coo.row, coo.col)
    keep = ~(ediff < lo)  # remove where diff < lo (strict, :248)
    kept_r, kept_c = coo.row[keep], coo.col[keep]

    # Absent pairs with diff > hi: blocked scan.
    add_r, add_c = [], []
    for r0 in range(0, n, block_rows):
        r1 = min(r0 + block_rows, n)
        native = native_ext.diff_threshold_scan(
            z_i, z_n, r0, r1, lo, hi, max_out=block_rows * n
        )
        if native is not None:
            oi, oj, okind = native
            sel = okind == 1
            bi, bj = oi[sel], oj[sel]
        else:
            d = z_i[r0:r1] @ z_i.T - z_n[r0:r1] @ z_n.T
            # zero the diagonal entries of this block
            rr = np.arange(r0, r1)
            d[rr - r0, rr] = 0.0
            bi, bj = np.nonzero(d > hi)
            bi = (bi + r0).astype(np.int64)
            bj = bj.astype(np.int64)
        if len(bi):
            # only pairs not already edges (:249 ppi==0 condition)
            existing = np.asarray(ppi[bi, bj]).ravel() != 0
            add_r.append(bi[~existing])
            add_c.append(bj[~existing])

    add_r = np.concatenate(add_r) if add_r else np.empty(0, np.int64)
    add_c = np.concatenate(add_c) if add_c else np.empty(0, np.int64)

    new_r = np.concatenate([kept_r, add_r])
    new_c = np.concatenate([kept_c, add_c])
    out = sp.coo_matrix(
        (np.ones(len(new_r), np.int64), (new_r, new_c)), shape=(n, n)
    )
    return out


def _modify_dense(ppi, pcc_nor, pcc_inter, thr) -> sp.coo_matrix:
    """Direct port of the reference dense path (data_preprocess.py:228-257)
    — used for dense PCC inputs and as the test oracle."""
    a = np.asarray(pcc_inter.todense() if sp.issparse(pcc_inter) else pcc_inter,
                   np.float64)
    b = np.asarray(pcc_nor.todense() if sp.issparse(pcc_nor) else pcc_nor,
                   np.float64)
    diff = a - b
    ppi_d = np.asarray(ppi.todense())
    lo = diff.mean() - thr * diff.std()
    hi = diff.mean() + thr * diff.std()
    res1 = np.logical_and(diff < lo, ppi_d == 1)
    res2 = np.logical_and(diff > hi, ppi_d == 0)
    out = ppi_d.copy()
    out[res1] = 0
    out[res2] = 1
    return sp.coo_matrix(out)
