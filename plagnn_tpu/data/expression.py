"""GEO expression → co-expression (PCC/"GCN") matrices.

Reproduces ``construct_gcn_matrix`` (/root/reference/code/data_preprocess.py:
128-172): align the expression CSV to the PPI protein list (group-by
uniprot_id with mean aggregation, drop proteins outside the PPI, zero-fill
missing), Pearson correlation over the sample columns, zero diagonal,
NaN→0.

Besides the dense-parity output, the *standardized factor* form is exposed:
``pcc_factors`` returns Z with zero-mean unit-norm rows (zeros for invalid
rows) such that PCC = Z·Zᵀ with the diagonal forced to 0 — the
perturbation-topology step works from these k-column factors instead of the
reference's dense 24041² intermediates (data_preprocess.py:237-241,
SURVEY.md §7 hard part 5).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pandas as pd
import scipy.sparse as sp


def align_expression(
    csv_path: str, sample_list: Sequence[str], protein_list: Sequence[str]
) -> np.ndarray:
    """(N, k) expression matrix aligned to the PPI protein list
    (zeros for proteins absent from the CSV) — data_preprocess.py:139-165."""
    expr_set = pd.read_csv(csv_path)
    cols = ["uniprot_id"] + list(sample_list)
    expr_data = pd.DataFrame(expr_set[cols]).sort_values("uniprot_id")
    expr_data = expr_data.groupby(expr_data["uniprot_id"]).agg("mean")
    expr_data = expr_data.loc[expr_data.index.isin(set(protein_list))]

    out = np.zeros((len(protein_list), len(sample_list)), np.float64)
    index = {u: i for i, u in enumerate(protein_list)}
    for uid, row in zip(expr_data.index, expr_data.to_numpy()):
        out[index[uid]] = row
    return out


def pcc_factors(expr: np.ndarray) -> np.ndarray:
    """Standardized factors Z with PCC = Z·Zᵀ (diag excluded).

    Rows with zero variance (e.g. all-zero fill) become zero rows, matching
    corrcoef's NaN rows after the reference's NaN→0 (data_preprocess.py:
    167-169)."""
    x = np.asarray(expr, np.float64)
    xc = x - x.mean(axis=1, keepdims=True)
    norm = np.sqrt((xc * xc).sum(axis=1, keepdims=True))
    with np.errstate(invalid="ignore", divide="ignore"):
        z = np.where(norm > 0, xc / norm, 0.0)
    return z


def pcc_dense(expr: np.ndarray) -> np.ndarray:
    """Dense PCC with reference post-processing (corrcoef → zero diagonal →
    NaN→0), data_preprocess.py:166-169."""
    with np.errstate(invalid="ignore", divide="ignore"):
        p = np.corrcoef(expr)
    np.fill_diagonal(p, 0)
    p[np.isnan(p)] = 0
    return p


def construct_gcn_matrix(
    csv_path: str, sample_list: Sequence[str], protein_list: Sequence[str]
) -> Tuple[sp.coo_matrix, np.ndarray]:
    """(gcn coo, expr matrix) with exact reference semantics
    (data_preprocess.py:128-172)."""
    expr = align_expression(csv_path, sample_list, protein_list)
    gcn = sp.coo_matrix(pcc_dense(expr))
    return gcn, expr


def pcc_at_edges(
    z: np.ndarray, rows: np.ndarray, cols: np.ndarray
) -> np.ndarray:
    """PCC values at edge positions from factors (diagonal entries return the
    raw product; callers exclude them)."""
    return np.einsum("ek,ek->e", z[rows], z[cols])
