"""Prediction post-processing.

``protein_loc_correction`` reproduces /root/reference/code/train.py:19-40
(torch) and performance.py:12-33 (numpy twin): per-column min-max
normalization, per-row sum-normalization, then a per-row adaptive threshold
``rowmax − (rowmax − rowmin)·α`` with strict ``>`` binarization.  The
reference loops rows in Python on the host every epoch; here it is a fully
vectorized jnp op that runs inside the jit'd step (SURVEY.md §3.1 flags the
per-epoch device→host hop as the design smell to fix).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def protein_loc_correction(
    loc_proba: jax.Array,
    alpha,
    row_valid: jax.Array | None = None,
) -> jax.Array:
    """Vectorized adaptive-threshold binarization.

    row_valid: optional (N,) bool — rows to include in the column statistics
    (excludes padding rows; the reference operates on exactly N=24041 rows).
    Returns float {0,1} predictions (padding rows all-zero).
    """
    x = loc_proba
    if row_valid is None:
        row_valid = jnp.ones(x.shape[0], bool)
    rv = row_valid[:, None]
    big = jnp.asarray(jnp.inf, x.dtype)
    min_p = jnp.min(jnp.where(rv, x, big), axis=0)
    max_p = jnp.max(jnp.where(rv, x, -big), axis=0)
    new = (x - min_p) / (max_p - min_p)
    new = new / jnp.sum(new, axis=1, keepdims=True)
    row_max = jnp.max(new, axis=1)
    row_min = jnp.min(new, axis=1)
    thresholds = row_max - (row_max - row_min) * alpha
    pred = (new > thresholds[:, None]).astype(x.dtype)
    return jnp.where(rv, pred, 0.0)


def protein_loc_correction_np(loc_proba: np.ndarray, alpha: float) -> np.ndarray:
    """Numpy twin (performance.py:12-33 semantics) for host-side analysis."""
    x = np.asarray(loc_proba)
    min_p = x.min(0)
    max_p = x.max(0)
    new = (x - min_p) / (max_p - min_p)
    new = new / new.sum(1).reshape(-1, 1)
    thr = new.max(1) - (new.max(1) - new.min(1)) * alpha
    pred = np.zeros(x.shape)
    pred[new > thr[:, None]] = 1.0
    return pred


def scaling_np(logit_mat: np.ndarray) -> np.ndarray:
    """Column min-max + row sum-normalization (main.py:15-29) — the merge
    scaler used for mis-localization scoring."""
    # dtype-preserving, like the reference (f32 logits stay f32 here and are
    # upcast only by the f64 accumulator in mat_merge).
    mat = np.array(logit_mat, copy=True)
    mat -= mat.min(0)
    mat /= mat.max(0)
    mat /= mat.sum(1).reshape(-1, 1)
    return mat
