"""Loss and class-weight functions.

Reproduces /root/reference/code/train.py:89-126 (``multi_loss`` and
``weight_cal``) with identical clamp/normalization semantics, but as masked
whole-graph jnp reductions so the entire epoch stays inside one jit'd step
(the reference's ``logits[train_index]`` advanced indexing becomes a boolean
mask over static shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def weight_cal(loc_mat: np.ndarray) -> np.ndarray:
    """Per-class weights ``w_i = (n_labeled − n_i) / n_i`` computed from the
    full localization matrix (train.py:111-126).  ``n_labeled`` counts rows
    with ≥1 annotation."""
    loc_mat = np.asarray(loc_mat)
    class_num = loc_mat.sum(axis=0)
    sample_num = int((loc_mat.sum(axis=1) > 0).sum())
    return (sample_num - class_num) / class_num


def multi_loss(
    probs: jax.Array,
    targets: jax.Array,
    mask: jax.Array,
    class_weight: jax.Array,
) -> jax.Array:
    """Weighted multi-label BCE (train.py:89-108).

    Per class i:
        L_i = −Σ_rows [ t·log(clamp(p,1e-9,10))·w_i
                        + (1−t)·log(clamp(1−p,1e-9,10)) ] / (w_i+1) · 2 / n
    summed over classes; ``n`` is the number of masked rows (the reference
    divides by ``len(input)`` of the selected subset).
    """
    mask = mask.astype(probs.dtype)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    w = class_weight.astype(probs.dtype)[None, :]
    ll = (
        targets * jnp.log(jnp.clip(probs, 1e-9, 10.0)) * w
        + (1.0 - targets) * jnp.log(jnp.clip(1.0 - probs, 1e-9, 10.0))
    ) / (w + 1.0) * 2.0
    per_class = -jnp.sum(ll * mask[:, None], axis=0) / n
    return jnp.sum(per_class)
