"""K-fold split generation with exact sklearn parity.

The reference uses ``sklearn.model_selection.KFold(n_splits, shuffle=True,
random_state=fseed)`` over ``label_with_loc_list`` with fold seeds
[12, 22, ..., 100] (/root/reference/code/train.py:162-178).  Fold membership
determines which logits feed main.py's merge, so parity depends on it
(SURVEY.md §7 step 4).  sklearn is available in this environment, so we call
it directly and convert the index splits into static boolean node masks.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from sklearn.model_selection import KFold

FOLD_SEEDS = (12, 22, 32, 42, 52, 62, 72, 82, 92, 100)


def fold_node_masks(
    label_indices: Sequence[int],
    n_pad_nodes: int,
    fold_num: int,
    fseed: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Boolean (fold_num, N_pad) train/val node masks for one round.

    ``label_indices`` is label_with_loc_list: global node ids of annotated
    proteins — the CV universe.  KFold splits *positions* in that list; the
    reference remaps positions to node ids (train.py:183-188).
    """
    label_indices = np.asarray(label_indices)
    kf = KFold(n_splits=fold_num, random_state=fseed, shuffle=True)
    train_masks = np.zeros((fold_num, n_pad_nodes), bool)
    val_masks = np.zeros((fold_num, n_pad_nodes), bool)
    for f, (tr, va) in enumerate(kf.split(label_indices)):
        train_masks[f, label_indices[tr]] = True
        val_masks[f, label_indices[va]] = True
    return train_masks, val_masks


def all_round_masks(
    label_indices: Sequence[int],
    n_pad_nodes: int,
    fold_num: int,
    fold_seeds: Sequence[int] = FOLD_SEEDS,
) -> Tuple[np.ndarray, np.ndarray]:
    """(rounds, fold_num, N_pad) masks for every round."""
    trs, vas = [], []
    for fseed in fold_seeds:
        tr, va = fold_node_masks(label_indices, n_pad_nodes, fold_num, fseed)
        trs.append(tr)
        vas.append(va)
    return np.stack(trs), np.stack(vas)
