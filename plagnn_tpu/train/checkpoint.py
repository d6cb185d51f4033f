"""Checkpoint / resume.

The reference never saves model weights — only per-fold logit matrices
(train.py:289), because downstream analysis consumes logits (SURVEY.md §5
"checkpoint/resume: none for model state").  The framework keeps that logit
contract AND adds real checkpointing:

* ``save_params`` / ``load_params``: flat-npz serialization of any param /
  optimizer pytree (orbax is available in the environment but npz keeps the
  artifact greppable and dependency-free).
* round-level resume in the train driver: a round whose artifacts are all
  present is skipped, mirroring the preprocessing pipeline's
  skip-if-exists caching (data_preprocess.py:270-291).
"""
from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax


def _flatten(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_params(path: str, tree: Any) -> None:
    leaves, treedef = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_params(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (treedef string is stored only
    for debugging; the target structure is authoritative)."""
    with np.load(path) as z:
        leaves_like, treedef = _flatten(like)
        leaves = [z[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree.unflatten(treedef, leaves)


def save_state(path: str, state: Any) -> None:
    """Atomically persist an arbitrary pytree (params + opt state + partial
    history) for mid-round resume: write to a temp file, then rename — a
    kill during the write never corrupts an existing checkpoint."""
    import pickle

    state = jax.tree.map(np.asarray, state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, path)


def load_state(path: str) -> Any:
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def round_complete(path: str, round_idx: int, fold_num: int) -> bool:
    """True when every fold's logit artifact for a round exists — the resume
    predicate used by the train driver."""
    return all(
        os.path.exists(os.path.join(path, f"{round_idx}_{f}_loc_logits.npy"))
        for f in range(1, fold_num + 1)
    )
