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


# Mid-round checkpoint schema.  v2 replaced the original pickle blob with
# the same flat-npz scheme save_params uses (greppable, robust across
# jax/numpy upgrades — pickle ties the file to the exact class layout of
# optax/jax internals at write time).  Bump on any layout change; loaders
# refuse mismatched versions loudly.
STATE_SCHEMA_VERSION = 2


def save_state(path: str, state: dict) -> None:
    """Atomically persist a mid-round training state for resume.

    ``state`` keys: ``params`` / ``opt_state`` (arbitrary pytrees — leaves
    are stored flat in ``jax.tree`` order and restored into caller-provided
    structures), ``history`` (nested dict of arrays — structure is stored
    and restored exactly), ``epochs_done`` (int), ``config`` (JSON-able
    fingerprint dict).  Write-to-temp + rename: a kill mid-write never
    corrupts an existing checkpoint."""
    import json

    p_leaves = [np.asarray(l) for l in jax.tree.leaves(state["params"])]
    o_leaves = [np.asarray(l) for l in jax.tree.leaves(state["opt_state"])]
    h_paths, h_leaves = [], []
    for kp, leaf in jax.tree_util.tree_flatten_with_path(state["history"])[0]:
        h_paths.append([k.key for k in kp])
        h_leaves.append(np.asarray(leaf))
    meta = {
        "schema": STATE_SCHEMA_VERSION,
        "epochs_done": int(state["epochs_done"]),
        "config": state.get("config"),
        "n_params": len(p_leaves),
        "n_opt": len(o_leaves),
        "history_paths": h_paths,
    }
    arrays = {"__meta__": np.frombuffer(json.dumps(meta).encode(), np.uint8)}
    arrays.update({f"p{i}": l for i, l in enumerate(p_leaves)})
    arrays.update({f"o{i}": l for i, l in enumerate(o_leaves)})
    arrays.update({f"h{i}": l for i, l in enumerate(h_leaves)})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_state(path: str) -> dict:
    """Load a v2 npz mid-round checkpoint.

    Returns ``{"params_leaves", "opt_leaves", "history", "epochs_done",
    "config", "schema"}`` — param/opt leaves are flat lists the caller
    unflattens into its own (authoritative) structures; history is the
    nested dict as saved.  Legacy pickle checkpoints and future schema
    versions are refused loudly."""
    import json

    try:
        z = np.load(path)
    except (ValueError, OSError) as e:
        raise ValueError(
            f"checkpoint {path} is not a v{STATE_SCHEMA_VERSION} npz "
            "mid-round checkpoint (legacy pickle checkpoints from older "
            "versions cannot be loaded safely); delete it to restart this "
            f"job chunk from epoch 0 ({e})"
        ) from e
    with z:
        if "__meta__" not in z.files:
            raise ValueError(
                f"checkpoint {path} carries no schema metadata; delete it to "
                "restart this job chunk from epoch 0"
            )
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta.get("schema") != STATE_SCHEMA_VERSION:
            raise ValueError(
                f"checkpoint {path} has schema version {meta.get('schema')!r} "
                f"but this build reads v{STATE_SCHEMA_VERSION}; delete it to "
                "restart this job chunk from epoch 0"
            )
        p_leaves = [z[f"p{i}"] for i in range(meta["n_params"])]
        o_leaves = [z[f"o{i}"] for i in range(meta["n_opt"])]
        history: dict = {}
        for i, kp in enumerate(meta["history_paths"]):
            d = history
            for k in kp[:-1]:
                d = d.setdefault(k, {})
            d[kp[-1]] = z[f"h{i}"]
    return {
        "params_leaves": p_leaves,
        "opt_leaves": o_leaves,
        "history": history,
        "epochs_done": meta["epochs_done"],
        "config": meta["config"],
        "schema": meta["schema"],
    }


def round_complete(path: str, round_idx: int, fold_num: int) -> bool:
    """True when every fold's logit artifact for a round exists — the resume
    predicate used by the train driver."""
    return all(
        os.path.exists(os.path.join(path, f"{round_idx}_{f}_loc_logits.npy"))
        for f in range(1, fold_num + 1)
    )
