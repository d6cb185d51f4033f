"""Checkpoint/resume unit tests (train/checkpoint.py)."""
import os

import numpy as np
import jax.numpy as jnp

from plagnn_tpu.train.checkpoint import load_params, round_complete, save_params


def test_save_load_roundtrip(tmp_path):
    tree = {
        "w": jnp.arange(6.0).reshape(2, 3),
        "nested": {"b": jnp.zeros(4), "count": jnp.asarray(3, jnp.int32)},
    }
    p = str(tmp_path / "ckpt.npz")
    save_params(p, tree)
    like = {
        "w": jnp.zeros((2, 3)),
        "nested": {"b": jnp.ones(4), "count": jnp.asarray(0, jnp.int32)},
    }
    restored = load_params(p, like)
    np.testing.assert_array_equal(restored["w"], np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(restored["nested"]["b"], np.zeros(4))
    assert int(restored["nested"]["count"]) == 3


def test_round_complete_predicate(tmp_path):
    d = str(tmp_path)
    assert not round_complete(d, 1, 2)
    np.save(os.path.join(d, "1_1_loc_logits.npy"), np.zeros((4, 12)))
    assert not round_complete(d, 1, 2)
    np.save(os.path.join(d, "1_2_loc_logits.npy"), np.zeros((4, 12)))
    assert round_complete(d, 1, 2)
    assert not round_complete(d, 2, 2)
