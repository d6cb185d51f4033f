"""The D=16 production recipe, executed (VERDICT r4 next-step 4).

The mesh planner's 2-host answer (BASELINE.md r4: D=16 -> fold=4 x graph=4,
balanced partition, hub cache, fold_batch > mesh_fold, modeled 0.905-0.916
end-to-end) had never run anywhere — not even virtually.  This drives the
engine at exactly that factorization on a 16-virtual-device CPU platform
(own subprocess: the suite's conftest pins 8 devices) with per-chip Pallas
kernels in interpret mode, and asserts the artifacts equal a single-chip
run."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, sys
sys.path.insert(0, {repo!r})
import numpy as np
mode = sys.argv[1]
out_dir = sys.argv[2]

from plagnn_tpu.data import synthetic_dataset
from plagnn_tpu.ops import from_scipy_coo, pad_features
from plagnn_tpu.train.engine import TrainConfig, train

import jax
if mode == "mesh":
    assert len(jax.devices()) == 16, jax.devices()

ppi, feats, loc, label_list = synthetic_dataset(
    n_nodes=512, n_edges=4000, seed=4, feature_dims=(3, 6, 6))
graph = from_scipy_coo(
    ppi, add_self_loops=True, widths=(4, 16, 64),
    node_multiple=16, edge_multiple=64)
kw = dict(
    lr=1e-3, fold_num=8, epoch_num=2, fold_batch=8,
    fold_seeds=(12,), hidden=(13, 9, 7, 5), compute_auc=True,
    auc_every=2, verbose=False)
if mode == "mesh":
    # the planner's D=16 production recipe: fold=4 x graph=4, balanced
    # degree-snake partition (default), per-chip pallas kernels with the
    # hub cache, fold_batch (8) > mesh_fold (4)
    kw.update(mesh_fold=4, mesh_graph=4, spmm_impl="pallas",
              pallas_interpret=True, hub_cache="8", mesh_balance=True)
train(graph, pad_features(feats, graph.n_nodes),
      pad_features(loc, graph.n_nodes), label_list, loc, TrainConfig(**kw),
      out_dir + "/", device_name="cpu")
print("D16_OK", mode)
"""


@pytest.mark.slow
def test_d16_recipe_virtual_execution(tmp_path):
    script = tmp_path / "d16.py"
    script.write_text(_SCRIPT.format(repo=REPO))
    mesh_dir = tmp_path / "mesh"
    ref_dir = tmp_path / "single"
    mesh_dir.mkdir()
    ref_dir.mkdir()

    def run(mode, out_dir, n_dev):
        env = {
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_dev}",
        }
        p = subprocess.run(
            [sys.executable, str(script), mode, str(out_dir)],
            capture_output=True, env=env, timeout=580)
        assert p.returncode == 0, p.stderr.decode()[-3000:]
        assert f"D16_OK {mode}" in p.stdout.decode()

    run("single", ref_dir, 1)
    run("mesh", mesh_dir, 16)

    ref_files = sorted(os.listdir(ref_dir))
    got_files = sorted(os.listdir(mesh_dir))
    assert got_files == ref_files
    logits = [f for f in ref_files if f.endswith("loc_logits.npy")]
    assert len(logits) == 8
    for f in logits:
        np.testing.assert_allclose(
            np.load(mesh_dir / f), np.load(ref_dir / f), atol=1e-5)
    # tsv structure columns are deterministic; the predict column binarizes
    # at an adaptive threshold where f32 reduction noise can flip a
    # borderline label, so it is excluded
    def tsv_struct(p):
        return ["\t".join(line.split("\t")[:5])
                for line in p.read_text().splitlines()]

    assert tsv_struct(mesh_dir / "log.tsv") == tsv_struct(ref_dir / "log.tsv")
    with open(ref_dir / "fig_data_1.json") as fh:
        fig_ref = json.load(fh)
    with open(mesh_dir / "fig_data_1.json") as fh:
        fig_got = json.load(fh)
    for split in ("train", "validation"):
        for alpha, folds in fig_ref[split].items():
            for fold, curves in folds.items():
                for k, v in curves.items():
                    np.testing.assert_allclose(
                        fig_got[split][alpha][fold][k], v,
                        atol=1e-5, rtol=1e-4,
                        err_msg=f"{split}/{alpha}/{fold}/{k}")
