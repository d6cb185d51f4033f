"""The PRODUCTION fold runner across real process boundaries (VERDICT r4
next-step 3): two `jax.distributed` processes x 4 virtual CPU devices each,
mesh fold=2 x graph=4, driven end to end through ``train.engine.train`` (the
same code path `plagnn train-normal --mesh fold=2,graph=4` runs on 2 hosts).
Process 0 writes the artifacts; they must equal a single-process single-chip
run byte-for-byte where deterministic (log.tsv) and to f32 reduction
tolerance elsewhere.

The prior round proved only 2-process bring-up + one cross-process psum
(test_scaling_harness.py); this exercises multi-process global-array
semantics of ``make_sharded_fold_runner`` — replicated numpy inputs into the
global-mesh jit, replicated outputs every process can read, per-process
artifact writing."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMMON = r"""
import os, sys
sys.path.insert(0, {repo!r})
import numpy as np

def run_train(out_dir, mesh_fold, mesh_graph):
    from plagnn_tpu.data import synthetic_dataset
    from plagnn_tpu.ops import from_scipy_coo, pad_features
    from plagnn_tpu.train.engine import TrainConfig, train

    ppi, feats, loc, label_list = synthetic_dataset(
        n_nodes=96, n_edges=500, seed=4, feature_dims=(3, 6, 6))
    graph = from_scipy_coo(
        ppi, add_self_loops=True, widths=(4, 16, 64),
        node_multiple=16, edge_multiple=64)
    cfg = TrainConfig(
        lr=1e-3, fold_num=2, epoch_num=3, fold_batch=2,
        fold_seeds=(12,), hidden=(13, 9, 7, 5), compute_auc=True,
        auc_every=2, verbose=False,
        mesh_fold=mesh_fold, mesh_graph=mesh_graph)
    train(graph, pad_features(feats, graph.n_nodes),
          pad_features(loc, graph.n_nodes), label_list, loc, cfg,
          out_dir + "/", device_name="cpu")
"""

_WORKER = _COMMON + r"""
pid = int(sys.argv[1])
out_dir = sys.argv[2]
from plagnn_tpu.parallel.multihost import initialize_distributed
n = initialize_distributed(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid)
import jax
assert n == 2 and jax.process_count() == 2
assert len(jax.devices()) == 8, jax.devices()   # 2 processes x 4 local
assert len(jax.local_devices()) == 4
run_train(out_dir, mesh_fold=2, mesh_graph=4)
print("MPRUN_OK", pid)
"""

_REF = _COMMON + r"""
run_train(sys.argv[2], mesh_fold=1, mesh_graph=1)
print("REF_OK")
"""


@pytest.mark.slow
def test_production_runner_two_processes(tmp_path):
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=REPO, port=port))
    ref_script = tmp_path / "ref.py"
    ref_script.write_text(_REF.format(repo=REPO, port=port))
    mesh_dir = tmp_path / "mesh"
    ref_dir = tmp_path / "single"
    mesh_dir.mkdir()
    ref_dir.mkdir()
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    }
    # reference: a fresh single-process single-chip interpreter (not the
    # test process — its 8-device env and jax state stay out of the picture)
    rp = subprocess.run(
        [sys.executable, str(ref_script), "0", str(ref_dir)],
        capture_output=True, env=env, timeout=600)
    assert rp.returncode == 0, rp.stderr.decode()[-2000:]

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(mesh_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process production run timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
        assert "MPRUN_OK" in out

    ref_files = sorted(os.listdir(ref_dir))
    got_files = sorted(os.listdir(mesh_dir))
    assert got_files == ref_files, (got_files, ref_files)
    # logits: f32-reduction tolerance; 2 folds x 1 round
    logits = [f for f in ref_files if f.endswith("loc_logits.npy")]
    assert len(logits) == 2
    for f in logits:
        np.testing.assert_allclose(
            np.load(mesh_dir / f), np.load(ref_dir / f), atol=1e-5)
    # log.tsv structure (round/fold/flag/index/true columns) is fully
    # deterministic — equality also proves exactly ONE process wrote it
    # (double-writing would duplicate appended rows).  The predict column is
    # excluded: it binarizes at an adaptive threshold where 1e-7 logit noise
    # can flip a borderline label.
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
                        atol=1e-5, rtol=1e-5,
                        err_msg=f"{split}/{alpha}/{fold}/{k}")
