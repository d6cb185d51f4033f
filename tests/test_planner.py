"""Mesh planner tests (parallel/planner.py).

The planner is pure host-side modeling: measured-rate interpolation,
exact partition comm counts, and the (fold, graph) factorization scorer
behind --mesh auto / plagnn plan-mesh.
"""
import numpy as np
import pytest

from plagnn_tpu.parallel.planner import (
    MEASURED_BF16_RATES,
    counts_1d,
    counts_2d,
    plan_mesh,
    rate_single_chip,
)


def test_rate_interpolation_anchors_and_shape():
    for b, r in MEASURED_BF16_RATES.items():
        assert rate_single_chip(b) == pytest.approx(r)
    # near-monotone over the sweep (measured anchors carry ~1% run-to-run
    # noise at the byte-bound plateau, e.g. B=28 vs B=24)
    xs = [rate_single_chip(b) for b in range(1, 40)]
    assert all(b2 >= b1 * 0.98 for b1, b2 in zip(xs, xs[1:]))
    # below the smallest anchor: issue-floor-bound, rate ~ b
    assert rate_single_chip(5) == pytest.approx(
        MEASURED_BF16_RATES[10] * 0.5)
    # beyond the measured plateau: flat, no extrapolation
    assert rate_single_chip(64) == pytest.approx(MEASURED_BF16_RATES[32])


def test_anchors_file_and_fallback(tmp_path, monkeypatch):
    """plan_mesh consumes a measured-anchors file when present and falls
    back to the baked constants when absent/malformed, recording the source
    either way (VERDICT r4 next-step 6)."""
    import json

    from plagnn_tpu.parallel.planner import load_anchors

    monkeypatch.delenv("PLAGNN_ANCHORS", raising=False)
    # hermetic: "baked" pins the constants regardless of any repo-level file
    anc = load_anchors("baked")
    assert anc["source"] == "baked"
    assert anc["rates"] == MEASURED_BF16_RATES

    f = tmp_path / "anchors.json"
    f.write_text(json.dumps({
        "bf16_rates": {"10": 100e6, "32": 200e6},
        "structure_tax": 1.05,
    }))
    anc = load_anchors(str(f))
    assert anc["source"] == str(f)
    assert anc["rates"] == {10: 100e6, 32: 200e6}
    assert anc["tax"] == 1.05 and anc["max_b"] == 32
    assert rate_single_chip(32, anc["rates"]) == pytest.approx(200e6)

    # malformed file falls through to baked, never crashes
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    monkeypatch.setattr(
        "plagnn_tpu.parallel.planner.DEFAULT_ANCHORS_PATH",
        str(tmp_path / "missing.json"))
    assert load_anchors(str(bad))["source"] == "baked"
    empty = tmp_path / "empty.json"
    empty.write_text(json.dumps({"bf16_rates": {}}))
    assert load_anchors(str(empty))["source"] == "baked"

    # the measured rates actually drive the plan: double every rate and the
    # modeled mesh throughput doubles with it
    src = np.array([0, 1, 2, 3] * 50)
    dst = np.array([1, 2, 3, 0] * 50)
    base = plan_mesh(2, src, dst, 4, total_jobs=10, anchors_path="baked")
    fast = tmp_path / "fast.json"
    fast.write_text(json.dumps({
        "bf16_rates": {str(b): 2 * r for b, r in MEASURED_BF16_RATES.items()},
    }))
    boosted = plan_mesh(2, src, dst, 4, total_jobs=10,
                        anchors_path=str(fast))
    assert boosted.anchors_source == str(fast)
    assert base.anchors_source == "baked"
    assert boosted.chosen.edge_folds_per_s == pytest.approx(
        2 * base.chosen.edge_folds_per_s, rel=1e-3)
    assert f"anchors: {fast}" in boosted.summary()


def test_counts_1d_hand_checked():
    # 4 nodes, 2 chips (c=2: chip0 owns {0,1}, chip1 owns {2,3})
    src = np.array([0, 1, 2, 3, 0])
    dst = np.array([2, 3, 0, 3, 1])
    cts = counts_1d(src, dst, 4, 2, balanced=False)
    assert cts["own_rows"] == 2
    np.testing.assert_array_equal(cts["edges_per_chip"], [2, 3])
    np.testing.assert_array_equal(cts["boundary_per_chip"], [1, 2])
    np.testing.assert_array_equal(cts["interior_per_chip"], [1, 1])
    np.testing.assert_array_equal(cts["halo_recv_rows"], [1, 2])
    np.testing.assert_array_equal(cts["halo_send_rows"], [2, 1])


def test_counts_1d_balanced_bounds_skew(rng):
    # power-law-ish degrees with hub ids clustered at the front: contiguous
    # blocks are skewed, the snake balance bounds it
    n, e, p = 512, 8000, 8
    dst = rng.choice(n, e, p=(1.0 / np.arange(1, n + 1))
                     / (1.0 / np.arange(1, n + 1)).sum())
    src = rng.integers(0, n, e)
    contig = counts_1d(src, dst, n, p, balanced=False)
    bal = counts_1d(src, dst, n, p, balanced=True)
    # the snake deal bounds the worst chip by mean + one node's degree
    deg_max = np.bincount(dst, minlength=n).max()
    assert bal["edges_per_chip"].max() <= e / p + deg_max
    assert bal["edges_per_chip"].max() <= contig["edges_per_chip"].max()


def test_counts_2d_vs_bruteforce(rng):
    """counts_2d against an independent brute-force of the same scheme
    definitions (grid ownership, column gather of needed rows, row-reduce
    partials landing at feature owners)."""
    n, e, pr, pc = 96, 900, 3, 2
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    cts = counts_2d(src, dst, n, pr, pc, balanced=False)
    p = pr * pc
    c_dst, c_src, own = -(-n // pr), -(-n // pc), -(-n // p)
    gather_recv = np.zeros(p, int)
    gather_send = np.zeros(p, int)
    reduce_send = np.zeros(p, int)
    reduce_recv = np.zeros(p, int)
    edges = np.zeros(p, int)
    for chip in range(p):
        i, j = divmod(chip, pc)
        mask = (dst // c_dst == i) & (src // c_src == j)
        edges[chip] = mask.sum()
        for s in np.unique(src[mask]):
            if s // own != chip:
                gather_recv[chip] += 1
                gather_send[s // own] += 1
        for d in np.unique(dst[mask]):
            if d // own != chip:
                reduce_send[chip] += 1
                reduce_recv[d // own] += 1
    np.testing.assert_array_equal(cts["edges_per_chip"], edges)
    np.testing.assert_array_equal(
        cts["halo_recv_rows"], gather_recv + reduce_recv)
    np.testing.assert_array_equal(
        cts["halo_send_rows"], gather_send + reduce_send)
    assert cts["edges_per_chip"].sum() == e
    np.testing.assert_array_equal(
        cts["interior_per_chip"] + cts["boundary_per_chip"],
        cts["edges_per_chip"])


def test_plan_mesh_structure(rng):
    from plagnn_tpu.data.synthetic import powerlaw_ppi

    ppi = powerlaw_ppi(n_nodes=4000, n_edges=40000, seed=70)
    loops = np.arange(4000, dtype=np.int64)
    src = np.concatenate([np.asarray(ppi.row, np.int64), loops])
    dst = np.concatenate([np.asarray(ppi.col, np.int64), loops])
    plan = plan_mesh(16, src, dst, 4000, total_jobs=100, include_2d=True)
    facts = {(c.mesh_fold, c.mesh_graph) for c in plan.table}
    assert facts == {(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)}
    assert any(c.scheme.startswith("2d:") for c in plan.table)
    ch = plan.chosen
    assert ch.scheme == "1d"
    assert ch.mesh_fold * ch.mesh_graph == 16
    assert ch.fold_batch == ch.mesh_fold * ch.b_local
    assert 0 < ch.efficiency <= 1.001
    assert all(0 < c.utilization <= 1.0 for c in plan.table)
    assert "mesh planner: D=16" in plan.summary()


@pytest.mark.slow
def test_plan_mesh_ppi_scale_production_recipe():
    """The production 2-host (16-chip) recipe on the PPI-scale graph: the
    planner must find a >=0.80 configuration — the round-3 gap was that pure
    graph P=16 models at 0.634; the (fold x graph) factorization closes it
    (VERDICT r3 missing #1 / next-step 1)."""
    from plagnn_tpu.data.synthetic import powerlaw_ppi

    ppi = powerlaw_ppi(n_nodes=24041, n_edges=700000, seed=70)
    loops = np.arange(24041, dtype=np.int64)
    src = np.concatenate([np.asarray(ppi.row, np.int64), loops])
    dst = np.concatenate([np.asarray(ppi.col, np.int64), loops])
    plan = plan_mesh(16, src, dst, 24041, total_jobs=100, include_2d=True)
    assert plan.chosen.efficiency >= 0.80
    assert plan.chosen.mesh_fold > 1, "pure graph P=16 cannot reach 0.80"
    # the modeled 2-D grid partition stays below 0.80 at pure-graph P=16
    # (recorded dead end; implement only if a future model clears the bar)
    two_d = [c for c in plan.table if c.scheme.startswith("2d:")]
    assert two_d and max(c.eff_graph for c in two_d) < 0.80


def test_cli_plan_mesh(capsys):
    from plagnn_tpu.cli import main

    main(["plan-mesh", "--devices", "8", "--nodes", "2000",
          "--edges", "16000"])
    out = capsys.readouterr().out
    assert "mesh planner: D=8" in out
    assert "x" in out and "eff" in out


@pytest.mark.slow
def test_train_mesh_auto_end_to_end(tmp_path, capsys):
    """--mesh auto:8 plans and trains on the 8-virtual-device CPU mesh."""
    from plagnn_tpu.cli import main

    root = str(tmp_path / "data")
    main(["synth", "--data-root", root, "--nodes", "96", "--edges", "500"])
    main(["train-normal", "-data", "GSE30931", "--data-root", root,
          "-e", "2", "--rounds", "2", "-f", "3", "--mesh", "auto:8"])
    out = capsys.readouterr().out
    assert "mesh planner: D=8" in out
    import os

    logd = os.path.join(root, "log", "GSE30931", "normal")
    for r in (1, 2):
        for f in (1, 2, 3):
            assert os.path.exists(
                os.path.join(logd, f"{r}_{f}_loc_logits.npy"))
