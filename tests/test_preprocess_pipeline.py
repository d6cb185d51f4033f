"""Integration test: raw synthetic inputs → full preprocessing pipeline →
training-ready bundle (the reference's data_preprocess.py __main__ flow)."""
import gzip
import json
import os

import numpy as np
import pytest
import scipy.sparse as sp

from plagnn_tpu.data.preprocess import DatasetConfig, preprocess
from plagnn_tpu.data.artifacts import load_condition

N_PROT = 40


def _make_raw_inputs(root, rng):
    sm = os.path.join(root, "support_materials")
    os.makedirs(sm, exist_ok=True)

    prots = [f"P{i:05d}" for i in range(N_PROT)]

    # --- BioGRID mitab -----------------------------------------------------
    lines = ["#header\n"]
    edges = set()
    for _ in range(120):
        a, b = rng.integers(0, N_PROT, 2)
        if a == b:
            continue
        edges.add((min(a, b), max(a, b)))
    for a, b in sorted(edges):
        alt_a = f"biogrid:1|uniprot/swiss-prot:{prots[a]}|x"
        alt_b = f"biogrid:2|uniprot/swiss-prot:{prots[b]}|y"
        lines.append("\t".join(
            ["x", "y", alt_a, alt_b] + ["-"] * 7
            + ["psi-mi:MI:0915(physical association)"]) + "\n")
    with open(os.path.join(sm, "BIOGRID-ORGANISM-Homo_sapiens-4.4.203.mitab.txt"), "w") as f:
        f.writelines(lines)

    # --- expression CSV (one file reused for all GSEs) ----------------------
    samples = [
        "GSM766676", "GSM766677", "GSM766678",
        "GSM766682", "GSM766683", "GSM766684",
    ]
    import csv

    with open(os.path.join(sm, "GSE30931_exprSet.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] + ["uniprot_id"] + samples)
        for i, p in enumerate(prots[: N_PROT - 5]):  # some proteins missing
            w.writerow([i + 1, p] + list(rng.gamma(2.0, 2.0, len(samples)).round(3)))

    # --- cellular component + uniprot dat -----------------------------------
    cc = ["GO:0005938", "GO:0005829", "GO:0015629", "GO:0005794",
          "GO:0005783", "GO:0005730", "GO:0005777", "GO:0005739",
          "GO:0005764", "GO:0005813", "GO:0005634", "GO:0005886"]
    with open(os.path.join(sm, "cellular_component.txt"), "w") as f:
        f.write("\n".join(cc) + "\n")

    entries = []
    for p in prots:
        gos = rng.choice(cc, size=rng.integers(0, 3), replace=False)
        lines = [f"ID   {p}_HUMAN", f"AC   {p};"]
        for go in gos:
            lines.append(f"DR   GO; {go}; C:somewhere; IDA:x.")
        entries.append("\n".join(lines) + "\n")
    with gzip.open(os.path.join(sm, "uniprot_sprot_human.dat.gz"), "wt") as f:
        f.write("//\n".join(entries) + "//\n")


def test_full_preprocess_and_load(tmp_path, rng):
    root = str(tmp_path)
    _make_raw_inputs(root, rng)
    datasets = (DatasetConfig(
        "GSE30931", "support_materials/GSE30931_exprSet.csv",
        ("GSM766676", "GSM766677", "GSM766678"),
        ("GSM766682", "GSM766683", "GSM766684"), 1.5,
    ),)
    preprocess(root, datasets, pca_components=5, verbose=False)

    gm = os.path.join(root, "generate_materials")
    # artifact contract
    for name in ("PPI_normal.npz", "ECC_normal.npz", "loc_matrix.npz",
                 "ECC_normal_pca.npy", "protein_ppi.json",
                 "label_with_loc_list.json", "label_list.json"):
        assert os.path.exists(os.path.join(gm, name)), name
    dsd = os.path.join(gm, "GSE30931_data")
    for name in ("GCN_normal.npz", "GCN_inter.npz", "expr_normal.npy",
                 "expr_inter.npy", "PPI_inter.npz", "ECC_inter.npz",
                 "GCN_normal_pca.npy", "GCN_inter_pca.npy",
                 "ECC_inter_pca.npy"):
        assert os.path.exists(os.path.join(dsd, name)), name

    # PPI is symmetric with zero diagonal
    ppi = sp.load_npz(os.path.join(gm, "PPI_normal.npz"))
    a = ppi.toarray()
    np.testing.assert_array_equal(a, a.T)
    assert a.diagonal().sum() == 0

    # idempotency: second run reuses artifacts without error
    preprocess(root, datasets, pca_components=5, verbose=False)

    # both conditions load into training-ready bundles
    for cond in ("normal", "inter"):
        bundle = load_condition(root, "GSE30931", cond,
                                node_multiple=8, edge_multiple=64,
                                widths=(4, 16))
        n = bundle.n_real
        assert n == ppi.shape[0]
        # feature width: 3 expr samples + 5 gcn_pca + 5 ecc_pca = 13
        assert bundle.feats.shape[1] == 13


def test_lean_preprocess_matches_dense(tmp_path, rng):
    """--no-dense-gcn must run the FULL pipeline (the round-1 lean mode
    crashed at the PCA stage) and produce the same PCA features as the dense
    mode: the PCA input is gcn.multiply(ppi), which the lean path rebuilds
    from expression factors at edge positions."""
    dense_root = str(tmp_path / "dense")
    lean_root = str(tmp_path / "lean")
    os.makedirs(dense_root)
    os.makedirs(lean_root)
    _make_raw_inputs(dense_root, np.random.default_rng(11))
    _make_raw_inputs(lean_root, np.random.default_rng(11))
    datasets = (DatasetConfig(
        "GSE30931", "support_materials/GSE30931_exprSet.csv",
        ("GSM766676", "GSM766677", "GSM766678"),
        ("GSM766682", "GSM766683", "GSM766684"), 1.5,
    ),)
    preprocess(dense_root, datasets, pca_components=5, verbose=False)
    preprocess(lean_root, datasets, pca_components=5, verbose=False,
               dense_gcn_artifacts=False)

    lean_ds = os.path.join(lean_root, "generate_materials", "GSE30931_data")
    dense_ds = os.path.join(dense_root, "generate_materials", "GSE30931_data")
    # lean mode must NOT write the dense PCC artifacts ...
    assert not os.path.exists(os.path.join(lean_ds, "GCN_normal.npz"))
    assert not os.path.exists(os.path.join(lean_ds, "GCN_inter.npz"))
    # ... but every downstream artifact matches the dense pipeline
    for name in ("GCN_normal_pca.npy", "GCN_inter_pca.npy", "ECC_inter_pca.npy"):
        np.testing.assert_allclose(
            np.load(os.path.join(lean_ds, name)),
            np.load(os.path.join(dense_ds, name)),
            atol=1e-8, err_msg=name,
        )
    np.testing.assert_array_equal(
        sp.load_npz(os.path.join(lean_ds, "PPI_inter.npz")).toarray(),
        sp.load_npz(os.path.join(dense_ds, "PPI_inter.npz")).toarray(),
    )
