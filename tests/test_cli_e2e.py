"""End-to-end drive of the full CLI pipeline on a synthetic bundle.

Automates the verify-skill recipe: synth → train-normal → train-inter →
score → performance → statistics → figures, asserting the reference's
artifact contract at every stage (README.md:195-218 entry points;
train.py:289,294-357 log artifacts; main.py:48,145-175 scoring outputs).
"""
import json
import os

import numpy as np
import pytest

from plagnn_tpu import cli


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clidata"))
    cli.main(["synth", "--data-root", root, "--nodes", "256",
              "--edges", "1500", "--seed", "7"])
    return root


TRAIN_FLAGS = ["-data", "GSE30931", "-e", "4", "--rounds", "1", "-f", "2",
               "--fold-batch", "2"]


@pytest.mark.slow
def test_train_both_conditions(data_root, capsys):
    cli.main(["train-normal", "--data-root", data_root] + TRAIN_FLAGS)
    cli.main(["train-inter", "--data-root", data_root] + TRAIN_FLAGS)
    out = capsys.readouterr().out
    assert "tra --" in out and "val --" in out

    for cond in ("normal", "perturbation"):
        d = os.path.join(data_root, "log", "GSE30931", cond)
        for fold in (1, 2):
            logits = np.load(os.path.join(d, f"1_{fold}_loc_logits.npy"))
            assert logits.shape[1] == 12
            assert np.all((logits >= 0) & (logits <= 1))
        assert os.path.exists(os.path.join(d, "log.tsv"))
        assert os.path.exists(os.path.join(d, "txt_log.txt"))
        curves = json.load(open(os.path.join(d, "fig_data_1.json")))
        assert set(curves) == {"train", "validation"}

        def leaf_lists(node):
            if isinstance(node, list):
                yield node
            elif isinstance(node, dict):
                for k, v in node.items():
                    if k == "pred_num_final":  # 12-organelle count vector,
                        assert len(v) == 12    # not a per-epoch curve
                        continue
                    yield from leaf_lists(v)

        lens = [len(leaf) for leaf in leaf_lists(curves)]
        assert lens and all(n == 4 for n in lens)  # one point per epoch

    # resume: re-running with identical flags must skip, not retrain
    cli.main(["train-normal", "--data-root", data_root] + TRAIN_FLAGS)
    assert "skipping" in capsys.readouterr().out


@pytest.mark.slow
def test_score_performance_statistics_figures(data_root, capsys):
    cli.main(["score", "--data-root", data_root])
    res = os.path.join(data_root, "res", "GSE30931")
    for state in ("normal", "perturbation"):
        merged = np.load(os.path.join(res, f"{state}_logits.npy"))
        assert merged.shape[1] == 12
    assert os.path.exists(os.path.join(res, "loc_change_record.csv"))
    assert os.path.exists(os.path.join(res, "res_alldata.json"))

    cli.main(["performance", "--data-root", data_root,
              "--rounds", "1", "--folds", "2"])
    out = capsys.readouterr().out
    assert "AIM" in out and "random" in out.lower()

    cli.main(["statistics", "--data-root", data_root])
    assert os.path.exists(os.path.join(data_root, "log", "statistics.txt"))

    cli.main(["figures", "--data-root", data_root])
    figs = [
        f
        for base, _, files in os.walk(os.path.join(data_root, "log"))
        for f in files
        if f.endswith(".png")
    ]
    assert figs, "figures wrote no .png files"
