"""Figure generation.

Port of /root/reference/code/figure.py and utils.fig_and_perf (utils.py:54-89)
with one conscious fix (SURVEY.md §5): the reference's fig_alpha_data scrapes
per-organelle count tables back out of txt_log.txt (figure.py:134-176); here
the same data comes from the structured fig_data_{round}.json written by the
engine.  All chart types are preserved:

* ΔPCC distribution over linked/unlinked pairs (save_diff/get_fig_data/fig,
  figure.py:10-106) — computed from factor matrices without dense N².
* Label-multiplicity counts (subcellular_fig_data, figure.py:109-123).
* Per-organelle prediction-distribution bars + Jensen-Shannon distance vs
  the control (fig_alpha, figure.py:179-235).
* Metric-vs-epoch curves (utils.fig_and_perf).
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, Sequence

import numpy as np
import scipy.sparse as sp
from scipy.spatial.distance import jensenshannon

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def diff_histogram(
    z_inter: np.ndarray,
    z_nor: np.ndarray,
    ppi,
    bins=None,
    block_rows: int = 2048,
):
    """Histogram counts of ΔPCC for linked vs unlinked pairs
    (figure.py:10-76) via a blocked scan (no dense N²)."""
    if bins is None:
        bins = np.arange(-2.0, 2.0 + 1e-9, 0.02)
    n = z_inter.shape[0]
    ppi = ppi.tocsr()
    linked = np.zeros(len(bins) - 1, np.int64)
    unlinked = np.zeros(len(bins) - 1, np.int64)
    for r0 in range(0, n, block_rows):
        r1 = min(r0 + block_rows, n)
        d = z_inter[r0:r1] @ z_inter.T - z_nor[r0:r1] @ z_nor.T
        rr = np.arange(r0, r1)
        d[rr - r0, rr] = np.nan  # exclude diagonal
        mask = np.asarray(ppi[r0:r1].todense()) > 0
        dl = d[mask]
        du = d[~mask & ~np.isnan(d)]
        linked += np.histogram(dl[~np.isnan(dl)], bins)[0]
        unlinked += np.histogram(du, bins)[0]
    return bins, linked, unlinked


def save_diff(z_inter, z_nor, ppi, out_dir: str, block_rows: int = 2048):
    """Persist the ΔPCC artifact triple ``diff.npy`` / ``diff_link.npy`` /
    ``diff_unlink.npy`` (figure.py:10-33 contract) from factor matrices.

    Reference semantics preserved exactly: ``diff_link = diff[ppi == 1]``,
    ``diff_unlink = diff[ppi == 0]`` — the unlink set INCLUDES the diagonal
    (ppi has a zero diagonal; both PCC artifacts do too, so those entries
    are 0), and ``diff.npy`` is the row-major flatten (the reference's
    ``.sort()`` on a one-element list of rows is a no-op).  The dense
    diff is produced block-by-block; the saved arrays are still O(N²) —
    the reference's own ~16 GB artifact footprint.
    """
    n = z_inter.shape[0]
    ppi = ppi.tocsr()
    all_parts, link_parts, unlink_parts = [], [], []
    for r0 in range(0, n, block_rows):
        r1 = min(r0 + block_rows, n)
        d = z_inter[r0:r1] @ z_inter.T - z_nor[r0:r1] @ z_nor.T
        # the GCN artifacts carry zero diagonals (pcc_dense fill_diagonal);
        # the factor form's self-correlation is 1 — force the artifact value
        rr = np.arange(r0, r1)
        d[rr - r0, rr] = 0.0
        mask = np.asarray(ppi[r0:r1].todense()) > 0
        all_parts.append(d.ravel())
        link_parts.append(d[mask])
        unlink_parts.append(d[~mask])
    np.save(os.path.join(out_dir, "diff.npy"), np.concatenate(all_parts))
    np.save(os.path.join(out_dir, "diff_link.npy"), np.concatenate(link_parts))
    np.save(os.path.join(out_dir, "diff_unlink.npy"),
            np.concatenate(unlink_parts))


def hist_data_from_diff(gse_dir: str) -> dict:
    """Rebuild ``hist_data.json`` from the saved diff artifacts — the
    vectorized twin of the reference's get_fig_data (figure.py:36-76):
    201 bin edges at -2 + 0.02·i, counts as ``[[i, count], ...]``."""
    hist_data = {}
    pcc_bin = [-2 + 0.02 * i for i in range(0, 201)]
    for fname, flag in (("diff.npy", "all"), ("diff_link.npy", "link"),
                        ("diff_unlink.npy", "unlink")):
        mat = np.load(os.path.join(gse_dir, fname)).flatten()
        idx = ((mat - (-2)) / 0.02).astype(np.int64)
        counts = np.bincount(idx, minlength=201)[:201]
        hist_data[flag] = [pcc_bin, [[i, int(c)] for i, c in enumerate(counts)]]
    out = os.path.join(gse_dir, "hist_data.json")
    with open(out, "w") as f:
        json.dump(hist_data, f)
    return hist_data


def plot_diff_histogram(bins, linked, unlinked, title, out_path):
    """Log-scale ΔPCC histograms (figure.py:79-106)."""
    centers = 0.5 * (bins[:-1] + bins[1:])
    plt.figure(dpi=300)
    plt.plot(centers, linked, label="linked")
    plt.plot(centers, unlinked, label="unlinked")
    plt.yscale("log")
    plt.xlabel("ΔPCC")
    plt.ylabel("pair count")
    plt.title(title)
    plt.legend(loc="best")
    plt.savefig(out_path)
    plt.close()


def subcellular_fig_data(loc_matrix_path: str) -> Dict[int, int]:
    """#annotations-per-protein counts (figure.py:109-123)."""
    loc = sp.load_npz(loc_matrix_path).toarray()
    counts = loc.sum(1).astype(int)
    return {k: int((counts == k).sum()) for k in range(0, counts.max() + 1)}


def organelle_distribution(pred: np.ndarray) -> np.ndarray:
    """Per-organelle share of predicted localizations."""
    num = pred.sum(0).astype(np.float64)
    return num / max(num.sum(), 1.0)


def _scrape_final_counts(lines: Sequence[str]) -> list:
    """The reference scraper's core (figure.py:147-171): from a txt_log.txt
    body (header stripped), collect each fold block's FINAL per-organelle
    prediction-count table row — the line right before every '-----'/'-----'
    double separator, plus the file's last line."""
    per_data = []
    for i in range(len(lines)):
        if i > (len(lines) - 3):
            d = lines[-1].strip().split(")")[0:-1]
            per_data.append(
                [p.split("%")[-1].strip().split("(")[-1] for p in d])
            break
        first, second, third = lines[i], lines[i + 1], lines[i + 2]
        if "-----" in second and "------" in third:
            d = first.strip().split(")")[0:-1]
            per_data.append(
                [p.split("%")[-1].strip().split("(")[-1] for p in d])
    return per_data


def final_pred_counts(log_dir: str, alpha: str) -> np.ndarray:
    """Per-(round, fold) final-epoch per-organelle prediction counts for one
    alpha — the quantity the reference's fig_alpha_data averages
    (figure.py:126-177).  Reads the engine's structured
    ``pred_num_final`` channel in fig_data_{round}.json; falls back to
    scraping txt_log.txt (the reference's mechanism) for runs that predate
    it.  Returns (n_runs, 12) float."""
    counts = []
    for fd in sorted(glob.glob(os.path.join(log_dir, "fig_data_*.json"))):
        with open(fd) as f:
            data = json.load(f)
        folds = data.get("validation", {}).get(str(alpha), {})
        for curves in folds.values():
            if "pred_num_final" in curves:
                counts.append(curves["pred_num_final"])
    if not counts:
        txt = os.path.join(log_dir, "txt_log.txt")
        if os.path.exists(txt):
            with open(txt) as f:
                lines = f.readlines()[3:]
            counts = _scrape_final_counts(lines)
    if not counts:
        return np.zeros((0, 12))
    return np.asarray(counts, np.float64)


def fig_alpha(
    log_dir: str,
    out_path: str,
    label_dist: np.ndarray,
    alphas: Sequence[str] = ("0.1",),
):
    """Per-organelle distribution bars + JS distance vs the label
    distribution — faithful to figure.py:179-235: per alpha, MEAN over all
    (round, fold) runs of the final-epoch prediction counts, truncated to
    int (figure.py:210 ``list(map(int, d_data))``), normalized to a
    distribution, then Jensen-Shannon distance against the annotation
    distribution ``loc.sum(0)/loc.sum()`` (figure.py:186-189)."""
    plt.figure(dpi=300)
    width = 0.8 / (len(alphas) + 1)
    x = np.arange(len(label_dist))
    plt.bar(x, label_dist, width, label="annotations")
    js = {}
    for ai, alpha in enumerate(alphas):
        per = final_pred_counts(log_dir, alpha)
        if per.size == 0:
            continue
        # reference pipeline: mean counts → int truncation → normalize
        d_data = np.array([int(v) for v in per.mean(axis=0)], np.float64)
        dist = d_data / max(d_data.sum(), 1.0)
        plt.bar(x + (ai + 1) * width, dist, width, label=f"alpha={alpha}")
        js[alpha] = float(jensenshannon(label_dist, dist))
    plt.xlabel("organelle")
    plt.ylabel("share")
    plt.legend(loc="best")
    plt.savefig(out_path)
    plt.close()
    return js if js else None


def fig_and_perf(fig_data_path: str, out_dir: str | None = None):
    """Metric-vs-epoch curves averaged over folds (utils.py:54-89)."""
    with open(fig_data_path) as f:
        fig_data = json.load(f)
    val_data = fig_data["validation"]
    first_alpha = next(iter(val_data))
    length = len(val_data[first_alpha]["1"]["aim"])
    f_num = len(val_data[first_alpha])
    f_data = {"AIM": {}, "COV": {}, "mlACC": {}}
    key_of = {"AIM": "aim", "COV": "cov", "mlACC": "acc"}
    for alpha in val_data:
        for label, k in key_of.items():
            acc = np.zeros(length)
            for fold in val_data[alpha].values():
                acc += np.array(fold[k])
            f_data[label][alpha] = acc / f_num
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        for item in f_data:
            plt.figure(dpi=300)
            for alpha, curve in f_data[item].items():
                plt.plot(range(length), curve, label=alpha)
            plt.legend(loc="best")
            plt.xlabel("epoch")
            plt.ylabel(item)
            plt.savefig(os.path.join(out_dir, f"{item}.png"))
            plt.close()
    return f_data


def fig_alpha_data_from_txt(log_root: str):
    """Compat port of the reference's txt-log scraper (figure.py:126-177):
    pulls the final per-organelle prediction-count table of each fold run
    back out of txt_log.txt and averages the counts.  Kept for byte-level
    workflow compatibility; the structured path above is preferred."""
    dicts = {}
    for paths in sorted(glob.glob(os.path.join(log_root, "GSE*"))):
        file_path = os.path.join(paths, "normal", "txt_log.txt")
        if not os.path.exists(file_path):
            continue
        with open(file_path) as f:
            content = f.readlines()
        per_data = _scrape_final_counts(content[3:])
        if per_data:
            arr = np.array(per_data).astype(float)
            dicts[os.path.basename(paths)] = arr.mean(axis=0).tolist()
    return dicts
