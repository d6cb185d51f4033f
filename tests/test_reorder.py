"""Graph reordering / DMA-coalescing diagnostics (ops/reorder.py).

These pin the HOST-side analysis behind BASELINE.md's lever-3 verdict: the
fraction of G=8-edge kernel groups whose source ids become strictly
consecutive (the single-wide-DMA condition) under identity / RCM / greedy
orderings, on both the configuration-model and community-structured
topologies.
"""
import numpy as np

from plagnn_tpu.data.synthetic import clustered_ppi, powerlaw_ppi
from plagnn_tpu.ops.reorder import (
    coalesce_report, greedy_coalesce_order, group_runs, rcm_order,
    relabel_edges,
)


def test_relabel_roundtrip():
    rng = np.random.default_rng(0)
    n = 64
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    perm = rng.permutation(n)
    s2, d2 = relabel_edges(src, dst, perm)
    # relabeling preserves the multigraph up to id renaming
    s3, d3 = relabel_edges(s2, d2, np.argsort(perm))
    np.testing.assert_array_equal(np.sort(s3), np.sort(src))
    # edge endpoints stay paired
    orig = {(a, b) for a, b in zip(src, dst)}
    back = {(a, b) for a, b in zip(s3, d3)}
    assert orig == back


def test_group_runs_hand_case():
    # row 0: sources 4,5,6,7,8,9,10,11 -> one fully consecutive group
    # row 1: sources 0,2,4,6,8,10,12,14 -> not consecutive
    # row 2: sources 1,2,3 (padded to 8 with dummies) -> not consecutive
    src = np.array(list(range(4, 12)) + list(range(0, 16, 2)) + [1, 2, 3])
    dst = np.array([0] * 8 + [1] * 8 + [2] * 3)
    c, n = group_runs(src, dst)
    assert (c, n) == (1, 3)


def test_orderings_are_permutations():
    ppi = powerlaw_ppi(512, 4096, seed=3)
    for fn in (rcm_order, greedy_coalesce_order):
        p = fn(ppi.row.astype(np.int64), ppi.col.astype(np.int64), 512)
        assert sorted(p) == list(range(512))


def test_greedy_beats_identity_on_clustered():
    """Community structure is recoverable: greedy/RCM must lift the
    coalescible fraction above the shuffled identity, and the absolute
    numbers must stay small enough to justify the lever-3 dead-end verdict
    (full-8 runs need 8 successive complex members all present; p_in<1
    makes that geometrically rare)."""
    ppi = clustered_ppi(2048, 40_000, seed=5)
    rep = coalesce_report(
        ppi.row.astype(np.int64), ppi.col.astype(np.int64), 2048)
    assert rep["greedy"]["fwd"] > rep["identity"]["fwd"]
    assert rep["rcm"]["fwd"] > rep["identity"]["fwd"]
    # the measured dead end: nothing close to a meaningful fraction
    assert max(rep["greedy"]["fwd"], rep["rcm"]["fwd"]) < 0.25


def test_clustered_ppi_shape_contract():
    ppi = clustered_ppi(1024, 20_000, seed=9)
    a = ppi.toarray()
    assert (a == a.T).all() and np.trace(a) == 0
    assert a.max() == 1
    deg = a.sum(1)
    assert deg.max() > 4 * deg.mean()  # hubs exist (complex cores)


def test_coalesce_report_bench_scale():
    ppi = powerlaw_ppi(24041, 700_000, seed=70)
    rep = coalesce_report(
        ppi.row.astype(np.int64), ppi.col.astype(np.int64), 24041)
    assert rep["greedy"]["fwd"] < 0.05  # the documented dead end
