"""Data-pipeline tests: ECC / PCC / topology / BioGRID / UniProt / GEO parity
against dense-numpy oracles and the reference's own algorithms."""
import gzip
import os

import numpy as np
import pytest
import scipy.sparse as sp

from plagnn_tpu.data import powerlaw_ppi
from plagnn_tpu.data.biogrid import (
    construct_uniprot_ppi,
    extract_interaction_data,
)
from plagnn_tpu.data.ecc import (
    edge_clustering_coefficients,
    edge_clustering_coefficients_dense_reference,
)
from plagnn_tpu.data.expression import (
    pcc_at_edges,
    pcc_dense,
    pcc_factors,
)
from plagnn_tpu.data.topology import (
    _modify_dense,
    diff_stats,
    modify_network_topology,
)


@pytest.fixture
def small_ppi(rng):
    return powerlaw_ppi(120, 800, seed=3)


def test_ecc_matches_reference_loop(small_ppi):
    fast = edge_clustering_coefficients(small_ppi).tocsr()
    ref = edge_clustering_coefficients_dense_reference(small_ppi).tocsr()
    assert (fast != ref).nnz == 0 or np.allclose(
        fast.toarray(), ref.toarray(), atol=1e-12
    )


def test_ecc_native_matches_scipy(small_ppi):
    from plagnn_tpu.data import native_ext

    if not native_ext.available():
        pytest.skip("native library unavailable")
    a = small_ppi.tocsr().astype(np.float64)
    coo = sp.triu(a, k=1).tocoo()
    tri_native = native_ext.common_neighbors(a, coo.row, coo.col)
    a2 = (a @ a).tocsr()
    tri_scipy = np.asarray(a2[coo.row, coo.col]).ravel()
    np.testing.assert_allclose(tri_native, tri_scipy)


def test_pcc_factors_match_dense(rng):
    expr = rng.gamma(2.0, 2.0, size=(60, 3))
    expr[5] = 0.0  # zero-variance row → NaN row in corrcoef
    expr[17] = 3.14  # constant row → zero variance too
    z = pcc_factors(expr)
    dense = pcc_dense(expr)
    rebuilt = z @ z.T
    np.fill_diagonal(rebuilt, 0)
    np.testing.assert_allclose(rebuilt, dense, atol=1e-12)


def test_diff_stats_match_dense(rng):
    e1 = rng.gamma(2.0, 2.0, size=(80, 3))
    e2 = rng.gamma(2.0, 2.0, size=(80, 3))
    e1[7] = 0
    z1, z2 = pcc_factors(e1), pcc_factors(e2)
    mean, std = diff_stats(z2, z1)
    diff = pcc_dense(e2) - pcc_dense(e1)
    np.testing.assert_allclose(mean, diff.mean(), atol=1e-12)
    np.testing.assert_allclose(std, diff.std(), atol=1e-12)


def test_topology_modification_matches_dense(rng, small_ppi):
    n = small_ppi.shape[0]
    e1 = rng.gamma(2.0, 2.0, size=(n, 3))
    e2 = e1 + rng.normal(0, 0.7, size=(n, 3))
    z1, z2 = pcc_factors(e1), pcc_factors(e2)
    lean = modify_network_topology(small_ppi, z1, z2, 1.5, block_rows=17)
    dense = _modify_dense(small_ppi.tocsr().astype(np.int8),
                          pcc_dense(e1), pcc_dense(e2), 1.5)
    la = lean.toarray()
    da = dense.toarray()
    np.testing.assert_array_equal(la, da)


def test_pcc_at_edges(rng):
    expr = rng.gamma(2.0, 2.0, size=(30, 3))
    z = pcc_factors(expr)
    dense = pcc_dense(expr)
    rows = np.array([0, 3, 7, 12])
    cols = np.array([5, 2, 9, 1])
    np.testing.assert_allclose(
        pcc_at_edges(z, rows, cols), dense[rows, cols], atol=1e-12
    )


MITAB_HEADER = "#ID A\tID B\talt A\talt B\tc4\tc5\tc6\tc7\tc8\tc9\tc10\ttype\n"


def _mitab_line(a, b, mi="psi-mi:MI:0915(physical association)"):
    alt_a = f"biogrid:1|uniprot/swiss-prot:{a}|refseq:x"
    alt_b = f"biogrid:2|uniprot/swiss-prot:{b}|refseq:y"
    return "\t".join(["x", "y", alt_a, alt_b] + ["-"] * 7 + [mi]) + "\n"


def test_biogrid_extraction(tmp_path):
    path = tmp_path / "mitab.txt"
    with open(path, "w") as f:
        f.write(MITAB_HEADER)
        f.write(_mitab_line("P11111", "P22222"))
        f.write(_mitab_line("P22222", "P33333", "psi-mi:MI:0403(colocalization)"))
        f.write(_mitab_line("P44444", "P55555", "psi-mi:MI:0999(other)"))  # dropped
        f.write(_mitab_line("P11111", "P11111"))  # self edge dropped
    d = extract_interaction_data(str(path))
    assert d["id_list"] == ["P11111", "P22222", "P33333"]
    ppi = construct_uniprot_ppi(d["id_list"], d["interaction_list"])
    a = ppi.toarray()
    expected = np.zeros((3, 3))
    expected[0, 1] = expected[1, 0] = 1
    expected[1, 2] = expected[2, 1] = 1
    np.testing.assert_array_equal(a, expected)


def test_uniprot_extraction(tmp_path):
    from plagnn_tpu.data.uniprot import (
        construct_protein_loc_matrix,
        extract_localization_data,
    )

    cc_path = tmp_path / "cellular_component.txt"
    with open(cc_path, "w") as f:
        f.write("GO:0005829\nGO:0005634\n")
    dat = (
        "ID   A_HUMAN\nAC   P11111;\n"
        "DR   GO; GO:0005829; C:cytosol; IDA:HPA.\n"
        "DR   GO; GO:0005634; C:nucleus; TAS:HPA.\n"  # TAS evidence → dropped
        "//\n"
        "ID   B_HUMAN\nAC   P22222; Q99999;\n"
        "DR   GO; GO:0005634; C:nucleus; IEA:Ensembl.\n"
        "DR   GO; GO:0001234; C:weird; IDA:HPA.\n"  # not in CC list → dropped
        "//\n"
        "ID   C_HUMAN\nAC   P33333;\n"
        "CC   no go lines\n"
        "//\n"
    )
    dat_path = tmp_path / "u.dat.gz"
    with gzip.open(dat_path, "wt") as f:
        f.write(dat)
    label_list = extract_localization_data(
        str(dat_path), str(cc_path), ["P11111", "P22222", "P33333"]
    )
    assert label_list == [
        ("P11111", ["GO:0005829"]),
        ("P22222", ["GO:0005634"]),
        ("P33333", []),
    ]
    loc = construct_protein_loc_matrix(label_list, str(cc_path)).toarray()
    np.testing.assert_array_equal(loc, [[1, 0], [0, 1], [0, 0]])


def test_geo_reader(tmp_path):
    from plagnn_tpu.data.geo import build_expr_set

    sm = tmp_path / "series_matrix.txt"
    with open(sm, "w") as f:
        f.write("!Series_title\t\"x\"\n")
        f.write('"ID_REF"\t"GSM1"\t"GSM2"\n')
        f.write('"probe1"\t1.5\t2.5\n')
        f.write('"probe2"\t3.0\t4.0\n')
        f.write('"probe3"\t9.0\t9.9\n')
    pm = tmp_path / "probe_map.csv"
    with open(pm, "w") as f:
        f.write("probe_id,uniprot_id\nprobe1,P11111\nprobe2,P22222\nprobe2,P99999\n")
    df = build_expr_set(str(sm), str(pm))
    assert list(df.columns) == ["uniprot_id", "GSM1", "GSM2"]
    # probe2 maps to two accessions (inner join duplicates), probe3 dropped
    assert sorted(df["uniprot_id"]) == ["P11111", "P22222", "P99999"]
    assert float(df[df.uniprot_id == "P22222"]["GSM1"].iloc[0]) == 3.0


def test_geo_to_expression_e2e(tmp_path):
    """L0→L1 end to end: a miniature GEO series-matrix + probe-map CSV (the
    scripts/export_probe_map.R contract) through `plagnn geo` (write_expr_set,
    R write.csv layout with the unnamed index column) into the expression
    alignment stage — multi-probe genes mean-aggregate, unmapped probes drop,
    off-PPI proteins drop, missing proteins zero-fill."""
    from plagnn_tpu.data.expression import align_expression
    from plagnn_tpu.data.geo import write_expr_set

    sm = tmp_path / "GSEmini_series_matrix.txt"
    with open(sm, "w") as f:
        f.write('!Series_title\t"mini"\n!Series_platform_id\t"GPLx"\n')
        f.write('"ID_REF"\t"GSM1"\t"GSM2"\t"GSM3"\n')
        f.write('"ILMN_1"\t1.0\t2.0\t3.0\n')
        f.write('"ILMN_2"\t5.0\t5.0\t5.0\n')   # second probe of P11111
        f.write('"ILMN_3"\t7.0\t8.0\t9.0\n')   # maps to P22222
        f.write('"ILMN_4"\t1.0\t1.0\t1.0\n')   # unmapped -> dropped
        f.write('"ILMN_5"\t4.0\t4.0\t4.0\n')   # maps off-PPI -> dropped later
    pm = tmp_path / "probe_map.csv"
    with open(pm, "w") as f:
        f.write("probe_id,uniprot_id\n")
        f.write("ILMN_1,P11111\nILMN_2,P11111\nILMN_3,P22222\nILMN_5,P99999\n")

    out_csv = tmp_path / "GSEmini_exprSet.csv"
    write_expr_set(str(sm), str(pm), str(out_csv))

    # R write.csv layout: leading unnamed index column, uniprot_id first
    with open(out_csv) as f:
        header = f.readline().strip().split(",")
    assert header[1] == "uniprot_id" and header[2:] == ["GSM1", "GSM2", "GSM3"]

    protein_list = ["P11111", "P22222", "P33333"]  # PPI universe
    expr = align_expression(str(out_csv), ["GSM1", "GSM2", "GSM3"], protein_list)
    np.testing.assert_allclose(expr[0], [3.0, 3.5, 4.0])  # mean of 2 probes
    np.testing.assert_allclose(expr[1], [7.0, 8.0, 9.0])
    np.testing.assert_allclose(expr[2], [0.0, 0.0, 0.0])  # zero-fill
