"""GEO series-matrix ingestion (Python port of code/data_reader.R).

The reference's R stage (/root/reference/code/data_reader.R) reads the GEO
series-matrix TXT (tab-separated, ``!`` comment lines), maps probe ids to
UniProt accessions via Bioconductor annotation DBs (illuminaHumanv4.db for
GSE30931, hgu133plus2.db for GSE27182/GSE74572), inner-joins, and writes
``GSE*_exprSet.csv`` with a leading ``uniprot_id`` column.

The Bioconductor databases are not redistributable here, so the probe→uniprot
table is supplied as a two-column CSV (``probe_id,uniprot_id`` — the exact
``toTable(<db>UNIPROT)`` export; run ``scripts/export_probe_map.R`` once on
any machine with Bioconductor to produce the tables for all three platforms).
Everything else matches the R semantics:
probes with multiple accessions produce one row per accession (inner join),
probes without a mapping are dropped, column order is uniprot_id first.
"""
from __future__ import annotations

import csv
import pandas as pd


def read_series_matrix(path: str) -> pd.DataFrame:
    """Parse the series-matrix table (R: read.table(sep='\\t',
    comment.char='!', header=T)); first column is the probe id."""
    rows = []
    header = None
    with open(path) as f:
        for line in f:
            if line.startswith("!") or not line.strip():
                continue
            parts = [p.strip().strip('"') for p in line.rstrip("\n").split("\t")]
            if header is None:
                header = parts
            else:
                rows.append(parts)
    df = pd.DataFrame(rows, columns=header)
    df = df.rename(columns={header[0]: "probe_id"})
    for c in df.columns[1:]:
        df[c] = pd.to_numeric(df[c], errors="coerce")
    return df


def load_probe_map(path: str) -> pd.DataFrame:
    """probe_id → uniprot_id table (export of toTable(<db>UNIPROT))."""
    m = pd.read_csv(path, dtype=str)
    cols = {c.lower(): c for c in m.columns}
    return pd.DataFrame({
        "probe_id": m[cols["probe_id"]].astype(str),
        "uniprot_id": m[cols["uniprot_id"]].astype(str),
    })


def build_expr_set(series_matrix_path: str, probe_map_path: str) -> pd.DataFrame:
    """Inner-join probes to accessions; uniprot_id leading column
    (data_reader.R:16-19)."""
    expr = read_series_matrix(series_matrix_path)
    expr["probe_id"] = expr["probe_id"].astype(str)
    ids = load_probe_map(probe_map_path)
    joined = expr.merge(ids, on="probe_id", how="inner")
    cols = ["uniprot_id"] + [
        c for c in joined.columns if c not in ("uniprot_id", "probe_id")
    ]
    return joined[cols]


def write_expr_set(
    series_matrix_path: str, probe_map_path: str, out_csv: str
) -> None:
    """R's write.csv emits a leading unnamed row-index column; keep it so the
    downstream pandas read (data_preprocess.py:139) sees the same layout."""
    df = build_expr_set(series_matrix_path, probe_map_path)
    df.insert(0, "", range(1, len(df) + 1))
    df.to_csv(out_csv, index=False, quoting=csv.QUOTE_MINIMAL)
