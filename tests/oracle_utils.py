"""Local re-implementation of the driver's oracle comparison.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, then compares row count + column names + order-insensitive
values (columns sorted by name, rows sorted, approximate float
equality). This is the same gate the driver applies at sf0.01, so a
green test here predicts a green CORRECTNESS_r{N}.json entry.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def compare_query(spark, sf_dir: str, spark_fn, oracle: str, limit_mismatch_report: int = 5):
    sdf = spark_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        rel = con.sql(oracle)
        d_cols = list(rel.columns)
        d_rows = [tuple(r) for r in rel.fetchall()]
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), f"columns differ: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"

    _, s_norm = _normalize_rows(s_cols, s_rows)
    _, d_norm = _normalize_rows(d_cols, d_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, (
        f"{len(mismatches)} row mismatches; first {limit_mismatch_report}: "
        f"{mismatches[:limit_mismatch_report]}"
    )
