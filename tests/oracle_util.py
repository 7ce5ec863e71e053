"""Local differential harness mirroring the driver's DuckDB-oracle check.

Stricter than the driver: rows are compared value-by-value with exact
equality — floats included, since every registered query keeps its double
math order-independent (DECIMAL-routed sums, fixed-order expressions) — so
any engine divergence is caught here before the driver sees it.
"""

from __future__ import annotations

import math
from datetime import datetime, date
from decimal import Decimal

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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert spark result == duckdb result (order-insensitive, col-sorted)."""
    cols = sorted(spark_df.columns)
    spark_rows = [
        tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()
    ]
    duck_res = con.execute(sql)
    duck_cols = [d[0] for d in duck_res.description]
    assert sorted(duck_cols) == cols, (
        f"column mismatch: spark={cols} duck={sorted(duck_cols)}"
    )
    idx = [duck_cols.index(c) for c in cols]
    duck_rows = [
        tuple(_norm(row[i]) for i in idx) for row in duck_res.fetchall()
    ]
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_sorted = sorted(spark_rows, key=lambda r: str(r))
    d_sorted = sorted(duck_rows, key=lambda r: str(r))
    mismatches = [
        (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
    ]
    assert not mismatches, (
        f"{len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
