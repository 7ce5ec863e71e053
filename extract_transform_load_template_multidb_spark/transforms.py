"""Scalar/row transforms from the reference's extract step (SURVEY.md §2.2).

All are pure DataFrame expressions — JVM-side, whole-stage-codegen'd, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DoubleType, FloatType

_INF = float("inf")


def clean_infinities(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """±inf → NULL on float/double columns (reference T3).

    Mirrors ``df.replace([inf, -inf], None)`` run on every RDBMS/BigQuery
    extract in the reference (e.g. ``Template-to-MySQL/
    BigQuery-to-MySQL-Method-1.py:58``). NaN is deliberately preserved —
    pandas ``replace`` only hits ±inf, and we keep that semantic exactly.
    """
    if cols is None:
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (DoubleType, FloatType))
        ]
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.when(F.col(c).isin(_INF, -_INF), F.lit(None)).otherwise(F.col(c))
        )
    return out


def drop_meta_columns(
    df: DataFrame, cols: tuple[str, ...] = ("@odata.etag",)
) -> DataFrame:
    """Strip protocol metadata columns (reference T2).

    Mirrors ``df.drop(columns=['@odata.etag'], errors='ignore')``
    (``Template-to-MySQL/Dynamics365-to-MySQL-Method-1.py:78``); Spark's
    ``drop`` already ignores missing columns.
    """
    return df.drop(*cols)


def window_cutoff(df: DataFrame, col: str, days: int = 30) -> Column:
    """Scalar cutoff = max(col) − ``days`` days, as a broadcastable 1-row plan.

    The reference anchors its rolling window at wall-clock "now" (four SQL
    dialect spellings of now−30d, e.g. ``Template-to-MySQL/
    BigQuery-to-MySQL-Method-2.py:58``); tests need determinism, so the
    anchor is injectable and defaults to ``max(col)`` over the data.
    """
    return F.max(F.col(col)) - F.expr(f"INTERVAL {int(days)} DAY")


def window_filter(
    df: DataFrame,
    col: str,
    days: int = 30,
    anchor=None,
) -> DataFrame:
    """Keep rows with ``col >= anchor − days`` (reference T4 / Method-2).

    With ``anchor=None`` the cutoff is computed from the data itself via a
    single-row aggregate broadcast-joined against the fact table — no
    driver-side collect, scales to any table size.
    """
    if anchor is not None:
        cutoff = F.lit(anchor) - F.expr(f"INTERVAL {int(days)} DAY")
        return df.filter(F.col(col) >= cutoff)
    cut = df.agg(window_cutoff(df, col, days).alias("__cutoff"))
    return (
        df.join(F.broadcast(cut), F.col(col) >= F.col("__cutoff"), "inner")
        .drop("__cutoff")
    )
