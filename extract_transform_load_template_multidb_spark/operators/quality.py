"""Data-quality profiling operators — the validation layer an ETL engine
owes its loads (the reference's only check is the record-count email,
``Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:86``).

All checks are single-pass aggregates or narrow joins:

- :func:`null_profile` — per-column null / NaN / ±inf counts in ONE scan
  (one aggregate with 3×|cols| expressions, then unpivoted to long form —
  never one job per column).
- :func:`fk_violation_count` — orphaned foreign keys via left-anti join.
- :func:`dup_key_count` — primary-key duplicate groups via one groupBy.

Each returns a small summary frame — at 100 TB the scan is the cost and
everything here is map-side expressible with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def null_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-form per-column quality counts: (column, n_null, n_nan, n_inf).

    NaN/±inf apply to floating columns only (0 elsewhere). One aggregate
    row is computed and exploded into |cols| rows driver-side-free via
    ``stack``.
    """
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}")
        )
        if dtypes[c] in ("double", "float"):
            aggs.append(
                F.count(F.when(F.isnan(c), 1)).alias(f"__nan_{c}")
            )
            aggs.append(
                F.count(
                    F.when(
                        F.col(c).isin(float("inf"), float("-inf")), 1
                    )
                ).alias(f"__inf_{c}")
            )
        else:
            aggs.append(F.lit(0).cast("long").alias(f"__nan_{c}"))
            aggs.append(F.lit(0).cast("long").alias(f"__inf_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __nan_{c}, __inf_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column, n_null, n_nan, n_inf)"
        )
    )


def fk_violation_count(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """(n_orphans,): child rows whose key has no parent — referential
    integrity as a left-anti join (NULL child keys count as orphans of
    none: they are excluded, being a null-check concern)."""
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)),
        child_key,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))


def dup_key_count(df: DataFrame, keys: list[str]) -> DataFrame:
    """(n_dup_groups, n_extra_rows): duplicate primary-key groups and how
    many rows deleting duplicates would remove."""
    groups = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    dups = groups.filter(F.col("__n") > 1)
    return dups.agg(
        F.count(F.lit(1)).alias("n_dup_groups"),
        F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n_extra_rows"),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: tuple[str, ...],
    compare_cols: tuple[str, ...],
) -> DataFrame:
    """Snapshot reconciliation: classify every key as ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` between two table versions —
    the check a migration or a rewritten pipeline runs before cutover.

    Output: one row per classification with its row count (stable 4-row
    summary; drill-down is the same join un-aggregated). One full outer
    join on the keys — a single co-partitioned shuffle of both sides; the
    value comparison is null-safe (``<=>``) so NULL→value transitions
    count as changes, not matches.
    """
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    joined = o.join(n, list(keys), "full_outer")
    same_vals = None
    for c in compare_cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same_vals = eq if same_vals is None else (same_vals & eq)
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same_vals, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
