"""Temporal join operators: as-of and range joins.

Spark has no built-in AS-OF join (DuckDB/Pandas do); the scalable
composition is the *union + carry-forward* pattern rather than an
inequality join:

1. tag right rows (quotes) and left rows (probes), union them,
2. one shuffle: window partitioned by key, ordered by (time, side) with
   right rows first at equal timestamps,
3. ``last(value, ignoreNulls)`` carries the latest right payload forward,
4. keep left rows.

Cost is one shuffle of |L|+|R| rows — versus an inequality join whose
equi-prefix degenerates to per-key cross products. This is the plan you
want at 100 TB: no skew beyond what the key distribution already has, and
AQE handles stragglers. A range join stays an equi-join on the key with
the range as a post-join filter (Catalyst pushes it into the join when the
band is literal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...],
    how: str = "left",
    tolerance_days: int | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_ts <= left_ts`` on the same key (ties on timestamp: the right
    row is visible to a left row at the exact same instant).

    ``right`` must be unique per (key, ts) — pre-aggregate it otherwise;
    ambiguity there would make the result nondeterministic.

    ``tolerance_days`` bounds the match age (market-data / feature-store
    semantics: a quote or feature older than the bound is stale, not a
    match): payloads whose matched right row is more than that many days
    before the left timestamp are nulled — same single shuffle, the bound
    is a post-carry row-local predicate.
    """
    l_tag = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        "*",
        *[F.lit(None).alias(f"__r_{c}") for c in payload_cols],
    )
    r_tag = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in payload_cols
        ],
        F.last(
            F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True
        ).over(w).alias("__m_ts"),
    )
    fresh = (
        F.lit(True)
        if tolerance_days is None
        else F.datediff(F.col("__t"), F.col("__m_ts")) <= tolerance_days
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(fresh, F.col(f"__m_{c}")).alias(c)
            for c in payload_cols
        ],
    )
    if how == "inner":
        out = out.na.drop(subset=[payload_cols[0]])
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    right_ts: str,
    lo_ts: str,
    hi_ts: str,
    group_cols: tuple[str, ...],
) -> DataFrame:
    """Count right rows whose ``right_ts`` falls in the left row's
    ``[lo_ts, hi_ts)`` interval, grouped by ``group_cols`` of the left.

    Equi-join on the key carries the band as a join-side filter; left rows
    with no match keep count 0 (left join + count of non-null).
    """
    cond = (
        (left[left_key] == right[right_key])
        & (right[right_ts] >= left[lo_ts])
        & (right[right_ts] < left[hi_ts])
    )
    return (
        left.join(right, cond, "left")
        .groupBy(*[left[c] for c in group_cols])
        .agg(F.count(right[right_ts]).alias("n_in_range"))
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...],
    how: str = "left",
) -> DataFrame:
    """Forward as-of: for each left row, attach the payload of the
    EARLIEST right row with ``right_ts >= left_ts`` on the same key
    (ties at the exact instant match) — the scheduling-direction
    counterpart of :func:`asof_join` ('what is the NEXT maintenance
    window / shipment / renewal after this event'). Same single-shuffle
    union+carry construction, with the scan order reversed: the window
    runs down descending timestamps, so ``last(ignorenulls)`` carries
    each right payload BACKWARD onto the left rows that precede it.
    ``right`` must be unique per (key, ts)."""
    l_tag = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        "*",
        *[F.lit(None).alias(f"__r_{c}") for c in payload_cols],
    )
    r_tag = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
    )
    # Descending time; at an equal instant the right row (0) sorts first
    # so it is already visible to the left row via the running frame.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").desc(), "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in payload_cols
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__m_{c}").alias(c) for c in payload_cols],
    )
    if how == "inner":
        out = out.na.drop(subset=[payload_cols[0]])
    return out
