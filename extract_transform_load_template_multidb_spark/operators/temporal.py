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

    All payload columns travel as ONE struct carried by a single
    ``last(ignorenulls)``: per-column carries would backfill a NULL in
    one payload column from a DIFFERENT (older) right row, producing a
    mixed-row match. The struct also carries the matched right
    timestamp, so the tolerance check and ``how='inner'`` key off the
    match itself rather than off any payload column's nullability.
    """
    r_struct = F.struct(
        *[F.col(c).alias(c) for c in payload_cols],
        F.col(right_ts).alias("__mt"),
    )
    struct_t = right.select(r_struct.alias("__r")).schema["__r"].dataType
    l_tag = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        "*",
        F.lit(None).cast(struct_t).alias("__r"),
    )
    r_tag = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
        r_struct.alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    )
    fresh = (
        F.lit(True)
        if tolerance_days is None
        else F.datediff(F.col("__t"), F.col("__m.__mt")) <= tolerance_days
    )
    kept = carried.filter(F.col("__is_left") == 1)
    if how == "inner":
        kept = kept.filter(F.col("__m").isNotNull() & fresh)
    return kept.select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(fresh, F.col("__m")[c]).alias(c)
            for c in payload_cols
        ],
    )


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
    ``right`` must be unique per (key, ts).

    As in :func:`asof_join`, the payload travels as ONE struct under a
    single ``last(ignorenulls)`` so a NULL in one payload column can
    never be backfilled from a different right row, and ``how='inner'``
    keys off the match struct itself."""
    r_struct = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    struct_t = right.select(r_struct.alias("__r")).schema["__r"].dataType
    l_tag = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        "*",
        F.lit(None).cast(struct_t).alias("__r"),
    )
    r_tag = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
        r_struct.alias("__r"),
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
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    )
    kept = carried.filter(F.col("__is_left") == 1)
    if how == "inner":
        kept = kept.filter(F.col("__m").isNotNull())
    return kept.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__m")[c].alias(c) for c in payload_cols],
    )
