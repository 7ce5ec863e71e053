"""Time-series resampling — the hypertable-rollup-style operator family.

Event streams are irregular; training/analytics consumers want regular
grids. :func:`resample_carry_forward` produces a dense per-key time spine
at a fixed step with observed aggregates and last-observation-carried-
forward gap fill — the continuous-aggregate + ``locf`` shape of
time-series stores, expressed as three Spark built-ins:

1. per-key min/max bucket → ``sequence()`` + ``explode`` generates the
   spine WITHOUT a driver loop or a cross join (spine size = key's own
   span, never global);
2. observed buckets aggregate once (partial agg before the shuffle);
3. a left join puts observations on the spine, and
   ``last(..., ignorenulls=True)`` over an unbounded-preceding window
   carries values forward.

Scale notes: everything shuffles by key (spine join and fill window are
co-partitioned — Catalyst reuses the exchange); the spine explode is the
output size, irreducible. Keys with pathological spans bound their own
spine only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_carry_forward(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Dense per-key grid at ``step`` with counts and gap-filled values.

    Output: (key, bucket_start, n_events, sum_value, filled_value) —
    ``n_events``/``sum_value`` are 0/NULL on empty buckets;
    ``filled_value`` carries the most recent non-empty bucket's sum
    forward (NULL until the first observation). NaN/±inf in the value are
    excluded from sums (the engine's T3 cleaning rule).

    ``step`` must be ``"<n> <unit>"`` with n=1 and a date_trunc-able unit
    (minute/hour/day/week) so observation bucketing and the spine stride
    agree; mismatched pairs would silently drop observations off-grid.
    """
    parts = step.strip().split()
    unit = parts[-1].rstrip("s")
    if len(parts) != 2 or parts[0] != "1" or unit not in (
        "minute", "hour", "day", "week",
    ):
        raise ValueError(
            f"step {step!r} unsupported: use '1 minute'|'1 hour'|'1 day'|"
            "'1 week' (bucketing truncates to the same unit the spine "
            "strides by)"
        )
    bucket = F.date_trunc(unit, F.col(ts_col))
    safe = F.when(
        F.isnan(value_col)
        | F.col(value_col).isin(float("inf"), float("-inf")),
        None,
    ).otherwise(F.col(value_col))
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            bucket.alias("bucket_start"),
            safe.alias("__v"),
        )
        .groupBy("key", "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("__v").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    spans = obs.groupBy("key").agg(
        F.min("bucket_start").alias("__lo"), F.max("bucket_start").alias("__hi")
    )
    spine = spans.select(
        "key",
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
        ).alias("bucket_start"),
    )
    joined = spine.join(obs, ["key", "bucket_start"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("key"),
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
    )
