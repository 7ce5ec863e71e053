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


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
    lookback: int = 20,
    min_obs: int = 10,
    threshold: float = 2.5,
) -> DataFrame:
    """Per-key rolling z-score outliers: each value vs its own trailing
    window — the streaming-friendly anomaly-detection shape (bounded
    state, no global statistics).

    The frame is ROWS BETWEEN ``lookback`` PRECEDING AND 1 PRECEDING
    (strictly historical — the current point never contaminates its own
    baseline), ordered by (ts, tiebreak) so the frame row-set is unique.
    Mean/variance come from decimal-routed Σv and Σv² within the frame —
    exact and associative, so the z-score is bit-identical under any
    partitioning, and an SQL oracle using the same two sums reproduces it
    exactly (built-in ``stddev`` would not: engines disagree on the
    one-pass vs Welford formulation in the last ulps).

    NaN/±inf values are dropped before windowing (the engine's T3
    cleaning rule). Scale: one shuffle by key; per-row state is the
    O(lookback) frame. Returns rows with |z| > ``threshold`` and at least
    ``min_obs`` baseline points: (*input columns*, n_base, base_mean, z).
    """
    v = F.col(value_col)
    finite = df.filter(
        ~F.isnan(v) & ~v.isin(float("inf"), float("-inf"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-lookback, -1)
    )
    s1 = F.sum(v.cast("decimal(38,6)")).over(w).cast("double")
    s2 = F.sum((v * v).cast("decimal(38,6)")).over(w).cast("double")
    n = F.count(v).over(w)
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    scored = finite.select(
        "*",
        n.alias("n_base"),
        mean.alias("base_mean"),
        ((v - mean) / F.sqrt(var)).alias("z"),
    )
    return scored.filter(
        (F.col("n_base") >= min_obs) & (F.abs(F.col("z")) > threshold)
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    unit: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity period,
    counted in each later period they return.

    Output: (cohort_start, period_offset, n_active) — ``n_active`` at
    offset 0 is the cohort size. Two shuffles total: one by key for the
    first-activity min (window, reusing the key partitioning for the
    activity rows), one by (cohort, offset) for the distinct count.
    Integer-exact throughout — no float drift possible.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).cast("date")
    days = {"day": 1, "week": 7, "month": None}[unit]
    if days is None:
        raise ValueError("month offsets are not fixed-width; use day|week")
    active = df.select(
        F.col(key_col).alias("key"), bucket.alias("period")
    ).withColumn(
        "cohort_start", F.min("period").over(Window.partitionBy("key"))
    )
    return (
        active.select(
            "key",
            "cohort_start",
            (F.datediff("period", "cohort_start") / days)
            .cast("int")
            .alias("period_offset"),
        )
        .groupBy("cohort_start", "period_offset")
        .agg(F.countDistinct("key").alias("n_active"))
    )


def ohlc_rollup(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """Hypertable-style OHLC continuous aggregate: per (key, time bucket)
    emit open/high/low/close plus count and an exact sum.

    Open/close use the min/max of ``struct(ts, id, value)`` — struct
    comparison is lexicographic and ``id`` is unique, so first/last are
    total-ordered even under duplicate timestamps, and the whole rollup is
    ONE map-side-combinable aggregation: no window function, no second
    shuffle — the partial-aggregate shape a 100 TB continuous aggregate
    needs (each executor folds its slice to one struct per group before
    the exchange). Non-finite values are excluded up front (the ±inf/NaN
    discipline of ``transforms.clean_inf_null``); the sum routes through
    DECIMAL(38,6) so it is order-independent under any partitioning.
    """
    finite = df.filter(
        ~F.isnan(F.col(val_col)) & (F.abs(F.col(val_col)) != float("inf"))
    )
    probe = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("id"),
        F.col(val_col).alias("v"),
    )
    return (
        finite.groupBy(
            F.col(key_col),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.min(probe).getField("v").alias("open"),
            F.max(F.col(val_col)).alias("high"),
            F.min(F.col(val_col)).alias("low"),
            F.max(probe).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(val_col).cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
