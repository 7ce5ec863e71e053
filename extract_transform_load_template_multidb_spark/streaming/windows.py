"""Time-window aggregations shared by batch and streaming plans.

Each builder takes any ``DataFrame`` — batch (``spark.read``) or streaming
(``spark.readStream``) — and returns the transformed frame; Catalyst plans
the same logical operators either way (stateful versions with watermark
eviction under streaming). This is the idiomatic Spark shape: one
declarative definition, two execution modes.

Scale notes: windowed aggregation shuffles once on (window, keys); with a
watermark the streaming state store holds only open windows. Sliding
windows multiply rows by window/slide before the shuffle — keep the ratio
small at 100 TB or pre-aggregate to the slide granularity first
(tumble at ``slide``, then roll up).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from extract_transform_load_template_multidb_spark.queries._util import dsum


def _value_safe(value_col: str) -> Column:
    """±inf/NaN → 0 so decimal-routed sums are defined (reference T3 rule)."""
    c = F.col(value_col)
    return F.when(
        F.isnan(c) | c.isin(float("inf"), float("-inf")), F.lit(0.0)
    ).otherwise(c)


def with_watermark(
    df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Attach an event-time watermark on streaming frames; no-op on batch.

    Late rows beyond ``delay`` are dropped and closed windows are evicted
    from the state store — the knob that bounds streaming state at scale.

    ``withWatermark`` requires a session-zoned TIMESTAMP event-time
    column; pyspark 4.x surfaces parquet TIMESTAMP(NANOS) as
    TIMESTAMP_NTZ, so cast first (UTC session ⇒ value-preserving).
    """
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts + exact sum per key.

    Output: (window_start, window_end, key, n_events, sum_value). Windows
    are epoch-aligned — identical to ``date_trunc`` bucketing for
    hour/minute widths, which is what the batch oracle exploits.
    """
    src = with_watermark(df, ts_col, watermark) if watermark else df
    w = F.window(F.col(ts_col), window)
    return (
        src.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(_value_safe(value_col), "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window event counts per key (each row lands in window/slide
    overlapping windows).

    Output: (window_start, window_end, key, n_events).
    """
    src = with_watermark(df, ts_col, watermark) if watermark else df
    w = F.window(F.col(ts_col), window, slide)
    return (
        src.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "n_events",
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Session-window aggregation: activity bursts per key separated by
    ``gap`` of silence.

    Output: (key, session_start, session_end, n_events) where
    ``session_end = last event + gap`` (Spark ``session_window`` semantics;
    the batch oracle reproduces it with gaps-and-islands SQL). Dynamic
    merging of adjacent sessions is handled by the operator — under
    streaming this is stateful with watermark-driven finalization.
    """
    src = with_watermark(df, ts_col, watermark) if watermark else df
    w = F.session_window(F.col(ts_col), gap)
    return (
        src.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def tumbling_distinct_users(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window exact distinct-user counts, streaming-safe.

    COUNT(DISTINCT) is not allowed in streaming aggregations, so the
    standard rewrite applies in BOTH modes: dedupe (user, window) pairs
    first — in streaming via watermarked ``dropDuplicates`` with
    bounded state, in batch the identical plan — then count per window.
    Output: (window_start, window_end, n_users). At extreme cardinality
    swap the dedupe for ``approx_count_distinct`` and accept the error
    bound; the window shape is unchanged.
    """
    src = with_watermark(df, ts_col, watermark) if watermark else df
    w = F.window(F.col(ts_col), window)
    deduped = src.select(
        F.col(ts_col), F.col(user_col), w.alias("w")
    ).dropDuplicates([user_col, "w"])
    return (
        deduped.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_users",
        )
    )
