"""Stream-stream and stream-static joins, batch/stream from one builder.

Stream-stream joins are the Structured Streaming feature the windowed
aggregations can't substitute: correlating two unbounded inputs (e.g.
orders with the events that follow them). Correctness requires BOTH a key
equality and a bounded time interval — without the interval, join state
grows forever; with it, each side's watermark lets Spark evict rows whose
match window has passed.

Built against plain DataFrames: in batch mode the same builder is a
normal equi-join with a range filter (oracle-checked by the driver); in
stream mode (``tests/test_streaming.py``) watermarks attach and state is
bounded by ``interval + watermark`` per key.

Scale notes: both sides shuffle on the join key once; state size ≈ input
rate × (interval + watermark). The stream-static enrich broadcasts the
static side per micro-batch — dimension lookups never shuffle the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from extract_transform_load_template_multidb_spark.streaming.windows import (
    with_watermark,
)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "3 days",
    watermark: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join right rows to left rows of the same key with
    ``left_ts ≤ right_ts < left_ts + interval``.

    In stream mode both inputs carry event-time watermarks, making this a
    legal append-mode stream-stream join whose state Spark can evict; in
    batch mode the watermarks are no-ops and Catalyst plans a plain
    equi-join with the range as a post-join filter.

    ``how`` extends the inner form to ``left_outer``/``right_outer``/
    ``full_outer`` — the streaming semantics Spark documents: matched
    rows emit as usual, and an unmatched row emits null-padded only once
    the watermark passes its join window (so outer results trail the
    inner ones by interval + watermark; in batch mode they appear
    immediately). The interval bound is what makes outer emission
    decidable at all — without it an unmatched row could match forever.
    """
    lw = with_watermark(left, left_ts, watermark)
    rw = with_watermark(right, right_ts, watermark)
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] < lw[left_ts] + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond, how)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension (broadcast per micro-batch).

    The static side is re-resolved each micro-batch (so a refreshed
    dimension table is picked up) and broadcast — the stream itself never
    shuffles for the lookup.
    """
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], how
    )
