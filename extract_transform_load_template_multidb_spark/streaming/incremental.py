"""Streaming incremental load: the reference's Method-2 pattern, continuous.

The reference reruns a daily batch that re-extracts a 30-day window and
delete-appends it into the target (reference ``Template-to-BigQuery/
Dynamics365-to-BigQuery-Method-2.py:86-91`` — the idempotent W7 variant).
On Spark this becomes a file-source stream with ``Trigger.AvailableNow``:
each run processes exactly the files that arrived since the last checkpoint
(no re-extract of the whole window), and the sink applies the same write
semantics per micro-batch via ``foreachBatch``.

Scale notes: the file source lists + checkpoints incrementally (no full
directory rescans with ``maxFilesPerTrigger``); ``foreachBatch`` upsert on
parquet rewrites matched files only in a real table format — at 100 TB the
sink becomes Delta/Iceberg MERGE, the plumbing here is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from extract_transform_load_template_multidb_spark.sinks.parquet_sink import (
    ParquetSink,
)


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental file-source stream over a landing directory.

    Streaming file sources require an explicit schema (no inference race
    with arriving files). ``max_files_per_trigger`` bounds micro-batch size
    so a backlog never produces one giant batch.
    """
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def streaming_dedup(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key stream: drop duplicate keys within the watermark.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes — bounded state, unlike a global ``dropDuplicates``
    whose state grows forever on an unbounded stream.
    """
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        # withWatermark requires session-zoned TIMESTAMP (UTC session ⇒
        # value-preserving cast); pyspark 4.x reads TIMESTAMP(NANOS) as NTZ.
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def run_available_now(
    stream_df: DataFrame,
    sink: ParquetSink,
    checkpoint_dir: str,
    mode: str = "append",
    keys: tuple[str, ...] = (),
    window_col: str | None = None,
) -> None:
    """Drain all currently-available input through ``foreachBatch`` into a
    :class:`ParquetSink`, then stop (``Trigger.AvailableNow``).

    ``mode`` picks the reference write semantic per micro-batch:
    ``append`` (W1/W5), ``upsert`` (W2, needs ``keys``), or
    ``window_overwrite`` (W7, needs ``window_col`` — replaces the batch's
    own min-of-column window, the idempotent refresh). Re-running after new
    files arrive processes only those files — the checkpoint carries source
    progress AND makes ``foreachBatch`` batch-ids replayable.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if mode == "append":
            sink.append(batch_df)
        elif mode == "upsert":
            sink.upsert(batch_df, keys, spark)
        elif mode == "window_overwrite":
            import pyspark.sql.functions as F

            lo = batch_df.agg(F.min(window_col)).collect()[0][0]
            if lo is not None:
                sink.window_overwrite(batch_df, window_col, lo, spark)
        else:
            raise ValueError(f"unknown mode {mode!r}")

    (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_to_memory(
    stream_df: DataFrame,
    table_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain a stream into an in-memory table (tests/debug only — the
    memory sink collects to the driver)."""
    (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_incremental_dedup(
    stream_df: DataFrame,
    corpus_df: DataFrame,
    sink: ParquetSink,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
) -> None:
    """Streaming ingest dedup: every micro-batch of arriving documents is
    checked against the existing corpus via the incremental MinHash path
    (:func:`operators.dedup.incremental_near_dups`) and the matched
    (delta_id, corpus_id, jaccard) pairs append to ``sink`` — the
    continuous form of batch-vs-corpus dedup, with source progress and
    batch replay carried by the checkpoint.

    At scale the corpus side's signatures/bands are precomputed (banding
    is per-doc and append-only), so each micro-batch costs
    O(|batch| + matches). A production variant would also fold accepted
    batch docs INTO the corpus band index per batch — elided here because
    parquet has no MERGE; the plumbing is identical with Delta/Iceberg.
    """
    from extract_transform_load_template_multidb_spark.operators.dedup import (
        incremental_near_dups,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        pairs = incremental_near_dups(
            corpus_df,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
        )
        sink.append(pairs)

    (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_mv_refresh(
    stream_df: DataFrame,
    sink: ParquetSink,
    checkpoint_dir: str,
    partial_agg,
    group_cols: tuple[str, ...],
) -> None:
    """Streaming materialized-view maintenance: each micro-batch is
    reduced to partial aggregates (``partial_agg``: batch DataFrame →
    mergeable partials keyed by ``group_cols``) and merged into the MV
    via :meth:`ParquetSink.merge_aggregate` — the continuous form of the
    reference's daily rollup reload, but the raw history is NEVER
    rescanned: per refresh the work is O(|micro-batch| + |MV|).

    With ``Trigger.AvailableNow`` + the checkpoint, re-running after new
    landing files arrive merges exactly the new files' partials once —
    restart-safe incremental view maintenance on plain parquet (swap in a
    MERGE-capable table format at scale, same plumbing).
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sink.merge_aggregate(
            partial_agg(batch_df), group_cols, batch_df.sparkSession
        )

    (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
