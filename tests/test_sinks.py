"""Run-twice idempotency matrix for the four write semantics (SURVEY §2.3).

The reference's Method-2 (retention delete + blind append) is NOT idempotent
— re-running duplicates the recent window — while W7 (window overwrite) is.
These tests pin both behaviors exactly.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row, functions as F

from extract_transform_load_template_multidb_spark.sinks import ParquetSink

CUTOFF = dt.datetime(2024, 3, 1)


def _day(d: int) -> dt.datetime:
    return dt.datetime(2024, 2, 1) + dt.timedelta(days=d)


@pytest.fixture()
def history(spark):
    """Target seeded with 10 old rows (before cutoff) + 5 recent."""
    rows = [
        Row(id=i, date_trans=_day(i), v=float(i)) for i in range(10)
    ] + [
        Row(id=100 + i, date_trans=CUTOFF + dt.timedelta(days=i), v=1.0)
        for i in range(5)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture()
def window_batch(spark):
    """Re-extracted recent window: same 5 recent ids, new values."""
    rows = [
        Row(id=100 + i, date_trans=CUTOFF + dt.timedelta(days=i), v=2.0)
        for i in range(5)
    ]
    return spark.createDataFrame(rows)


def test_append_duplicates_on_rerun(spark, history, tmp_path):
    sink = ParquetSink(os.path.join(tmp_path, "t"))
    sink.append(history)
    sink.append(history)
    assert spark.read.parquet(sink.path).count() == 30


def test_overwrite_idempotent(spark, history, tmp_path):
    sink = ParquetSink(os.path.join(tmp_path, "t"))
    sink.overwrite(history)
    sink.overwrite(history)
    out = spark.read.parquet(sink.path)
    assert out.count() == 15


def test_retention_append_reference_semantics(spark, history, window_batch, tmp_path):
    """Old rows are trimmed; rerun DUPLICATES the window (reference W3+W5)."""
    sink = ParquetSink(os.path.join(tmp_path, "t"))
    sink.overwrite(history)
    sink.retention_append(window_batch, "date_trans", CUTOFF, spark)
    out1 = spark.read.parquet(sink.path)
    # 5 retained recent + 5 appended; the 10 old rows deleted
    assert out1.count() == 10
    assert out1.filter(F.col("date_trans") < F.lit(CUTOFF)).count() == 0
    # Re-run: the recent window duplicates — the documented non-idempotency.
    sink.retention_append(window_batch, "date_trans", CUTOFF, spark)
    assert spark.read.parquet(sink.path).count() == 15


def test_window_overwrite_idempotent(spark, history, window_batch, tmp_path):
    """W7: recent window replaced in place; rerun is a no-op (idempotent)."""
    sink = ParquetSink(os.path.join(tmp_path, "t"))
    sink.overwrite(history)
    for _ in range(2):
        sink.window_overwrite(window_batch, "date_trans", CUTOFF, spark)
        out = spark.read.parquet(sink.path)
        assert out.count() == 15  # 10 old kept + 5 window rows
        recent = out.filter(F.col("date_trans") >= F.lit(CUTOFF))
        assert recent.count() == 5
        assert recent.agg(F.min("v")).collect()[0][0] == 2.0


def test_parquet_upsert_key_collision(spark, history, tmp_path):
    sink = ParquetSink(os.path.join(tmp_path, "t"))
    sink.overwrite(history)
    updates = spark.createDataFrame(
        [Row(id=0, date_trans=_day(0), v=99.0), Row(id=999, date_trans=_day(1), v=7.0)]
    )
    sink.upsert(updates, ("id",), spark)
    out = spark.read.parquet(sink.path)
    assert out.count() == 16  # 15 - 1 replaced + 2 (1 update, 1 insert)
    assert out.filter(F.col("id") == 0).collect()[0]["v"] == 99.0
    assert out.filter(F.col("id") == 999).count() == 1


def test_bigquery_sink_disposition_mapping():
    """Reference W4/W5: overwrite → WRITE_TRUNCATE, append → WRITE_APPEND
    (MySQL-to-BigQuery-Method-1.py:76-79), explicit disposition wins."""
    from extract_transform_load_template_multidb_spark.sinks.bigquery import (
        BigQuerySink,
    )

    sink = BigQuerySink(table="your_dataset.your_table", temp_gcs_bucket="b")
    assert sink.writer_options("overwrite")["writeDisposition"] == (
        "WRITE_TRUNCATE"
    )
    assert sink.writer_options("append")["writeDisposition"] == "WRITE_APPEND"
    assert sink.writer_options("append")["temporaryGcsBucket"] == "b"

    pinned = BigQuerySink(
        table="d.t", direct=True, write_disposition="WRITE_EMPTY"
    )
    opts = pinned.writer_options("append")
    assert opts["writeDisposition"] == "WRITE_EMPTY"
    assert opts["writeMethod"] == "direct"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sink.writer_options("merge")
    with _pytest.raises(ValueError):
        BigQuerySink(table="d.t", write_disposition="NOPE").writer_options(
            "append"
        )


def test_bigquery_retention_delete_sql():
    """Reference W6 cleanup statement shape
    (MySQL-to-BigQuery-Method-2.py:75-78)."""
    from extract_transform_load_template_multidb_spark.sinks.bigquery import (
        retention_delete_sql,
    )

    sql = retention_delete_sql("your_dataset.your_table", "date_trans", 30)
    assert sql == (
        "DELETE FROM `your_dataset.your_table` WHERE date_trans < "
        "DATE_SUB(CURRENT_DATE(), INTERVAL 30 DAY)"
    )


def test_bigquery_source_option_construction():
    """Reference S1/S2 extract spec on the public connector surface."""
    import pytest as _pytest

    from extract_transform_load_template_multidb_spark.sources.bigquery import (
        BigQuerySource,
    )

    t = BigQuerySource(table="your_dataset.your_table")
    assert t.reader_options() == {"table": "your_dataset.your_table"}

    q = BigQuerySource(
        query="SELECT * FROM d.t WHERE date_trans >= '2024-01-01'",
        materialization_dataset="scratch",
        views_enabled=True,
    )
    opts = q.reader_options()
    assert opts["materializationDataset"] == "scratch"
    assert opts["viewsEnabled"] == "true"
    assert opts["query"].startswith("SELECT")

    with _pytest.raises(ValueError):
        BigQuerySource().reader_options()
    with _pytest.raises(ValueError):
        BigQuerySource(table="a.b", query="SELECT 1").reader_options()
    with _pytest.raises(ValueError):
        BigQuerySource(query="SELECT 1").reader_options()
