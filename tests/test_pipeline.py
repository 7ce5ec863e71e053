"""Pipeline runner: lazy composition, record-count metric, notify, retry."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from extract_transform_load_template_multidb_spark.pipeline import Notifier, Pipeline
from extract_transform_load_template_multidb_spark.sinks import ParquetSink
from extract_transform_load_template_multidb_spark.sources import FileSource
from extract_transform_load_template_multidb_spark.transforms import (
    clean_infinities,
    window_filter,
)


def test_method2_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """Method-2 shape: windowed extract → clean → append, with count metric."""
    sent = []
    sink = ParquetSink(os.path.join(tmp_path, "events_out"))
    pipe = Pipeline(
        name="events_window_load",
        source=FileSource(os.path.join(sf_dir, "events.parquet")),
        transforms=[
            lambda df: df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
            if dict(df.dtypes).get("ts") == "bigint"
            else df,
            lambda df: window_filter(df, "ts", days=30),
            lambda df: clean_infinities(df, ["value"]),
        ],
        sink=sink.append,
        notifier=Notifier(send=lambda s, b: sent.append((s, b))),
    )
    n = pipe.run(spark)
    assert n > 0
    out = spark.read.parquet(sink.path)
    assert out.count() == n
    # inf values were cleaned
    assert out.filter(F.col("value").isin(float("inf"), float("-inf"))).count() == 0
    assert sent and sent[0][0].startswith("Data Load Successful")
    assert str(n) in sent[0][1]


def test_pipeline_retry_then_fail(spark):
    sent = []
    calls = {"n": 0}

    def bad_source(s):
        calls["n"] += 1
        raise RuntimeError("connection refused")

    pipe = Pipeline(
        name="doomed",
        source=bad_source,
        sink=lambda df: None,
        notifier=Notifier(send=lambda s, b: sent.append(s)),
        retries=1,
        retry_delay=0.01,
    )
    with pytest.raises(RuntimeError):
        pipe.run(spark)
    assert calls["n"] == 2  # initial + 1 retry (reference default_args)
    assert [s for s in sent if s.startswith("Data Load Failed")]


def test_smtp_sender_message_shape():
    """smtp_sender renders exactly the reference C4 email
    (Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:35-46): MIMEText body,
    From/To/Subject headers, sendmail then quit — and never raises."""
    from extract_transform_load_template_multidb_spark.pipeline import smtp_sender

    calls = {}

    class FakeSMTP:
        def __init__(self, addr, port):
            calls["connect"] = (addr, port)

        def sendmail(self, sender, recipients, payload):
            calls["sendmail"] = (sender, recipients, payload)

        def quit(self):
            calls["quit"] = True

    send = smtp_sender(
        "messenger.example.com",
        "office@example.com",
        ["a@example.com", "b@example.com"],
        port=25,
        smtp_factory=FakeSMTP,
    )
    Notifier(send=send).success("events_load", 1234)
    assert calls["connect"] == ("messenger.example.com", 25)
    sender, recipients, payload = calls["sendmail"]
    assert sender == "office@example.com"
    assert recipients == ["a@example.com", "b@example.com"]
    assert "Subject: Data Load Successful: events_load" in payload
    assert "To: a@example.com, b@example.com" in payload
    assert "Records: 1234" in payload
    assert calls["quit"]


def test_smtp_sender_swallows_errors():
    from extract_transform_load_template_multidb_spark.pipeline import smtp_sender

    def boom(addr, port):
        raise ConnectionRefusedError("no smtp here")

    send = smtp_sender("h", "s@x", ["r@x"], smtp_factory=boom)
    send("subject", "body")  # must not raise


def test_pipeline_from_config_end_to_end(spark, sf_dir, tmp_path):
    """The reference's copy-a-template-edit-constants surface as one
    declarative dict: file source → clean + window → parquet append,
    with the count metric and notification."""
    from extract_transform_load_template_multidb_spark.config import (
        pipeline_from_config,
    )

    sent = []
    out = os.path.join(tmp_path, "cfg_out")
    pipe = pipeline_from_config(
        {
            "name": "cfg_events_load",
            "source": {
                "type": "file",
                "path": os.path.join(sf_dir, "orders.parquet"),
            },
            "transforms": [
                {"op": "select", "cols": ["o_orderkey", "o_orderdate"]},
                {"op": "window_filter", "col": "o_orderdate", "days": 60},
            ],
            "sink": {"type": "parquet", "path": out, "mode": "append"},
            "retries": 0,
            "retry_delay": 0.01,
        }
    )
    pipe.notifier = Notifier(send=lambda s, b: sent.append((s, b)))
    n = pipe.run(spark)
    assert n > 0
    got = spark.read.parquet(out)
    assert got.count() == n
    assert set(got.columns) == {"o_orderkey", "o_orderdate"}
    assert sent and sent[0][0].startswith("Data Load Successful")


def test_pipeline_from_config_rejects_unknowns():
    from extract_transform_load_template_multidb_spark.config import (
        pipeline_from_config,
    )

    with pytest.raises(ValueError, match="missing required"):
        pipeline_from_config({"name": "x"})
    with pytest.raises(ValueError, match="unknown source type"):
        pipeline_from_config(
            {"name": "x", "source": {"type": "ftp"}, "sink": {}}
        )
    with pytest.raises(ValueError, match="unknown transform op"):
        pipeline_from_config(
            {
                "name": "x",
                "source": {"type": "file", "path": "/p"},
                "transforms": [{"op": "mystery"}],
                "sink": {"type": "parquet", "path": "/o"},
            }
        )
    with pytest.raises(ValueError, match="unknown sink type"):
        pipeline_from_config(
            {
                "name": "x",
                "source": {"type": "file", "path": "/p"},
                "sink": {"type": "kafka"},
            }
        )
