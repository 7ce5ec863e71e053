"""Multimodal plumbing tests: schema contracts, Arrow batch shapes,
partition sizing, and the real-codec gate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from extract_transform_load_template_multidb_spark.catalog import load_table
from extract_transform_load_template_multidb_spark.operators import (
    multimodal as mm,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.synthesize_media(load_table(spark, sf_dir, "documents"))


def test_media_schema_contract(media):
    assert [f.name for f in mm.MEDIA_SCHEMA.fields] == media.columns
    got = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in mm.MEDIA_SCHEMA.fields}
    assert got == want


def test_extract_features_shape_and_determinism(spark, media):
    feats = mm.extract_features(media, dim=4)
    assert feats.columns == [
        "asset_id", "media_type", "n_bytes", "payload_sha256",
        "feat_mean", "feat_dim",
    ]
    rows = feats.orderBy("asset_id").limit(5).collect()
    rows2 = mm.extract_features(media, dim=4).orderBy("asset_id").limit(
        5
    ).collect()
    assert rows == rows2  # deterministic across runs/partitionings
    assert all(0.0 <= r["feat_mean"] <= 1.0 for r in rows)
    assert all(r["feat_dim"] == 4 for r in rows)


def test_frame_sample_fanout(media):
    frames = mm.sample_frames(media, every_ms=1000)
    video = media.filter(F.col("media_type") == "video").select(
        "asset_id", "duration_ms"
    )
    expected = video.select(
        F.greatest(F.lit(1), (F.col("duration_ms") / 1000).cast("long"))
        .alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert frames.count() == expected
    # frame indices are dense 0..n-1 per asset
    per = frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    assert per.filter(F.col("mx") != F.col("n") - 1).count() == 0


def test_real_codec_path_is_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff")


def test_repartition_for_media(spark, media):
    before = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    df = mm.repartition_for_media(media, target_rows=50)
    # no hidden session reconfiguration (batch caps are the caller's,
    # via media_batch_conf at session build)...
    assert (
        spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        == before
    )
    # ...and the scan is spread over at least the session's parallelism.
    cores = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() >= min(
        cores, media.rdd.getNumPartitions()
    )
    assert mm.media_batch_conf(50)[
        "spark.sql.execution.arrow.maxRecordsPerBatch"
    ] == "50"


def test_media_stats_sniffs_magic_bytes(spark):
    rows = [
        (1, "image", None, bytearray(b"\xff\xd8\xff\xe0rest"), None, None, None, None),
        (2, "image", None, bytearray(b"\x89PNG\r\n"), None, None, None, None),
        (3, "audio", None, bytearray(b"plain"), None, None, None, None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {
        r["asset_id"]: r["sniffed_format"]
        for r in mm.media_stats(df).collect()
    }
    assert got == {1: "jpeg", 2: "png", 3: "unknown"}
