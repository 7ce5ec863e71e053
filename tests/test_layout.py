"""Z-order layout: the physical locality property that makes min/max data
skipping work on EVERY interleaved dimension, not just the sort leader."""

from __future__ import annotations

from pyspark.sql import functions as F

from extract_transform_load_template_multidb_spark.catalog import load_table
from extract_transform_load_template_multidb_spark.operators import (
    layout as ly,
)


def _file_span_fraction(spark, path, col):
    """Average per-file (max-min) span of ``col``, as a fraction of the
    column's global domain — the quantity row-group skipping depends on."""
    df = spark.read.parquet(path).withColumn(
        "__f", F.input_file_name()
    )
    longcol = F.col(col).cast("long")
    per_file = df.groupBy("__f").agg(
        F.min(longcol).alias("mn"), F.max(longcol).alias("mx")
    )
    g = df.agg(
        F.min(longcol).alias("gmn"), F.max(longcol).alias("gmx")
    ).first()
    domain = max(g["gmx"] - g["gmn"], 1)
    spans = [r["mx"] - r["mn"] for r in per_file.collect()]
    return sum(spans) / len(spans) / domain


def test_zorder_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order by (user_id, ts) must give every file a bounded span on
    BOTH columns; a linear sort by user_id leaves ts spans near 100%."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("long").alias("ts_us"),
        "value",
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    ly.zorder_write(ev, ["user_id", "ts_us"], zpath, n_files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(lpath)
    )

    z_user = _file_span_fraction(spark, zpath, "user_id")
    z_ts = _file_span_fraction(spark, zpath, "ts_us")
    lin_ts = _file_span_fraction(spark, lpath, "ts_us")

    # Both z-ordered dimensions are localized…
    assert z_user < 0.5, z_user
    assert z_ts < 0.5, z_ts
    # …while the linear layout has no ts locality at all.
    assert lin_ts > 0.9, lin_ts
    # No rows lost or duplicated by the rewrite.
    assert spark.read.parquet(zpath).count() == ev.count()


def test_zorder_accepts_metadata_bounds(spark, sf_dir, tmp_path):
    """Passing known bounds must skip the min/max scan and still produce a
    valid layout (the 100 TB path, where bounds come from metadata)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("long").alias("ts_us")
    )
    g = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_us"), F.max("ts_us")
    ).first()
    path = str(tmp_path / "zb")
    ly.zorder_write(
        ev,
        ["user_id", "ts_us"],
        path,
        n_files=8,
        bounds={
            "user_id": (g[0], g[1]),
            "ts_us": (g[2], g[3]),
        },
    )
    assert spark.read.parquet(path).count() == ev.count()
    assert _file_span_fraction(spark, path, "user_id") < 0.6


def test_compact_files_reduces_count_and_preserves_rows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    frag = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(frag)  # simulate micro-batch litter
    compacted = str(tmp_path / "compacted")
    n = ly.compact_files(spark, frag, compacted, target_file_bytes=10**9)
    assert n == 1
    import glob

    assert len(glob.glob(compacted + "/*.parquet")) == 1
    got = spark.read.parquet(compacted)
    assert got.count() == ev.count()
    # sorted variant keeps a clustering while compacting
    sorted_path = str(tmp_path / "compacted_sorted")
    ly.compact_files(
        spark, frag, sorted_path, target_file_bytes=10**9,
        sort_cols=["user_id"],
    )
    assert spark.read.parquet(sorted_path).count() == ev.count()
