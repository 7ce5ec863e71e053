"""File-format breadth: CSV/JSON/ORC round-trips through FileSource,
partitioned layouts with partition pruning, and parquet schema evolution —
the format surface a user switching from the reference's pandas
``read_sql``/``to_csv`` world expects to keep."""

from __future__ import annotations

import os

from pyspark.sql import Row, functions as F

from extract_transform_load_template_multidb_spark.sources import FileSource


def _sample(spark):
    return spark.createDataFrame(
        [Row(id=i, grp=f"g{i % 3}", amount=float(i) * 1.25) for i in range(30)]
    )


def _assert_roundtrip(spark, df, path, fmt, write_opts=None, read_opts=None):
    w = df.write.format(fmt).mode("overwrite")
    for k, v in (write_opts or {}).items():
        w = w.option(k, v)
    w.save(path)
    got = FileSource(
        path,
        format=fmt,
        schema="id bigint, grp string, amount double",
        options=read_opts or {},
    ).read(spark)
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in df.collect()
    )
    assert dict(got.dtypes)["amount"] == "double"
    return got


def test_csv_roundtrip_with_header_and_compression(spark, tmp_path):
    df = _sample(spark)
    _assert_roundtrip(
        spark,
        df,
        str(tmp_path / "csv_gz"),
        "csv",
        write_opts={"header": "true", "compression": "gzip"},
        read_opts={"header": "true"},
    )


def test_json_roundtrip(spark, tmp_path):
    _assert_roundtrip(spark, _sample(spark), str(tmp_path / "json"), "json")


def test_orc_roundtrip(spark, tmp_path):
    _assert_roundtrip(spark, _sample(spark), str(tmp_path / "orc"), "orc")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A filter on the partition column must prune directories at plan
    time — the scan reads one partition, not all three."""
    path = str(tmp_path / "parts")
    _sample(spark).write.partitionBy("grp").mode("overwrite").parquet(path)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("grp=")
    ) == ["grp=g0", "grp=g1", "grp=g2"]

    got = spark.read.parquet(path).filter(F.col("grp") == "g1")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(grp" in plan
    assert got.count() == 10
    # only the matching directory's files are listed in the scan
    assert "grp=g0" not in plan.split("Location")[-1][:400]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """mergeSchema unions columns across files written with evolving
    schemas (the lakehouse append-new-column pattern)."""
    path = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], "id bigint, v1 string").write.parquet(
        path
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, v1 string, v2 double"
    ).write.mode("append").parquet(path)
    got = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(got.columns) == {"id", "v1", "v2"}
    byid = {r["id"]: r for r in got.collect()}
    assert byid[1]["v2"] is None and byid[2]["v2"] == 9.5


def test_file_source_rejects_unknown_format():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        FileSource("/nonexistent", format="avro-nope")
