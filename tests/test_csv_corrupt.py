"""CSV ingest robustness: PERMISSIVE corrupt-record routing at the
source — the file-format counterpart of etl_dead_letter_json (which
handles payload-level corruption after a clean scan)."""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def test_csv_permissive_routes_corrupt_records(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,qty\n"
        "1,alpha,10\n"
        "2,beta,notanumber\n"   # type-corrupt
        "3,gamma,30\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("qty", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()  # required before filtering on _corrupt_record
    )
    good = df.filter(df._corrupt_record.isNull())
    dead = df.filter(df._corrupt_record.isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 3]
    deads = dead.collect()
    assert len(deads) == 1
    # the raw line is preserved for the quarantine sink
    assert "notanumber" in deads[0]._corrupt_record
    df.unpersist()


def test_csv_failfast_raises(spark, tmp_path):
    import pytest
    p = tmp_path / "in2.csv"
    p.write_text("id,qty\n1,10\n2,bad\n")
    schema = "id BIGINT, qty BIGINT"
    with pytest.raises(Exception):
        (
            spark.read.schema(schema)
            .option("header", "true")
            .option("mode", "FAILFAST")
            .csv(str(p))
            .collect()
        )
