"""DDL module: type-map round trips (every notebook entry), NVARCHAR
promotion on ASCII vs non-ASCII samples, golden CREATE TABLE strings."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from extract_transform_load_template_multidb_spark.ddl import (
    bq_type_to_sqlserver,
    create_table_sql,
    nvarchar_promotions,
    schema_from_information_rows,
    spark_type_to_dialect,
)

# Every entry of the notebook's BigQuery→SQL Server map (ipynb:253-262).
@pytest.mark.parametrize(
    "bq,expected",
    [
        ("STRING", "VARCHAR(255)"),
        ("INT64", "BIGINT"),
        ("FLOAT64", "FLOAT"),
        ("BOOL", "BIT"),
        ("NUMERIC", "DECIMAL(38,9)"),
        ("BIGNUMERIC", "DECIMAL(38,9)"),
        ("TIMESTAMP", "DATETIME"),
        ("DATE", "DATE"),
        ("TIME", "TIME"),
        ("GEOGRAPHY", "VARCHAR(255)"),  # unknown → fallback (ipynb:281)
    ],
)
def test_bq_to_sqlserver_map(bq, expected):
    assert bq_type_to_sqlserver(bq) == expected


def test_spark_type_dialect_matrix():
    assert spark_type_to_dialect(LongType(), "mysql") == "BIGINT"
    assert spark_type_to_dialect(DoubleType(), "sqlserver") == "FLOAT"
    assert spark_type_to_dialect(DoubleType(), "postgresql") == "DOUBLE PRECISION"
    assert spark_type_to_dialect(BooleanType(), "sqlserver") == "BIT"
    assert spark_type_to_dialect(BooleanType(), "bigquery") == "BOOL"
    assert spark_type_to_dialect(DecimalType(38, 9), "mysql") == "DECIMAL(38,9)"
    assert spark_type_to_dialect(DecimalType(38, 9), "bigquery") == "NUMERIC"
    assert spark_type_to_dialect(TimestampType(), "mysql") == "DATETIME"
    with pytest.raises(ValueError):
        spark_type_to_dialect(LongType(), "oracle")


def test_create_table_golden_mysql():
    schema = StructType(
        [
            StructField("id", LongType(), nullable=False),
            StructField("name", StringType()),
            StructField("amount", DoubleType()),
            StructField("created", TimestampType()),
            StructField("day", DateType()),
        ]
    )
    sql = create_table_sql("your_table", schema, "mysql")
    assert sql == (
        "CREATE TABLE `your_table` (\n"
        "    `id` BIGINT NOT NULL,\n"
        "    `name` VARCHAR(255),\n"
        "    `amount` DOUBLE,\n"
        "    `created` DATETIME,\n"
        "    `day` DATE\n"
        ");"
    )


def test_create_table_sqlserver_with_nvarchar():
    schema = StructType(
        [StructField("id", IntegerType()), StructField("title", StringType())]
    )
    sql = create_table_sql(
        "t", schema, "sqlserver", nvarchar_columns={"title"}
    )
    assert "[title] NVARCHAR(255)" in sql
    assert "[id] INT" in sql


def test_nvarchar_promotion_ascii_vs_not(spark):
    df = spark.createDataFrame(
        [
            Row(plain="abc123", symbols="hello world", unicode_col="héllo", num=1),
            Row(plain="XYZ", symbols="a_b", unicode_col="ascii", num=2),
        ]
    )
    promoted = nvarchar_promotions(df)
    # "hello world" has a space, "a_b" an underscore, "héllo" a non-ASCII é —
    # both match [^a-zA-Z0-9]; pure alnum column stays VARCHAR.
    assert promoted == {"symbols", "unicode_col"}


def test_nvarchar_promotion_respects_sample_bound(spark):
    # Non-alnum value hidden beyond the sample bound → not promoted
    rows = [Row(s="clean")] * 50 + [Row(s="dirty!")]
    df = spark.createDataFrame(rows).coalesce(1)
    assert nvarchar_promotions(df, sample_rows=10) == set()


def test_schema_from_information_rows():
    schema = schema_from_information_rows(
        [
            ("id", "bigint", None),
            ("name", "varchar", 255),
            ("flag", "bit", None),
            ("ts", "datetime", None),
            ("mystery", "geography", None),
        ]
    )
    assert [f.dataType for f in schema.fields] == [
        LongType(),
        StringType(),
        BooleanType(),
        TimestampType(),
        StringType(),  # unknown → string fallback
    ]
