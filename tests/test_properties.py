"""Property-based checks (hypothesis) — SURVEY.md §5.4.

Random inputs assert the invariants the oracle fixtures can't sweep:
window-extract/retention complementarity over arbitrary date sets, DDL
generation over arbitrary schemas, tokenizer/shingle agreement with a pure
Python reference, and upsert idempotency over random key collisions.
"""

from __future__ import annotations

import datetime as dt
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from extract_transform_load_template_multidb_spark import ddl, transforms
from extract_transform_load_template_multidb_spark.operators import dedup as dd

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_dates = st.lists(
    st.dates(dt.date(2023, 1, 1), dt.date(2024, 12, 31)),
    min_size=1,
    max_size=40,
)


@given(dates=_dates, days=st.integers(1, 60))
@settings(**_SETTINGS)
def test_window_extract_and_retention_partition(spark, dates, days):
    """extract(≥ cutoff) and its retention complement (< cutoff) partition
    the input exactly — no row lost, none duplicated, for any date set."""
    df = spark.createDataFrame([(i, d) for i, d in enumerate(dates)],
                               "i long, d date")
    kept = transforms.window_filter(df, "d", days=days)
    cutoff = max(dates) - dt.timedelta(days=days)
    old = df.filter(F.col("d") < F.lit(cutoff))
    got = sorted(r["i"] for r in kept.unionByName(old).collect())
    assert got == sorted(range(len(dates)))
    assert kept.join(old, "i", "inner").count() == 0


_identifiers = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
_types = st.sampled_from(
    [StringType(), LongType(), DoubleType(), BooleanType(),
     TimestampType(), DateType()]
)


@given(
    cols=st.dictionaries(_identifiers, _types, min_size=1, max_size=8),
    dialect=st.sampled_from(["mysql", "sqlserver", "postgresql", "bigquery"]),
)
@settings(max_examples=50, deadline=None)
def test_ddl_contains_every_column(cols, dialect):
    schema = StructType(
        [StructField(n, t, True) for n, t in cols.items()]
    )
    sql = ddl.create_table_sql("t", schema, dialect=dialect)
    assert sql.upper().startswith("CREATE TABLE")
    for name in cols:
        assert name in sql
    # one comma-separated definition per column, balanced parens
    assert sql.count(",") >= len(cols) - 1
    assert sql.count("(") == sql.count(")")


_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _py_tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


@given(text=st.text(max_size=120))
@settings(**_SETTINGS)
def test_tokenize_matches_python_reference(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(dd.tokenize(F.col("text")).alias("t")).collect()[0]["t"]
    assert got == _py_tokens(text)


@given(text=st.text(alphabet="ab c.!", max_size=60), n=st.integers(2, 4))
@settings(**_SETTINGS)
def test_shingles_match_python_reference(spark, text, n):
    toks = _py_tokens(text)
    want = sorted(
        {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    ) if len(toks) >= n else []
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(
        F.array_sort(dd.word_shingles(F.col("text"), n)).alias("s")
    ).collect()[0]["s"]
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_parquet_upsert_idempotent(spark, tmp_path_factory, rows):
    """Upserting the same batch twice equals once, for any key collisions
    (last write per key wins within Spark determinism: we dedupe input)."""
    from extract_transform_load_template_multidb_spark.sinks.parquet_sink import (
        ParquetSink,
    )

    # unique per key (upsert contract: right side unique on key)
    uniq = {k: v for k, v in rows}
    df = spark.createDataFrame(list(uniq.items()), "k long, v long")
    path = str(tmp_path_factory.mktemp("ups") / "t")
    sink = ParquetSink(path)
    sink.upsert(df, ("k",), spark)
    once = sorted(map(tuple, spark.read.parquet(path).collect()))
    sink.upsert(df, ("k",), spark)
    twice = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert once == twice == sorted(uniq.items())
