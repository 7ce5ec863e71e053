"""Unit tests for the reference transform semantics (SURVEY §2.2)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row

from extract_transform_load_template_multidb_spark.transforms import (
    clean_infinities,
    drop_meta_columns,
    window_filter,
)

INF = float("inf")


def test_clean_infinities_nulls_inf_keeps_nan(spark):
    df = spark.createDataFrame(
        [Row(a=1.0, b="x"), Row(a=INF, b="y"), Row(a=-INF, b="z"),
         Row(a=float("nan"), b="w"), Row(a=None, b="v")]
    )
    out = clean_infinities(df).collect()
    vals = {r["b"]: r["a"] for r in out}
    assert vals["x"] == 1.0
    assert vals["y"] is None and vals["z"] is None  # ±inf → NULL
    assert math.isnan(vals["w"])  # NaN preserved (pandas replace semantics)
    assert vals["v"] is None


def test_clean_infinities_ignores_non_float_columns(spark):
    df = spark.createDataFrame([Row(i=1, s="a", d=INF)])
    out = clean_infinities(df).collect()[0]
    assert out["i"] == 1 and out["s"] == "a" and out["d"] is None


def test_drop_meta_columns_ignores_missing(spark):
    df = spark.createDataFrame([Row(a=1)])
    assert drop_meta_columns(df).columns == ["a"]  # no @odata.etag → no-op
    df2 = spark.createDataFrame([{"a": 1, "@odata.etag": "W/1"}])
    assert drop_meta_columns(df2).columns == ["a"]


def test_window_filter_boundary_inclusive(spark):
    base = dt.datetime(2024, 3, 31)
    rows = [Row(id=i, ts=base - dt.timedelta(days=i)) for i in (0, 15, 30, 31, 45)]
    df = spark.createDataFrame(rows)
    kept = sorted(r["id"] for r in window_filter(df, "ts", days=30).collect())
    # cutoff = max(ts) − 30d = 2024-03-01; day-30 row is exactly ON it → kept
    assert kept == [0, 15, 30]


def test_window_filter_explicit_anchor(spark):
    rows = [
        Row(id=1, ts=dt.datetime(2024, 3, 1)),
        Row(id=2, ts=dt.datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows)
    kept = [r["id"] for r in
            window_filter(df, "ts", days=30, anchor=dt.datetime(2024, 3, 15)).collect()]
    assert kept == [1]


def test_asof_join_tolerance_nulls_stale_matches(spark):
    from extract_transform_load_template_multidb_spark.operators import (
        temporal as tp,
    )

    left = spark.createDataFrame(
        [(1, 1, dt.date(2024, 1, 10)), (2, 1, dt.date(2024, 3, 1)),
         (3, 2, dt.date(2024, 1, 5))],
        "event_id long, k long, d date",
    )
    right = spark.createDataFrame(
        [(1, dt.date(2024, 1, 8), 100)], "k long, rd date, payload long"
    )
    got = {
        r["event_id"]: r["payload"]
        for r in tp.asof_join(
            left, right, "k", "k", "d", "rd", ("payload",),
            tolerance_days=7,
        ).collect()
    }
    # event 1: match 2 days old → kept; event 2: 53 days old → stale;
    # event 3: different key, no match at all.
    assert got == {1: 100, 2: None, 3: None}
