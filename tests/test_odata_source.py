"""OData source: URL rendering (pushdown), paging, meta-column drop."""

from __future__ import annotations

from extract_transform_load_template_multidb_spark.sources import (
    ODataSource,
    render_odata_url,
)
from extract_transform_load_template_multidb_spark.sources.odata import (
    window_filter_clause,
)


def test_render_url_matches_reference_shape():
    url = render_odata_url("https://erp.example.com", "DemandForecasts")
    assert url == "https://erp.example.com/data/DemandForecasts"


def test_render_url_filter_pushdown():
    clause = window_filter_clause("date_trans", "2024-03-01T00:00:00Z")
    url = render_odata_url(
        "https://erp.example.com", "DemandForecasts", filter=clause,
        select=["id", "date_trans"], top=100,
    )
    assert "$filter=date_trans%20ge%202024-03-01T00%3A00%3A00Z" in url
    assert "$select=id%2Cdate_trans" in url
    assert "$top=100" in url


def test_odata_paging_and_meta_drop(spark):
    pages = {
        "https://erp/data/E": {
            "value": [
                {"id": 1, "x": "a", "@odata.etag": "W/1"},
                {"id": 2, "x": "b", "@odata.etag": "W/2"},
            ],
            "@odata.nextLink": "https://erp/data/E?$skip=2",
        },
        "https://erp/data/E?$skip=2": {
            "value": [{"id": 3, "x": "c", "@odata.etag": "W/3"}],
        },
    }
    fetched = []

    def fake_fetch(url, headers):
        fetched.append((url, headers.get("Authorization")))
        return pages[url]

    src = ODataSource(
        base_url="https://erp",
        entity="E",
        fetch=fake_fetch,
        token_provider=lambda: "tok123",
    )
    df = src.read(spark)
    rows = {r["id"]: r["x"] for r in df.collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}
    assert "@odata.etag" not in df.columns
    assert all(auth == "Bearer tok123" for _, auth in fetched)
    assert len(fetched) == 2  # followed nextLink once


def test_odata_empty_feed(spark):
    src = ODataSource(
        base_url="https://erp", entity="E", fetch=lambda u, h: {"value": []}
    )
    assert src.read(spark).count() == 0


def test_odata_datasource_parallel_pages(spark):
    """format("odata") reads pages as input partitions on executors."""
    import json

    from extract_transform_load_template_multidb_spark.sources import (
        ODataDataSource,
    )

    spark.dataSource.register(ODataDataSource)
    pages = [
        [{"id": 1, "x": "a"}, {"id": 2, "x": "b"}],
        [{"id": 3, "x": "c"}],
        [],
    ]
    df = (
        spark.read.format("odata")
        .schema("id BIGINT, x STRING")
        .option("inline_pages", json.dumps(pages))
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    assert {(r["id"], r["x"]) for r in df.collect()} == {
        (1, "a"), (2, "b"), (3, "c"),
    }


def test_odata_datasource_skip_top_plan():
    """Offset paging splits into $skip/$top windows, one per partition."""
    from pyspark.sql.types import StructType

    from extract_transform_load_template_multidb_spark.sources.odata_datasource import (
        ODataPagedReader,
    )

    schema = StructType.fromDDL("id BIGINT")
    reader = ODataPagedReader(
        schema, {"page_size": "100", "n_pages": "4"}
    )
    parts = reader.partitions()
    assert [(p.skip, p.top) for p in parts] == [
        (0, 100), (100, 100), (200, 100), (300, 100),
    ]
