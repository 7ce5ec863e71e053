"""OData change feed as a Spark 4 Python STREAMING DataSource.

The reference's Method-2 incremental pattern re-extracts a 30-day window
every day (reference ``Template-to-MySQL/Dynamics365-to-MySQL-Method-2.py:
68-75`` — a ``$filter`` window rendered by hand). The streaming form reads
the feed as an offset-tracked change stream instead: each micro-batch
pulls the next ``$skip/$top`` slice, the consumed position is the
checkpointed offset, and a restart resumes exactly where the last commit
left off — no window re-extract, no duplicate rows.

Usage::

    spark.dataSource.register(ODataChangeFeedDataSource)
    stream = (spark.readStream.format("odata_feed")
              .schema("id BIGINT, name STRING, date_trans TIMESTAMP")
              .option("base_url", "https://erp.example.com")
              .option("entity", "DemandForecasts")
              .option("batch_size", "5000")
              .load())

For hermetic tests, ``inline_records`` carries the whole feed as a JSON
array in the options; the offset/commit/restart protocol is identical to
the live path (``read`` slices the same positions a live ``$skip`` would).

Scale note: a SimpleDataSourceStreamReader reads on the driver — correct
for API-bounded feeds (the bottleneck is the remote endpoint, and the
reference's own extract is a single driver-side GET). Fan-out happens
downstream: the returned micro-batch is a normal DataFrame that
repartitions into the cluster before any heavy transform.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from extract_transform_load_template_multidb_spark.sources.odata import (
    render_odata_url,
)


class ODataChangeFeedDataSource(DataSource):
    """``format("odata_feed")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "odata_feed"

    def schema(self) -> str:
        raise NotImplementedError(
            "odata_feed source requires an explicit .schema(...) — the "
            "planner does not probe the API"
        )

    def simpleStreamReader(
        self, schema: StructType
    ) -> "ODataChangeFeedReader":
        return ODataChangeFeedReader(schema, self.options)


class ODataChangeFeedReader(SimpleDataSourceStreamReader):
    """Offset = number of feed records consumed; read() returns the next
    slice and the advanced offset, readBetweenOffsets() replays a
    committed-but-unflushed slice after restart."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_names = [f.name for f in schema.fields]
        self.options = options
        self.batch_size = int(options.get("batch_size", "1000"))
        self._inline = (
            json.loads(options["inline_records"])
            if "inline_records" in options
            else None
        )

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _fetch(self, skip: int, top: int) -> list[dict]:
        if self._inline is not None:
            return self._inline[skip : skip + top]
        url = render_odata_url(
            self.options["base_url"],
            self.options["entity"],
            filter=self.options.get("filter"),
            select=(
                self.options["select"].split(",")
                if "select" in self.options
                else None
            ),
            top=top,
            skip=skip,
        )
        headers = {"Accept": "application/json"}
        if "bearer_token" in self.options:
            headers["Authorization"] = (
                f"Bearer {self.options['bearer_token']}"
            )
        req = urllib.request.Request(url, headers=headers)
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read().decode("utf-8")).get("value", [])

    def _rows(self, records: list[dict]) -> list[Tuple]:
        # a concrete list, not a generator: the offset-slice pair is
        # pickled across the planner boundary
        return [
            tuple(rec.get(n) for n in self.schema_names) for rec in records
        ]

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        i = int(start["index"])
        records = self._fetch(i, self.batch_size)
        return iter(self._rows(records)), {"index": i + len(records)}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[Tuple]:
        i, j = int(start["index"]), int(end["index"])
        return iter(self._rows(self._fetch(i, j - i)))
