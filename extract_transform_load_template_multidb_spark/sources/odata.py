"""Dynamics 365 / OData REST source (reference S9/S10).

The reference authenticates with OAuth2 client-credentials and GETs
``{RESOURCE}/data/{Entity}`` unwrapping the JSON ``value`` array
(``Template-to-MySQL/Dynamics365-to-MySQL-Method-1.py:58-73``); the windowed
variant renders ``$filter=date_trans ge {cutoff}`` into the URL — *manual*
predicate pushdown (``Dynamics365-to-MySQL-Method-2.py:68-69``).

Spark has no OData connector, so this is a custom reader:

- ``render_odata_url`` reproduces the reference's URL construction including
  the ``$filter`` pushdown, plus ``$select`` (column pruning pushdown) and
  ``$top``/``$skip`` paging the reference lacks.
- ``ODataSource`` pages through ``@odata.nextLink`` on the driver, building
  a DataFrame per page batch and unioning — the row volume of an OData feed
  is API-bounded, so driver-side paging with distributed downstream
  processing is the right trade. HTTP and token acquisition are injectable
  callables (stdlib ``urllib`` default) so tests run hermetically.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

META_COLUMNS = ("@odata.etag", "@odata.context", "@odata.nextLink")


def render_odata_url(
    base_url: str,
    entity: str,
    filter: str | None = None,
    select: list[str] | None = None,
    top: int | None = None,
    skip: int | None = None,
) -> str:
    """Build ``{base}/data/{entity}?$filter=...&$select=...`` exactly as the
    reference does for its windowed extract, with filter/column pushdown
    rendered server-side."""
    params: list[tuple[str, str]] = []
    if filter:
        params.append(("$filter", filter))
    if select:
        params.append(("$select", ",".join(select)))
    if top is not None:
        params.append(("$top", str(top)))
    if skip is not None:
        params.append(("$skip", str(skip)))
    url = f"{base_url.rstrip('/')}/data/{entity}"
    if params:
        # Keep the literal ``$`` in $filter/$select/$top keys (OData
        # convention); percent-encode values only.
        url += "?" + "&".join(
            f"{k}={urllib.parse.quote(v, safe='')}" for k, v in params
        )
    return url


def window_filter_clause(col: str, cutoff_iso: str) -> str:
    """OData ``$filter`` for the 30-day rolling window: ``{col} ge {cutoff}``
    (reference ``Dynamics365-to-MySQL-Method-2.py:68-69``)."""
    return f"{col} ge {cutoff_iso}"


def _default_fetch(url: str, headers: dict[str, str]) -> dict:
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read().decode("utf-8"))


@dataclass
class ODataSource:
    base_url: str
    entity: str
    filter: str | None = None
    select: list[str] | None = None
    page_size: int | None = None
    # (url, headers) -> parsed JSON document; injectable for tests/retries.
    fetch: Callable[[str, dict[str, str]], dict] = field(default=None)  # type: ignore[assignment]
    # () -> bearer token; replaces the reference's adal client-credentials
    # flow (Dynamics365-to-MySQL-Method-1.py:59-62).
    token_provider: Callable[[], str] | None = None
    drop_meta: bool = True
    max_pages: int = 100_000

    def __post_init__(self):
        if self.fetch is None:
            self.fetch = _default_fetch

    def _headers(self) -> dict[str, str]:
        headers = {"Accept": "application/json"}
        if self.token_provider is not None:
            headers["Authorization"] = f"Bearer {self.token_provider()}"
        return headers

    def read(self, spark: SparkSession) -> DataFrame:
        url: str | None = render_odata_url(
            self.base_url,
            self.entity,
            filter=self.filter,
            select=self.select,
            top=self.page_size,
        )
        headers = self._headers()
        records: list[dict] = []
        pages = 0
        while url and pages < self.max_pages:
            doc = self.fetch(url, headers)
            records.extend(doc.get("value", []))
            url = doc.get("@odata.nextLink")
            pages += 1
        if self.drop_meta:
            records = [
                {k: v for k, v in rec.items() if k not in META_COLUMNS}
                for rec in records
            ]
        # JSON round-trip through spark.read.json infers a consistent schema
        # for row-oriented records (the reference's pd.DataFrame(data) step).
        if not records:
            return spark.createDataFrame([], schema="struct<>")
        rdd = spark.sparkContext.parallelize(
            [json.dumps(r) for r in records]
        )
        return spark.read.json(rdd)

    def __call__(self, spark: SparkSession) -> DataFrame:
        return self.read(spark)
