"""BigQuery source spec (reference S1/S2) for the public
spark-bigquery-connector.

The reference extracts with ``bq_client.query(...).to_dataframe()``
(``Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:52-56``) — the whole
result lands in one pandas frame on one machine. On Spark the same
extract is ``spark.read.format("bigquery")``: the open-source connector
reads the table's storage-API streams in parallel across executors, and
Catalyst pushes filters (the S2 windowed extract's ``WHERE date_trans >=
DATE_SUB(...)``) and column pruning into the BigQuery read session.

The connector jar is not in this container, so ``read`` fails fast with a
clear error when the format is absent; option construction — where the
reference semantics live — is fully tested. ``query`` mode reproduces the
reference's arbitrary-SQL extract (requires ``materializationDataset``,
per the public connector contract).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class BigQuerySource:
    """Either ``table`` (``dataset.table``, parallel storage-API scan —
    preferred: pushdown works) or ``query`` (arbitrary SQL materialized
    server-side into ``materialization_dataset`` first)."""

    table: str | None = None
    query: str | None = None
    materialization_dataset: str | None = None
    views_enabled: bool = False
    options: dict[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        if (self.table is None) == (self.query is None):
            raise ValueError("exactly one of table/query is required")
        opts: dict[str, str] = {}
        if self.table is not None:
            opts["table"] = self.table
        else:
            if not self.materialization_dataset:
                raise ValueError(
                    "query mode requires materialization_dataset (the "
                    "connector materializes the SQL into a temp table "
                    "there before the parallel read)"
                )
            opts["query"] = self.query
            opts["materializationDataset"] = self.materialization_dataset
        if self.views_enabled:
            opts["viewsEnabled"] = "true"
        opts.update(self.options)
        return opts

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("bigquery")
        for k, v in self.reader_options().items():
            reader = reader.option(k, v)
        return reader.load()

    def __call__(self, spark: SparkSession) -> DataFrame:
        return self.read(spark)
