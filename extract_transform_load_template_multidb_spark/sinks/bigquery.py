"""BigQuery sink spec (reference W4/W5/W6) for the public
spark-bigquery-connector.

The reference loads pandas frames with ``LoadJobConfig(write_disposition=
"WRITE_TRUNCATE"|"WRITE_APPEND")`` (``Template-to-BigQuery/
MySQL-to-BigQuery-Method-1.py:76-79``, ``...-Method-2.py:94-97``). On
Spark the equivalent is ``df.write.format("bigquery")`` with a SaveMode —
the open-source connector (`com.google.cloud.spark:spark-bigquery`) maps
``overwrite`` → WRITE_TRUNCATE and ``append`` → WRITE_APPEND; the
``writeDisposition`` option may also be passed explicitly and then takes
precedence over the mode-derived one. The connector jar is not in this
container, so ``write`` raises a clear error if the format is missing;
option construction — the part the reference semantics live in — is fully
testable.

Retention delete (W6, ``DELETE ... WHERE date_trans < ...`` before an
append — ``MySQL-to-BigQuery-Method-2.py:75-78``) is a server-side
statement: render it with :func:`retention_delete_sql` and run it through
the BigQuery client/JDBC, exactly like the MySQL path in
``sinks.jdbc_upsert.execute_sink_sql``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_DISPOSITIONS = ("WRITE_TRUNCATE", "WRITE_APPEND", "WRITE_EMPTY")
_MODE_TO_DISPOSITION = {"overwrite": "WRITE_TRUNCATE", "append": "WRITE_APPEND"}


@dataclass
class BigQuerySink:
    """``table`` is ``dataset.table`` (reference: "your_dataset.your_table");
    ``temp_gcs_bucket`` is required by the connector's indirect write path,
    ``direct`` uses the BigQuery Storage Write API instead (no bucket)."""

    table: str
    temp_gcs_bucket: str | None = None
    direct: bool = False
    write_disposition: str | None = None  # explicit override of the mode map
    options: dict[str, str] = field(default_factory=dict)

    def writer_options(self, mode: str) -> dict[str, str]:
        """The exact option set handed to ``df.write.format("bigquery")``."""
        if mode not in _MODE_TO_DISPOSITION:
            raise ValueError(
                f"mode {mode!r} not supported; use one of "
                f"{tuple(_MODE_TO_DISPOSITION)}"
            )
        disposition = self.write_disposition or _MODE_TO_DISPOSITION[mode]
        if disposition not in _DISPOSITIONS:
            raise ValueError(
                f"writeDisposition {disposition!r} invalid; "
                f"one of {_DISPOSITIONS}"
            )
        opts = {"table": self.table, "writeDisposition": disposition}
        if self.direct:
            opts["writeMethod"] = "direct"
        elif self.temp_gcs_bucket:
            opts["temporaryGcsBucket"] = self.temp_gcs_bucket
        opts.update(self.options)
        return opts

    def write(self, df: DataFrame, mode: str = "append") -> None:
        writer = df.write.format("bigquery").mode(mode)
        for k, v in self.writer_options(mode).items():
            writer = writer.option(k, v)
        writer.save()


def retention_delete_sql(table: str, col: str, interval_days: int) -> str:
    """W6 retention delete in BigQuery SQL — the reference's pre-append
    cleanup (``MySQL-to-BigQuery-Method-2.py:75-78``), rendered for
    ``CURRENT_DATE()`` arithmetic."""
    if not str(interval_days).isdigit():
        raise ValueError("interval_days must be a non-negative integer")
    return (
        f"DELETE FROM `{table}` WHERE {col} < "
        f"DATE_SUB(CURRENT_DATE(), INTERVAL {interval_days} DAY)"
    )
