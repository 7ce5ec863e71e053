"""Write semantics (SURVEY.md §2.3) — the product core of the reference.

Four load strategies, each preserved exactly and tested via the run-twice
idempotency matrix:

- append            (W1/W5: blind bulk append)
- overwrite         (W4: truncate-and-load)
- retention_append  (W3+W5: delete rows older than the window, then append —
                     reference semantics, NOT idempotent by design)
- window_overwrite  (W7: delete the recent window then append its
                     re-extracted contents — idempotent, recommended)
- upsert            (W2: key-collision update, JDBC ON DUPLICATE KEY /
                     ON CONFLICT, batched per partition)
"""

from extract_transform_load_template_multidb_spark.sinks.parquet_sink import (
    ParquetSink,
)
from extract_transform_load_template_multidb_spark.sinks.jdbc_upsert import (
    JdbcUpsertWriter,
    upsert_sql,
)
from extract_transform_load_template_multidb_spark.sinks.bigquery import (
    BigQuerySink,
    retention_delete_sql,
)

__all__ = [
    "ParquetSink",
    "JdbcUpsertWriter",
    "upsert_sql",
    "BigQuerySink",
    "retention_delete_sql",
]
