"""Structured Streaming surface.

The reference is strictly batch (``schedule_interval='@daily'``, reference
``Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:25``); its Method-2
30-day rolling window is a *batch* incremental pattern. This package
re-expresses that pattern on Spark Structured Streaming — the natural
scale-up when "daily batch" becomes "continuous arrival" — plus the
windowed/stateful operators a streaming engine owes its users:

- :mod:`.windows` — tumbling / sliding / session window aggregations,
  written against a plain ``DataFrame`` so one builder serves batch and
  ``readStream`` identically (the driver's oracle checks run them in batch
  mode; ``tests/test_streaming.py`` runs the same builders under
  ``Trigger.AvailableNow`` and asserts stream == batch).
- :mod:`.incremental` — file-stream readers and the streaming analogue of
  the reference's Method-2 window refresh (idempotent ``foreachBatch``
  overwrite), plus watermarked streaming dedup.
- :mod:`.stateful` — custom stateful processing via
  ``applyInPandasWithState`` (sessionization with explicit timeout).
"""

from extract_transform_load_template_multidb_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_counts,
    tumbling_counts,
)
