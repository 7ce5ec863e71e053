"""Named-query registry: the driver-facing catalog of every operator.

Each query is registered under a stable name with (a) a PySpark callable
``(spark, sf_dir) -> DataFrame`` and (b) — when SQL-expressible — an ANSI-SQL
oracle string that DuckDB runs on the same parquet tables. The pair is the
correctness contract from SURVEY.md §5: row count + schema + order-insensitive
value hash must match.

Float discipline: order-insensitive hashing means double aggregation must be
order-independent, so every SUM/AVG over doubles goes through
``DECIMAL(38,6)`` (exact, associative) and is cast back to double — both in
the Spark plan and in the oracle SQL — making the results bit-identical
regardless of partitioning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a named query and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(ORACLES)


_loaded = False

# The correctness driver checks queries in registry order with a bounded
# run budget (the round-1 run stopped mid-registry). Keep the most
# expensive query+oracle pairs LAST so a budget cut costs re-verification
# of already-proven heavy queries, never first evidence for cheap ones.
_CHECK_LAST = (
    "sim_cosine_topk_lsh",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_clusters_minhash",
    "dedup_minhash_lsh",
)


def _load_all() -> None:
    global _loaded
    if _loaded:
        return
    # Import for registration side effects.
    from extract_transform_load_template_multidb_spark.queries import (  # noqa: F401
        advanced,
        etl,
        governance,
        multimodal,
        pyfunc,
        relational,
        time_windows,
    )

    try:
        from extract_transform_load_template_multidb_spark.queries import (  # noqa: F401
            llm_data,
        )
    except ImportError:
        pass
    for name in _CHECK_LAST:
        if name in QUERIES:
            QUERIES[name] = QUERIES.pop(name)
        if name in ORACLES:
            ORACLES[name] = ORACLES.pop(name)
    _loaded = True
