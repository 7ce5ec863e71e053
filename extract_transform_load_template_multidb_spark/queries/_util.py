"""Shared helpers for oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Exact, order-independent aggregation of doubles: route through
# DECIMAL(38,6). The fixture money/measure columns carry ≤2 true decimal
# digits, so any 2- or 3-factor product has ≤6 — every value lands exactly
# ON the scale-6 grid (never midway), making the double→decimal cast
# tie-free and identical across Spark and DuckDB. The decimal sum is then
# associative/exact and the final decimal→double cast bit-identical, so the
# value hash matches no matter how partitions combine. (Scale 4 was not
# enough: a triple product has 6 true decimals, and values sitting exactly
# at the 5th-decimal tie rounded differently per engine.)
DEC = "decimal(38,6)"


def dsum(col: Column, alias: str) -> Column:
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
