"""Skew-mitigation utilities for hot-key aggregations and joins.

AQE's skew-join splitting (on by default in :mod:`..session`) handles most
runtime skew; these helpers cover the two cases it cannot:

- :func:`salted_agg` — a single giant group (one reducer owns the hot key)
  is split across ``n_salts`` partial groups, aggregated, then re-combined.
  Works for any algebraic aggregate (sum/count/min/max — pass the partial
  and merge forms).
- :func:`salted_broadcast_left` — a hot-key equi-join where the right side
  is small-ish but the hot key's left rows overwhelm one task: replicate
  the right side ``n_salts`` times, scatter the left side across salts.
  (With a truly small right side just ``F.broadcast`` it; salting is for
  the in-between sizes where broadcast is too big and one shuffle
  partition would take the whole hot key.)

Both are deterministic: the salt derives from a stable hash of other
columns, not ``rand()``, so retries/speculative tasks produce identical
partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def stable_salt(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a row's columns."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salt_from: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then (keys).

    ``partial_aggs`` run per (key, salt); ``merge_aggs`` combine the
    partials per key and must reference the partial output columns. The
    first shuffle spreads a hot key over ``n_salts`` reducers; the second
    handles only ``n_salts`` rows per key.
    """
    salted = df.withColumn("__salt", stable_salt(salt_from, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: left scattered over salts, right
    replicated ``n_salts``× — each (key, salt) shuffle partition carries
    ~1/n of the hot key's rows. Output columns = left ∪ right (minus the
    duplicate key).
    """
    salt_cols = list(salt_from or left.columns)
    l_s = left.withColumn("__salt", stable_salt(salt_cols, n_salts))
    r_s = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    return l_s.join(r_s, [key, "__salt"]).drop("__salt")
