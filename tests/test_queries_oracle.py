"""Differential test: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 correctness gate (row count + schema +
order-insensitive values) at sf0.001 so regressions surface in `pytest`
before a round ends.
"""

from __future__ import annotations

import pytest

from extract_transform_load_template_multidb_spark.queries import (
    all_oracles,
    all_queries,
)
from tests.oracle_util import compare, duck_connection

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_runs_rows_only(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
