"""DuckDB baseline for the headline queries.

BASELINE.md's operational target: PySpark (local mode) within 2× of DuckDB
running the equivalent ``oracle_sql()`` on the same parquet. This script
measures that baseline — same fixture dir, same result sets — and prints
one JSON line shaped like ``bench.py``'s. Results are recorded in
``BENCH_BASELINE.json`` for the current fixtures.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from bench import HEADLINE
from extract_transform_load_template_multidb_spark.queries import all_oracles

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = all_oracles()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in oracles:
            continue
        t0 = time.perf_counter()
        con.execute(oracles[name]).fetchall()
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
