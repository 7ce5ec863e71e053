"""Run one query and dump the executed (final-AQE) plan node metrics from
the SQL tab REST endpoint — definitive per-operator attribution
(rows output, time in node metrics). Measurement-only tool.

Usage: python tools/sql_metrics.py <query_name> [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from extract_transform_load_template_multidb_spark.queries import all_queries
from extract_transform_load_template_multidb_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    qs = all_queries()
    spark = get_spark(
        app_name="etl-multidb-sqlmetrics",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs["q1_pricing_summary"](spark, sf_dir).count()
    for i in range(repeats):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.count()
        print(f"repeat {i}: {time.perf_counter() - t0:.2f}s", flush=True)
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/sql?length=200", timeout=20
    ) as r:
        execs = json.load(r)
    ex = max(execs, key=lambda e: e["id"])
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/sql/{ex['id']}?details=true&planDescription=true",
        timeout=20,
    ) as r:
        detail = json.load(r)
    print("== duration(ms):", detail.get("duration"))
    for node in detail.get("nodes", []):
        interesting = {
            m["name"]: m["value"]
            for m in node.get("metrics", [])
            if any(
                k in m["name"]
                for k in (
                    "number of output rows",
                    "time total",
                    "shuffle bytes written",
                    "records read",
                    "data size",
                    "time to build",
                    "time in aggregation",
                )
            )
        }
        if interesting:
            print(f"node {node['nodeId']:3d} {node['nodeName'][:60]:60s} {interesting}")
    with open("/tmp/last_plan.txt", "w") as fh:
        fh.write(detail.get("planDescription", ""))
    print("plan written to /tmp/last_plan.txt")


if __name__ == "__main__":
    main()
