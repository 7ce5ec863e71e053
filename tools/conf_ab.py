"""A/B a set of session configs over a query subset (measurement-only).

Usage: python tools/conf_ab.py '<json-conf-dict>' name [name ...]

Builds ONE session with the given extra conf (so run one variant per
process), warms up like bench.py, then times each query build+count
min-of-3 and prints one JSON line. Never used by bench.py or the driver
contract; exists to adjudicate config candidates before they are baked
into session.py defaults.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from extract_transform_load_template_multidb_spark.queries import all_queries
from extract_transform_load_template_multidb_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    conf = json.loads(sys.argv[1])
    names = sys.argv[2:]
    repeats = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "3"))
    qs = all_queries()
    spark = get_spark(app_name="etl-multidb-conf-ab", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    qs["q1_pricing_summary"](spark, sf_dir).count()
    out: dict[str, float] = {}
    for name in names:
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 4))
        out[name] = min(runs)
    print(
        json.dumps(
            {"conf": conf, "total": round(sum(out.values()), 3), "queries": out},
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
