"""Print the physical plan of registered queries.

    python tools/explain_audit.py q1_pricing_summary dedup_minhash_lsh
    python tools/explain_audit.py --all            # every registered query

The one-command version of the plan review the engine's development loop
runs after every operator lands (`.explain("formatted")` until the plan is
the one you'd want at 100 TB); `tests/test_plans.py` pins the properties
that must never regress — this tool is for reading the rest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from extract_transform_load_template_multidb_spark.queries import all_queries
from extract_transform_load_template_multidb_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    qs = all_queries()
    names = list(qs) if "--all" in args else [a for a in args if a in qs]
    unknown = [a for a in args if a not in qs and a != "--all"]
    if unknown or not names:
        print(f"unknown or missing query names: {unknown or '(none given)'}")
        print("registered:", ", ".join(qs))
        raise SystemExit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="explain-audit", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        qs[name](spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
