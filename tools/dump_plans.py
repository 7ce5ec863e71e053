"""Dump .explain('formatted') for named queries to files (judge evidence).

Usage: SPARK_GRAFT_PLAN_DIR=plans/r11 SPARK_GRAFT_PLAN_SUFFIX=_before \
           python tools/dump_plans.py name [name ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from extract_transform_load_template_multidb_spark.queries import all_queries
from extract_transform_load_template_multidb_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "plans/r11")
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "")
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    spark = get_spark(app_name="etl-multidb-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in sys.argv[1:]:
        df = qs[name](spark, sf_dir)
        qe = df._jdf.queryExecution()
        s = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(s)
        print(path, flush=True)


if __name__ == "__main__":
    main()
