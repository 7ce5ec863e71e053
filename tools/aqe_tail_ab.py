"""Round-12 probe: does AQE's per-stage job materialization pay for
itself on tiny-input tail queries?  Arms, interleaved in one session:

  A  adaptive on (status quo)
  B  adaptive off, shuffle.partitions left at the session value
  C  adaptive off, shuffle.partitions=8

Per arm: min-of-N wall for build+count, plus job count. Measurement-only.
Usage: python tools/aqe_tail_ab.py [n_queries] [repeats]
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
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)["queries"]
    only = os.environ.get("AQE_AB_ONLY", "").strip()
    if only:
        names = [n for n in only.split(",") if n]
    else:
        tail = sorted(
            (n for n, v in detail.items() if v < 1.2), key=detail.get
        )
        step = max(1, len(tail) // n_sample)
        names = tail[::step][:n_sample]

    qs = all_queries()
    spark = get_spark(app_name="r12-aqe-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    qs["q1_pricing_summary"](spark, sf_dir).count()

    def set_arm(arm: str) -> None:
        if arm == "A":
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        elif arm == "B":
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        else:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.shuffle.partitions", "8")

    def one(name: str, arm: str) -> tuple[float, int]:
        set_arm(arm)
        try:
            j0 = int(str(sc._jsc.sc().dagScheduler().nextJobId()))
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            w = time.perf_counter() - t0
            j1 = int(str(sc._jsc.sc().dagScheduler().nextJobId()))
            return round(w, 4), j1 - j0
        finally:
            set_arm("A")

    res = {n: {a: [] for a in "ABC"} for n in names if n in qs}
    for _ in range(repeats):
        for n in res:
            for a in "ABC":
                res[n][a].append(one(n, a))
    tot = {a: 0.0 for a in "ABC"}
    jobs = {a: 0 for a in "ABC"}
    for n, arms in res.items():
        mins = {a: min(v)[0] for a, v in arms.items()}
        js = {a: min(v)[1] for a, v in arms.items()}
        for a in "ABC":
            tot[a] += mins[a]
            jobs[a] += js[a]
        print(json.dumps({"name": n, "min": mins, "jobs": js}), flush=True)
    print(json.dumps({"n": len(res), "totals": {a: round(tot[a], 3)
          for a in "ABC"}, "jobs": jobs}), flush=True)


if __name__ == "__main__":
    main()
