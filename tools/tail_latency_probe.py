"""Round-12 measurement: where does the 526-query tail's fixed cost go?

For a sample of tail queries, splits one bench-protocol repeat into
  build   — qs[name](spark, sf_dir) (python + py4j + eager analysis)
  opt     — queryExecution().optimizedPlan() (analysis+optimization)
  exec    — .count() (physical planning, codegen, AQE jobs, tasks)
and counts the Spark jobs the action ran. Also A/Bs the round-12 driver-
latency caches (catalog._TABLE_CACHE / session._CONF_APPLIED) by clearing
them before every build in the "cold" arm — i.e. the round-11 behavior —
inside ONE warm session, interleaved. Measurement-only tool: never
imported by bench.py or the driver contract.

Usage: python tools/tail_latency_probe.py [n_queries] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from extract_transform_load_template_multidb_spark import catalog, session
from extract_transform_load_template_multidb_spark.queries import all_queries
from extract_transform_load_template_multidb_spark.session import get_spark


def main() -> None:
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)["queries"]
    # Tail = everything under 1.2 s merged-min; stratified sample by rank.
    tail = sorted(
        (n for n, v in detail.items() if v < 1.2), key=detail.get
    )
    step = max(1, len(tail) // n_sample)
    names = tail[:: step][:n_sample]

    qs = all_queries()
    spark = get_spark(app_name="r12-tail-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs["q1_pricing_summary"](spark, sf_dir).count()

    def one(name: str, cold: bool) -> dict:
        if cold:
            catalog._TABLE_CACHE.clear()
            session._CONF_APPLIED.clear()
        j0 = int(str(sc._jsc.sc().dagScheduler().nextJobId()))
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df._jdf.queryExecution().optimizedPlan()
        t2 = time.perf_counter()
        df.count()
        t3 = time.perf_counter()
        j1 = int(str(sc._jsc.sc().dagScheduler().nextJobId()))
        return {
            "build": round(t1 - t0, 4),
            "opt": round(t2 - t1, 4),
            "exec": round(t3 - t2, 4),
            "total": round(t3 - t0, 4),
            "jobs": j1 - j0,
        }

    out = {}
    for name in names:
        if name not in qs:
            continue
        rows = {"cold": [], "warm": []}
        for _ in range(repeats):
            rows["cold"].append(one(name, cold=True))
            rows["warm"].append(one(name, cold=False))
        best = {
            arm: min(rows[arm], key=lambda r: r["total"]) for arm in rows
        }
        out[name] = best
        print(json.dumps({"name": name, **{a: best[a] for a in best}}),
              flush=True)

    tot = {
        arm: round(sum(v[arm]["total"] for v in out.values()), 3)
        for arm in ("cold", "warm")
    }
    phases = {
        arm: {
            ph: round(sum(v[arm][ph] for v in out.values()), 3)
            for ph in ("build", "opt", "exec")
        }
        for arm in ("cold", "warm")
    }
    jobs = {arm: sum(v[arm]["jobs"] for v in out.values()) for arm in
            ("cold", "warm")}
    print(json.dumps({"n": len(out), "totals": tot, "phases": phases,
                      "jobs": jobs}), flush=True)


if __name__ == "__main__":
    main()
