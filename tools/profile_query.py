"""Per-query profiler: wall-time split into build/analyze/execute plus
per-stage attribution from the Spark UI REST API.

Usage: python tools/profile_query.py name [name ...]
       python tools/profile_query.py --top 25          # slowest from BENCH_DETAIL
       SPARK_GRAFT_PROFILE_REPEATS=3 python tools/profile_query.py q1_pricing_summary

For each query prints one JSON line:
  {"name": ..., "build_s": ..., "exec_s": [...], "stages": [
      {"desc": ..., "stage": id, "tasks": n, "run_ms": executorRunTime,
       "cpu_ms": executorCpuTime, "sh_r_mb": ..., "sh_w_mb": ...,
       "in_mb": ...}, ...]}

The session enables the UI (bench/tests keep it off) so stage metrics are
readable from http://localhost:<port>/api/v1; jobs are labeled per query
via setJobDescription so stages attribute cleanly. Measurement-only tool:
never used by bench.py or the driver contract.
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


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_PROFILE_REPEATS", "2"))
    names = sys.argv[1:]
    if names and names[0] == "--top":
        k = int(names[1]) if len(names) > 1 else 25
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            detail = json.load(fh)["queries"]
        names = sorted(detail, key=detail.get, reverse=True)[:k]
    qs = all_queries()
    spark = get_spark(
        app_name="etl-multidb-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # Warm up like bench.py does.
    qs["q1_pricing_summary"](spark, sf_dir).count()

    for name in names:
        if name not in qs:
            print(json.dumps({"name": name, "err": "unknown"}), flush=True)
            continue
        execs = []
        build_s = None
        jd = f"profile:{name}"
        for i in range(repeats):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            if i == 0:
                build_s = t1 - t0
            spark.sparkContext.setJobDescription(jd if i == repeats - 1 else None)
            df.count()
            spark.sparkContext.setJobDescription(None)
            execs.append(round(time.perf_counter() - t1, 4))
        # Attribute stages of the LAST repeat (codegen/footers warm).
        stage_rows = []
        try:
            jobs = [j for j in _api(base, "/jobs") if j.get("description") == jd]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            for sid in stage_ids:
                for att in _api(base, f"/stages/{sid}"):
                    stage_rows.append(
                        {
                            "stage": sid,
                            "name": att["name"].split("\n")[0][:80],
                            "tasks": att["numCompleteTasks"],
                            "run_ms": att["executorRunTime"],
                            "cpu_ms": round(
                                att.get("executorCpuTime", 0) / 1e6
                            ),
                            "sh_r_mb": round(
                                att.get("shuffleReadBytes", 0) / 1e6, 2
                            ),
                            "sh_w_mb": round(
                                att.get("shuffleWriteBytes", 0) / 1e6, 2
                            ),
                            "in_mb": round(att.get("inputBytes", 0) / 1e6, 2),
                            "out_rows": att.get("outputRecords", 0),
                        }
                    )
        except Exception as e:  # REST hiccups must not kill the sweep
            stage_rows = [{"err": str(e)[:120]}]
        print(
            json.dumps(
                {
                    "name": name,
                    "build_s": round(build_s, 4),
                    "exec_s": execs,
                    "n_stages": len(stage_rows),
                    "stages": sorted(
                        stage_rows,
                        key=lambda r: -r.get("run_ms", 0),
                    )[:12],
                },
                separators=(",", ":"),
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
