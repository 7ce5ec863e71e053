"""Incrementally extend BENCH_BASELINE.json to every HEADLINE query.

For each headline name missing from the committed baseline, the DuckDB
oracle is timed in a SEPARATE subprocess with a hard-KILL timeout (a
DuckDB process deep in a native query ignores SIGTERM — signals deliver
between bytecodes), at the same sf_dir bench.py uses. A query whose
oracle exceeds the timeout is recorded as null (DNF) with the reason in
the companion "notes" map — mirroring the committed
dedup_clusters_minhash entry.

Usage: python tools/update_baseline.py [--timeout 180] [--refresh name ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = r"""
import json, sys, time
import duckdb
sys.path.insert(0, %(repo)r)
from extract_transform_load_template_multidb_spark.queries import all_oracles
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(
        "CREATE VIEW " + t + " AS SELECT * FROM '%(sf_dir)s/" + t + ".parquet'"
    )
sql = all_oracles()[%(name)r]
t0 = time.perf_counter()
con.execute(sql).fetchall()
print(json.dumps({"s": round(time.perf_counter() - t0, 4)}))
"""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    timeout = 180
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = int(args[i + 1])
        del args[i : i + 2]
    refresh = set(args)

    from bench import HEADLINE
    from extract_transform_load_template_multidb_spark.queries import (
        all_oracles,
    )

    path = os.path.join(REPO, "BENCH_BASELINE.json")
    with open(path) as fh:
        baseline = json.load(fh)
    queries = baseline.setdefault("queries", {})
    # The committed artifact's legacy "notes" is a prose STRING (the
    # round-5 DNF explanation); keep it and use a separate per-query map.
    notes = baseline.setdefault("query_notes", {})
    oracles = all_oracles()
    todo = [
        n
        for n in HEADLINE
        if n in oracles and (n not in queries or n in refresh)
    ]
    print(f"{len(todo)} oracles to time (timeout {timeout}s)", file=sys.stderr)
    for k, name in enumerate(todo, 1):
        code = _CHILD % {"repo": REPO, "sf_dir": sf_dir, "name": name}
        t0 = time.time()
        try:
            out = subprocess.run(
                ["timeout", "-s", "KILL", str(timeout), sys.executable, "-c", code],
                capture_output=True,
                text=True,
            )
            if out.returncode == 0:
                secs = json.loads(out.stdout.strip().splitlines()[-1])["s"]
                queries[name] = secs
                notes.pop(name, None)
            else:
                queries[name] = None
                notes[name] = (
                    f"DNF: killed at {timeout}s"
                    if out.returncode in (124, 137, -9)
                    else f"oracle error rc={out.returncode}: "
                    + out.stderr.strip()[-200:]
                )
        except Exception as ex:  # noqa: BLE001
            queries[name] = None
            notes[name] = f"runner error: {ex}"
        print(
            f"[{k}/{len(todo)}] {name}: {queries[name]}"
            f" ({round(time.time()-t0,1)}s wall)",
            file=sys.stderr,
        )
    done = [v for v in queries.values() if v is not None]
    baseline["value"] = round(sum(done), 4)
    baseline["n_queries"] = len(queries)
    with open(path, "w") as fh:
        json.dump(baseline, fh, indent=1, sort_keys=True)
    print(f"wrote {path}: {len(queries)} entries", file=sys.stderr)


if __name__ == "__main__":
    main()
