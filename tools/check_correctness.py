"""Local mimic of the driver's correctness gate, with per-query timing.

Runs every registered query on Spark at $SPARK_GRAFT_SF_DIR (default
sf0.01) and its DuckDB oracle side-by-side; compares row count, sorted
schema, and an order-insensitive value hash the way the driver does
(columns sorted by name, rows sorted, float values rounded). Prints one
JSON line per query with timings so slow spots are visible, and a final
summary line.

Usage: python tools/check_correctness.py [name ...]
       python tools/check_correctness.py --emit CORRECTNESS_LOCAL_r07.json \
           --round 7        # full run + committed audit artifact

With --emit, the per-query records are also written as one JSON file in
the CORRECTNESS_LOCAL_r{N}.json format, including the cumulative
``driver_green_ever`` map (query name → rounds in which the DRIVER's own
CORRECTNESS_r{N}.json recorded it green) so union driver coverage is
auditable from one place without reading every round file.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from extract_transform_load_template_multidb_spark.queries import (
    all_oracles,
    all_queries,
)
from extract_transform_load_template_multidb_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "mM":
            # Stringify datetimes: Spark/DuckDB frames disagree on the
            # storage unit (us vs ns), which the driver's canonicalizer
            # tolerates but a raw byte-hash would not. Keep numeric dtypes
            # raw — int64-vs-float64 drift (the DuckDB HUGEINT artifact)
            # must FAIL here exactly as it does in the driver. Object
            # columns stay RAW too: the driver sorts raw values, so a
            # list/struct cell must crash here exactly as it crashed the
            # round-6 driver (stringifying first masked that defect).
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    for c in df.columns:
        if df[c].dtype == object:
            # Post-sort stringify for hash stability (None vs NaN,
            # Decimal vs float artifacts) — mirrors driver behavior of
            # sorting raw then hashing a canonical text form.
            df[c] = df[c].astype(str)
    # Dtype-KIND signature folded into the hash: pandas hashes int64 0
    # and float64 0.0 to the same value (shared zero bit pattern), so a
    # DuckDB HUGEINT→float64 promotion against Spark's int64 passed this
    # gate while the driver's canonical-text hash (which renders `0` vs
    # `0.0`) went red (round-8 dq_completeness_matrix). Width is NOT
    # part of the signature — int32 vs int64 both render `0` in text —
    # only the int/float/bool/other family is.
    fam = {"i": "i", "u": "i", "f": "f", "b": "b"}
    kinds = "".join(fam.get(df[c].dtype.kind, "o") for c in df.columns)
    return f"{pd.util.hash_pandas_object(df, index=False).sum()}|{kinds}"


def _driver_green_ever() -> dict[str, list[int]]:
    """Union of driver-green names across every committed
    CORRECTNESS_r{N}.json (name → list of rounds with a green row)."""
    green: dict[str, list[int]] = {}
    for rnd in range(1, 100):
        path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            # Green means the VALUE hash matched. The rows_match-and-no-err
            # fallback applies only to rounds whose records predate the
            # hash_match key — a record that carries hash_match: false had
            # divergent values and must not count as driver-green.
            if "hash_match" in rec:
                ok = bool(rec.get("hash_match"))
            else:
                ok = bool(rec.get("rows_match")) and rec.get("err") is None
            if ok:
                green.setdefault(name, []).append(rnd)
    return dict(sorted(green.items()))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    emit_path = None
    round_no = None
    usage = (
        "usage: check_correctness.py [--emit OUT.json] [--round N] [name ...]"
    )
    if "--emit" in args:
        i = args.index("--emit")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            sys.exit(f"--emit needs a file path operand\n{usage}")
        emit_path = args[i + 1]
        del args[i : i + 2]
    if "--round" in args:
        i = args.index("--round")
        if i + 1 >= len(args):
            sys.exit(f"--round needs an integer operand\n{usage}")
        try:
            round_no = int(args[i + 1])
        except ValueError:
            sys.exit(f"--round operand must be an integer: {args[i+1]!r}\n{usage}")
        del args[i : i + 2]
    only = set(args)
    spark = get_spark(app_name="correctness-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = all_queries(), all_oracles()
    n_pass = n_fail = 0
    records: dict[str, dict] = {}
    t_start = time.perf_counter()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {"q": name}
        try:
            t0 = time.perf_counter()
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_s"] = round(time.perf_counter() - t0, 2)
            rec["rows"] = len(sdf)
            if name not in oracles:
                rec["status"] = "no_oracle"
                print(json.dumps(rec), flush=True)
                continue
            t0 = time.perf_counter()
            odf = con.execute(oracles[name]).df()
            rec["oracle_s"] = round(time.perf_counter() - t0, 2)
            ok_rows = len(sdf) == len(odf)
            ok_schema = sorted(sdf.columns) == sorted(odf.columns)
            ok_hash = ok_rows and ok_schema and _canon(sdf) == _canon(odf)
            rec["status"] = "pass" if ok_hash else "FAIL"
            if not ok_hash:
                rec["rows_match"] = ok_rows
                rec["schema_match"] = ok_schema
                rec["oracle_rows"] = len(odf)
        except Exception as e:  # noqa: BLE001
            rec["status"] = "ERROR"
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
        n_pass += rec["status"] == "pass"
        n_fail += rec["status"] in ("FAIL", "ERROR")
        records[name] = {k: v for k, v in rec.items() if k != "q"}
        print(json.dumps(rec), flush=True)
    print(
        json.dumps(
            {
                "summary": True,
                "pass": n_pass,
                "fail": n_fail,
                "total_s": round(time.perf_counter() - t_start, 1),
            }
        )
    )
    if emit_path:
        out = {
            "round": round_no,
            "sf": sf_dir.rsplit("sf", 1)[-1],
            "tool": "tools/check_correctness.py",
            "pass": n_pass,
            "fail": n_fail,
            "total": len(records),
            "driver_green_ever": _driver_green_ever(),
            "queries": records,
        }
        with open(emit_path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {emit_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
