"""Scale-up probe: measure how the flagship dedup path grows with data.

The correctness gates prove the operators RIGHT at sf0.01/sf0.1; this
probe measures how they COST as the corpus multiplies — the evidence
behind the "would this survive 100x?" design claims. It builds k x
`documents` by unioning k deterministic replicas whose every token is
salted with the replica id (`w` -> `w<k>`), so shingles never match
ACROSS replicas and each replica contributes the original corpus's
near-dup structure: the true pair/cluster counts are exactly k x the
base counts, and a scale-correct plan should grow close to linearly
(log-log slope ~= 1). A quadratic candidate generator (all-pairs,
unbanded LSH, skew-blind bucket expansion) would show slope ~= 2 and
k^2 pair counts instead.

Usage: python tools/scaling_probe.py [k ...]   (default 1 2 4 8)
Writes SCALING_r{N}.json (env SPARK_GRAFT_ROUND, default 8) and prints
one JSON line per k plus a summary with the fitted log-log slope.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from extract_transform_load_template_multidb_spark.catalog import load_table
from extract_transform_load_template_multidb_spark.operators import dedup as dd
from extract_transform_load_template_multidb_spark.session import get_spark


def replicate_salted(docs, k: int):
    """k deterministic replicas; every token salted with the replica id
    so cross-replica shingles never collide (word-level suffix keeps the
    token-count/length distributions intact). Replica 0 is the original
    corpus unchanged."""
    parts = [docs.select("doc_id", "text")]
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    for r in range(1, k):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"), r"(\S+)", r"$1" + str(r)
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # Spread the union across the same partition count a k x scan would
    # have, so per-task volumes stay flat (what a real k x corpus gives).
    return out.repartition(32 * k)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "8")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    # Warm the JVM/codegen caches so k=1 isn't charged the spin-up cost.
    dd.near_dup_pairs(
        docs.limit(50), num_perm=8, rows_per_band=2, threshold=0.5
    ).count()
    results = {}
    for k in ks:
        corpus = replicate_salted(docs, k).localCheckpoint(eager=True)
        n_docs = corpus.count()
        best = None
        for _ in range(2):  # min-of-2: this host has wall-clock bursts
            t0 = time.perf_counter()
            pairs = dd.near_dup_pairs(
                corpus, num_perm=8, rows_per_band=2, threshold=0.5
            ).localCheckpoint(eager=True)
            n_pairs = pairs.count()
            t1 = time.perf_counter()
            comps = dd.connected_components(pairs)
            n_nodes = comps.count()
            t2 = time.perf_counter()
            rec = {
                "n_docs": n_docs,
                "n_pairs": n_pairs,
                "n_clustered_nodes": n_nodes,
                "pairgen_s": round(t1 - t0, 2),
                "closure_s": round(t2 - t1, 2),
                "total_s": round(t2 - t0, 2),
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        results[k] = best
        print(json.dumps({"k": k, **best}), flush=True)
        corpus.unpersist()

    # log-log slope of total_s vs k over the measured points (least
    # squares on (ln k, ln t)); 1.0 = linear, 2.0 = quadratic.
    pts = [(math.log(k), math.log(r["total_s"])) for k, r in results.items()]
    n = len(pts)
    slope = None
    if n >= 2:
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        sxx = sum((x - mx) ** 2 for x, _ in pts)
        sxy = sum((x - mx) * (y - my) for x, y in pts)
        slope = round(sxy / sxx, 3) if sxx else None
    # Pair counts are k x base in ground truth; the BANDED candidate
    # stage's recall varies a few % per replica because salted shingles
    # hash to different signatures, so allow 5% around linear.
    k0 = min(results)
    per_unit = results[k0]["n_pairs"] / k0
    pair_linear = all(
        abs(r["n_pairs"] - k * per_unit) <= 0.05 * k * per_unit
        for k, r in results.items()
    )
    out = {
        "probe": "dedup_near_dup_pairs+connected_components",
        "sf_dir": sf_dir,
        "results": {str(k): r for k, r in results.items()},
        "loglog_slope_total_s": slope,
        "pairs_exactly_linear": pair_linear,
        "notes": (
            "k salted replicas of documents (cross-replica shingles never "
            "match): ground-truth pairs/clusters are exactly k x base, so "
            "slope ~1 certifies the banded+skew-capped pipeline scales "
            "linearly in corpus size; slope ~2 would indict a quadratic "
            "candidate stage. Wall times are single-run on a noisy host - "
            "read the slope, not any one point."
        ),
    }
    path = f"SCALING_r{rnd.zfill(2)}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"summary": True, "slope": slope,
                      "pairs_exactly_linear": pair_linear, "file": path}))


if __name__ == "__main__":
    main()
