"""Round-12 interleaved A/B: old .rdd-probing _fan_out vs the stats gate,
and the recall audit's anti-join vs subtraction — min-of-N per arm, one
warm session, arms alternated so host-noise bursts hit both. Measurement
only; never imported by bench.py or the driver contract.

Usage: python tools/ab_r12.py [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from extract_transform_load_template_multidb_spark import catalog
from extract_transform_load_template_multidb_spark.operators import dedup as dd
from extract_transform_load_template_multidb_spark.queries import all_queries
from extract_transform_load_template_multidb_spark.session import get_spark


def _fan_out_old(df):
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = all_queries()
    spark = get_spark(app_name="r12-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs["q1_pricing_summary"](spark, sf_dir).count()
    fan_new = dd._fan_out

    names = [
        "dedup_minhash_lsh",
        "dedup_incremental_minhash",
        "dedup_simhash_pairs",
        "dedup_clusters_minhash",
        "dedup_bbit_minhash_estimate",
        "dedup_lsh_recall_audit",
    ]

    def run(name: str, arm: str) -> float:
        dd._fan_out = _fan_out_old if arm == "old" else fan_new
        try:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            return round(time.perf_counter() - t0, 3)
        finally:
            dd._fan_out = fan_new

    # recall audit "old" shape: anti-join arm reconstructed inline.
    def recall_old() -> float:
        docs = catalog.load_table(spark, sf_dir, "documents")
        exact = dd.ngram_jaccard_pairs(
            docs, n=1, threshold=0.5, strategy="allpairs"
        ).select("id_a", "id_b")
        found = dd.near_dup_pairs(
            docs, num_perm=8, rows_per_band=2, threshold=0.5
        ).select("id_a", "id_b")
        missed = exact.join(found, ["id_a", "id_b"], "left_anti")
        ne = exact.agg(F.count(F.lit(1)).alias("n_exact"))
        nf = found.agg(F.count(F.lit(1)).alias("n_found"))
        nm = missed.agg(F.count(F.lit(1)).alias("n_missed"))
        out = ne.crossJoin(nf).crossJoin(nm).select(
            "n_exact", "n_found", "n_missed",
            (F.col("n_found").cast("double")
             / F.col("n_exact").cast("double")).alias("recall"),
        )
        t0 = time.perf_counter()
        out.count()
        return round(time.perf_counter() - t0, 3)

    res: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in names
    }
    res["dedup_lsh_recall_audit_oldshape"] = {"old": [], "new": []}
    for i in range(repeats):
        for n in names:
            if n == "dedup_lsh_recall_audit":
                res["dedup_lsh_recall_audit_oldshape"]["old"].append(
                    recall_old()
                )
                res[n]["new"].append(run(n, "new"))
            else:
                res[n]["old"].append(run(n, "old"))
                res[n]["new"].append(run(n, "new"))
        print(json.dumps({"sweep": i, **{
            k: v for k, v in res.items()
        }}), flush=True)

    for n, arms in res.items():
        mins = {a: (min(v) if v else None) for a, v in arms.items()}
        print(json.dumps({"name": n, "min": mins, "raw": arms}), flush=True)


if __name__ == "__main__":
    main()
