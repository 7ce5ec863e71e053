"""Salted aggregation/join equal their unsalted plans on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from extract_transform_load_template_multidb_spark.operators import skew


def _skewed(spark):
    # one hot key (0) with 5k rows, 50 cold keys with ~100 each
    hot = spark.range(5000).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(5000, 10000).select(
        (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"])
        for r in skew.salted_agg(
            df,
            keys=["k"],
            partial_aggs=[
                F.sum("v").alias("ps"),
                F.count(F.lit(1)).alias("pn"),
            ],
            merge_aggs=[
                F.sum("ps").alias("s"),
                F.sum("pn").alias("n"),
            ],
            salt_from=["v"],
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.range(51).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = sorted(
        (r["k"], r["v"], r["w"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["w"])
        for r in skew.salted_broadcast_left(
            left, right, key="k", n_salts=8, salt_from=["v"]
        ).collect()
    )
    assert salted == plain


def test_salt_is_deterministic(spark):
    df = _skewed(spark).withColumn("s1", skew.stable_salt(["v"], 8))
    df2 = _skewed(spark).withColumn("s1", skew.stable_salt(["v"], 8))
    assert df.exceptAll(df2).count() == 0
    assert df.select(F.max("s1"), F.min("s1")).collect()[0] == (7, 0)


def test_lsh_bucket_cap_is_subset(spark, sf_dir):
    """With a bucket cap, candidate pairs are a subset of the uncapped set
    (recall-oriented approximation, never new pairs)."""
    import os

    from pyspark.sql import functions as F

    from extract_transform_load_template_multidb_spark.operators import (
        dedup as dd,
    )

    doc = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    full = {
        (r["id_a"], r["id_b"])
        for r in dd.near_dup_pairs(doc, threshold=0.5)
        .select("id_a", "id_b")
        .collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in dd.near_dup_pairs(doc, threshold=0.5, max_bucket_size=8)
        .select("id_a", "id_b")
        .collect()
    }
    assert capped <= full
    assert len(capped) < len(full)  # the fixture HAS oversized buckets


def test_ngram_posting_cap_lowers_jaccard_only(spark, sf_dir):
    """Stop-shingle cap: reported Jaccard is a lower bound of the exact
    value and no new pairs appear."""
    import os

    from extract_transform_load_template_multidb_spark.operators import (
        dedup as dd,
    )

    doc = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(doc, threshold=0.05).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(
            doc, threshold=0.05, max_posting_list=3
        ).collect()
    }
    assert set(capped) <= set(exact)
    for pair, j in capped.items():
        assert j <= exact[pair] + 1e-12


def test_near_dup_empty_text_copies_never_pair(spark):
    """Exact copies of a zero-token text have no MinHash signature, hence
    no bands — they must NOT appear as near-dup pairs (parity with the
    uncollapsed pipeline and the SQL oracle); normal duplicate cliques
    still pair with Jaccard exactly 1.0."""
    from pyspark.sql import functions as F

    from extract_transform_load_template_multidb_spark.operators import (
        dedup as dd,
    )

    docs = spark.createDataFrame(
        [
            (1, "... !!! ..."),   # tokenizes to nothing
            (2, "... !!! ..."),   # identical empty-token copy
            (3, "alpha beta gamma delta"),
            (4, "alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.near_dup_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) not in got
    assert got[(3, 4)] == 1.0
