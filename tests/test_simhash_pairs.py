"""SimHash pair generation: the pigeonhole losslessness guarantee and the
rare-ngram novelty score (round 5)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from extract_transform_load_template_multidb_spark.operators import dedup as dd
from extract_transform_load_template_multidb_spark.operators import text as tx

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
          "theta", "iota", "kappa"]

_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=12,
)


@given(texts=_texts)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_simhash_pairs_lossless_vs_bruteforce(spark, texts):
    """Band candidate generation must find EVERY pair within max_hamming
    (pigeonhole: d < n_bands), i.e. banded output == brute-force popcount
    over all fingerprint pairs."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fp = {r["doc_id"]: r["simhash"]
          for r in dd.simhash(df, bits=32).collect()}
    expected = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for a in fp
        for b in fp
        if a < b and bin(fp[a] ^ fp[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.simhash_pairs(
            df, bits=32, n_bands=4, max_hamming=3
        ).collect()
    }
    assert got == expected


def test_simhash_pairs_identical_texts_hamming_zero(spark):
    df = spark.createDataFrame(
        [(1, "same words here"), (2, "same words here"),
         (3, "totally different content now")],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dd.simhash_pairs(df).collect()}
    assert got.get((1, 2)) == 0


def test_rare_ngram_ratio_counts(spark):
    # "a b" appears in docs 1,2,3 (freq 3 ≤ 3 → rare at max_freq=3);
    # "b c" only in doc 1 (freq 1 → rare); with max_freq=2 "a b" is not.
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "a b"), (4, "x")],
        "doc_id long, text string",
    )
    r3 = {r["doc_id"]: r for r in tx.rare_ngram_ratio(df, max_freq=3).collect()}
    assert (r3[1]["n_ngrams"], r3[1]["n_rare"]) == (2, 2)
    assert r3[1]["rare_ratio"] == 1.0
    assert (r3[4]["n_ngrams"], r3[4]["n_rare"], r3[4]["rare_ratio"]) == (
        0, 0, 0.0)
    r2 = {r["doc_id"]: r for r in tx.rare_ngram_ratio(df, max_freq=2).collect()}
    assert (r2[1]["n_ngrams"], r2[1]["n_rare"]) == (2, 1)
    assert r2[1]["rare_ratio"] == 0.5
    assert (r2[2]["n_ngrams"], r2[2]["n_rare"]) == (1, 0)


def test_incremental_near_dups_cross_set_only(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "unrelated corpus content")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (11, "alpha beta gamma delta"),
         (12, "nothing matches this")],
        "doc_id long, text string",
    )
    got = {
        (r["delta_id"], r["corpus_id"]): r["jaccard"]
        for r in dd.incremental_near_dups(
            corpus, delta, threshold=0.5
        ).collect()
    }
    # both identical delta docs match corpus doc 1; the 10↔11 within-delta
    # pair is out of scope by design
    assert got == {(10, 1): 1.0, (11, 1): 1.0}
