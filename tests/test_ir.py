"""Unit tests for the IR / LM operators and the event-series analytics.

Hand-computed references on tiny frames (the sf0.001 oracle runs live in
test_queries_oracle.py; these pin the operator semantics directly).
"""

from __future__ import annotations

import math

import pytest

from extract_transform_load_template_multidb_spark.operators import ir
from extract_transform_load_template_multidb_spark.operators import (
    timeseries as tsops,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )


def test_tfidf_hand_computed(docs):
    out = {
        (r.doc_id, r.term): r
        for r in ir.tfidf_top_terms(docs, k=3).collect()
    }
    # N=3; df: apple 1, banana 2, cherry 2, durian 1.
    idf1 = round(math.log(4.0 / 2.0), 6)  # df=1
    idf2 = round(math.log(4.0 / 3.0), 6)  # df=2
    r = out[(1, "apple")]
    assert (r.tf, r.df) == (2, 1) and r.tfidf == pytest.approx(2 * idf1)
    assert out[(3, "durian")].tfidf == pytest.approx(idf1)
    assert out[(3, "cherry")].tfidf == pytest.approx(3 * idf2)
    # rank is dense per doc starting at 1, ties broken by term text
    assert out[(1, "apple")].rank == 1
    assert out[(1, "banana")].rank == 2


def test_tfidf_topk_truncates(docs):
    rows = ir.tfidf_top_terms(docs, k=1).collect()
    assert len(rows) == 3  # one term per doc
    assert {r.doc_id for r in rows} == {1, 2, 3}


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "query query join filler filler"),
            (2, "query filler filler filler filler"),
            (3, "filler filler filler filler filler"),
        ],
        ["doc_id", "text"],
    )
    rows = ir.bm25_scores(docs, ("query", "join")).collect()
    by_id = {r.doc_id: r.score for r in rows}
    # doc 3 has no query terms → absent; doc 1 beats doc 2.
    assert set(by_id) == {1, 2}
    assert by_id[1] > by_id[2] > 0
    # Every dl is 5, avgdl 5 → the dl normalizer is exactly 1; verify
    # doc 2's single-term score against the closed form.
    n, df_q = 3, 2
    idf_q = round(math.log(1.0 + (n - df_q + 0.5) / (df_q + 0.5)), 6)
    expected = idf_q * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 5 / 5.0))
    assert by_id[2] == pytest.approx(expected, abs=1e-6)


def test_unigram_logprob_uniform_corpus(spark):
    # 4 tokens total, each distinct → every token has p = 1/4.
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd")], ["doc_id", "text"]
    )
    rows = ir.unigram_logprob(docs).collect()
    lp = round(math.log(0.25), 6)
    for r in rows:
        assert r.n_tokens == 2
        assert r.avg_logprob == pytest.approx(lp, abs=1e-6)


def test_unigram_logprob_common_vs_rare(spark):
    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "xylophone")], ["doc_id", "text"]
    )
    by_id = {
        r.doc_id: r.avg_logprob
        for r in ir.unigram_logprob(docs).collect()
    }
    # 'the' has p=4/5, 'xylophone' 1/5 → doc 1 scores higher (more typical)
    assert by_id[1] > by_id[2]


def test_rolling_zscore_flags_spike(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: gentle noise then a spike at the end
    vals = [10.0, 11.0, 10.5, 9.5, 10.2, 9.8, 10.1, 10.3, 9.9, 10.0,
            10.4, 9.6, 100.0]
    for i, v in enumerate(vals):
        rows.append((i, 1, base + dt.timedelta(minutes=i), v))
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = tsops.rolling_zscore_anomalies(
        df, "user_id", "ts", "value", "event_id",
        lookback=20, min_obs=10, threshold=2.5,
    ).collect()
    assert [r.event_id for r in out] == [12]
    assert out[0].z > 10
    # baseline excludes the spike itself (strictly-historical frame)
    assert out[0].base_mean == pytest.approx(
        sum(vals[:12]) / 12, abs=1e-6
    )


def test_rolling_zscore_needs_min_obs(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, base + dt.timedelta(minutes=i), v)
        for i, v in enumerate([1.0, 2.0, 1.5, 100.0])
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = tsops.rolling_zscore_anomalies(
        df, "user_id", "ts", "value", "event_id", min_obs=10
    ).collect()
    assert out == []  # only 3 baseline points before the spike


def test_cohort_retention_hand_computed(spark):
    import datetime as dt

    def t(day):
        return dt.datetime(2024, 1, day)

    # weeks: Jan 1 (Mon) / Jan 8 / Jan 15
    df = spark.createDataFrame(
        [
            (1, t(2)), (1, t(9)), (1, t(16)),   # active weeks 0,1,2
            (2, t(3)), (2, t(17)),              # active weeks 0,2
            (3, t(10)),                          # joins in week 1
        ],
        ["user_id", "ts"],
    )
    out = {
        (str(r.cohort_start), r.period_offset): r.n_active
        for r in tsops.cohort_retention(df, "user_id", "ts").collect()
    }
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-01", 2)] == 2
    assert out[("2024-01-08", 0)] == 1
    assert ("2024-01-08", 1) not in out


def test_duplicated_spans_hand_computed(spark):
    from extract_transform_load_template_multidb_spark.operators import (
        dedup as dd,
    )

    shared = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [
            (1, f"alpha {shared} beta"),
            (2, f"gamma delta {shared}"),
            (3, "epsilon zeta eta theta iota kappa lamda mu nu xi"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in dd.duplicated_spans(docs, k=8, min_docs=2).collect()
    }
    # doc 3 shares nothing
    assert set(out) == {1, 2}
    # doc 1: tokens alpha(0) one(1)..ten(10) beta(11); shared 8-grams start
    # at positions 1,2,3 → merged span [1, 10]
    assert (out[1].span_start, out[1].span_end) == (1, 10)
    assert out[1].n_dup_shingles == 3
    # doc 2: gamma(0) delta(1) one(2)..ten(11) → span [2, 11]
    assert (out[2].span_start, out[2].span_end) == (2, 11)


def test_duplicated_spans_islands_split(spark):
    from extract_transform_load_template_multidb_spark.operators import (
        dedup as dd,
    )

    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    b = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = spark.createDataFrame(
        [
            (1, f"{a} gapword1 gapword2 {b}"),
            (2, a),
            (3, b),
        ],
        ["doc_id", "text"],
    )
    rows = sorted(
        dd.duplicated_spans(docs, k=8, min_docs=2)
        .filter("doc_id = 1")
        .collect(),
        key=lambda r: r.span_start,
    )
    # two separate islands, split by the gap words
    assert [(r.span_start, r.span_end) for r in rows] == [(0, 7), (10, 17)]


def test_pagerank_star_graph(spark):
    from extract_transform_load_template_multidb_spark.operators import (
        graph as gr,
    )

    # undirected star: hub 0 — leaves 1..4, plus isolated node 5
    pairs = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["node"])
    ranks = {
        r.node: r["rank"]
        for r in gr.pagerank(edges, nodes, iterations=3).collect()
    }
    # python reference: same recurrence, no quantization (tolerance covers
    # the DECIMAL(38,12) rounding)
    n, d = 6, 0.85
    deg = {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}
    adj_in = {0: [1, 2, 3, 4], 1: [0], 2: [0], 3: [0], 4: [0], 5: []}
    r = {i: 1 / n for i in range(6)}
    for _ in range(3):
        r = {
            v: (1 - d) / n + d * sum(r[u] / deg[u] for u in adj_in[v])
            for v in range(6)
        }
    for v in range(6):
        assert ranks[v] == pytest.approx(r[v], abs=1e-9), v
    # hub dominates, isolated node sits at the damping floor trajectory
    assert ranks[0] > ranks[1] > ranks[5]
