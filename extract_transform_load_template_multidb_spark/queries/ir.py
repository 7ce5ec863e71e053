"""Corpus-statistics IR queries: TF-IDF, BM25, unigram-LM quality.

Beyond-reference extensions over the ``documents`` fixture (SURVEY.md §7
phase 4) built on :mod:`operators.ir`. Every ``ln`` is quantized to 6
decimals before arithmetic and every per-doc double sum is decimal-routed,
so the DuckDB oracles reproduce the scores bit-for-bit (see the operator
module docstring for the determinism discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from extract_transform_load_template_multidb_spark.catalog import load_table
from extract_transform_load_template_multidb_spark.operators import ir
from extract_transform_load_template_multidb_spark.queries import query

# Non-distinct token list per doc (matches operators.dedup.tokenize).
_SQL_TOKS = """
toks_list AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       w -> w <> '') AS t
    FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS w FROM toks_list)
"""

_TFIDF_ORACLE = f"""
WITH {_SQL_TOKS},
tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, w AS term, tf, df,
         tf * round(ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
  FROM tf JOIN dfreq USING (w) CROSS JOIN n
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= 3
"""


@query("text_tfidf_topterms", oracle=_TFIDF_ORACLE)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (term salience extraction)."""
    return ir.tfidf_top_terms(
        load_table(spark, sf_dir, "documents"), k=3
    )


_BM25_TERMS = ("table", "join", "query")

_BM25_ORACLE = f"""
WITH {_SQL_TOKS},
hits AS (SELECT * FROM tok WHERE w IN ('table', 'join', 'query')),
tf AS (SELECT doc_id, w, count(*) AS tf FROM hits GROUP BY doc_id, w),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
dl AS (SELECT doc_id, CAST(len(t) AS INT) AS dl FROM toks_list),
n AS (SELECT count(*) AS n FROM documents),
ad AS (SELECT CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) / COUNT(dl)
         AS avgdl FROM dl),
contrib AS (
  SELECT doc_id, dl,
         round(ln(1.0 + (n - df + 0.5) / (df + 0.5)), 6)
           * (tf * 2.2)
           / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl)) AS c
  FROM tf JOIN dfreq USING (w) JOIN dl USING (doc_id)
  CROSS JOIN n CROSS JOIN ad
)
SELECT doc_id, dl,
       CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE) AS score
FROM contrib GROUP BY doc_id, dl
ORDER BY score DESC, doc_id
LIMIT 50
"""


@query("text_bm25_search", oracle=_BM25_ORACLE)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-50 for the fixed query ('table', 'join', 'query')."""
    return ir.bm25_scores(
        load_table(spark, sf_dir, "documents"), _BM25_TERMS
    )


_UNIGRAM_ORACLE = f"""
WITH {_SQL_TOKS},
counts AS (SELECT w, count(*) AS ct FROM tok GROUP BY w),
total AS (SELECT count(*) AS total FROM tok),
lp AS (
  SELECT doc_id, round(ln(ct / total), 6) AS lp
  FROM tok JOIN counts USING (w) CROSS JOIN total
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(SUM(CAST(lp AS DECIMAL(38,6))) AS DOUBLE) / count(*)
         AS avg_logprob
FROM lp GROUP BY doc_id
"""


@query("text_unigram_logprob", oracle=_UNIGRAM_ORACLE)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM mean log-prob per doc (perplexity-style quality)."""
    return ir.unigram_logprob(load_table(spark, sf_dir, "documents"))


_BIGRAM_ORACLE = f"""
WITH {_SQL_TOKS},
bg AS (
    SELECT doc_id, t[i] AS w1, t[i+1] AS w2
    FROM toks_list, LATERAL (SELECT unnest(range(1, len(t))) AS i)
    WHERE len(t) >= 2
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w AS w1, count(*) AS c1 FROM tok GROUP BY w),
v AS (SELECT count(DISTINCT w) AS v FROM tok),
lp AS (
    SELECT b.doc_id, round(ln((c.c2 + 1) / (u.c1 + v.v)), 6) AS lp
    FROM bg b
    JOIN c2 c ON c.w1 = b.w1 AND c.w2 = b.w2
    JOIN c1 u ON u.w1 = b.w1
    CROSS JOIN v
)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(SUM(CAST(lp AS DECIMAL(38,6))) AS DOUBLE) / count(*)
         AS avg_logprob
FROM lp GROUP BY doc_id
"""


@query("text_bigram_logprob", oracle=_BIGRAM_ORACLE)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram-LM mean log-prob per doc (add-one smoothed): the
    word-ORDER quality signal — common words in uncommon order score low
    here while the unigram model cannot tell."""
    return ir.bigram_logprob(load_table(spark, sf_dir, "documents"))


_PRF_ORACLE = f"""
WITH {_SQL_TOKS},
hits AS (SELECT * FROM tok WHERE w IN ('table', 'join', 'query')),
tf AS (SELECT doc_id, w, count(*) AS tf FROM hits GROUP BY doc_id, w),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
dl AS (SELECT doc_id, CAST(len(t) AS INT) AS dl FROM toks_list),
n AS (SELECT count(*) AS n FROM documents),
ad AS (SELECT CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) / COUNT(dl)
         AS avgdl FROM dl),
contrib AS (
  SELECT doc_id, dl,
         round(ln(1.0 + (n - df + 0.5) / (df + 0.5)), 6)
           * (tf * 2.2)
           / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl)) AS c
  FROM tf JOIN dfreq USING (w) JOIN dl USING (doc_id)
  CROSS JOIN n CROSS JOIN ad
),
top10 AS (
  SELECT doc_id
  FROM (SELECT doc_id,
               CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE) AS score
        FROM contrib GROUP BY doc_id, dl)
  ORDER BY score DESC, doc_id LIMIT 10
),
fb_tf AS (
  SELECT t.w, CAST(COUNT(*) AS BIGINT) AS fb_occurrences,
         CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS fb_docs
  FROM tok t JOIN top10 USING (doc_id)
  WHERE t.w NOT IN ('table', 'join', 'query')
  GROUP BY t.w
),
cdf AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY w),
scored AS (
  SELECT f.w AS term, f.fb_occurrences, f.fb_docs,
         CAST(f.fb_occurrences AS DOUBLE)
           * round(ln((n.n + 1.0) / (cdf.df + 1.0)), 6) AS rocchio_score
  FROM fb_tf f JOIN cdf USING (w) CROSS JOIN n
)
SELECT term, fb_occurrences, fb_docs, rocchio_score
FROM scored
ORDER BY rocchio_score DESC, term
LIMIT 8
"""


@query("text_prf_query_expansion", oracle=_PRF_ORACLE)
def text_prf_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio-lite): run the
    BM25 query, take the top-10 documents as assumed-relevant, and rank
    their non-query terms by feedback-frequency × quantized IDF — the
    8 expansion terms a second retrieval round would add. Two bounded
    stages on top of the BM25 plan: the top-10 set broadcasts back onto
    the posting list, and term scoring is one word-keyed aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    top10 = (
        ir.bm25_scores(docs, _BM25_TERMS)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
        .select("doc_id")
    )
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda w: w != "",
            )
        ).alias("w"),
    )
    fb = (
        tok.join(F.broadcast(top10), "doc_id")
        .where(~F.col("w").isin(*_BM25_TERMS))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("fb_occurrences"),
            F.count_distinct("doc_id").cast("long").alias("fb_docs"),
        )
    )
    cdf = tok.groupBy("w").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    idf = F.round(
        F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
    )
    return (
        fb.join(cdf, "w")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("w").alias("term"),
            "fb_occurrences",
            "fb_docs",
            (F.col("fb_occurrences").cast("double") * idf).alias(
                "rocchio_score"
            ),
        )
        .orderBy(F.col("rocchio_score").desc(), "term")
        .limit(8)
    )


# Shared BM25 contribution pipeline (same constants as _BM25_ORACLE) —
# re-used by the fusion / ranking-quality oracles below.
_SQL_BM25_SCORES = f"""
{_SQL_TOKS},
hits AS (SELECT * FROM tok WHERE w IN ('table', 'join', 'query')),
tf AS (SELECT doc_id, w, count(*) AS tf FROM hits GROUP BY doc_id, w),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
dl AS (SELECT doc_id, CAST(len(t) AS INT) AS dl FROM toks_list),
n AS (SELECT count(*) AS n FROM documents),
ad AS (SELECT CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) / COUNT(dl)
         AS avgdl FROM dl),
contrib AS (
  SELECT doc_id, dl,
         round(ln(1.0 + (n - df + 0.5) / (df + 0.5)), 6)
           * (tf * 2.2)
           / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl)) AS c
  FROM tf JOIN dfreq USING (w) JOIN dl USING (doc_id)
  CROSS JOIN n CROSS JOIN ad
),
bm25 AS (
  SELECT doc_id, CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE) AS score
  FROM contrib GROUP BY doc_id
)
"""

_RRF_ORACLE = f"""
WITH {_SQL_BM25_SCORES},
lex AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS r_lex
  FROM bm25
  ORDER BY score DESC, doc_id LIMIT 50
),
top1 AS (SELECT doc_id FROM lex WHERE r_lex = 1),
elems AS (
    SELECT vec_id,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT)
               AS v,
           generate_subscripts(embedding, 1) - 1 AS d
    FROM embeddings
),
norms AS (SELECT vec_id, SUM(v * v) AS nsq FROM elems GROUP BY vec_id),
dots AS (
    SELECT b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
    FROM elems a
    JOIN top1 q ON a.vec_id = q.doc_id
    JOIN elems b ON b.d = a.d AND b.vec_id <> a.vec_id
    GROUP BY b.vec_id
),
sem AS (
    SELECT neighbor_id AS doc_id,
           CAST(row_number() OVER (
               ORDER BY CAST(dot AS DOUBLE)
                 / (sqrt(CAST(na.nsq AS DOUBLE))
                    * sqrt(CAST(nb.nsq AS DOUBLE))) DESC,
               neighbor_id) AS BIGINT) AS r_cos
    FROM dots
    JOIN norms na ON na.vec_id = (SELECT doc_id FROM top1)
    JOIN norms nb ON nb.vec_id = neighbor_id
    ORDER BY r_cos LIMIT 50
),
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         l.r_lex, s.r_cos,
         COALESCE(1.0 / (60 + l.r_lex), CAST(0 AS DOUBLE))
           + COALESCE(1.0 / (60 + s.r_cos), CAST(0 AS DOUBLE)) AS rrf
  FROM lex l FULL OUTER JOIN sem s ON s.doc_id = l.doc_id
)
SELECT doc_id, r_lex, r_cos, round(rrf, 6) AS rrf_score
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT 20
"""


@query("sim_rrf_fusion", oracle=_RRF_ORACLE)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (k=60) of a lexical and a semantic
    ranking — the standard hybrid-retrieval combiner (Cormack et al.):
    BM25 top-50 for the fixed term query on one side, exact-cosine
    top-50 against the BM25 top-1 document's embedding (pseudo-
    relevance semantic query; doc_id == vec_id in the fixture) on the
    other, fused by Σ 1/(60+rank) over a full outer join. Every stage
    is a bounded 50-row frame after the two scoring passes: BM25 is the
    shared posting-list aggregate, the cosine side broadcasts ONE query
    vector through the corpus (integer quantized dots, no float
    accumulation), and fusion is a 50×50 outer join — driver never
    materializes anything."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import Window
    from extract_transform_load_template_multidb_spark.operators import (
        similarity as sim,
    )

    # The 50-row lexical ranking feeds BOTH the semantic query seed and
    # the fusion join — cache it so the posting-list aggregate underneath
    # runs once (50 rows pinned, unpersisted by executor GC at job end).
    lex = (
        ir.bm25_scores(docs, _BM25_TERMS, limit=50)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "doc_id"))
            .cast("long")
            .alias("r_lex"),
        )
        .cache()
    )
    top1 = lex.where(F.col("r_lex") == 1).select("doc_id")
    qvec = emb.join(
        F.broadcast(top1), emb["vec_id"] == top1["doc_id"]
    ).select("vec_id", "embedding")
    sem = sim.cosine_topk_bruteforce(emb, qvec, k=50).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rnk").cast("long").alias("r_cos"),
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "r_lex",
        "r_cos",
        (
            F.coalesce(
                1.0 / (60 + F.col("r_lex")), F.lit(0.0)
            )
            + F.coalesce(1.0 / (60 + F.col("r_cos")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            "r_lex",
            "r_cos",
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


_NDCG_ORACLE = f"""
WITH {_SQL_BM25_SCORES},
rel AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS rel
  FROM hits GROUP BY doc_id
),
ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS i
  FROM bm25 ORDER BY score DESC, doc_id LIMIT 10
),
dcg AS (
  SELECT CAST(SUM(CAST(r.rel * round(1.0 / log2(rk.i + 1), 6)
                       AS DECIMAL(38,6))) AS DOUBLE) AS dcg
  FROM ranked rk JOIN rel r USING (doc_id)
),
ideal AS (
  SELECT rel,
         CAST(row_number() OVER (ORDER BY rel DESC, doc_id) AS BIGINT)
             AS i
  FROM rel ORDER BY rel DESC, doc_id LIMIT 10
),
idcg AS (
  SELECT CAST(SUM(CAST(rel * round(1.0 / log2(i + 1), 6)
                       AS DECIMAL(38,6))) AS DOUBLE) AS idcg
  FROM ideal
)
SELECT round(dcg.dcg, 6) AS dcg_at_10,
       round(idcg.idcg, 6) AS idcg_at_10,
       round(dcg.dcg / idcg.idcg, 6) AS ndcg_at_10
FROM dcg CROSS JOIN idcg
"""


@query("text_ndcg_at_10", oracle=_NDCG_ORACLE)
def text_ndcg_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 ranking against graded relevance = query-term
    hit count per document (linear-gain variant — exponential 2^rel
    gains overflow on count-valued grades). The ranking-quality metric
    every retrieval stack reports; complements `sim_lsh_mrr` (MRR
    grades ONE known answer, NDCG grades the whole graded list).
    Discounts 1/log2(i+1) are quantized at 6 dp so the rel×discount
    products land exactly on the decimal grid; DCG/IDCG are 10-term
    decimal sums (order-independent); everything past the shared
    posting-list pass is ≤10 rows."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda w: w != "",
            )
        ).alias("w"),
    )
    rel = (
        tok.where(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("rel"))
    )
    ranked = (
        ir.bm25_scores(docs, _BM25_TERMS, limit=10)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "doc_id"))
            .cast("long")
            .alias("i"),
        )
    )
    disc = lambda i: F.round(1.0 / F.log2(i + 1), 6)  # noqa: E731
    dcg = (
        ranked.join(rel, "doc_id")
        .agg(
            F.sum(
                (F.col("rel") * disc(F.col("i"))).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("dcg")
        )
    )
    ideal = (
        rel.orderBy(F.col("rel").desc(), "doc_id")
        .limit(10)
        .select(
            "rel",
            F.row_number()
            .over(Window.orderBy(F.col("rel").desc(), "doc_id"))
            .cast("long")
            .alias("i"),
        )
    )
    idcg = ideal.agg(
        F.sum(
            (F.col("rel") * disc(F.col("i"))).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("idcg")
    )
    return dcg.crossJoin(idcg).select(
        F.round("dcg", 6).alias("dcg_at_10"),
        F.round("idcg", 6).alias("idcg_at_10"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
    )


_PHRASE_ORACLE = f"""
WITH {_SQL_TOKS},
pos AS (
    SELECT doc_id, t[i] AS w, i
    FROM toks_list, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)
),
first AS (SELECT doc_id, i FROM pos WHERE w = 'hash'),
second AS (SELECT doc_id, i FROM pos WHERE w = 'join'),
hits AS (
    SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(f.i) AS BIGINT) AS first_pos
    FROM first f JOIN second s
      ON s.doc_id = f.doc_id AND s.i = f.i + 1
    GROUP BY f.doc_id
)
SELECT doc_id, n_occurrences, first_pos
FROM hits
ORDER BY n_occurrences DESC, doc_id
LIMIT 25
"""


@query("text_phrase_search_positional", oracle=_PHRASE_ORACLE)
def text_phrase_search_positional(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact phrase search ('hash join') via a positional inverted
    index: tokenize with positions, restrict the posting list to the
    two query terms, and match adjacency with an equi-join on
    (doc, pos+1) — the operator BM25 bag-of-words retrieval
    (`text_bm25_search`) cannot express, and the backbone of every
    phrase/proximity query engine. The position join touches ONLY the
    two terms' postings (selectivity = term frequency, not corpus
    size), joins on composite integer keys, and never materializes
    full positional lists for non-query terms past the filter."""
    from pyspark.sql import Window
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda w: w != "",
            )
        ).alias("i0", "w"),
    ).select("doc_id", "w", (F.col("i0") + 1).alias("i"))
    first = pos.where(F.col("w") == "hash").select("doc_id", "i")
    second = pos.where(F.col("w") == "join").select(
        F.col("doc_id").alias("d2"), F.col("i").alias("i2")
    )
    hits = (
        first.join(
            second,
            (F.col("d2") == F.col("doc_id"))
            & (F.col("i2") == F.col("i") + 1),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("i").cast("long").alias("first_pos"),
        )
    )
    return hits.orderBy(
        F.col("n_occurrences").desc(), "doc_id"
    ).limit(25)


_QL_ORACLE = f"""
WITH {_SQL_TOKS},
ctf AS (
    SELECT w, CAST(count(*) AS BIGINT) AS cf FROM tok
    WHERE w IN ('table', 'join', 'query') GROUP BY w
),
ctot AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM tok),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks_list),
tf AS (
    SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
    WHERE w IN ('table', 'join', 'query') GROUP BY doc_id, w
),
terms AS (
    SELECT d.doc_id, d.dl, c.w, c.cf, COALESCE(t.tf, 0) AS tf
    FROM dl d
    CROSS JOIN ctf c
    LEFT JOIN tf t ON t.doc_id = d.doc_id AND t.w = c.w
),
scored AS (
    SELECT doc_id, dl,
           round(ln((tf + 2000.0 * (cf / CAST((SELECT ct FROM ctot)
                                              AS DOUBLE)))
                    / (dl + 2000.0)), 6) AS lp
    FROM terms
)
SELECT doc_id, CAST(dl AS BIGINT) AS dl,
       CAST(SUM(CAST(lp AS DECIMAL(38,6))) AS DOUBLE) AS ql_score
FROM scored GROUP BY doc_id, dl
ORDER BY ql_score DESC, doc_id
LIMIT 50
"""


@query("text_query_likelihood_dirichlet", oracle=_QL_ORACLE)
def text_query_likelihood_dirichlet(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (μ=2000) for the
    fixed term query: score = Σ_q ln((tf + μ·P_c(w)) / (dl + μ)) — the
    language-modeling retrieval family (Zhai-Lafferty) beside BM25
    (`text_bm25_search`, TF-saturation family): smoothing comes from
    the corpus model, so documents are penalized for MISSING query
    terms rather than just rewarded for containing them (zero-tf terms
    still contribute, which BM25's per-hit sum cannot express). The
    corpus term stats broadcast (3 rows); every doc scores all three
    terms via a left join of the tf postings onto the doc-length
    frame; ln quantized at 6 dp, 3-term decimal sum."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda w: w != "",
            )
        ).alias("w"),
    )
    hits = tok.where(F.col("w").isin(*_BM25_TERMS))
    ctf = hits.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("cf")
    )
    ctot = tok.agg(F.count(F.lit(1)).cast("long").alias("ct"))
    dl = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda w: w != "",
            )
        )
        .cast("long")
        .alias("dl"),
    )
    tf = hits.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    terms = (
        dl.crossJoin(F.broadcast(ctf.crossJoin(ctot)))
        .join(tf, ["doc_id", "w"], "left")
        .na.fill({"tf": 0})
    )
    lp = F.round(
        F.log(
            (
                F.col("tf")
                + 2000.0 * (F.col("cf") / F.col("ct").cast("double"))
            )
            / (F.col("dl") + 2000.0)
        ),
        6,
    )
    return (
        terms.select("doc_id", "dl", lp.alias("lp"))
        .groupBy("doc_id", "dl")
        .agg(
            F.sum(F.col("lp").cast("decimal(38,6)"))
            .cast("double")
            .alias("ql_score")
        )
        .orderBy(F.col("ql_score").desc(), "doc_id")
        .limit(50)
    )


_KWIC_ORACLE = f"""
WITH {_SQL_TOKS},
pos AS (
    SELECT doc_id, t,
           unnest(range(1, len(t) + 1)) AS i
    FROM toks_list
),
hits AS (
    SELECT doc_id, i, t FROM pos WHERE t[i] = 'column'
)
SELECT doc_id,
       CAST(i AS BIGINT) AS position,
       COALESCE(array_to_string(t[greatest(i - 3, 1) : i - 1], ' '),
                '') AS left_context,
       COALESCE(array_to_string(t[i + 1 : least(i + 3, len(t))], ' '),
                '') AS right_context
FROM hits
ORDER BY doc_id, position
LIMIT 100
"""


@query("text_kwic_concordance", oracle=_KWIC_ORACLE)
def text_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC (keyword-in-context) concordance for the term 'column':
    every occurrence with its ±3-token windows — the corpus-linguistics
    primitive under collocation review, sense disambiguation and
    prompt-context mining (and the human-readable audit view for any
    term the quality filters flag). The token arrays slice locally
    (F.slice), so context extraction is a narrow map over the posting
    hits — no join back to the corpus, no position explosion beyond
    the query term's own occurrences; first 100 lines in (doc,
    position) order."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda w: w != "",
    )
    pos = docs.select(
        "doc_id", F.posexplode(toks).alias("i0", "w"), toks.alias("t")
    ).select(
        "doc_id", (F.col("i0") + 1).alias("i"), "w", "t"
    )
    hits = pos.where(F.col("w") == "column")
    # Slice starts/lengths computed to match the oracle's 1-based
    # inclusive array slicing exactly.
    start_l = F.greatest(F.col("i") - 3, F.lit(1))
    len_l = F.col("i") - start_l
    start_r = F.col("i") + 1
    len_r = F.greatest(
        F.least(F.col("i") + 3, F.size("t")) - F.col("i"), F.lit(0)
    )
    return (
        hits.select(
            "doc_id",
            F.col("i").cast("long").alias("position"),
            F.array_join(
                F.slice(F.col("t"), start_l, len_l), " "
            ).alias("left_context"),
            F.array_join(
                F.slice(F.col("t"), start_r, len_r), " "
            ).alias("right_context"),
        )
        .orderBy("doc_id", "position")
        .limit(100)
    )


# Monroe et al. 2008 ("Fightin' Words") log-odds-ratio with informative
# Dirichlet prior: the contrastive-keyword statistic. Each ln is
# round(·,6)-quantized before the subtraction so both engines emit
# identical deltas; the variance and z are exact IEEE arithmetic on
# identical doubles.
_FIGHTIN_ORACLE = f"""
WITH {_SQL_TOKS},
src AS (SELECT doc_id, source FROM documents),
stok AS (SELECT s.source, t.w FROM tok t JOIN src s USING (doc_id)),
ysw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS y
        FROM stok GROUP BY source, w),
ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
       FROM stok GROUP BY source),
yw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS y_all FROM stok GROUP BY w),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM stok),
scored AS (
    SELECT c.source, c.w, c.y,
           round(ln((c.y + 100.0 * t.y_all / o.n)
                    / (s.n_s + 100.0 - c.y - 100.0 * t.y_all / o.n)), 6)
           - round(ln((t.y_all - c.y + 100.0 * t.y_all / o.n)
                      / (o.n - s.n_s + 100.0 - (t.y_all - c.y)
                         - 100.0 * t.y_all / o.n)), 6) AS delta,
           1.0 / (c.y + 100.0 * t.y_all / o.n)
           + 1.0 / (t.y_all - c.y + 100.0 * t.y_all / o.n) AS var
    FROM ysw c
    JOIN ns s USING (source)
    JOIN yw t USING (w)
    CROSS JOIN tot o
    WHERE c.y >= 5
)
SELECT source, w, y, z FROM (
    SELECT source, w, y, delta / sqrt(var) AS z,
           row_number() OVER (PARTITION BY source
                              ORDER BY delta / sqrt(var) DESC, w) AS rn
    FROM scored
) WHERE rn <= 5
"""


@query("text_contrastive_source_keywords", oracle=_FIGHTIN_ORACLE)
def text_contrastive_source_keywords(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contrastive keywords per source via the log-odds-ratio with an
    informative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    'Fightin' Words') — the statistic that fixes what TF-IDF and raw
    PMI get wrong about corpus comparison: the prior (a0=100, scaled by
    corpus frequency) shrinks rare-word noise, and the z-score
    normalizes by the sampling variance, so surfaced terms are ones a
    source genuinely OVERUSES relative to the rest of the corpus.
    Top-5 terms per source, ≥5 occurrences. Two partial-aggregable
    token shuffles plus broadcast totals; at 100 TB the token→term
    join is the only wide stage and AQE sizes it."""
    docs = load_table(spark, sf_dir, "documents")
    from extract_transform_load_template_multidb_spark.operators.dedup import (
        tokenize,
    )

    stok = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("w")
    )
    ysw = stok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    ns = stok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    )
    yw = stok.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("y_all")
    )
    tot = stok.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = (
        ysw.join(F.broadcast(ns), "source")
        .join(yw, "w")
        .crossJoin(F.broadcast(tot))
        .where(F.col("y") >= 5)
    )
    aw = F.lit(100.0) * F.col("y_all") / F.col("n")
    delta = F.round(
        F.log(
            (F.col("y") + aw)
            / (F.col("n_s") + 100.0 - F.col("y") - aw)
        ),
        6,
    ) - F.round(
        F.log(
            (F.col("y_all") - F.col("y") + aw)
            / (
                F.col("n") - F.col("n_s") + 100.0
                - (F.col("y_all") - F.col("y"))
                - aw
            )
        ),
        6,
    )
    var = F.lit(1.0) / (F.col("y") + aw) + F.lit(1.0) / (
        F.col("y_all") - F.col("y") + aw
    )
    z = delta / F.sqrt(var)
    from pyspark.sql import Window as Win

    ranked = j.select("source", "w", "y", z.alias("z")).withColumn(
        "rn",
        F.row_number().over(
            Win.partitionBy("source").orderBy(F.col("z").desc(), "w")
        ),
    )
    return ranked.where(F.col("rn") <= 5).select("source", "w", "y", "z")


_PPL_FILTER_ORACLE = f"""
WITH {_SQL_TOKS},
counts AS (SELECT w, count(*) AS ct FROM tok GROUP BY w),
total AS (SELECT count(*) AS total FROM tok),
lp AS (
  SELECT doc_id, round(ln(ct / total), 6) AS lp
  FROM tok JOIN counts USING (w) CROSS JOIN total
),
scored AS (
  SELECT doc_id,
         CAST(SUM(CAST(lp AS DECIMAL(38,6))) AS DOUBLE) / count(*)
           AS avg_logprob
  FROM lp GROUP BY doc_id
),
thr AS (SELECT quantile_cont(avg_logprob, 0.1) AS p10 FROM scored)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE s.avg_logprob >= t.p10) AS BIGINT)
           AS n_kept,
       CAST(COUNT(*) FILTER (WHERE s.avg_logprob < t.p10) AS BIGINT)
           AS n_dropped,
       MIN(s.avg_logprob) FILTER (WHERE s.avg_logprob >= t.p10)
           AS kept_min_lp,
       MAX(s.avg_logprob) AS max_lp,
       ANY_VALUE(t.p10) AS threshold_p10
FROM scored s
JOIN documents d USING (doc_id)
CROSS JOIN thr t
GROUP BY d.source
"""


@query("curation_perplexity_filter", oracle=_PPL_FILTER_ORACLE)
def curation_perplexity_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet-style perplexity filtering, audited per source: score every
    document under the corpus unigram LM (`text_unigram_logprob`'s
    quantized-ln mean), set the cut at the exact 10th percentile, and
    report each source's keep/drop split with the threshold and the
    kept-range extremes — the report a data-mixture owner reads before
    committing a quality cut (a source losing most of its mass to the
    filter is a sourcing bug, not a quality win). The percentile runs
    through the distributed running-count selector and broadcasts back;
    kept-range stats are MIN/MAX selections (exact doubles), never
    order-dependent float sums."""
    docs = load_table(spark, sf_dir, "documents")
    scored = ir.unigram_logprob(docs).select("doc_id", "avg_logprob")
    from extract_transform_load_template_multidb_spark.queries._util import (
        exact_percentiles,
    )

    thr = exact_percentiles(scored, [], "avg_logprob", {"p10": 0.1})
    joined = (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .crossJoin(F.broadcast(thr))
    )
    kept = F.col("avg_logprob") >= F.col("p10")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(kept, 1)).cast("long").alias("n_kept"),
        F.count(F.when(~kept, 1)).cast("long").alias("n_dropped"),
        F.min(F.when(kept, F.col("avg_logprob"))).alias("kept_min_lp"),
        F.max("avg_logprob").alias("max_lp"),
        F.any_value("p10").alias("threshold_p10"),
    )


_KN_ORACLE = f"""
WITH {_SQL_TOKS},
bg AS (
    SELECT doc_id, t[i] AS w1, t[i+1] AS w2
    FROM toks_list, LATERAL (SELECT unnest(range(1, len(t))) AS i)
    WHERE len(t) >= 2
),
c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
       FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS fanout
        FROM c2 GROUP BY w1),
cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS fanin
         FROM c2 GROUP BY w2),
bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c2),
lp AS (
    SELECT b.doc_id,
           round(ln((c.c2 - CAST(0.75 AS DOUBLE)) / x.c1
                    + CAST(0.75 AS DOUBLE) * x.fanout / x.c1
                      * (CAST(n.fanin AS DOUBLE) / t.n_types)), 6) AS lp
    FROM bg b
    JOIN c2 c ON c.w1 = b.w1 AND c.w2 = b.w2
    JOIN ctx x ON x.w1 = b.w1
    JOIN cont n ON n.w2 = b.w2
    CROSS JOIN bt t
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CAST(lp AS DECIMAL(38,6))) AS DOUBLE) / count(*)
         AS avg_logprob
FROM lp GROUP BY doc_id
"""


@query("text_kneser_ney_bigram_logprob", oracle=_KN_ORACLE)
def text_kneser_ney_bigram_logprob(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kneser–Ney-smoothed bigram LM mean log-prob per doc (d=0.75,
    interpolated form): the smoothing that made n-gram LMs competitive —
    the continuation probability P_cont(w₂) counts how many CONTEXTS a
    word follows, not how often it occurs, so 'Francisco' (frequent,
    one context) stops stealing mass from genuinely versatile words.
    The better-calibrated quality signal next to the add-one model
    (`text_bigram_logprob`), with all four count tables — bigram,
    context totals, fan-out, fan-in — from ONE bigram pass; every
    probability is exact-integer arithmetic plus one literal discount,
    ln quantized to 6, decimal-averaged per doc. Same two-shuffle shape
    as the add-one model."""
    docs = load_table(spark, sf_dir, "documents")
    from extract_transform_load_template_multidb_spark.operators.dedup import (
        tokenize,
    )

    arrs = docs.select(
        "doc_id", tokenize(F.col("text")).alias("t")
    ).filter(F.size("t") >= 2)
    bg = arrs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c2 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c2")
    )
    ctx = c2.groupBy("w1").agg(
        F.sum("c2").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("fanout"),
    )
    cont = c2.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("fanin")
    )
    bt = c2.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    lp = F.round(
        F.log(
            (F.col("c2") - F.lit(0.75)) / F.col("c1")
            + F.lit(0.75)
            * F.col("fanout")
            / F.col("c1")
            * (F.col("fanin").cast("double") / F.col("n_types"))
        ),
        6,
    )
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(bt))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        (
            F.sum(F.col("lp").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_logprob"),
    )
