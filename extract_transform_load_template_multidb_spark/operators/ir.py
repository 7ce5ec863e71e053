"""Information-retrieval / language-model text operators.

Beyond-reference extensions (SURVEY.md §7 phase 4): corpus-statistics
operators a training-data pipeline runs corpus-wide — TF-IDF term salience,
BM25 relevance scoring against a fixed query, and a corpus unigram
language-model log-probability (the CCNet-style "how typical is this
document of the corpus" quality signal, with the LM trained on the corpus
itself in the same job).

Determinism discipline: the only transcendental used is ``ln``, whose last
ulp may differ between JVM ``Math.log`` and the C library — every ``ln``
output is therefore rounded to 6 decimals *before* entering arithmetic, so
products/sums are computed on bit-identical doubles in Spark and the DuckDB
oracle. Per-document sums of those doubles route through DECIMAL(38,6)
(exact, associative) exactly like the money aggregates in
``queries/_util.py``.

Scale notes: the corpus→term-stats aggregation shuffles the token stream by
term once (partial aggregation bounds the shuffle to distinct terms per
partition); the stats table is typically ≪ corpus so the join back is left
un-hinted for AQE to broadcast at runtime — a literal broadcast() hint
would be wrong for web-scale vocabularies (hundreds of millions of distinct
tokens), while AQE sees the real size. Document length is a narrow map and
never shuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from extract_transform_load_template_multidb_spark.operators.dedup import tokenize

DEC = "decimal(38,6)"


def _token_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w) one row per token occurrence — the corpus token stream."""
    return df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("w")
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document: (id, term, tf, df, tfidf, rank).

    ``idf = round(ln((N+1)/(df+1)), 6)`` (smoothed; quantized per the
    module determinism discipline), ``tfidf = tf * idf``. Ties are broken
    by term text so the top-k set is unique. One shuffle by (id, term)
    for tf, one by term for df, one by id for the top-k window — each
    with partial aggregation; nothing is quadratic in corpus size.
    """
    toks = _token_stream(df, text_col, id_col)
    tf = toks.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    idf = F.round(F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)), 6)
    scored = (
        tf.join(dfreq, "w")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("w").alias("term"),
            "tf",
            "df",
            (F.col("tf") * idf).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def bm25_scores(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 50,
) -> DataFrame:
    """BM25 relevance of every document against a fixed term query.

    Classic Robertson/Sparck-Jones BM25 (probabilistic IR; public
    formula): ``idf(t) = round(ln(1 + (N - df + 0.5)/(df + 0.5)), 6)``,
    per-term contribution ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/
    avgdl))``, summed per document through DECIMAL(38,6).

    The token stream is filtered to the query terms *before* any
    aggregation — the selective IN-list is the inverted-index access
    path; the corpus-wide work is only the narrow document-length map.
    Returns the top ``limit`` docs: (id, score, dl) ordered by score
    desc, id.
    """
    toks = _token_stream(df, text_col, id_col)
    hits = toks.filter(F.col("w").isin(*query_terms))
    tf = hits.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    dl = df.select(
        F.col(id_col),
        F.size(tokenize(F.col(text_col))).alias("dl"),
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("__n")
    )
    avgdl = dl.agg(
        (
            F.sum(F.col("dl").cast(DEC)).cast("double") / F.count("dl")
        ).alias("__avgdl")
    )
    idf = F.round(
        F.log(
            1.0
            + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        6,
    )
    contrib = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
        )
    )
    return (
        tf.join(dfreq, "w")
        .join(dl, id_col)
        .join(F.broadcast(stats))
        .join(F.broadcast(avgdl))
        .select(F.col(id_col), F.col("dl"), contrib.alias("__c"))
        .groupBy(id_col, "dl")
        .agg(F.sum(F.col("__c").cast(DEC)).cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(limit)
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-unigram-LM mean log-probability per document.

    Trains the unigram model on the corpus itself (token count / total
    tokens) and scores each document by the mean ``round(ln(p(t)), 6)``
    over its token stream — the quality signal low-perplexity filters
    (CCNet-style) threshold on: boilerplate/templated docs score high,
    lexically atypical docs score low. Returns (id, n_tokens,
    avg_logprob).

    The per-token log-prob is quantized then decimal-summed per doc, so
    the mean is independent of partitioning; the token→term-stats join is
    AQE-sized (see module docstring).
    """
    toks = _token_stream(df, text_col, id_col)
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("ct"))
    total = toks.agg(F.count(F.lit(1)).alias("__total"))
    lp = F.round(F.log(F.col("ct") / F.col("__total")), 6)
    return (
        toks.join(counts, "w")
        .join(F.broadcast(total))
        .select(F.col(id_col), lp.alias("__lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.col("__lp").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-bigram-LM mean log-probability per document, add-one
    smoothed: P(w₂|w₁) = (C(w₁w₂)+1) / (C(w₁)+V).

    The next-order quality signal above :func:`unigram_logprob` — a doc
    of common words in UNCOMMON order (word-salad spam, shuffled
    boilerplate) scores high under the unigram model but low here.
    Trained on the corpus itself; smoothing keeps unseen bigrams finite.

    Shape: the bigram stream is a narrow array expression (adjacent-pair
    structs, no self-join); it shuffles twice — once joined to bigram
    counts by (w₁,w₂), once to unigram counts by w₁ — with the vocab
    size V a broadcast scalar. Per-bigram log-probs are quantized
    (``round(ln(·), 6)``) then decimal-summed, so the mean is
    partitioning-independent. Returns (id, n_bigrams, avg_logprob) for
    docs with ≥ 2 tokens.
    """
    arrs = df.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= 2)
    bg = arrs.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("b"),
    ).select(F.col(id_col), F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    toks = _token_stream(df, text_col, id_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = toks.groupBy(F.col("w").alias("w1")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    v = toks.agg(F.count_distinct(F.col("w")).alias("__v"))
    lp = F.round(
        F.log((F.col("c2") + 1) / (F.col("c1") + F.col("__v"))), 6
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(F.broadcast(v))
        .select(F.col(id_col), lp.alias("__lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum(F.col("__lp").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_logprob"),
        )
    )
