"""Deduplication operators for training-data pipelines.

All stages are pure DataFrame expressions (JVM-side, no Python UDFs):

- :func:`exact_dedup_groups` / :func:`exact_dedup` — hash-groupBy exact dedup.
- :func:`tokenize` — shared lowercase word tokenizer.
- :func:`minhash_signatures` — k-permutation MinHash where each permutation
  is "lexicographic min of md5(i:word)"; a string-min is a valid uniform
  min-hash and is reproducible in any engine with md5.
- :func:`lsh_bands` / :func:`lsh_candidate_pairs` — banding + skew-proof
  blocked per-bucket pair generation.
- :func:`jaccard_pairs` — exact word-set Jaccard for candidate verification.
- :func:`simhash` — b-bit SimHash via md5-derived bit contributions.

Scale notes: the only shuffles are the per-doc groupBys (keyed by doc id)
and the band-bucket self-join, whose fan-out is bounded by bucket size; at
100 TB you salt overfull buckets (a bucket with B docs yields B² candidate
pairs — cap B and spill the rest to a second LSH round with different seeds).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T


def tokenize(text: Column) -> Column:
    """Lowercased word tokens, empties removed.

    The explicit empty-filter keeps Spark and SQL engines in agreement on
    leading/trailing separators (their regexp-split edge semantics differ).
    """
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda w: w != "")


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate groups by content hash: (text_hash, keeper_id, n_copies).

    The keeper is the minimum id — deterministic under any partitioning.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one row (min id) per distinct text."""
    keepers = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
) -> DataFrame:
    """Per-document MinHash signature: columns sig_0..sig_{k-1}.

    Permutation i is min over the doc's distinct tokens of
    ``md5(concat(i, ':', token))`` — one explode + one groupBy with k min
    aggregates; k scales the agg width, not the shuffle count.

    The input is fanned out over the session's cores first (gated — a
    no-op whenever the upstream already has ≥ cores partitions, i.e. at
    cluster scale): the k·|tokens| md5 evaluations are the CPU bulk of
    every MinHash pipeline and they run in the PARTIAL aggregate, i.e.
    on the input's own partitioning — a small fixture corpus arrives as
    ONE parquet split and serialized the whole hash workload onto a
    single core (measured round 11: a 0.9–3.3 s one-task stage inside
    every minhash query at sf0.1).
    """
    toks = _fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("w")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("w")))).alias(f"sig_{i}")
        for i in range(num_perm)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Band the signature: (id, band_idx, band_hash).

    ``band_hash`` is ``xxhash64`` of the band's concatenated signature
    rows: only *equality* of the banded signature matters downstream, so
    an 8-byte join key beats a hex digest — the band self-join and the
    candidate dedup shuffle dominate LSH cost on dup-heavy corpora.
    """
    assert num_perm % rows_per_band == 0
    bands = []
    for b in range(num_perm // rows_per_band):
        cols = [
            F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        bands.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    return sig_df.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")


def lsh_candidate_pairs(
    bands_df: DataFrame,
    id_col: str = "doc_id",
    block_size: int = 256,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any band bucket.

    Hybrid per-bucket pair generator, never a naive band self-join: a
    bucket of B docs yields B²/2 pairs, and with a self-join all of a hot
    bucket's fan-out lands on the one task that owns its join key
    (observed on the fixture corpus: one 3 921-doc bucket → 15.4M rows in
    a single task while 31 cores idle; AQE cannot split skew *within* one
    key). Buckets are collected into sorted member arrays, then split by
    size:

    - **small buckets** (≤ ``block_size`` members — virtually all of them
      on a healthy corpus) expand to pairs in place with one explode
      chain; their work is already spread evenly because the buckets
      themselves are spread evenly across tasks. No extra shuffle.
    - **large buckets** (the skewed tail) are cut into ``block_size``
      chunks, the (i ≤ j) chunk-pairs exploded and round-robin
      repartitioned — a few hundred small rows — and only then expanded to
      id pairs, so one degenerate bucket's quadratic work lands on every
      core instead of one.

    Chunks come from a sorted array, so cross-chunk pairs satisfy
    id_a < id_b by construction; only same-chunk expansion needs the
    comparison. The hybrid exists because round-robin repartitioning ALL
    block-pairs doubled wall-time at sf0.1 (31s → 70s): the extra shuffle
    and the per-row array payload cost more than they saved for the 99% of
    buckets that were never skewed.

    At 100 TB the same shape holds: the heavy shuffle is the final
    ``distinct`` over candidate pairs (irreducible — it IS the output),
    while the bucket arrays stay bounded by the band-bucket size, which
    degenerate stop-buckets permitting — cap or drop buckets above a size
    threshold upstream if the corpus has them (they contribute no dedup
    signal).
    """
    buckets = (
        bands_df.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    if max_bucket_size is not None:
        # The 100 TB guardrail the docstring promises: a degenerate bucket
        # of B docs costs B²/2 pairs while carrying almost no dedup signal
        # (everything hashes together — typically boilerplate/stop
        # content). Dropping such buckets bounds worst-case cost; pairs
        # they would have contributed usually re-surface through the other
        # bands. OFF by default — it is a recall-oriented approximation
        # and the exact oracle-checked semantics require all buckets.
        buckets = buckets.filter(F.size("__ids") <= max_bucket_size)
    # Near-identical cliques collide in EVERY band, producing the same
    # member array once per band; expanding each copy multiplies the pair
    # stream feeding the distinct by up to the band count. Deduplicating
    # the arrays first (a shuffle of bucket rows, thousands, not pairs,
    # millions) drops that factor without changing the pair union.
    return expand_sorted_array_pairs(
        buckets.select("__ids").distinct(), block_size
    ).distinct()


def expand_sorted_array_pairs(
    arrays_df: DataFrame, block_size: int = 256
) -> DataFrame:
    """All (id_a < id_b) pairs within each row's sorted ``__ids`` array —
    the skew-proof hybrid expansion described in
    :func:`lsh_candidate_pairs`. Rows with arrays ≤ ``block_size`` expand
    in place; larger arrays go through the blocked + round-robin path so
    one degenerate array cannot pin a core. Pairs across rows are NOT
    deduplicated here.
    """
    c = int(block_size)

    small_pairs = (
        arrays_df.filter(F.size("__ids") <= c)
        .select(F.col("__ids").alias("bb"), F.explode("__ids").alias("id_a"))
        .select(
            "id_a",
            F.explode(
                F.filter(F.col("bb"), lambda y: y > F.col("id_a"))
            ).alias("id_b"),
        )
    )

    big = arrays_df.filter(F.size("__ids") > c)
    blocks = F.expr(
        f"transform(sequence(0, cast(ceil(size(__ids) / {c}.0) AS INT) - 1),"
        f" k -> slice(__ids, k * {c} + 1, {c}))"
    )
    block_pairs = F.expr(
        "flatten(transform(sequence(0, size(__blocks) - 1), i ->"
        " transform(sequence(i, size(__blocks) - 1), j ->"
        " struct(__blocks[i] AS ba, __blocks[j] AS bb, i = j AS same))))"
    )
    big_pairs = (
        big.select(blocks.alias("__blocks"))
        .select(F.explode(block_pairs).alias("bp"))
        .repartition(arrays_df.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col("bp.same").alias("same"),
            F.col("bp.bb").alias("bb"),
            F.explode("bp.ba").alias("id_a"),
        )
        .select(
            "id_a",
            F.explode(
                F.when(
                    F.col("same"),
                    F.filter(F.col("bb"), lambda y: y > F.col("id_a")),
                ).otherwise(F.col("bb"))
            ).alias("id_b"),
        )
    )
    return small_pairs.unionByName(big_pairs)


def banded_unique_pairs(
    bands_all: DataFrame,
    id_col: str = "doc_id",
    n_bands: int | None = None,
    block_size: int = 256,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs with **no distinct() exchange**: each
    (id_a < id_b) pair sharing ≥1 band hash positionally is emitted
    EXACTLY ONCE — at its minimum shared band.

    ``bands_all`` is one row per doc: ``(id_col, __bhs: array<bigint>)``,
    the doc's band-hash vector (``n_bands`` long; defaults to the array
    length taken from a literal-sized ``F.array`` schema is not possible,
    so pass it explicitly). Per band, docs sharing the band's hash form a
    bucket (exactly :func:`lsh_candidate_pairs` semantics); a bucket at
    band k expands a member pair only when the two members agree on NO
    band j < k. For any pair, the set of shared bands is fixed and
    non-empty iff the pair is a candidate, so exactly one band — the
    minimum — emits it: the stream is globally duplicate-free by
    construction and the output-sized ``distinct()`` shuffle of the
    classic pipeline (measured at sf0.1: 23.4M exploded rows partially
    deduped into a 59 MB / 12.2M-record exchange, re-aggregated into
    10.5M pairs — the single largest stage of every MinHash query)
    disappears outright; only bucket rows (thousands) ever shuffle.
    Skew-proofing is unchanged: small buckets expand in place, oversized
    buckets go through the same blocked + round-robin path as
    :func:`expand_sorted_array_pairs`.

    The min-shared-band test is generated as a SCALAR or-chain over the
    member struct's prior-band fields — never slice/zip_with array ops,
    which allocate per candidate pair and measured 5× slower than the
    whole classic distinct() they were replacing.

    ``max_bucket_size`` drops oversized buckets like
    :func:`lsh_candidate_pairs`, but NOTE the semantics differ from the
    classic path: a pair whose MINIMUM shared band was dropped is not
    re-emitted by a later shared band (the freshness test compares raw
    band hashes, not bucket survival). Callers that rely on the classic
    "pairs may re-surface through other bands" behavior must keep
    :func:`lsh_candidate_pairs`.
    """
    if n_bands is None:
        raise ValueError("pass n_bands (static band count)")
    c = int(block_size)
    # Member struct: id plus the doc's band hashes for every band that
    # can ever be a PRIOR band (0..n_bands-2). sort_array orders by the
    # leading field, so member arrays are id-sorted like the classic
    # path's sorted id arrays.
    member = F.struct(
        F.col(id_col).alias("id"),
        *[F.col("__bhs")[j].alias(f"h{j}") for j in range(max(n_bands - 1, 0))],
    )
    exploded = bands_all.select(
        member.alias("__m"),
        F.posexplode("__bhs").alias("band_idx", "band_hash"),
    )
    buckets = (
        exploded.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_set("__m")).alias("__mem"))
        .filter(F.size("__mem") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("__mem") <= max_bucket_size)
    k = F.col("band_idx")

    def _stale(a, b):
        # True iff members a, b share SOME band before this bucket's band
        # — i.e. a smaller band already emitted the pair. Pure scalar
        # or-chain (short-circuits in codegen); band 0 is never stale.
        # Null-safe equality (round-12 ADVICE): the bucket groupBy puts
        # NULL band hashes in one bucket, so "shared" for the staleness
        # test must treat NULL = NULL as a match too — plain == yields
        # NULL, which the ~_stale filter silently DROPS instead of
        # emitting exactly once. Internal callers (xxhash64/concat_ws,
        # shiftright) never produce null hashes; this keeps the public
        # function's exactly-once guarantee for ones that do.
        out = F.lit(False)
        for j in range(max(n_bands - 1, 0)):
            out = out | ((k > F.lit(j)) & a[f"h{j}"].eqNullSafe(b[f"h{j}"]))
        return out

    small_pairs = (
        buckets.filter(F.size("__mem") <= c)
        .select(k, F.col("__mem").alias("bb"), F.explode("__mem").alias("a"))
        .select(
            k,
            "a",
            F.explode(
                F.filter(F.col("bb"), lambda y: y["id"] > F.col("a")["id"])
            ).alias("b"),
        )
        # Staleness runs as a TOP-LEVEL filter, not inside the array
        # lambda: higher-order lambdas are interpreted (no codegen), so
        # per-candidate struct work there measured 5-9× slower than the
        # classic distinct() it replaces; as a codegen Filter over plain
        # struct-field reads it is a few compiled comparisons per row.
        .where(~_stale(F.col("a"), F.col("b")))
        .select(F.col("a")["id"].alias("id_a"), F.col("b")["id"].alias("id_b"))
    )

    big = buckets.filter(F.size("__mem") > c)
    blocks = F.expr(
        f"transform(sequence(0, cast(ceil(size(__mem) / {c}.0) AS INT) - 1),"
        f" k -> slice(__mem, k * {c} + 1, {c}))"
    )
    block_pairs = F.expr(
        "flatten(transform(sequence(0, size(__blocks) - 1), i ->"
        " transform(sequence(i, size(__blocks) - 1), j ->"
        " struct(__blocks[i] AS ba, __blocks[j] AS bb, i = j AS same))))"
    )
    big_pairs = (
        big.select(k, blocks.alias("__blocks"))
        .select(k, F.explode(block_pairs).alias("bp"))
        .repartition(bands_all.sparkSession.sparkContext.defaultParallelism)
        .select(
            k,
            F.col("bp.same").alias("same"),
            F.col("bp.bb").alias("bb"),
            F.explode("bp.ba").alias("a"),
        )
        .select(
            k,
            "a",
            F.explode(
                F.when(
                    F.col("same"),
                    F.filter(
                        F.col("bb"), lambda y: y["id"] > F.col("a")["id"]
                    ),
                ).otherwise(F.col("bb"))
            ).alias("b"),
        )
        .where(~_stale(F.col("a"), F.col("b")))
        .select(F.col("a")["id"].alias("id_a"), F.col("b")["id"].alias("id_b"))
    )
    return small_pairs.unionByName(big_pairs)


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-set Jaccard for given candidate pairs.

    Each doc's distinct tokens are pre-hashed to 64-bit ints
    (``xxhash64`` — collision odds ~n²/2⁶⁴ per pair, negligible), the
    arrays ride two id-keyed joins onto the pairs, and |A∩B| is a JVM-side
    ``array_intersect`` over longs. This is ~3× faster than either a
    string-array intersect or an exploded token equi-join (which shuffles
    |pairs| × tokens rows); work is O(|pairs| · avg tokens) with no
    explosion, and the token-array side is broadcast-able / AQE-convertible
    when small.
    """
    toks = df.select(
        F.col(id_col),
        F.transform(
            F.array_distinct(tokenize(F.col(text_col))),
            lambda t: F.xxhash64(t),
        ).alias("__toks"),
    )
    return _pairwise_jaccard_on_arrays(toks, pairs, id_col)


def _pairwise_jaccard_on_arrays(
    toks: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-pair set Jaccard over pre-built element-hash arrays.

    ``toks`` is ``(id_col, __toks: array<bigint>)``; the arrays ride two
    id-keyed joins onto the pairs (broadcast-able / AQE-convertible when
    small) and |A∩B| is a JVM-side ``array_intersect`` over longs.
    """
    a = toks.select(F.col(id_col).alias("id_a"), F.col("__toks").alias("__ta"))
    b = toks.select(F.col(id_col).alias("id_b"), F.col("__toks").alias("__tb"))
    # The intersect is the per-pair hot loop, so it must be evaluated
    # exactly ONCE per row: (1) materialize it in its own projection and
    # express jaccard over the resulting attribute — writing the formula
    # directly would plant two intersect nodes in one expression tree;
    # (2) taint the materialized count with a value-preserving
    # nondeterministic term (+ int(rand()·0) ≡ +0): without it, callers'
    # threshold filters are pushed through the projection and INTO THE
    # JOIN CONDITION with the intersect re-inlined (observed: 3
    # evaluations per row, ~2.5× slower), and higher-order array
    # expressions get no codegen subexpression reuse. Nondeterministic
    # expressions cannot be moved or duplicated by the optimizer. The
    # seed is fixed (a seeded Rand is still Nondeterministic to
    # Catalyst, so the barrier holds) so the plan string — and with it
    # bench.py's plan fingerprint — is session-stable; unseeded rand()
    # bakes a fresh seed literal into the plan every session.
    n_inter = F.size(
        F.array_intersect(F.col("__ta"), F.col("__tb"))
    ) + (F.rand(seed=0) * F.lit(0.0)).cast("int")
    counted = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            n_inter.alias("__ni"),
            F.size("__ta").alias("__na"),
            F.size("__tb").alias("__nb"),
        )
    )
    return counted.select(
        "id_a",
        "id_b",
        (
            F.col("__ni") / (F.col("__na") + F.col("__nb") - F.col("__ni"))
        ).alias("jaccard"),
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full MinHash→LSH→verify near-dup pipeline: pairs with Jaccard ≥ t.

    Runs the quadratic stages per DISTINCT TEXT, not per document:
    signatures, banding, and Jaccard verification depend only on the text,
    so exact duplicates are collapsed first (one md5 groupBy) and each
    verified *text* pair expands back to document pairs at the end. On a
    dup-heavy corpus this shrinks the LSH working set by the duplication
    factor and removes the biggest shuffle entirely — the distinct() over
    candidate *doc* pairs becomes a distinct over candidate *text* pairs.
    Semantics are unchanged and oracle-checked: docs of one text share all
    band hashes (same signature → always candidates, Jaccard exactly 1.0),
    and a cross-text doc pair is a candidate iff its rep pair is, with the
    identical Jaccard value (token sets depend only on the text).

    Expansion skew (a clique of N exact copies yields N²/2 pairs) is
    handled by the same blocked expansion as LSH buckets
    (:func:`expand_sorted_array_pairs`); cross-clique products explode one
    side before the other so AQE can rebalance between the two explodes.
    """
    if num_perm % rows_per_band != 0:
        # Match lsh_bands' contract up front (round-12 ADVICE): the banded
        # paths floor-divide num_perm // rows_per_band, which would
        # silently drop the trailing signature rows (quietly different
        # candidate recall) instead of failing.
        raise ValueError(
            f"num_perm={num_perm} must be divisible by "
            f"rows_per_band={rows_per_band}"
        )
    groups = df.groupBy(F.md5(F.col(text_col)).alias("__th")).agg(
        F.min(id_col).alias("__rep"),
        F.sort_array(F.collect_set(F.col(id_col))).alias("__ids"),
    )
    reps = df.join(
        groups.select(F.col("__rep").alias(id_col)), id_col, "left_semi"
    )

    sigs = minhash_signatures(reps, text_col, id_col, num_perm)
    if max_bucket_size is None:
        # Round-11 optimization: generate each candidate pair exactly
        # once (at its minimum shared band) instead of exploding every
        # band's bucket and distinct()-ing — same band hashes, same
        # candidate SET, but the biggest exchange of the pipeline (the
        # pair-level distinct) vanishes; see banded_unique_pairs.
        bands_all = sigs.select(
            F.col(id_col),
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"sig_{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(num_perm // rows_per_band)
                ]
            ).alias("__bhs"),
        )
        cands = banded_unique_pairs(
            bands_all, id_col, n_bands=num_perm // rows_per_band
        )
    else:
        # The bucket-size cap's documented semantics ("drop the bucket,
        # pairs may re-surface through other bands") need the classic
        # explode+distinct path — min-shared-band emission would skip
        # pairs whose minimum band was dropped.
        bands = lsh_bands(sigs, id_col, num_perm, rows_per_band)
        cands = lsh_candidate_pairs(
            bands, id_col, max_bucket_size=max_bucket_size
        )
    rep_jac = jaccard_pairs(reps, cands, text_col, id_col).filter(
        F.col("jaccard") >= threshold
    )

    # Intra-clique pairs: identical texts, Jaccard is exactly 1.0 (the
    # verify formula on equal token sets), included whenever t ≤ 1 — but
    # only for texts that HAVE a signature: a zero-token text generates no
    # bands, so even exact copies of it are never candidates in the
    # uncollapsed pipeline (and the oracle), and must not pair up here.
    with_sig = groups.join(
        sigs.select(F.col(id_col).alias("__rep")), "__rep", "left_semi"
    )
    same_pairs = expand_sorted_array_pairs(
        with_sig.filter(F.size("__ids") >= 2).select("__ids")
    ).select("id_a", "id_b", F.lit(1.0).alias("jaccard"))

    # Cross-text pairs: every doc of text A × every doc of text B carries
    # the rep pair's verified Jaccard. Two-step explode keeps the row
    # width bounded (first explode frees the A array before B fans out).
    ga = groups.select(
        F.col("__rep").alias("id_a"), F.col("__ids").alias("__ia")
    )
    gb = groups.select(
        F.col("__rep").alias("id_b"), F.col("__ids").alias("__ib")
    )
    cross_pairs = (
        rep_jac.join(ga, "id_a")
        .join(gb, "id_b")
        .select("jaccard", "__ib", F.explode("__ia").alias("x"))
        .select("jaccard", "x", F.explode("__ib").alias("y"))
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            "jaccard",
        )
    )
    if threshold > 1.0:  # degenerate: nothing can reach it, 1.0 included
        same_pairs = same_pairs.filter(F.lit(False))
    return same_pairs.unionByName(cross_pairs)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-gram word shingles (space-joined token n-grams).

    Pure array expression — no explode/shuffle; docs shorter than ``n``
    tokens yield an empty array.

    NOTE: pass an already-materialized token *array column* via
    :func:`word_shingles_from_tokens` in hot paths — this convenience form
    inlines ``tokenize(text)`` at every one of its 2+3n references, and
    Spark does not common-subexpression-eliminate across a lambda body, so
    the regex split would re-run per reference per row.
    """
    return word_shingles_from_tokens(tokenize(text), n)


def positional_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Non-distinct n-gram array — index i is the shingle starting at
    token position i. Pure array expression, no explode/shuffle."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Shingles from a token array column (see :func:`word_shingles`)."""
    return F.array_distinct(positional_shingles_from_tokens(toks, n))



# Per-session cache of AQE's advisory partition size (used by _fan_out's
# gate); id-keyed, value includes nothing session-owning so staleness after
# session churn is harmless (worst case: a re-read of one conf value).
_ADVISORY_BYTES: dict[int, int] = {}


def _fan_out(df: DataFrame) -> DataFrame:
    """Spread a frame over the session's parallelism when its input is too
    small to arrive in >= cores partitions (a small fixture table is ONE
    parquet row group → one scan task, serializing tokenize + shingle
    explode + the self-join's map side onto a single core; a tiny
    post-shuffle frame gets AQE byte-coalesced to 1-2 tasks the same way).
    Gated, so at cluster scale — where the input is large enough to occupy
    every core — this is a no-op and adds no shuffle.

    Round-12: the gate reads the OPTIMIZER'S size estimate
    (``optimizedPlan().stats().sizeInBytes`` — pure driver-side plan
    arithmetic over file-scan statistics) instead of probing
    ``df.rdd.getNumPartitions()``. The old probe was not free: under AQE,
    ``.rdd`` materializes every upstream query stage EAGERLY at plan-build
    time, and that work re-executes when the real action runs (exchange
    reuse does not span executions) — on shuffle-rooted inputs like the
    minhash ``reps`` frame it silently ran the groupBy+semi-join twice per
    query, and on scan-rooted inputs it still paid a physical-planning
    pass per call (round-11 verdict #5/#8, ADVICE). The byte threshold is
    cores x AQE's advisory partition size: below it, AQE would coalesce
    the frame under ``cores`` tasks (the exact pathology being guarded
    against); above it, the scan/shuffle already spreads to >= cores
    tasks within ~2x, and a forced round-robin repartition of a multi-GB
    frame would cost more than the tail parallelism it buys."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        # py4j converts the scala BigInt to a Python int; str() covers
        # any bridge that hands back the raw object instead.
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return df  # stats unavailable: never force a cluster-scale shuffle
    advisory = _ADVISORY_BYTES.get(id(spark))
    if advisory is None:
        advisory = 64 * 1024 * 1024
        try:
            advisory = int(
                spark._jvm.org.apache.spark.network.util.JavaUtils
                .byteStringAsBytes(
                    spark.conf.get(
                        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                        "64m",
                    )
                )
            )
        except Exception:
            pass
        _ADVISORY_BYTES[id(spark)] = advisory
    if est < cores * advisory:
        return df.repartition(cores)
    return df

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_posting_list: int | None = None,
    reuse_shingles: bool = False,
    strategy: str = "index",
    max_reps: int = 1 << 20,
) -> DataFrame:
    """n-gram shingle Jaccard near-dup pairs via inverted-index self-join.

    Only pairs sharing ≥1 shingle are scored (the join IS the candidate
    generation — all-pairs never materializes); |A∪B| from per-doc shingle
    counts. At 100 TB, stop-shingles (shared by many docs) dominate the
    join fan-out — cap posting-list length or fall back to MinHash banding.

    Like :func:`near_dup_pairs`, the quadratic stage runs per DISTINCT
    TEXT: shingle sets are a pure function of the text, so exact
    duplicates collapse first and verified text pairs expand back to doc
    pairs — posting lists shrink by the duplication factor, which squares
    in the join. Docs with no shingles (< n tokens) generate no pairs even
    among exact copies, matching the inverted-index semantics.

    ``strategy`` picks how candidate rep pairs are scored; both produce
    the identical pair set whenever ``threshold > 0``:

    - ``"index"`` (default) — the inverted-index self-join above. Right
      whenever shingles are discriminative (posting lists ≪ corpus), the
      normal regime for n ≥ 2.
    - ``"allpairs"`` — score EVERY rep pair with a JVM
      ``array_intersect`` over the per-rep distinct shingle-hash arrays
      (the :func:`jaccard_pairs` kernel), skipping the index entirely.
      Right for the dense/small-universe regime — unigram shingles over
      a bounded vocabulary, where posting lists approach the corpus size
      and the index join degenerates to Σ p² ≈ |reps|² exploded rows
      that are then re-aggregated per pair (measured at sf0.1: 448M
      joined rows re-grouped into 10.5M pairs vs 12.5M direct pair
      evaluations — the index pays ~36 joined rows per surviving pair
      plus a 156 MB pair-count exchange the all-pairs path never
      creates). Equivalence for t > 0: a pair sharing ≥1 shingle and
      J ≥ t appears in both; a pair sharing none has J = 0 < t (or a
      NULL 0/0 when both sets are empty — those reps are excluded, as
      the index path excludes shingle-less docs). Quadratic by
      construction, so the honest 100 TB posture is the same one the
      recall audit documents: run it on the sample-sized ground-truth
      side, never corpus-wide — and that posture is ENFORCED (round-12
      verdict/ADVICE): the universe of rep ids is collected into a
      single array row (one aggregation buffer, subject to the 2 GB
      single-row ceiling) before blocked expansion, so the allpairs
      strategy raises at execution time when more than ``max_reps``
      distinct shingled texts survive (default 2²⁰ ≈ 1M reps = an 8 MB
      id row and ~0.5e12 scored pairs — already past where the index or
      MinHash banding is the right tool; the guard is a plan-side
      raise_error, zero extra jobs).
    """
    if strategy not in ("index", "allpairs"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    if strategy == "allpairs" and threshold <= 0:
        # At t = 0 the strategies genuinely differ (the index emits only
        # shingle-sharing pairs; all-pairs would emit J=0 pairs too).
        raise ValueError("strategy='allpairs' requires threshold > 0")
    groups = df.groupBy(F.md5(F.col(text_col)).alias("__th")).agg(
        F.min(id_col).alias("__rep"),
        F.sort_array(F.collect_set(F.col(id_col))).alias("__ids"),
    )
    reps = df.join(
        groups.select(F.col("__rep").alias(id_col)), id_col, "left_semi"
    )
    # Materialize the token array in its own projection so the regex split
    # runs once per row (the shingle expression references it 2+3n times,
    # and CSE does not reach into lambda bodies).
    toks = _fan_out(
        reps.select(
            F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
        )
    )
    if strategy == "allpairs":
        # Per-rep distinct shingle-hash ARRAYS (the jaccard_pairs kernel
        # representation); reps with no shingles are excluded up front —
        # the inverted index never pairs them either.
        sh_arr = toks.select(
            F.col(id_col),
            F.array_distinct(
                F.transform(
                    word_shingles_from_tokens(F.col("__toks"), n),
                    lambda s: F.xxhash64(s),
                )
            ).alias("__toks"),
        ).filter(F.size("__toks") >= 1)
        # Every rep pair, generated skew-proof by the same blocked
        # expansion LSH buckets use (one global sorted id array → 256-id
        # blocks → block pairs spread round-robin over the cluster): the
        # quadratic work lands on every core, and no pair row ever
        # shuffles — the arrays are broadcast onto the expansion output.
        universe = sh_arr.agg(
            F.sort_array(F.collect_list(F.col(id_col))).alias("__ids")
        ).select(
            # Guard the quadratic path at execution time (no extra job):
            # above max_reps the single-row id array and the |reps|²/2
            # expansion are both out of contract — fail loudly instead.
            F.expr(
                f"CASE WHEN size(__ids) <= {int(max_reps)} THEN __ids "
                "ELSE raise_error(concat('ngram_jaccard_pairs(strategy="
                "\\'allpairs\\') is capped at max_reps="
                f"{int(max_reps)}"
                " distinct shingled texts (got ', size(__ids), '): the "
                "all-pairs arm is for sample-sized ground-truth sides; "
                "use strategy=\\'index\\' or MinHash banding corpus-"
                "wide')) END"
            ).alias("__ids")
        )
        rep_jac = _pairwise_jaccard_on_arrays(
            sh_arr, expand_sorted_array_pairs(universe), id_col
        ).filter(F.col("jaccard") >= threshold)
        shingled = groups.join(
            sh_arr.select(F.col(id_col).alias("__rep")), "__rep", "left_semi"
        )
        return _expand_rep_pairs_to_docs(groups, rep_jac, shingled, threshold)
    sh = toks.select(
        F.col(id_col),
        # 64-bit-hash the shingle before the self-join: the join stream is
        # Σ posting-list² rows, and an 8-byte key shuffles/compares an
        # order of magnitude cheaper than a multi-word string key
        # (collisions ~2⁻⁶⁴ — immaterial).
        F.explode(
            F.transform(
                word_shingles_from_tokens(F.col("__toks"), n),
                lambda s: F.xxhash64(s),
            )
        ).alias("s"),
    )
    if reuse_shingles:
        # The shingle frame feeds three consumers (both self-join sides
        # and the per-doc sizes); Spark's ReuseExchange covers the join
        # but the sizes aggregation re-tokenizes the corpus from the
        # scan. A lazy local checkpoint materializes the compact
        # (id, hash64) frame once on executor storage and serves all
        # three — worthwhile when the caller runs several pair
        # pipelines in one query (e.g. lexical-vs-semantic agreement);
        # at 100 TB it trades recompute for ~16 B/shingle of
        # memory-and-disk blocks, the standard reuse of a shared stage.
        sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sh_joinable = sh
    if max_posting_list is not None:
        # Stop-shingle guardrail (the cap the docstring promises): a
        # shingle appearing in P docs contributes P² rows to the
        # inverted-index join — boilerplate shingles dominate fan-out at
        # corpus scale while contributing little discriminative signal.
        # Shingles above the cap are excluded from CANDIDATE GENERATION
        # AND the intersection counts, but |A|/|B| stay exact, so reported
        # Jaccard is a lower bound (recall-oriented approximation). OFF by
        # default — the oracle-checked semantics require every shingle.
        hot = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("__p"))
            .filter(F.col("__p") > max_posting_list)
            .select("s")
        )
        sh_joinable = sh.join(hot, "s", "left_anti")
    a = sh_joinable.select(F.col(id_col).alias("id_a"), "s")
    b = sh_joinable.select(F.col(id_col).alias("id_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    rep_jac = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )

    # Cliques of exact copies pair up only when the text has shingles at
    # all (≥ n tokens); Jaccard of identical non-empty shingle sets is 1.0.
    shingled = groups.join(
        sizes.select(F.col(id_col).alias("__rep")), "__rep", "left_semi"
    )
    return _expand_rep_pairs_to_docs(groups, rep_jac, shingled, threshold)


def _expand_rep_pairs_to_docs(
    groups: DataFrame,
    rep_jac: DataFrame,
    shingled: DataFrame,
    threshold: float,
) -> DataFrame:
    """Expand verified rep-level pairs back to doc-level pairs (shared by
    both :func:`ngram_jaccard_pairs` strategies): intra-clique pairs of
    exact copies carry Jaccard 1.0 (only for texts that have shingles —
    ``shingled``), cross-text pairs carry the rep pair's value."""
    same_pairs = expand_sorted_array_pairs(
        shingled.filter(F.size("__ids") >= 2).select("__ids")
    ).select("id_a", "id_b", F.lit(1.0).alias("jaccard"))

    ga = groups.select(
        F.col("__rep").alias("id_a"), F.col("__ids").alias("__ia")
    )
    gb = groups.select(
        F.col("__rep").alias("id_b"), F.col("__ids").alias("__ib")
    )
    cross_pairs = (
        rep_jac.join(ga, "id_a")
        .join(gb, "id_b")
        .select("jaccard", "__ib", F.explode("__ia").alias("x"))
        .select("jaccard", "x", F.explode("__ib").alias("y"))
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            "jaccard",
        )
    )
    if threshold > 1.0:  # degenerate: nothing can reach it, 1.0 included
        same_pairs = same_pairs.filter(F.lit(False))
    return same_pairs.unionByName(cross_pairs)


def _cc_union_find_local(edges: DataFrame) -> DataFrame:
    """Small-graph fast path: collect the (deduped, canonical src>dst)
    edge list and run union-find with path halving on the driver.
    Union-find is direction-agnostic and self-loop/duplicate-tolerant, so
    any edge view that mentions every node works.

    Reached on explicit ``algorithm="local"`` or as two-phase's closure
    over the contracted forest when that forest is under the adaptive
    threshold (see connected_components) — the same runtime-adaptivity
    philosophy as AQE's sort-merge→broadcast conversion: pay a distributed
    loop only when the data demands it. A bounded driver collect of a few
    million longs replaces 2–4 shuffle rounds each costing several
    scheduler round-trips, which at fixture scale is pure fixed overhead.
    """
    spark = edges.sparkSession
    pdf = edges.toPandas()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
        rs, rd = find(s), find(d)
        if rs != rd:
            # Union by min id so roots are already the min label.
            if rd < rs:
                rs, rd = rd, rs
            parent[rd] = rs
    nodes = list(parent)
    out = pd.DataFrame({"node": nodes, "component": [find(n) for n in nodes]})
    node_t = edges.schema["src"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_t),
            T.StructField("component", node_t),
        ]
    )
    return spark.createDataFrame(out, schema=schema)


# Per-partition row budget for iterated forest contraction: partitions
# are sized so a pass's union-find dict stays ~3M entries (~300 MB of
# Python dict per concurrent worker). Module-level so tests can shrink
# it to force the multi-pass path on small fixtures.
_CONTRACT_ROWS_PER_PART = 1_500_000


def _cc_two_phase(
    und: DataFrame, max_iter: int, small_graph_edges: int
) -> DataFrame:
    """Two-phase "filtering" connected components (Lattanzi et al.,
    "Filtering: a method for solving graph problems in MapReduce",
    SPAA'11 — public algorithm; also the contraction step of
    Karloff-Suri-Vassilvitskii MRC CC):

    **Phase 1 — partition-local contraction.** One ``mapInPandas`` pass
    over the canonical edge stream (duplicates tolerated — a repeated
    pair is a union no-op — so the caller never pays a distinct
    shuffle): each partition runs
    union-find (path halving, union-by-min-id) over ITS edges only and
    emits its spanning forest as (node → partition-local min root) rows.
    Per-partition state is O(distinct nodes in the partition) — bounded
    by sizing partitions, never by |E|. The union of per-partition
    spanning forests has exactly the original graph's connected
    components (each partition's forest preserves its edges'
    connectivity; the union preserves all of it), and its size is
    Σ_p |nodes_p| — on clique-heavy near-dup graphs ~100× smaller than
    |E|, since every clique collapses to a star within each partition.

    **Phase 2 — global closure over the contracted forest.** Driver
    union-find when the forest is small (the overwhelmingly common case:
    |forest| ≤ P·|V| regardless of |E|). When the forest is still big —
    a DENSE graph saturates the P·|V| bound, so at P ∝ |E| the forest
    grows with the partition count, measured ~k² on k-fold salted
    cliques — the filtering iteration from the same paper applies: the
    identical partition-local contraction re-runs over the forest with
    a shrunken partition count (one repartition exchange + one linear
    Arrow sweep per pass, per-partition state capped by
    ``_CONTRACT_ROWS_PER_PART``) until the driver gate is met, with
    star contraction as the fallback if shrinkage stalls (only possible
    when |V| alone exceeds the gate — then O(log n) star rounds
    genuinely are the memory-safe answer). Phase 1 output is already in
    canonical src≥dst form (roots are per-partition minima), which is
    exactly what both closures expect.

    Fixed point (node → min reachable id) is identical to label/star/
    local by construction. At 100 TB this replaces O(diameter) or
    O(log n) full-|E| shuffle rounds with ONE linear Arrow-batched pass
    over |E| plus a closure over the P·|V|-bounded forest.

    ``und`` must be the canonical view (src = greater id, dst = smaller
    id; duplicates and self-loops allowed — self-loops register the
    node, duplicates are no-ops). It is consumed exactly once, so an
    unmaterialized pair pipeline upstream is evaluated exactly once.
    Output: (node, component).
    """
    node_t = und.schema["src"].dataType
    out_schema = T.StructType(
        [T.StructField("src", node_t), T.StructField("dst", node_t)]
    )

    def _contract(batches):
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in batches:
            for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
                rs, rd = find(s), find(d)
                if rs != rd:
                    if rd < rs:
                        rs, rd = rd, rs
                    parent[rd] = rs
        if not parent:
            return
        nodes = list(parent)
        # Roots ride along as (r, r) self-rows so phase 2 sees every
        # node (matches the local/label treatment of self-loop-only
        # nodes); they are a per-component handful of extra rows. The
        # forest is yielded in bounded chunks, not one frame: a single
        # pandas batch holding a skewed partition's whole node set
        # would be serialized as one Arrow batch (2 GB record-batch
        # ceiling) — chunking keeps batch size independent of
        # partition node count.
        chunk = 1_000_000
        for i in range(0, len(nodes), chunk):
            part = nodes[i : i + chunk]
            yield pd.DataFrame(
                {"src": part, "dst": [find(n) for n in part]}
            )

    forest = und.mapInPandas(_contract, schema=out_schema).localCheckpoint(
        eager=True
    )
    cnt = forest.count()
    # Iterated filtering (round-11): the first forest is bounded by
    # P·|V|, and a dense graph HITS that bound — every partition sees
    # most nodes, so at 32·k input partitions the forest grows ~k²
    # (measured: 259M salted-clique pairs → ~10⁸-row forest). Rather
    # than handing a forest that large to O(log n)·3-shuffle star
    # contraction, re-run the SAME partition-local contraction over
    # the forest with a shrunken partition count (each pass: one
    # repartition exchange + one linear Arrow sweep; correctness is
    # the pass-1 argument verbatim — a union of per-partition spanning
    # forests of a forest preserves exactly the original components,
    # and union-by-min keeps labels on the min-id grid). Partition
    # count is chosen so per-partition union-find state stays ~3M
    # entries; each pass shrinks the frame toward P'·|V|, normally
    # reaching the driver gate in 1-2 passes. Star contraction remains
    # the fallback if shrinkage stalls (possible only when |V| alone
    # exceeds the gate — then O(log n) rounds genuinely are the
    # memory-safe answer).
    passes = 0
    while 2 * cnt > small_graph_edges and passes < 4:
        nparts = max(1, -(-cnt // _CONTRACT_ROWS_PER_PART))
        if nparts >= forest.rdd.getNumPartitions():
            break  # repartitioning coarser is impossible — stalled
        nxt = forest.repartition(nparts).mapInPandas(
            _contract, schema=out_schema
        ).localCheckpoint(eager=True)
        ncnt = nxt.count()
        forest.unpersist()
        if ncnt >= cnt:
            forest, cnt = nxt, ncnt
            break  # no shrinkage — bail to the fallback
        forest, cnt = nxt, ncnt
        passes += 1
    if 2 * cnt <= small_graph_edges:
        return _cc_union_find_local(forest)
    return _cc_star_contraction(forest, max_iter)


def _cc_star_contraction(edges: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public
    algorithm): converges in O(log n) rounds regardless of component
    DIAMETER, where min-label propagation needs O(diameter) rounds.

    Each round rewrites the edge set:

    - **large-star** (per node u, m = min of u and its neighbors): every
      neighbor v > u re-attaches to m — long tails fold toward small ids;
    - **small-star** (per node u over its ≤-neighbors): all of them plus
      u attach to their minimum — stars flatten.

    Both steps preserve connectivity and strictly shrink a potential
    function, and the fixed point is a disjoint union of stars centered
    at each component's minimum id. Convergence is detected by an
    (edge-count, order-insensitive checksum) pair riding the same action
    that materializes the round's checkpoint — one job per round. Per
    round the cost is two groupBys + one dedup over |E| — ~3 shuffles vs
    label-prop's 1, which is why this is the HIGH-DIAMETER strategy, not
    the default: near-dup graphs are clique-heavy (diameter 2–3) and
    cheaper under label-prop.

    ``edges`` may arrive canonical (src ≥ dst) or mixed-direction, with
    duplicates and self-loops tolerated: the first filter below takes
    the src > dst view (dropping duplicates is handled by the per-round
    ``distinct``), and self-loop-only nodes are restored by the lonely
    anti-join at the end — this is the contract both callers actually
    use (``connected_components`` passes the canonical ``und`` view,
    ``_cc_two_phase`` the non-deduped forest). Output: (node,
    component).
    """
    # Canonical undirected form: src > dst (every edge once, larger first).
    cur = edges.filter(F.col("src") > F.col("dst")).localCheckpoint(
        eager=True
    )
    prev_sig: tuple = (-1, -1)
    for _ in range(max_iter):
        sym = cur.unionByName(
            cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # Large-star: neighbors v > u attach to m = min(Γ(u) ∪ {u}).
        lmins = sym.groupBy("src").agg(F.min("dst").alias("__mn")).select(
            "src", F.least(F.col("__mn"), F.col("src")).alias("__m")
        )
        large = (
            sym.join(lmins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        # Small-star on the large-star output: per node u (larger end),
        # all ≤-neighbors and u itself attach to their minimum.
        ssym = large.filter(F.col("src") > F.col("dst"))
        smins = ssym.groupBy("src").agg(F.min("dst").alias("__m"))
        with_m = ssym.join(smins, "src")
        small = (
            with_m.filter(F.col("dst") != F.col("__m"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .unionByName(
                smins.select(F.col("src"), F.col("__m").alias("dst"))
            )
            .filter(F.col("src") != F.col("dst"))
        )
        cur = (
            small.select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        # One action: materialize checkpoint + convergence signature.
        row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("sig"),
        ).first()
        sig = (row["n"], row["sig"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_iter} rounds — "
            "raise max_iter (rounds needed grow with log(n))"
        )
    # Fixed point = stars: (src=node, dst=component-min root).
    roots = cur.select(F.col("dst").alias("node")).distinct()
    out = cur.select(
        F.col("src").alias("node"), F.col("dst").alias("component")
    ).unionByName(
        roots.select("node", F.col("node").alias("component"))
    )
    # Nodes appearing ONLY in self-loops are dropped by the src>dst
    # canonicalization above but are their own components under the
    # local/label/two-phase strategies — restore them so every strategy
    # produces the same labeling on the same input. The self-loop set
    # is empty on near-dup pair streams, so this branch costs one
    # narrow filter + a near-empty anti-join.
    lonely = (
        edges.filter(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("node"))
        .distinct()
        .join(out.select("node"), "node", "left_anti")
    )
    return out.unionByName(
        lonely.select("node", F.col("node").alias("component"))
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    small_graph_edges: int = 4_000_000,
    algorithm: str = "auto",
    broadcast_nodes: int = 2_000_000,
) -> DataFrame:
    """Cluster near-dup pairs into components: (node, component) where
    component = the minimum node id reachable through the pair graph.

    Pairs are the OUTPUT of the near-dup operators; a dedup pipeline then
    needs the transitive closure to keep one doc per duplicate CLUSTER
    (A~B, B~C must collapse to one keeper even if A~C was never a
    candidate).

    ``algorithm`` picks the strategy:

    - ``"auto"`` (default) = ``"two_phase"``: partition-local union-find
      (one Arrow-batched ``mapInPandas`` pass over the canonical pair
      stream — no dedup shuffle, no checkpoint, no sizing count; the
      pass is the pair pipeline's only consumer, so it is evaluated
      exactly once) contracts |E| to a union of spanning forests
      ≤ P·|V| rows; the closure then runs over the forest — driver
      union-find when 2·|forest| ≤ ``small_graph_edges`` (≤ ~64 MB of
      longs at the default, the same runtime adaptivity AQE applies to
      small join sides, measured on the CONTRACTED set where counting
      is cheap), star contraction otherwise. Set
      ``small_graph_edges=0`` to force a fully distributed closure.
      See :func:`_cc_two_phase`.
    - ``"label"``: iterative min-label propagation — each round every
      node takes the min of its own and its neighbors' labels, one
      join+groupBy per round, converging in O(component DIAMETER) rounds
      — cheap on clique-heavy near-dup graphs (diameter 2–3), but every
      round still reshuffles the full edge set, which is why two_phase
      displaced it as auto's big-graph default in round 10. Round 1 is
      join-free (``min(node, min(neighbors))``
      — one groupBy over the edge list); rounds are localCheckpoint()ed
      so lineage stays flat, and the convergence check rides the SAME
      action that materializes the checkpoint (one job per round). When
      the label table is small (≤ ``broadcast_nodes``) each round
      broadcast-joins it against the checkpointed edges instead of
      paying a 2×|E| sort-merge exchange — the clique-heavy near-dup
      case where |E| ≫ |V|.
    - ``"star"``: alternating large-star/small-star contraction
      (:func:`_cc_star_contraction`) — O(log n) rounds independent of
      diameter, ~3 shuffles per round. Choose it for chain/mesh-shaped
      graphs (similarity time-series, citation paths) where diameter ≫
      log n; the unit tests pin a 400-node path graph that label-prop
      cannot finish in 25 rounds and star finishes in ~5.
    - ``"local"``: force the driver union-find (caller asserts the graph
      is small).

    At 100 TB each label round is one shuffle of |E| + |V|, each star
    round ~3·|E|, while two_phase touches |E| exactly once (one Arrow
    pass, per-partition state bounded by the partition's node count) and
    closes over a P·|V|-bounded forest; ``small_graph_edges`` keeps the
    driver-collect fallback in charge only when the CONTRACTED forest is
    provably tiny.
    """
    if algorithm not in ("auto", "label", "star", "local", "two_phase"):
        raise ValueError(
            f"unknown algorithm {algorithm!r}; "
            "expected auto | label | star | local | two_phase"
        )
    # Canonical undirected view: one row per pair, larger id first — a
    # NARROW projection, deliberately not deduped or materialized.
    # Union-find (local and two-phase) is duplicate- and direction-
    # tolerant, so auto never pays a distinct shuffle, a checkpoint
    # write, or a sizing count() over the full pair stream: the two-
    # phase pass below is the only consumer and evaluates the pair
    # pipeline exactly once. Only the explicitly-requested label/star
    # strategies (which DO reshuffle edges every round) dedup+checkpoint
    # first.
    cand = pairs.select(
        F.greatest(F.col(id_a), F.col(id_b)).alias("src"),
        F.least(F.col(id_a), F.col(id_b)).alias("dst"),
    )
    if algorithm == "local":
        return _cc_union_find_local(cand)
    if algorithm in ("two_phase", "auto"):
        # Auto always contracts first: one linear pass shrinks |E| to a
        # P·|V|-bounded forest, and the forest's own size (not a count
        # of the raw pair stream) picks driver union-find vs star —
        # runtime adaptivity measured where it's cheap.
        return _cc_two_phase(cand, max_iter, small_graph_edges)
    und = cand.distinct().localCheckpoint(eager=True)
    if algorithm == "star":
        return _cc_star_contraction(und, max_iter)
    edges = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    # Round 1, join-free: label(node) = min(node, min over neighbors).
    labels = (
        edges.groupBy(F.col("dst").alias("node"))
        .agg(F.least(F.col("node"), F.min("src")).alias("component"))
        .localCheckpoint(eager=True)
    )
    # Near-dup graphs are clique-heavy: |E| can be huge while |V| stays
    # small (every doc in a dup clique contributes O(clique) edges). When
    # the label table fits a broadcast (≤ broadcast_nodes rows — it is
    # already materialized, so the count is a cheap local job), each
    # propagation round becomes a broadcast-hash join over the
    # checkpointed edges plus a |V|-bounded map-side-combined groupBy —
    # no 2×|E| sort-merge exchange per round. localCheckpoint hides row
    # stats from AQE, so without the explicit hint Spark must assume the
    # label side is large; this is the same runtime adaptivity AQE would
    # apply if it could see the stats. Graphs with |V| above the
    # threshold keep the shuffle join — broadcasting a corpus-scale
    # label table would OOM every executor.
    bcast = labels.count() <= broadcast_nodes
    n_changed = -1
    for _ in range(max_iter - 1):
        lab_src = labels.withColumnRenamed("node", "src")
        neighbor_min = (
            edges.join(F.broadcast(lab_src) if bcast else lab_src, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("__nbr_min"))
        )
        if bcast:
            neighbor_min = F.broadcast(neighbor_min)
        updated = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("__nbr_min", "component")
            ).alias("component"),
            (F.coalesce("__nbr_min", "component") < F.col("component")).alias(
                "__chg"
            ),
        ).localCheckpoint(eager=False)
        # One action: materializes the checkpoint AND tests convergence.
        n_changed = updated.filter(F.col("__chg")).count()
        labels = updated.drop("__chg")
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({n_changed} labels still changing) — the pair graph has a "
            "component with diameter above max_iter; raise max_iter "
            "(cost is one join+groupBy round each)"
        )
    return labels


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Rows surviving near-dup CLUSTER dedup: every doc in a component
    except its minimum-id keeper is dropped; docs in no pair survive."""
    comps = connected_components(pairs, id_a, id_b)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def _hex_to_long(hex_col: Column) -> Column:
    """Portable hex→int (Spark: conv; DuckDB oracle uses CAST('0x'||h))."""
    return F.conv(hex_col, 16, 10).cast("long")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """b-bit SimHash fingerprint per document.

    Each distinct token hashes (md5 → first b bits); bit j of the
    fingerprint is the majority vote of token bit j (+1/−1, ties → 0).
    Expressed as explode(tokens) × explode(bit positions) → one groupBy —
    exact integer math end-to-end, so any engine agrees bit-for-bit.
    ``bits=16`` keeps the oracle cheap; production callers can raise it
    (≤32 with the md5-prefix hash; swap in xxhash64 for 64).

    The fingerprint is a pure function of the text, so the tokens×bits
    fan-out (the expensive part) runs once per DISTINCT text and the
    result joins back to every copy — a dup-factor saving on real corpora.
    Docs with zero tokens produce no row, exactly as in the uncollapsed
    form.
    """
    assert bits <= 32
    nibbles = (bits + 3) // 4
    groups = df.groupBy(F.md5(F.col(text_col)).alias("__th")).agg(
        F.min(id_col).alias("__rep"),
        F.collect_set(F.col(id_col)).alias("__ids"),
    )
    reps = df.join(
        groups.select(F.col("__rep").alias(id_col)), id_col, "left_semi"
    )
    # Fan the reps over the session's cores before the tokens×bits
    # fan-out (gated no-op at cluster scale): like minhash_signatures,
    # the md5-per-token work otherwise runs on the scan's partitioning —
    # one task on a single-split fixture corpus.
    toks = _fan_out(reps.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("w"),
    ).select(
        F.col(id_col),
        _hex_to_long(F.substring(F.md5(F.col("w")), 1, nibbles)).alias("h"),
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j")
    contrib = toks.select(F.col(id_col), F.col("h"), bit).select(
        F.col(id_col),
        F.col("j"),
        # shiftright/shiftleft need expression (not literal) shift amounts →
        # SQL form; both engines define >> / shiftright on (long, int).
        F.when(F.expr("shiftright(h, j)").bitwiseAND(1) == 1, 1)
        .otherwise(-1)
        .alias("c"),
    )
    rep_hash = (
        contrib.groupBy(id_col, "j")
        .agg(F.sum("c").alias("vote"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(
                    F.col("vote") > 0,
                    F.expr("shiftleft(CAST(1 AS BIGINT), j)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )
    return (
        rep_hash.join(
            groups.select(F.col("__rep").alias(id_col), "__ids"), id_col
        )
        .select(F.explode("__ids").alias(id_col), "simhash")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
    block_size: int = 256,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: (id_a, id_b, hamming ≤ ``max_hamming``).

    The Manku/Jain/Sarma WWW'07 scheme (public algorithm): split the
    b-bit fingerprint into ``n_bands`` equal bit ranges; any two
    fingerprints within hamming distance d < n_bands must agree EXACTLY
    on at least one band (pigeonhole — d flipped bits can touch at most d
    bands), so the band equi-join is a LOSSLESS candidate generator, not
    a recall trade-off like MinHash banding. Candidates verify with one
    integer popcount: ``bit_count(a XOR b)``.

    Requires ``max_hamming < n_bands`` (the pigeonhole precondition) and
    ``bits % n_bands == 0``.

    Scale shape: candidate generation reuses the skew-proof bucketed
    expansion of the MinHash path (:func:`lsh_candidate_pairs` —
    per-bucket arrays, blocked expansion for degenerate buckets), the
    fingerprint table re-joins candidates id-keyed, and verification is
    one JVM integer op per candidate. Total: the fingerprint aggregation
    + one bucket shuffle + one distinct over candidates — no all-pairs
    stage anywhere. With b bits the band value domain is 2^(b/n_bands);
    at 100 TB raise ``bits`` (wider fingerprints = fewer spurious band
    collisions) rather than lowering bands.
    """
    assert max_hamming < n_bands, "pigeonhole guarantee needs d < n_bands"
    assert bits % n_bands == 0
    band_bits = bits // n_bands
    fp = simhash(df, text_col, id_col, bits)
    band_exprs = [
        F.expr(
            f"(shiftright(simhash, {b * band_bits}) & "
            f"{(1 << band_bits) - 1})"
        )
        for b in range(n_bands)
    ]
    if max_bucket_size is None:
        # Round-11: min-shared-band unique pair generation — same
        # candidate set, no pair-level distinct() exchange (see
        # banded_unique_pairs; the near_dup_pairs rationale applies
        # verbatim, and SimHash band values are already positional).
        bands_all = fp.select(
            F.col(id_col), F.array(*band_exprs).alias("__bhs")
        )
        cands = banded_unique_pairs(
            bands_all, id_col, n_bands=n_bands, block_size=block_size
        )
    else:
        band_structs = [
            F.struct(F.lit(b).alias("band_idx"), e.alias("band_hash"))
            for b, e in enumerate(band_exprs)
        ]
        bands = fp.select(
            F.col(id_col), F.explode(F.array(*band_structs)).alias("band")
        ).select(id_col, "band.band_idx", "band.band_hash")
        cands = lsh_candidate_pairs(
            bands,
            id_col,
            block_size=block_size,
            max_bucket_size=max_bucket_size,
        )
    a = fp.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("__sa"))
    b = fp.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("__sb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def incremental_near_dups(
    corpus: DataFrame,
    delta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.6,
) -> DataFrame:
    """Incremental MinHash dedup: near-dup pairs BETWEEN an incoming batch
    and an existing corpus — the production shape, where re-running the
    full pairwise pipeline per ingest would redo corpus-scale work.

    Output: (delta_id, corpus_id, jaccard ≥ t). Within-delta duplicates
    are deliberately out of scope (run :func:`near_dup_pairs` on the
    delta for those); the candidate join is delta-bands × corpus-bands
    only, so per ingest the new work is |delta| signature computation
    plus an equi-join against the corpus band index — in a deployed
    pipeline the corpus side of this join is a PRECOMPUTED, stored table
    (banding is per-doc and append-only), making ingest cost
    O(|delta| + matches), never O(|corpus|).

    Verification reuses the exact token-set Jaccard of the batch path
    over the union frame, id-keyed joins only.
    """
    # Round-11: the delta×corpus band join emits one row per SHARED band
    # — keeping only each pair's MINIMUM shared band (a scalar or-chain
    # over the prior-band hashes both sides carry) makes the stream
    # unique by construction, so the pair-level distinct() exchange of
    # the classic form disappears (the banded_unique_pairs argument,
    # bipartite case: for any (delta, corpus) pair the shared-band set
    # is fixed; exactly its minimum emits).
    if num_perm % rows_per_band != 0:
        raise ValueError(  # see near_dup_pairs: floor-division would
            f"num_perm={num_perm} must be divisible by "  # drop bands
            f"rows_per_band={rows_per_band}"
        )
    n_bands = num_perm // rows_per_band

    def _band_vec(src: DataFrame, out_id: str) -> DataFrame:
        sigs = minhash_signatures(src, text_col, id_col, num_perm)
        bhs = [
            F.xxhash64(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"sig_{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(n_bands)
        ]
        return sigs.select(
            F.col(id_col).alias(out_id),
            *[bhs[j].alias(f"__{out_id}_h{j}") for j in range(n_bands - 1)],
            F.posexplode(F.array(*bhs)).alias("band_idx", "band_hash"),
        )

    d_bands = _band_vec(delta, "delta_id")
    c_bands = _band_vec(corpus, "corpus_id")
    # Null-as-false equality (round-12 ADVICE, bipartite counterpart of
    # banded_unique_pairs' null handling): the candidate join uses plain
    # equality, under which NULL band hashes never bucket — so a NULL
    # prior-band comparison must read "not shared" (FALSE), not NULL,
    # or ~stale silently drops the pair at its real minimum band.
    # Internal band hashes (xxhash64/concat_ws) are never null.
    stale = F.lit(False)
    for j in range(n_bands - 1):
        stale = stale | (
            (F.col("band_idx") > F.lit(j))
            & F.coalesce(
                F.col(f"__delta_id_h{j}") == F.col(f"__corpus_id_h{j}"),
                F.lit(False),
            )
        )
    # Spread the candidate stream before the jaccard verify: the classic
    # distinct() incidentally re-partitioned candidates 32 ways, and
    # dropping it left the verify (array_intersect per pair) running on
    # the band join's probe-side partitioning — a couple of
    # AQE-coalesced tasks, measured 3.7 s serial for 1.5M pairs at
    # sf0.1. The spread shuffles two ids per pair (16 B — strictly less
    # than the distinct's exchange it replaces) and is pinned by number
    # so AQE cannot re-coalesce it.
    cands = (
        d_bands.join(c_bands, ["band_idx", "band_hash"])
        .where(~stale)
        .select("delta_id", "corpus_id")
        .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    )
    union_src = corpus.select(F.col(id_col), F.col(text_col)).unionByName(
        delta.select(F.col(id_col), F.col(text_col))
    )
    pairs = cands.select(
        F.col("delta_id").alias("id_a"), F.col("corpus_id").alias("id_b")
    )
    return (
        jaccard_pairs(union_src, pairs, text_col, id_col)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").alias("delta_id"),
            F.col("id_b").alias("corpus_id"),
            "jaccard",
        )
    )


def blocked_edit_distance_pairs(
    df: DataFrame,
    block_cols: tuple[str, ...],
    text_col: str,
    id_col: str = "doc_id",
    max_distance: int = 3,
    block_size: int = 256,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Record linkage / entity resolution: candidate pairs from equality
    BLOCKING on ``block_cols``, verified by Levenshtein edit distance on
    ``text_col`` — the classic fuzzy-matching shape for names, titles,
    and addresses where token-set methods (MinHash/Jaccard) are blind to
    character-level typos.

    Output: (id_a, id_b, dist ≤ ``max_distance``). Blocking IS the scale
    technique — the quadratic verify runs per block, never corpus-wide —
    and candidate generation reuses the skew-proof bucketed expansion of
    the LSH path (:func:`lsh_candidate_pairs`), so one hot block cannot
    pin a core. Levenshtein is a JVM built-in on both engines; at 100 TB
    pick block keys so blocks stay ≪ ``max_bucket_size`` (e.g. add a
    phonetic or prefix key), exactly as in production linkage systems.
    """
    bands = df.select(
        F.col(id_col),
        F.lit(0).alias("band_idx"),
        F.xxhash64(*[F.col(c) for c in block_cols]).alias("band_hash"),
    )
    cands = lsh_candidate_pairs(
        bands, id_col, block_size=block_size, max_bucket_size=max_bucket_size
    )
    a = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__ta", "__tb").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= max_distance)
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Span-level exact-substring duplication: maximal token ranges whose
    every k-gram also appears in ≥ ``min_docs - 1`` other documents.

    The span-granular counterpart of document-level dedup (the
    "remove the duplicated substring, keep the rest of the document"
    operation of suffix-array training-data dedup — public method, Lee
    et al., "Deduplicating Training Data Makes Language Models Better",
    ACL'22 — re-expressed relationally: positional k-gram explode →
    cross-document frequency → per-doc gaps-and-islands merge of the
    covered ranges).

    Returns (id, span_start, span_end, n_dup_shingles): token positions
    inclusive, spans ≥ k tokens, non-overlapping per doc.

    Scale: two shuffles by shingle text (frequency count with partial
    aggregation, then the semi-join back) and one by doc for the island
    merge. Shingles travel as full strings so an SQL oracle agrees
    exactly; a production variant would band by ``xxhash64(gram)``
    (8-byte shuffle keys, same spans modulo hash collision). Positions
    and spans are integer-exact.
    """
    # Materialize the token array BEFORE shingling: the transform lambda
    # references the array 2+3k times and Spark does not CSE across a
    # lambda body — inlining tokenize() here re-runs the regex split ~26×
    # per row at k=8 (observed 50 s vs 2 s at sf0.01).
    toks = (
        df.select(
            F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
        )
        .select(
            F.col(id_col),
            F.posexplode(
                positional_shingles_from_tokens(F.col("__toks"), k)
            ).alias("pos", "g"),
        )
    )
    dup = (
        toks.groupBy("g")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("g")
    )
    cand = toks.join(dup, "g", "left_semi").select(
        F.col(id_col), "pos", (F.col("pos") + (k - 1)).alias("__end")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max("__end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = cand.select(
        F.col(id_col),
        "pos",
        "__end",
        F.when(
            prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
        )
        .otherwise(0)
        .alias("__new"),
    )
    island = F.sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("__island", island)
        .groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("__end").alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_shingles"),
        )
        .select(id_col, "span_start", "span_end", "n_dup_shingles")
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """n-gram shingle CONTAINMENT near-dup pairs: |A∩B|/|A| and |A∩B|/|B|,
    kept when either direction ≥ ``threshold``.

    Containment is the superset detector Jaccard structurally misses: a
    short document embedded verbatim in a long one (article + boilerplate
    wrapper, quote + commentary) has containment ≈ 1 from the short side
    while Jaccard ≈ |A|/|B| stays arbitrarily low. Same inverted-index
    economics as :func:`ngram_jaccard_pairs` — candidate pairs come from
    the shingle equi-join (all-pairs never materializes), the quadratic
    stage runs per DISTINCT TEXT with exact copies expanded back at the
    end, and shingles are 64-bit-hashed before the join.

    Output: (id_a < id_b, containment_a = |A∩B|/|A|, containment_b).
    """
    groups = df.groupBy(F.md5(F.col(text_col)).alias("__th")).agg(
        F.min(id_col).alias("__rep"),
        F.sort_array(F.collect_set(F.col(id_col))).alias("__ids"),
    )
    reps = df.join(
        groups.select(F.col("__rep").alias(id_col)), id_col, "left_semi"
    )
    toks = _fan_out(
        reps.select(
            F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
        )
    )
    sh = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                word_shingles_from_tokens(F.col("__toks"), n),
                lambda s: F.xxhash64(s),
            )
        ).alias("s"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "s")
    b = sh.select(F.col(id_col).alias("id_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    rep_pairs = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter") / F.col("n_a")).alias("containment_a"),
            (F.col("n_inter") / F.col("n_b")).alias("containment_b"),
        )
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= threshold
        )
    )

    shingled = groups.join(
        sizes.select(F.col(id_col).alias("__rep")), "__rep", "left_semi"
    )
    same_pairs = expand_sorted_array_pairs(
        shingled.filter(F.size("__ids") >= 2).select("__ids")
    ).select(
        "id_a",
        "id_b",
        F.lit(1.0).alias("containment_a"),
        F.lit(1.0).alias("containment_b"),
    )

    ga = groups.select(
        F.col("__rep").alias("id_a"), F.col("__ids").alias("__ia")
    )
    gb = groups.select(
        F.col("__rep").alias("id_b"), F.col("__ids").alias("__ib")
    )
    cross_pairs = (
        rep_pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "containment_a", "containment_b", "__ib",
            F.explode("__ia").alias("x"),
        )
        .select(
            "containment_a", "containment_b", "x",
            F.explode("__ib").alias("y"),
        )
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            # The rep pair is oriented id_a < id_b over REP ids; member
            # expansion can flip the orientation, and containment is
            # direction-specific — swap the two values when x > y.
            F.when(F.col("x") <= F.col("y"), F.col("containment_a"))
            .otherwise(F.col("containment_b"))
            .alias("containment_a"),
            F.when(F.col("x") <= F.col("y"), F.col("containment_b"))
            .otherwise(F.col("containment_a"))
            .alias("containment_b"),
        )
    )
    if threshold > 1.0:
        same_pairs = same_pairs.filter(F.lit(False))
    return same_pairs.unionByName(cross_pairs)
