"""Physical-plan shape assertions: the 100 TB posture, checked in CI.

Correctness tests prove the numbers; these prove the *plans* — filters
reach the parquet scan, small sides broadcast, top-k never global-sorts,
LSH never degenerates to a cross product, scans prune columns. A plan
regression here is a scale bug even when sf0.001 results stay right.
"""

from __future__ import annotations

import pytest

from extract_transform_load_template_multidb_spark.queries import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_scan(spark, sf_dir):
    """q3's selective dimension filter must reach the customer scan."""
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "PushedFilters: [" in plan
    assert "c_mktsegment" in plan.split("PushedFilters")[1][:200] or (
        "EqualTo(c_mktsegment,BUILDING)" in plan
    )


def test_topk_no_global_sort(spark, sf_dir):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject, not a full
    Sort→Limit (a global sort of the fact table at 100 TB)."""
    for name in ("sort_limit_topk", "q3_shipping_priority",
                 "text_top_ngrams"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


def test_dimension_joins_broadcast(spark, sf_dir):
    """q5's nation/region/supplier joins must broadcast, never shuffle the
    fact side for a dimension."""
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3
    plan2 = _plan(spark, sf_dir, "join_broadcast_dim")
    assert "BroadcastHashJoin" in plan2


def test_aggregates_partial_then_final(spark, sf_dir):
    """q1 must map-side combine (two HashAggregate levels around the
    exchange) — at scale the partial agg is what bounds shuffle volume."""
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # partial + final HashAggregate pair around the grouping exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(l_returnflag" in plan


def test_no_cartesian_anywhere_in_lsh(spark, sf_dir):
    """LSH candidate generation must stay an equi-join on (band, hash);
    a cross/nested-loop join means all-pairs materialized."""
    for name in ("dedup_minhash_lsh", "dedup_embedding_cosine",
                 "sim_cosine_topk_lsh"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_column_pruning_reaches_scan(spark, sf_dir):
    """A 3-column aggregate over orders must not read the other columns."""
    plan = _plan(spark, sf_dir, "join_broadcast_dim")
    scan = plan[plan.index("ReadSchema"):][:300]
    assert "o_custkey" in scan and "o_totalprice" in scan
    assert "o_orderpriority" not in scan and "o_orderstatus" not in scan


def test_semi_anti_stay_semi_anti(spark, sf_dir):
    """EXISTS/NOT EXISTS must plan as semi/anti joins (no row explosion +
    distinct)."""
    assert "LeftSemi" in _plan(spark, sf_dir, "join_semi")
    assert "LeftAnti" in _plan(spark, sf_dir, "join_anti")


def test_window_extract_pushes_nothing_to_python(spark, sf_dir):
    """The reference-parity ETL queries must stay whole-stage-codegen
    JVM plans — no Python evaluation nodes."""
    for name in ("etl_window_extract", "etl_inf_null_clean",
                 "text_quality_score", "dedup_simhash"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_mapinpandas_only_where_intended(spark, sf_dir):
    """The multimodal extractors are the ONLY sanctioned pandas hops, and
    they must be Arrow-batched (MapInPandas), not row-at-a-time."""
    plan = _plan(spark, sf_dir, "mm_extract_features")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_jaccard_intersect_evaluated_once(spark, sf_dir):
    """The per-pair array_intersect in minhash verification must appear
    exactly once in the optimized plan. Without the nondeterministic fence
    in jaccard_pairs (operators/dedup.py), the caller's threshold filter is
    pushed into the join condition with the intersect re-inlined — three
    evaluations of the hot loop per row. Guards the fence against a Spark
    upgrade silently re-tripling the work."""
    df = QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    optimized = (
        df._jdf.queryExecution().optimizedPlan().toString()
    )
    assert optimized.count("array_intersect") == 1


def test_q18_having_filter_before_wide_join(spark, sf_dir):
    """Q18's threshold must reduce the orderkey set via aggregate+semi-join
    before the customer/lineitem joins — never aggregate after the joins."""
    plan = _plan(spark, sf_dir, "q18_large_volume_orders")
    assert "LeftSemi" in plan
    # the semi join's build side is the HAVING aggregate, so at least two
    # aggregates exist (threshold agg + final group)
    assert plan.count("HashAggregate") >= 2


def test_q16_dimension_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_supplier_variety")
    assert "BroadcastHashJoin" in plan
    # single-distinct aggregation plans as a (group, distinct-col) dedupe
    # aggregate feeding a partial_count(distinct) — assert the dedupe level
    # exists so a regression to a naive global distinct is caught
    assert "partial_count(distinct" in plan
    assert plan.count("HashAggregate") >= 3
    # the brand exclusion must reach the part scan
    assert "Not(EqualTo(p_brand," in plan


def _n_exchanges(plan: str) -> int:
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )


def test_scd2_single_key_shuffle(spark, sf_dir):
    """Both windows AND the per-run aggregate must reuse ONE exchange on
    the key (hash partitioning by a subset satisfies the (key, run)
    clustering) — a second shuffle here would double the cost of history
    builds at scale."""
    assert _n_exchanges(_plan(spark, sf_dir, "scd2_priority_history")) == 1


def test_chunking_is_exchange_free(spark, sf_dir):
    """Document chunking is map + explode only — any exchange means a
    regression shuffles the whole corpus."""
    assert _n_exchanges(_plan(spark, sf_dir, "curation_chunk_documents")) == 0


def test_packing_shuffles_once_by_shard(spark, sf_dir):
    assert _n_exchanges(_plan(spark, sf_dir, "curation_pack_sequences")) == 1


def test_null_profile_is_one_pass(spark, sf_dir):
    """The per-column profile must be a single global aggregate (one scan,
    one 1-row exchange), never a job per column."""
    plan = _plan(spark, sf_dir, "dq_null_profile_events")
    assert plan.count("FileScan") == 1
    assert _n_exchanges(plan) == 1


def test_salted_agg_two_level(spark, sf_dir):
    """The salted hot-key aggregation must shuffle twice — first on
    (key, salt) so no reducer owns a whole hot key, then on the key to
    merge n_salts partial rows — with map-side partial aggregation
    around both exchanges."""
    import re

    plan = _plan(spark, sf_dir, "agg_salted_hot_keys")
    assert re.search(
        r"Exchange hashpartitioning\(event_type#\d+, __salt#\d+", plan
    ), "first shuffle must key on (event_type, __salt)"
    assert re.search(
        r"Exchange hashpartitioning\(event_type#\d+, \d+\)", plan
    ), "second shuffle must key on event_type alone"
    # Four HashAggregate nodes: partial+final for each of the two levels.
    assert plan.count("HashAggregate") >= 4


def test_lang_id_is_exchange_free(spark, sf_dir):
    """Language ID must be a pure narrow map over the documents scan —
    per-language array-filter hit counts, no explode/join/groupBy. Any
    exchange here is a corpus-scale shuffle at 100 TB."""
    plan = _plan(spark, sf_dir, "text_lang_id")
    assert _n_exchanges(plan) == 0
    assert plan.count("FileScan") == 1


def test_pyfunc_queries_are_arrow_batched(spark, sf_dir):
    """The pyfunc demo queries must plan as Arrow-batched Python nodes
    (ArrowEvalPython / FlatMapGroupsInPandas) — BatchEvalPython anywhere
    means a row-at-a-time pickle loop snuck into the engine."""
    plan = _plan(spark, sf_dir, "pyfunc_vec_l2_norm")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    plan2 = _plan(spark, sf_dir, "pyfunc_grouped_median")
    assert "FlatMapGroupsInPandas" in plan2
    assert "BatchEvalPython" not in plan2


def test_decontaminate_broadcasts_eval_shingles(spark, sf_dir):
    """Decontamination must broadcast the eval shingle set and join it
    map-side — the corpus must NOT shuffle keyed by shingle (at 100 TB
    that exchange would dwarf the query). The only allowed corpus
    exchange is the per-doc hit count keyed by doc_id."""
    import re

    plan = _plan(spark, sf_dir, "curation_decontaminate")
    assert "BroadcastHashJoin" in plan
    # Exactly one shingle-keyed exchange: the eval set's own distinct,
    # nested beneath the BroadcastExchange (build side) — never the corpus.
    shingle_ex = list(
        re.finditer(r"Exchange hashpartitioning\(shingle#\d+", plan)
    )
    assert len(shingle_ex) == 1
    assert shingle_ex[0].start() > plan.index("BroadcastExchange")
    # The corpus-side exchange is the per-doc hit count, keyed by doc_id.
    assert re.search(r"Exchange hashpartitioning\(doc_id#\d+", plan)


def test_paragraph_dedup_no_cartesian(spark, sf_dir):
    """Paragraph-level LSH must keep the banded equi-join candidate shape
    of the document-level path — no cross/nested-loop join."""
    plan = _plan(spark, sf_dir, "dedup_minhash_paragraphs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_new_pair_generators_no_cartesian(spark, sf_dir):
    """SimHash banding, incremental delta×corpus banding, and the
    paragraph rebuild must all stay equi-join/window shaped — any
    cross/nested-loop join is an all-pairs scale bug."""
    for name in ("dedup_simhash_pairs", "dedup_incremental_minhash",
                 "curation_dedup_paragraphs", "text_rare_ngram_ratio"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_rare_ngram_partial_aggregates(spark, sf_dir):
    """The corpus n-gram count must map-side combine before its shuffle —
    at web scale the partial agg is what keeps the gram exchange bounded."""
    plan = _plan(spark, sf_dir, "text_rare_ngram_ratio")
    assert plan.count("HashAggregate") >= 2


def test_distributed_median_single_exchange(spark, sf_dir):
    """The exact-median query must reuse ONE exchange keyed by the group
    for both windows and the final aggregate — the property that makes it
    the scale-safe alternative to grouped applyInPandas."""
    assert _n_exchanges(
        _plan(spark, sf_dir, "agg_exact_median_distributed")
    ) == 1


def test_quality_filter_is_exchange_free(spark, sf_dir):
    """The composite keep/drop filter must stay a pure narrow map — at
    100 TB any exchange here is a corpus-scale shuffle for a row-local
    decision."""
    plan = _plan(spark, sf_dir, "text_quality_filter")
    assert _n_exchanges(plan) == 0
    assert plan.count("FileScan") == 1


def test_funnel_single_user_shuffle(spark, sf_dir):
    """All three funnel-step windows and the per-user aggregate must share
    ONE user_id exchange; the only other exchange is the final 1-row
    summary. A per-step self-join of the fact table would show here as
    extra hash exchanges."""
    plan = _plan(spark, sf_dir, "window_funnel_steps")
    assert _n_exchanges(plan) <= 2
    assert plan.count("Window") == 3


def test_numeric_profile_one_pass(spark, sf_dir):
    """All per-column stats must come from ONE scan + one 1-row
    aggregate — a per-column job loop is the anti-pattern."""
    plan = _plan(spark, sf_dir, "dq_numeric_profile_events")
    assert plan.count("FileScan") == 1
    assert _n_exchanges(plan) == 1


def test_linkage_no_cartesian(spark, sf_dir):
    """Blocked edit-distance candidates must come from the bucketed
    expansion — never a cross join of the table with itself."""
    plan = _plan(spark, sf_dir, "link_blocked_levenshtein")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q6_pushdown_and_pruning(spark, sf_dir):
    """Q6 is the pushdown showcase: every predicate must reach the parquet
    scan, and the scan must read only the four referenced columns out of
    eleven — at 100 TB this is the difference between scanning ~35% and
    100% of the table bytes."""
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    pushed = plan.split("PushedFilters")[1]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed[:400], col
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert read_schema.count(",") == 3  # 4 columns, none extra


def test_tpch_topk_queries_no_global_sort(spark, sf_dir):
    """Q10/Q21 ORDER BY + LIMIT must plan as TakeOrderedAndProject."""
    for name in ("q10_returned_items", "q21_waiting_suppliers"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


def test_q19_broadcast_not_cartesian(spark, sf_dir):
    """Q19's OR-of-ANDs predicate spans both join sides; the join must
    remain a broadcast hash join on the p_partkey equi-key with the
    disjunction as a post-join filter — never a nested-loop."""
    plan = _plan(spark, sf_dir, "q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q21_single_backbone_shuffle(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS pair is algebraized into one per-order
    aggregate: the flagged lineitem⋈orders join result must be shuffled
    on l_orderkey for the distinct-supplier counts, not self-joined once
    per quantifier (which would add two more lineitem-sized exchanges)."""
    plan = _plan(spark, sf_dir, "q21_waiting_suppliers")
    # flagged (lineitem⋈orders) feeds both the per-order agg and the
    # probe side → ≤2 lineitem scans; the quantifier-per-self-join shape
    # this guards against would need a third.
    assert plan.count("lineitem.parquet") <= 2
    assert "CartesianProduct" not in plan


def test_q17_decorrelated_single_lineitem_agg(spark, sf_dir):
    """Q17's correlated avg must decorrelate to one per-part aggregate
    joined back — the plan has exactly one l_partkey aggregate exchange
    feeding the probe join, not a per-row subquery."""
    plan = _plan(spark, sf_dir, "q17_small_qty_revenue")
    assert "Exchange hashpartitioning(l_partkey" in plan or (
        "Exchange hashpartitioning(t_partkey" in plan
    )
    assert "CartesianProduct" not in plan


def test_zscore_single_key_exchange(spark, sf_dir):
    """The rolling z-score must be ONE shuffle by user_id feeding one
    Window — Σv, Σv² and count all come from the same frame pass."""
    plan = _plan(spark, sf_dir, "ts_rolling_zscore")
    assert _n_exchanges(plan) == 1
    assert plan.count("Window") == 1


def test_cohort_retention_two_exchanges(spark, sf_dir):
    """Cohort retention: one shuffle by user for first-activity, one by
    (cohort, offset) for the distinct count — with partial per-partition
    dedup before the second (the HashAggregate pair below the exchange)."""
    plan = _plan(spark, sf_dir, "window_cohort_retention")
    assert _n_exchanges(plan) == 2


def test_ir_queries_no_cartesian(spark, sf_dir):
    """TF-IDF / BM25 / unigram-LM corpus statistics must never plan a
    CartesianProduct — the only conditionless joins are broadcast 1-row
    scalar attaches (N, total, avgdl)."""
    for name in ("text_tfidf_topterms", "text_bm25_search",
                 "text_unigram_logprob"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_ohlc_rollup_single_shuffle_no_window(spark, sf_dir):
    """The OHLC continuous aggregate must plan as ONE partial+final
    aggregation pair — struct-argmin open/close instead of a window
    function, so no sort-based Window exchange ever appears."""
    plan = _plan(spark, sf_dir, "ts_ohlc_rollup")
    assert "Window" not in plan
    assert plan.count("HashAggregate") + plan.count("SortAggregate") >= 2
    assert plan.count("Exchange") == 1, plan


def test_pq_codebook_and_adc_broadcast(spark, sf_dir):
    """PQ encoding and ADC scoring must broadcast the codebook/lookup
    sides — the corpus never shuffles against them, and no cartesian
    product may appear anywhere in the plan."""
    plan = _plan(spark, sf_dir, "sim_cosine_topk_pq")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_bpe_pair_stats_topk_and_partial_agg(spark, sf_dir):
    """BPE pair counting must map-side combine (partial+final aggregate)
    and take the top-k without a global sort."""
    plan = _plan(spark, sf_dir, "text_bpe_pair_stats")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2, plan


def test_salted_join_keys_include_salt(spark, sf_dir):
    """The salted join's keys must be (event_type, __salt) — the salt in
    the join keys IS the skew fix: if the dim is big enough to shuffle,
    each (key, salt) partition carries ~1/n of a hot key; here the
    40-row salted dim auto-broadcasts (better still — no fact shuffle),
    but the salt must survive into the join either way."""
    plan = _plan(spark, sf_dir, "join_salted_skew")
    import re

    m = re.search(
        r"(HashJoin|SortMergeJoin) \[event_type[^\]]*__salt", plan
    )
    assert m, plan


def test_rank1_compaction_uses_group_limit(spark, sf_dir):
    """CDC latest-state and the per-domain quota cap filter on
    row_number()<=k — Spark must rewrite both into WindowGroupLimit
    (bounded per-partition top-k heap), never a full per-key sort of the
    change log."""
    for name in ("etl_cdc_latest_state", "curation_domain_cap"):
        plan = _plan(spark, sf_dir, name)
        assert "WindowGroupLimit" in plan, name


def test_attribution_single_sort_no_join(spark, sf_dir):
    """Last-touch attribution must be the single-sort running-window
    formulation: no join operator of any kind in the plan (the naive
    event-to-event range self-join is quadratic in bursty users)."""
    plan = _plan(spark, sf_dir, "window_last_touch_attribution")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_interpolation_single_exchange_per_key(spark, sf_dir):
    """Linear-interpolation gap-fill merges grid+events into one per-user
    ordered stream: no join for the bracket search, and every exchange is
    keyed by user_id (grid generation + two window passes reuse it)."""
    import re

    plan = _plan(spark, sf_dir, "ts_interpolate_linear")
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    keys = set(
        m.group(1)
        for m in re.finditer(r"Exchange hashpartitioning\((\w+)#", plan)
    )
    assert keys <= {"user_id"}, keys


def test_iqr_fences_broadcast(spark, sf_dir):
    """The per-group Tukey fences must broadcast back onto the value
    stream — the fact side never shuffles for a 5-row fence table."""
    plan = _plan(spark, sf_dir, "dq_outlier_iqr")
    assert "BroadcastHashJoin" in plan


def test_matmul_topk_is_arrow_and_prunes(spark, sf_dir):
    """The matmul top-k must be an Arrow mapInPandas stage (never
    BatchEvalPython) and its only exchange is the final rank shuffle
    keyed by query_id — batch-local pruning means the full score matrix
    never shuffles."""
    import re

    plan = _plan(spark, sf_dir, "sim_cosine_topk_matmul")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    keys = set(
        m.group(1)
        for m in re.finditer(r"Exchange hashpartitioning\((\w+)#", plan)
    )
    assert keys <= {"query_id"}, keys


def test_mad_median_broadcast(spark, sf_dir):
    """MAD's per-group median table must broadcast back onto the value
    stream — same contract as the IQR fences."""
    plan = _plan(spark, sf_dir, "dq_mad_robust_spread")
    assert "BroadcastHashJoin" in plan


def test_dhash_pairs_banded_no_cartesian(spark, sf_dir):
    """Perceptual-pair candidates must come from the (band, value)
    equi-join — never an all-pairs image comparison."""
    plan = _plan(spark, sf_dir, "mm_dhash_hamming_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_checksum_partial_final_agg(spark, sf_dir):
    """The table checksum must partial-aggregate map-side: two
    HashAggregate/SortAggregate levels, so only one partial row per
    partition reaches the final reduce."""
    plan = _plan(spark, sf_dir, "dq_table_checksum")
    n_aggs = plan.count("HashAggregate") + plan.count("SortAggregate")
    assert n_aggs >= 2


def test_dead_letter_parse_is_jvm_side(spark, sf_dir):
    """Dead-letter JSON routing must stay whole-stage JVM (from_json):
    any Python eval node means payload parsing fell off the fast path."""
    plan = _plan(spark, sf_dir, "etl_dead_letter_json")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_entropy_single_key_exchange(spark, sf_dir):
    """Categorical entropy: the (user,type) count, the per-user total
    window, and the final rollup must all ride ONE user_id-compatible
    exchange chain — no second shuffle key."""
    import re

    plan = _plan(spark, sf_dir, "agg_entropy_categorical")
    keys = set(
        m.group(1)
        for m in re.finditer(r"Exchange hashpartitioning\((\w+)#", plan)
    )
    assert keys <= {"user_id"}, keys


def test_linkpred_topk_no_cartesian(spark, sf_dir):
    """Common-neighbors link prediction: the wedge join must stay an
    equi-join on the shared middle vertex (no all-pairs), and the top-30
    must plan as TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, sf_dir, "graph_linkpred_common_neighbors")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_centroid_margin_broadcasts_centroids(spark, sf_dir):
    """Label-centroid margins: the labels×dims centroid table must
    broadcast — the corpus side must never shuffle for the join."""
    plan = _plan(spark, sf_dir, "sim_label_centroid_margin")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_knn_vote_broadcasts_queries_and_labels(spark, sf_dir):
    """k-NN label vote: both the query vectors and the label lookup are
    dimension-sized and must broadcast against the corpus pass."""
    plan = _plan(spark, sf_dir, "sim_knn_label_vote")
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2
    assert "CartesianProduct" not in plan


def test_cusum_argmax_single_row_limit(spark, sf_dir):
    """CUSUM change-point: the argmax must plan as TakeOrderedAndProject
    (1-row), never a full sort of the daily series."""
    plan = _plan(spark, sf_dir, "window_cusum_changepoint")
    assert "TakeOrderedAndProject" in plan


def test_welch_sufficient_stats_partial_agg(spark, sf_dir):
    """Welch t-test: the (n, Σx, Σx²) sufficient statistics must
    partial-aggregate map-side so only per-partition partials shuffle."""
    plan = _plan(spark, sf_dir, "agg_welch_t_test")
    assert plan.count("HashAggregate") + plan.count("SortAggregate") >= 2


def test_lateral_topn_decorrelates_to_group_limit(spark, sf_dir):
    """Correlated LATERAL (ORDER BY+LIMIT per customer) must decorrelate
    into a join + WindowGroupLimit — never a per-row subquery re-execution
    or a cartesian."""
    plan = _plan(spark, sf_dir, "join_lateral_topn_orders")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_any_all_broadcasts_extrema(spark, sf_dir):
    """Quantified ALL/ANY rewrite: the per-nation extrema table must
    broadcast against the supplier scan."""
    plan = _plan(spark, sf_dir, "subquery_any_all_quantified")
    assert "BroadcastHashJoin" in plan


def test_theta_band_join_no_cartesian(spark, sf_dir):
    """The ±1% price theta join must ride the banded equi-join — a
    cartesian/BNLJ here means the non-equi predicate leaked into the
    join condition."""
    plan = _plan(spark, sf_dir, "join_theta_price_band")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zipf_topn_group_limit(spark, sf_dir):
    """Zipf fit: the top-200 rank cut must not global-sort the whole
    vocabulary — WindowGroupLimit (or TakeOrdered) bounds it."""
    plan = _plan(spark, sf_dir, "text_zipf_fit")
    assert ("WindowGroupLimit" in plan) or ("TakeOrderedAndProject" in plan)


def test_ks_shuffles_distinct_values_only(spark, sf_dir):
    """KS statistic: the heavy input collapses to distinct values BEFORE
    any window — the plan must aggregate, then window, never window the
    raw rows."""
    plan = _plan(spark, sf_dir, "agg_ks_two_sample")
    assert plan.count("HashAggregate") + plan.count("SortAggregate") >= 2
    assert "TakeOrderedAndProject" in plan


def test_attribution_single_user_exchange_chain(spark, sf_dir):
    """Multi-touch attribution: sessionization, conversion anchoring,
    and path sizing must all ride user_id-compatible exchanges — no
    additional shuffle key creeps in before the final event_type
    rollup."""
    import re

    plan = _plan(spark, sf_dir, "ts_multi_touch_attribution")
    keys = set(
        m.group(1)
        for m in re.finditer(r"Exchange hashpartitioning\((\w+)#", plan)
    )
    assert keys <= {"user_id", "event_type"}, keys


def test_bootstrap_se_single_pass_no_explode(spark, sf_dir):
    """Bootstrap SE of the mean: all 20 replicate weighted sums must
    come from ONE aggregation pass over the fact table — the only
    explode allowed is the post-aggregation unpack of the 1-row
    replicate array (a parent of the aggregate in the plan tree), never
    an explode-by-replicate under the agg multiplying the stream 20×."""
    plan = _plan(spark, sf_dir, "agg_bootstrap_se_mean")
    assert plan.count("Scan parquet") == 1
    gen = plan.find("Generate explode")
    # Plan strings print parents above children: an aggregate must sit
    # BELOW the explode (the explode consumes the 1-row replicate
    # array, it does not feed rows into the fact aggregation).
    assert gen == -1 or plan.find("HashAggregate", gen) != -1


def test_mahalanobis_broadcast_and_topk(spark, sf_dir):
    """Mahalanobis outliers: the 1-row moment table broadcasts back
    onto the stream and the outlier cut is a TakeOrderedAndProject,
    never a global sort of all scored rows."""
    plan = _plan(spark, sf_dir, "agg_mahalanobis_outliers")
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_gini_split_no_single_reducer_percentile(spark, sf_dir):
    """Gini split finder, post round-6 rewrite: the nine exact deciles
    must use the distributed running-count selector — no `percentile(`
    aggregate buffering o_totalprice on one reducer — and the candidate
    cuts broadcast against one labeled pass ending in a 1-row limit."""
    plan = _plan(spark, sf_dir, "agg_gini_split_finder")
    assert "percentile(" not in plan
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_exact_percentile_sites_distributed(spark, sf_dir):
    """Every converted exact-percentile site stays on the running-count
    selector: a Spark upgrade or refactor reintroducing the in-memory
    `percentile(` aggregate is the 100×-scale regression this guards."""
    for name in (
        "agg_percentiles",
        "ts_inter_order_gaps",
        "agg_priority_sla_compliance",
        "agg_trimmed_winsorized_means",
        "dq_outlier_iqr",
        "dq_mad_robust_spread",
        "curation_corpus_datacard",
        "dq_join_fanout_profile",
    ):
        assert "percentile(" not in _plan(spark, sf_dir, name), name


def test_fourier_bounded_frequency_fanout(spark, sf_dir):
    """Fourier top periods: the DFT fan-out must be the bounded
    frequency grid (posexplode of a fixed-length array), aggregated
    partial-then-final, with the top-period cut a limited sort."""
    plan = _plan(spark, sf_dir, "ts_fourier_top_periods")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_decode_jpeg_single_arrow_stage_no_shuffle(spark, sf_dir):
    """JPEG decode: synthesize→decode must be a narrow Arrow map chain —
    exactly the two intended Python stages, no exchange of payload
    bytes beyond the deliberate media repartition."""
    plan = _plan(spark, sf_dir, "mm_decode_jpeg")
    assert plan.count("MapInPandas") == 2
    assert "BatchEvalPython" not in plan


def test_correlated_scalar_decorrelates(spark, sf_dir):
    """The correlated scalar subquery must decorrelate to ONE aggregate
    over orders joined back on o_custkey — never a per-outer-row
    re-execution (no nested-loop join of the subquery side)."""
    plan = _plan(spark, sf_dir, "subquery_correlated_scalar")
    assert plan.count("HashAggregate") >= 2  # partial+final of ONE agg
    assert "CartesianProduct" not in plan
    # Exactly two scans of orders: the outer side and the decorrelated
    # aggregate side (per-row re-execution would show neither — it
    # would be a lateral loop — and a third scan means the rewrite
    # duplicated the subquery).
    assert plan.count("Scan parquet") <= 3


def test_key_gap_audit_no_global_sort(spark, sf_dir):
    """The key-gap audit must stay an anti-join (hash shuffles, full
    parallelism) — a lag-window formulation would globally sort every
    key on one executor at 100 TB."""
    plan = _plan(spark, sf_dir, "dq_key_sequence_gaps")
    assert "Window" not in plan
    assert "Sort [k" not in plan


def test_mann_kendall_pairs_on_bounded_rollup(spark, sf_dir):
    """Mann-Kendall: the O(days²) sign-pair join must run on the daily
    rollup (one fact aggregate FIRST, then a broadcast inequality
    join) — never a fact-table cartesian."""
    plan = _plan(spark, sf_dir, "ts_mann_kendall_trend")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # inequality join, tiny side
    # The events scan feeds an aggregate before any join.
    assert plan.count("HashAggregate") >= 2


def test_kendall_tau_pairs_on_bounded_rollup(spark, sf_dir):
    """Kendall tau-b: same posture — concordance pairs over the daily
    rollup via broadcast, tie terms as partial-aggregable groupBys."""
    plan = _plan(spark, sf_dir, "agg_kendall_tau_daily")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_fisher_exact_in_plan_no_python(spark, sf_dir):
    """Fisher exact: the log-factorial table, tail fan-out, and nine
    term joins are all JVM-side (broadcast hash joins over range()) —
    no Python evaluation anywhere."""
    plan = _plan(spark, sf_dir, "agg_fisher_exact_2x2")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert plan.count("BroadcastHashJoin") >= 8  # nine lnf lookups


def test_adamic_adar_degree_broadcast(spark, sf_dir):
    """Adamic-Adar: the per-middle-vertex degree table joins in as a
    broadcast (it is ≤ |V|, tiny next to the wedge fan-out), and the
    final top-30 plans as TakeOrderedAndProject."""
    plan = _plan(spark, sf_dir, "graph_linkpred_adamic_adar")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_skipgram_linear_fanout_topk(spark, sf_dir):
    """Skip-gram PPMI: pair generation is zip_with slices (narrow,
    linear), marginals join back hash-side, and top-20 is a
    TakeOrderedAndProject — no quadratic token self-join."""
    plan = _plan(spark, sf_dir, "text_skipgram_ppmi")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_clipping_profile_single_arrow_stage(spark, sf_dir):
    """Audio clipping: synthesize→profile is a narrow two-stage Arrow
    map chain with no shuffle of payload bytes."""
    plan = _plan(spark, sf_dir, "mm_audio_clipping_detect")
    assert plan.count("MapInPandas") == 2
    assert "Exchange" not in plan.split("MapInPandas")[0]


def test_not_in_plans_null_aware_anti_join(spark, sf_dir):
    """NOT IN against a nullable subquery must plan Spark's null-aware
    anti join (the NAAJ broadcast form) — the semantics-preserving
    plan, not a plain anti join."""
    plan = _plan(spark, sf_dir, "subquery_not_in_null_semantics")
    # The null-aware form is the broadcast hash LeftAnti with the
    # isNullAwareAntiJoin flag set (trailing `true`); the NULL-stripped
    # variant in the same query plans the plain form (`false`).
    assert "LeftAnti, BuildRight, true" in plan
    assert "LeftAnti, BuildRight, false" in plan


def test_dsir_broadcast_logratio_topk(spark, sf_dir):
    """DSIR selection: the 64-row smoothed log-ratio table must broadcast
    back onto per-doc bucket counts (never shuffle the counts by bucket
    for the join) and top-50 must plan as TakeOrderedAndProject."""
    plan = _plan(spark, sf_dir, "curation_dsir_importance")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_rake_linear_phrase_pipeline(spark, sf_dir):
    """RAKE: phrase segmentation is a per-doc running window, scoring is
    hash joins on word/phrase keys, top-20 is TakeOrderedAndProject —
    no cross products, no Python in the plan."""
    plan = _plan(spark, sf_dir, "text_rake_keywords")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_lsh_recall_audit_broadcast_no_cartesian(spark, sf_dir):
    """Embedding LSH recall audit: ground truth joins bucket codes via
    broadcast; nothing degenerates to an all-pairs product."""
    plan = _plan(spark, sf_dir, "sim_lsh_candidate_recall")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_davies_bouldin_broadcast_centroids(spark, sf_dir):
    """Davies-Bouldin: the label×dim centroid table broadcasts back to
    member elements; the L×L peer stage never cross-products the
    element table."""
    plan = _plan(spark, sf_dir, "sim_davies_bouldin_index")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_mmr_bounded_pool_no_cartesian(spark, sf_dir):
    """MMR re-ranking: the corpus pass is the distributed stage; the
    greedy walk is a bounded driver fold over the collected
    queries×pool frame, so the RESULT plan is a local table (plus the
    final rounding projection) — no joins, no Python eval nodes, and
    certainly no cartesian product anywhere."""
    plan = _plan(spark, sf_dir, "sim_mmr_diversified_topk")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan


def test_holt_two_window_passes(spark, sf_dir):
    """Brown/Holt double smoothing: two chained window passes over ONE
    daily series — the plan carries Window nodes but no join and only
    the aggregation + single-partition window exchanges."""
    plan = _plan(spark, sf_dir, "ts_holt_linear_forecast")
    assert "Window" in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 3


def test_tukey_hsd_broadcast_pairs(spark, sf_dir):
    """Tukey HSD: the 5-row per-group stats table self-pairs via a
    broadcast non-equi join plus a broadcast of the 1-row MSW scalar —
    never a partitioned cross product."""
    plan = _plan(spark, sf_dir, "agg_tukey_hsd_qstats")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_edge_density_single_arrow_chain(spark, sf_dir):
    """Image edge energy: PPM synthesis is pure expression (no Python),
    so the whole decode/gradient pass is ONE Arrow stage; at most the
    media-balance round-robin repartition sits upstream."""
    plan = _plan(spark, sf_dir, "mm_image_edge_density")
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_negbin_partial_aggregable(spark, sf_dir):
    """Negative-binomial fit: integer sufficient statistics must plan as
    partial+final hash aggregates (map-side combine), JVM-only."""
    plan = _plan(spark, sf_dir, "agg_negative_binomial_fit")
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan


def test_mattr_linear_no_range_join(spark, sf_dir):
    """MATTR: the sliding-window distinct count must use the linear
    last-occurrence identity (lag + agg), never a token×window range
    join."""
    plan = _plan(spark, sf_dir, "text_mattr_lexical_diversity")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "Window" in plan


def test_cuped_partial_aggregable(spark, sf_dir):
    """CUPED: per-user pairs then one scalar moment pass — partial+final
    hash aggregates, JVM-only."""
    plan = _plan(spark, sf_dir, "agg_cuped_variance_reduction")
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan


def test_sprt_single_series_no_join(spark, sf_dir):
    """SPRT monitor: one daily rollup + one running window; no joins
    anywhere in the plan."""
    plan = _plan(spark, sf_dir, "ts_sprt_ab_monitor")
    assert "Window" in plan
    assert "Join" not in plan


def test_range_count_broadcast_lookups_no_range_join(spark, sf_dir):
    """Prefix-sum range count: interval counts resolve via TWO broadcast
    equi-lookups against the bounded calendar — the plan must carry
    broadcast hash joins and no partitioned cross product."""
    plan = _plan(spark, sf_dir, "join_range_count_prefix_sum")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_croston_windows_partitioned_by_part(spark, sf_dir):
    """Croston: both EWMA window passes must partition by part (never a
    single global sort of all demand events)."""
    plan = _plan(spark, sf_dir, "ts_croston_intermittent_demand")
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan.split("Window")[0]
    assert "CartesianProduct" not in plan


def test_burrows_bounded_pair_stage(spark, sf_dir):
    """Burrows' Delta: after the token pass everything lives on the
    sources×30 frame via broadcast joins; top-10 is TakeOrdered."""
    plan = _plan(spark, sf_dir, "text_burrows_delta")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bloom_prefilter_before_exact_join(spark, sf_dir):
    """Bloom prefilter: the 1-row bitmap broadcast and the exact dim join
    must both be broadcast-side; the fact table never cross-products."""
    plan = _plan(spark, sf_dir, "join_bloom_prefilter")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_skew_planner_distributed_percentiles(spark, sf_dir):
    """Skew planner: per-key percentiles must use the running-count
    selector, never the single-reducer percentile aggregate."""
    plan = _plan(spark, sf_dir, "dq_shuffle_skew_planner")
    assert "percentile" not in plan.lower()
    assert "Window" in plan


def test_did_partial_aggregable(spark, sf_dir):
    """DiD: one fact pass to 2×2 cells with map-side combine; JVM-only."""
    plan = _plan(spark, sf_dir, "agg_diff_in_differences")
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_attribution_equi_join_on_user(spark, sf_dir):
    """Attribution lookback: the purchase×touch join must stay keyed on
    user_id (hash/sort-merge with the hour bound residual), never a
    time cross join."""
    plan = _plan(spark, sf_dir, "window_attribution_linear")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_katz_checkpointed_edges_decimal_contrib(spark, sf_dir):
    """Katz: unrolled iterations over the checkpointed edge list — no
    cartesian anywhere; contributions aggregate partial+final."""
    plan = _plan(spark, sf_dir, "graph_katz_centrality")
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_jsd_bounded_grid_stage(spark, sf_dir):
    """JSD: after the one token pass everything runs on the source×64
    grid via broadcast joins; top-10 is TakeOrdered; JVM-only."""
    plan = _plan(spark, sf_dir, "text_jsd_source_divergence")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_srm_distinct_rollup_jvm_only(spark, sf_dir):
    """SRM guardrail: distinct-user rollup plans as layered hash
    aggregates; JVM-only scalar dag after."""
    plan = _plan(spark, sf_dir, "agg_srm_guardrail")
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_eb_shrinkage_broadcast_pooled_scalar(spark, sf_dir):
    """EB shrinkage: per-customer moments shrink against ONE broadcast
    pooled-stats row; top-50 plans as TakeOrderedAndProject."""
    plan = _plan(spark, sf_dir, "agg_empirical_bayes_shrinkage")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_holt_winters_broadcast_index_join(spark, sf_dir):
    """Holt-Winters weekly: the 7-row seasonal index joins broadcast;
    the smoothing windows stay join-free after it."""
    plan = _plan(spark, sf_dir, "ts_holt_winters_weekly")
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_rfm_windows_over_customer_rollup(spark, sf_dir):
    """RFM: the three ntile windows run over the per-customer rollup
    (post-aggregation), never over the raw fact table."""
    plan = _plan(spark, sf_dir, "window_rfm_segmentation")
    assert "Window" in plan
    # the customer rollup aggregate must appear BEFORE (deeper than) the
    # window operators in the plan tree string
    assert plan.index("HashAggregate") < len(plan)
    assert "CartesianProduct" not in plan


def test_conformal_distributed_quantile_broadcast_scalar(spark, sf_dir):
    """Conformal interval: calibration quantile via the running-count
    selector (no single-reducer percentile aggregate); the test pass
    joins ONE broadcast scalar row."""
    plan = _plan(spark, sf_dir, "agg_conformal_interval")
    assert "percentile" not in plan.lower()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_boilerplate_linear_shingle_rollup(spark, sf_dir):
    """Boilerplate report: positional shingling is explode + hash-groupBy
    (linear); top-25 is TakeOrdered; no Python, no cross product beyond
    the 1-row scalar broadcast."""
    plan = _plan(spark, sf_dir, "dedup_boilerplate_ngrams")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_cvm_value_counts_running_window(spark, sf_dir):
    """CvM: evaluates on distinct-value groups with one running window —
    never the single-reducer percentile buffer, never Python."""
    plan = _plan(spark, sf_dir, "agg_cramer_von_mises_2sample")
    assert "percentile" not in plan.lower()
    assert "Window" in plan
    assert "BatchEvalPython" not in plan


def test_ltv_two_shuffles_bounded_output(spark, sf_dir):
    """Cohort LTV: cohort assignment + age rollup, per-cohort windows,
    TakeOrdered top-40 — no cross product."""
    plan = _plan(spark, sf_dir, "ts_cohort_ltv_projection")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_mcnemar_single_pass_jvm(spark, sf_dir):
    """McNemar: per-user flags then 4-cell rollup — layered partial+final
    hash aggregates, JVM-only."""
    plan = _plan(spark, sf_dir, "agg_mcnemar_paired_test")
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_textrank_linear_pair_generation(spark, sf_dir):
    """TextRank: co-occurrence pairs come from zip_with slices (linear,
    narrow), never a positional token self-join; top-20 is TakeOrdered
    and the graph loop stays cartesian-free."""
    plan = _plan(spark, sf_dir, "text_textrank_keywords")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # The rank loop starts from pagerank's localCheckpoint, so the pair
    # stage lives in the edge frame's own plan: assert the linear
    # zip_with shape there (no join at all before the distinct).
    from extract_transform_load_template_multidb_spark.catalog import (
        load_table,
    )
    from extract_transform_load_template_multidb_spark.operators import (
        dedup as dd,
    )
    from pyspark.sql import functions as F

    tl = load_table(spark, sf_dir, "documents").select(
        dd.tokenize(F.col("text")).alias("t")
    )
    n = F.size("t")
    pairs = tl.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.greatest(n - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(n - 1, F.lit(0))),
                lambda x, y: F.struct(x.alias("wa"), y.alias("wb")),
            )
        ).alias("p")
    )
    pplan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "zip_with" in pplan
    assert "Exchange" not in pplan


def test_its_segment_moments_broadcast_combine(spark, sf_dir):
    """ITS: per-segment OLS moments in one pass; the pre/post/breakpoint
    combine is broadcast 1-row joins, JVM-only."""
    plan = _plan(spark, sf_dir, "ts_interrupted_time_series")
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_naive_skill_two_lags_one_agg(spark, sf_dir):
    """Seasonal-naive skill: two lags over one ordered pass + one
    aggregate; no joins."""
    plan = _plan(spark, sf_dir, "ts_seasonal_naive_skill")
    assert "Window" in plan
    assert "Join" not in plan


def test_gamma_mom_partial_aggregable(spark, sf_dir):
    """Gamma MoM: one DECIMAL moment pass with map-side combine."""
    plan = _plan(spark, sf_dir, "agg_gamma_mom_fit")
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_hill_topk_no_global_sort(spark, sf_dir):
    """Hill estimator: the top-101 order statistics must plan as
    TakeOrderedAndProject, never a full sort of the fact table."""
    plan = _plan(spark, sf_dir, "agg_hill_tail_index")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_stl_anomalies_distributed_mad(spark, sf_dir):
    """Seasonal residual anomalies: median and MAD via the running-count
    selector (no single-reducer percentile); the seasonal table and the
    two scale scalars broadcast."""
    plan = _plan(spark, sf_dir, "ts_seasonal_residual_anomalies")
    assert "percentile" not in plan.lower()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_latency_no_self_join(spark, sf_dir):
    """Signup→purchase latency: conditional mins per user — no join of
    events to events, percentiles via the running selector."""
    plan = _plan(spark, sf_dir, "window_signup_to_purchase_latency")
    assert "percentile" not in plan.lower()
    assert "SortMergeJoin" not in plan


def test_stratified_ate_window_on_user_rollup(spark, sf_dir):
    """Stratified ATE: the ntile stratifier runs over the per-user rollup
    (not the fact table); the cell combine is a broadcast join."""
    plan = _plan(spark, sf_dir, "agg_stratified_ate")
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_seasonal_strength_broadcast_components(spark, sf_dir):
    """Seasonal strength: decomposition windows + one broadcast of the
    7-row seasonal table; single final scalar aggregate."""
    plan = _plan(spark, sf_dir, "ts_seasonal_strength")
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_markov_attribution_tiny_iteration_frames(spark, sf_dir):
    """Markov removal attribution: the journey rollup is the only
    distributed stage; the 12-step absorption walk now runs as a
    bounded driver fold over the collected ≤7-state transition table
    (the BPE-merge-table pattern), so the RESULT plan is a local table
    plus the rounding projection — no joins, no cartesian, no Python
    eval nodes."""
    plan = _plan(spark, sf_dir, "window_markov_removal_attribution")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
    assert "Join" not in plan


def test_lsh_mrr_no_cartesian_broadcast_truth(spark, sf_dir):
    """LSH MRR: truth and bucket rankings join on equi keys with the
    query set broadcast — never an all-pairs product."""
    plan = _plan(spark, sf_dir, "sim_lsh_mrr")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_wilcoxon_value_counts_running_rank(spark, sf_dir):
    """Wilcoxon: midranks come from the distinct-value running count —
    never a single-reducer percentile/rank buffer, JVM-only."""
    plan = _plan(spark, sf_dir, "agg_wilcoxon_signed_rank")
    assert "percentile" not in plan.lower()
    assert "Window" in plan
    assert "BatchEvalPython" not in plan


def test_friedman_ranks_within_week_blocks(spark, sf_dir):
    """Friedman: ranks partition by week (bounded blocks), never a global
    sort of the daily table in one partition... the week-partitioned
    window is the only sort."""
    plan = _plan(spark, sf_dir, "agg_friedman_weekday_test")
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_target_encoding_broadcast_group_stats(spark, sf_dir):
    """Target encoding: group stats and the 1-row global prior broadcast
    back onto the keyed row scan — one group rollup, no re-shuffle of
    the fact rows."""
    plan = _plan(spark, sf_dir, "feature_target_encoding")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_auc_value_counts_rank_identity(spark, sf_dir):
    """AUC: one value-counts pass + running rank window — never a global
    per-row sort or a percentile buffer."""
    plan = _plan(spark, sf_dir, "agg_auc_rank_sum")
    assert "percentile" not in plan.lower()
    assert "Window" in plan
    assert "BatchEvalPython" not in plan


def test_ece_broadcast_cells_and_median(spark, sf_dir):
    """ECE: the median cut and cell rates broadcast back; bins come from
    one ntile window over the scored rows."""
    plan = _plan(spark, sf_dir, "agg_expected_calibration_error")
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_probscores_single_scored_pass(spark, sf_dir):
    """Proper scores: one scored pass with broadcast cell rates; no
    Python, no cross product beyond the 1-row median broadcast."""
    plan = _plan(spark, sf_dir, "agg_probabilistic_scores")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_kpss_integer_exact_windows(spark, sf_dir):
    """KPSS: partial sums and lag products run in one ordered window pass
    over the bounded daily series; integer-exact until the final
    division (no percentile, no Python)."""
    plan = _plan(spark, sf_dir, "ts_kpss_stationarity")
    assert "Window" in plan
    assert "percentile" not in plan.lower()
    assert "BatchEvalPython" not in plan


def test_qini_windows_over_user_rollup(spark, sf_dir):
    """Qini: ntile + cumulative windows run over the per-user rollup and
    the 10-row decile table, never the fact table."""
    plan = _plan(spark, sf_dir, "agg_qini_uplift_deciles")
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_adf_integer_moments_one_pass(spark, sf_dir):
    """ADF: lag construction in one ordered window pass; all normal-
    equation moments partial-aggregable DECIMAL integers."""
    plan = _plan(spark, sf_dir, "ts_adf_unit_root")
    assert "Window" in plan
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_pettitt_rank_cumsum_takeordered(spark, sf_dir):
    """Pettitt: midranks via the value-counts running window, argmax via
    TakeOrdered — no per-split self-join of the series."""
    plan = _plan(spark, sf_dir, "ts_pettitt_changepoint")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_silhouette_broadcast_centroids_linear(spark, sf_dir):
    """Simplified silhouette: O(n·k) member×centroid distances with the
    centroid table broadcast — never pairwise members."""
    plan = _plan(spark, sf_dir, "sim_simplified_silhouette")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ktruss_equi_join_support_no_cartesian(spark, sf_dir):
    """k-truss: per-round edge support via oriented-adjacency equi-joins,
    checkpointed edge list, no cross product anywhere."""
    plan = _plan(spark, sf_dir, "graph_ktruss_edges")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_psi_two_fact_passes_broadcast_bounds(spark, sf_dir):
    """PSI: bounds/time-split is a 1-row broadcast back onto the stream;
    bin×side counting is partial-aggregable — no sort, no cartesian, and
    the 10-bin spine joins broadcast."""
    plan = _plan(spark, sf_dir, "dq_population_stability")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_grubbs_moments_broadcast_takeordered(spark, sf_dir):
    """Grubbs: one day-grouped agg, a 1-row moments broadcast, and the
    argmax day via TakeOrdered — never a global sort of the dailies."""
    plan = _plan(spark, sf_dir, "agg_grubbs_outlier")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_isotonic_minimax_on_bin_summary_only(spark, sf_dir):
    """Isotonic fit: ventile cuts broadcast back for binning (one fact
    pass), and the O(bins³) minimax join runs on the 20-row summary —
    the fact table must appear in exactly one scan."""
    plan = _plan(spark, sf_dir, "agg_isotonic_calibration")
    assert plan.count("orders.parquet") <= 2  # cuts pass + binning pass
    assert "CartesianProduct" not in plan


def test_woe_single_conditional_count_pass(spark, sf_dir):
    """WOE/IV: one 5-group conditional-count aggregate + a broadcast
    total — no second scan of orders, no join by priority."""
    plan = _plan(spark, sf_dir, "feature_woe_iv")
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in plan


def test_rrf_bounded_frames_after_scoring(spark, sf_dir):
    """RRF fusion: the cosine side broadcasts ONE query vector through
    the corpus and fusion joins two ≤50-row frames — no cartesian, no
    shuffle join of rankings."""
    plan = _plan(spark, sf_dir, "sim_rrf_fusion")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_ndcg_posting_list_single_tokenize(spark, sf_dir):
    """NDCG@10: relevance counts and BM25 share the posting-list shape;
    DCG/IDCG are ≤10-row aggregates (SortAggregate/HashAggregate over
    decimal sums), never a global sort of documents."""
    plan = _plan(spark, sf_dir, "text_ndcg_at_10")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_nelson_aalen_running_sum_bounded(spark, sf_dir):
    """Nelson-Aalen: per-customer aggregate → distinct-duration collapse
    → ONE running-sum window over the duration frame; the window must
    partition nothing bigger than the duration summary."""
    plan = _plan(spark, sf_dir, "agg_nelson_aalen_hazard")
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert plan.count("orders.parquet") == 1 or (
        plan.count("FileScan") == plan.count("orders.parquet")
    )


def test_spectral_entropy_constant_size_after_daily(spark, sf_dir):
    """Spectral entropy: one day-grouped pass; the 20-harmonic cross
    join multiplies the DAILY summary (broadcast range), not the fact
    table. The 20-row power summary is checkpointed (it feeds both the
    total and the probabilities), so the single daily pass sits behind
    the checkpoint — the visible plan must not re-scan orders."""
    plan = _plan(spark, sf_dir, "ts_spectral_entropy")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("orders.parquet") <= 1


def test_hits_linear_chain_broadcast_scores(spark, sf_dir):
    """HITS: every half-step joins the cached edge list against a
    BROADCAST score frame (8 BroadcastHashJoins), and the un-normalized
    chain never multiplies plans — no cartesian, no Python, and the
    edge list is built from exactly one lineitem scan."""
    plan = _plan(spark, sf_dir, "graph_hits_bipartite")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_lifecycle_window_on_distinct_userweeks(spark, sf_dir):
    """Lifecycle states: the lag/lead window shuffles the DISTINCT
    (user, week) frame, never the raw event stream, and the census is
    partial-aggregable."""
    plan = _plan(spark, sf_dir, "window_user_lifecycle_states")
    assert "Window" in plan
    assert plan.count("HashAggregate") >= 4  # distinct pair + census
    assert "CartesianProduct" not in plan


def test_vif_single_moments_pass(spark, sf_dir):
    """VIF: all three R² come from ONE 10-sum moments pass over
    lineitem — exactly one fact scan, correlations broadcast."""
    plan = _plan(spark, sf_dir, "agg_vif_multicollinearity")
    assert plan.count("lineitem.parquet") == 1


def test_allen_pairs_equi_join_on_orderkey(spark, sf_dir):
    """Allen census: the interval self-join must stay keyed on
    l_orderkey (bounded per-key fanout) — no cartesian; the only
    nested-loop join allowed is the 1-row share-total broadcast."""
    plan = _plan(spark, sf_dir, "join_allen_interval_relations")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_biprojection_pairgen_keyed_by_customer(spark, sf_dir):
    """Bipartite projection: pair generation is the per-customer
    equi-self-join of the checkpointed distinct edge list; degree
    tables broadcast; top-25 is TakeOrdered."""
    plan = _plan(spark, sf_dir, "graph_bipartite_projection")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_cms_sketch_fixed_state_broadcast_probe(spark, sf_dir):
    """CMS: the sketch is a 1024-cell aggregate (partial-aggregable ×4
    hash explode), and the top-10 probe broadcasts onto it — never a
    shuffle join keyed by user."""
    plan = _plan(spark, sf_dir, "agg_cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_simpson_pooled_from_stratum_sums(spark, sf_dir):
    """Simpson screen: the pooled row must be the SUM of the stratum
    moments (decimal sums are associative), not a second fact scan —
    the checkpointed moments hide the single lineitem pass."""
    plan = _plan(spark, sf_dir, "agg_simpson_paradox_detector")
    assert plan.count("lineitem.parquet") == 0  # behind the checkpoint
    assert "CartesianProduct" not in plan


def test_peak_prominence_bounded_frames(spark, sf_dir):
    """Peak detection: every MAX/MIN is a bounded ROWS frame over the
    day-ordered aggregate; top-5 is TakeOrdered, no self-join of the
    series."""
    plan = _plan(spark, sf_dir, "ts_peak_prominence")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan or "BroadcastHashJoin" not in plan


def test_concurrency_sweep_day_partitioned_window(spark, sf_dir):
    """Sweep line: the boundary running sum must be PARTITIONED by day
    (two-level prefix sum) — a global-order window over all boundaries
    is the single-partition hazard this query exists to avoid. The only
    unpartitioned window runs over the day-count frame."""
    plan = _plan(spark, sf_dir, "window_concurrency_sweep")
    assert "Window" in plan
    assert "hashpartitioning(day_bucket" in plan
    assert "CartesianProduct" not in plan


def test_contingency_margins_on_cell_table(spark, sf_dir):
    """Residuals: margins are windows over the ≤|rf|×|ls| cell table;
    exactly one lineitem scan."""
    plan = _plan(spark, sf_dir, "agg_contingency_residuals")
    assert plan.count("lineitem.parquet") == 1


def test_average_precision_user_dim_window(spark, sf_dir):
    """AP: the ranking window runs over the per-user aggregate; the
    event stream is scanned once and reduced before any sort."""
    plan = _plan(spark, sf_dir, "agg_average_precision")
    assert plan.count("events.parquet") == 1
    assert "CartesianProduct" not in plan


def test_ljung_box_integer_sums_day_frame(spark, sf_dir):
    """Ljung-Box: autocovariances from integer sums over the
    checkpointed day-index frame — the single events pass sits behind
    the checkpoint, so the visible plan re-scans nothing."""
    plan = _plan(spark, sf_dir, "ts_ljung_box_q")
    assert plan.count("events.parquet") == 0
    assert "CartesianProduct" not in plan


def test_kruskal_midranks_value_counts(spark, sf_dir):
    """Kruskal-Wallis: midranks via the value-counts running window
    (checkpointed), group sums one 7-group aggregate — one orders
    scan feeding both the dailies and the rank join."""
    plan = _plan(spark, sf_dir, "ts_kruskal_wallis_weekday")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_haar_levels_halve_behind_checkpoints(spark, sf_dir):
    """Haar: each lifting level is one pair-index groupBy of a frame
    that halves; the fact pass sits behind the first checkpoint, so
    the visible plan re-scans nothing."""
    plan = _plan(spark, sf_dir, "ts_haar_wavelet_energy")
    assert plan.count("orders.parquet") == 0
    assert "CartesianProduct" not in plan


def test_tile_stats_arrow_only_python(spark, sf_dir):
    """Tile stats: the decode pass must be Arrow-batched mapInPandas
    (ArrowEvalPython/MapInPandas), never row-at-a-time BatchEvalPython,
    and a narrow map — no shuffle before the Python hop."""
    plan = _plan(spark, sf_dir, "mm_image_tile_stats")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_minmax_bounds_before_python_hop(spark, sf_dir):
    """mapInPandas minmax: the bounds aggregate broadcasts onto the
    stream BEFORE the Python hop; the map is narrow and Arrow-batched."""
    plan = _plan(spark, sf_dir, "pyfunc_mapinpandas_minmax")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_hist_sketch_fixed_state_aggregate(spark, sf_dir):
    """Histogram sketch: the per-window state is a plain (window, bin)
    count aggregate — partial+final around one exchange, quantile
    extraction windowed over the ≤100-bin cell table."""
    plan = _plan(spark, sf_dir, "stream_hist_quantile_sketch")
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_debounce_hourly_rollup_window(spark, sf_dir):
    """Debounce: one fact aggregate to the hourly frame, lags over the
    ≤hours frame — exact integer condition, no float threshold."""
    plan = _plan(spark, sf_dir, "window_alert_debounce")
    assert plan.count("events.parquet") == 1
    assert "Window" in plan


def test_disjunctive_rewrite_all_hash_joins(spark, sf_dir):
    """Disjunctive rewrite: every disjunct leg is a HASH join (the
    whole point — the naive OR join would be a nested loop). Two hash
    joins now cover the three counts: the key leg and the conjunctive
    A∩B leg share one orderkey equi-join (conditional count), and the
    date leg is a per-date count-product join that never materializes
    matched rows. The only nested loop is the 1-row count combine."""
    plan = _plan(spark, sf_dir, "join_disjunctive_union_rewrite")
    assert "CartesianProduct" not in plan
    assert (
        plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin") >= 2
    )
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_confusion_one_pass_conditional_counts(spark, sf_dir):
    """Confusion metrics: one per-user pass, one 4-cell conditional
    aggregate — exactly one events scan, no join."""
    plan = _plan(spark, sf_dir, "agg_confusion_threshold_metrics")
    assert plan.count("events.parquet") == 1
    assert "Join" not in plan


def test_phrase_search_postings_filtered_before_join(spark, sf_dir):
    """Phrase search: the adjacency join touches only the two query
    terms' postings — the word filter must sit below the join, and the
    join is an equi-join on (doc, position)."""
    plan = _plan(spark, sf_dir, "text_phrase_search_positional")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_clamped_balance_two_stacked_windows(spark, sf_dir):
    """Clamped balance: prefix sum + running min on ONE (part, day)
    exchange — no recursive/self-join fallback for the sequential
    recurrence."""
    plan = _plan(spark, sf_dir, "window_clamped_running_balance")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(part") >= 1


def test_dup_payment_equi_blocked_self_join(spark, sf_dir):
    """Duplicate-payment audit: the self-join must hash on the
    (custkey, bucket) blocking key; the date window is a residual
    filter, never a nested-loop condition."""
    plan = _plan(spark, sf_dir, "dq_duplicate_payment_detector")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_as_was_as_is_residual_validity_join(spark, sf_dir):
    """As-was/as-is: both attributions are equi-joins on the customer
    key (validity is residual); the combine is a tiny full-outer — no
    cartesian, no range-join explosion."""
    plan = _plan(spark, sf_dir, "scd2_as_was_vs_as_is")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nn1d_no_global_sort_of_fact(spark, sf_dir):
    """1-D all-NN: the fact-sized windows are partitioned by the price
    bucket; the only unpartitioned window runs over the checkpointed
    boundary stream. No global Sort of the orders frame outside the
    bucket exchange."""
    plan = _plan(spark, sf_dir, "join_nearest_price_neighbor")
    assert "Exchange hashpartitioning(bkt" in plan or (
        "hashpartitioning(bkt" in plan
    )
    assert "CartesianProduct" not in plan


def test_interval_coalesce_one_key_exchange(spark, sf_dir):
    """Interval coalesce: running max-of-ends, island cumsum and the
    merge all ride ONE (part) hash exchange — no self-join of
    intervals."""
    plan = _plan(spark, sf_dir, "window_interval_coalesce")
    assert "Join" not in plan
    assert "hashpartitioning(part" in plan


def test_western_electric_bounded_frames(spark, sf_dir):
    """WE rules: z from a 1-row moments broadcast; every rule is a
    bounded ROWS frame over the day series — no self-joins."""
    plan = _plan(spark, sf_dir, "ts_western_electric_rules")
    assert "CartesianProduct" not in plan
    assert plan.count("orders.parquet") <= 2  # daily + moments branch


def test_weighted_sample_narrow_map_topk(spark, sf_dir):
    """ES weighted sample: one narrow map over documents, TakeOrdered
    top-k — no shuffle beyond the top-k merge, no Python."""
    plan = _plan(spark, sf_dir, "curation_weighted_sample_es")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan


def test_zcr_arrow_narrow_map(spark, sf_dir):
    """ZCR: Arrow-batched decode, narrow map, no shuffle, no
    row-at-a-time Python."""
    plan = _plan(spark, sf_dir, "mm_wav_zero_crossing_rate")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_interval_integrity_one_key_window(spark, sf_dir):
    """Interval audit: one key-partitioned lead window, two stacked
    aggregates — one orders scan, no join."""
    plan = _plan(spark, sf_dir, "dq_interval_integrity_audit")
    assert plan.count("orders.parquet") == 1
    assert "Join" not in plan


def test_rolling_slope_frame_sums_no_refit(spark, sf_dir):
    """Rolling OLS: the five regression sums are frame windows over the
    daily series — one orders scan, no per-window self-join."""
    plan = _plan(spark, sf_dir, "window_rolling_ols_slope")
    assert plan.count("orders.parquet") == 1
    assert "Join" not in plan


def test_ratio_delta_two_stacked_aggregates(spark, sf_dir):
    """Delta CI: per-user aggregate then a 1-row moments pass — one
    events scan, no join, everything else scalar algebra."""
    plan = _plan(spark, sf_dir, "agg_ratio_metric_delta_ci")
    assert plan.count("events.parquet") == 1
    assert "Join" not in plan


def test_asof_forward_single_shuffle_carry(spark, sf_dir):
    """Forward as-of: the reversed union+carry — ONE key exchange, a
    descending-time running window, no per-row subquery and no fanout
    join+regroup."""
    plan = _plan(spark, sf_dir, "join_asof_forward_next_order")
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 1
    assert "SortMergeJoin" not in plan


def test_mod97_codegen_no_python(spark, sf_dir):
    """Mod-97: the Horner fold is a higher-order expression — stays in
    codegen, no Python, one narrow scan."""
    plan = _plan(spark, sf_dir, "scalar_mod97_checksum")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_record_days_running_max(spark, sf_dir):
    """Record days: one running-max window over the daily frame; the
    record-number window runs over the near-empty record subset."""
    plan = _plan(spark, sf_dir, "ts_record_breaking_days")
    assert plan.count("orders.parquet") == 1
    assert "Join" not in plan


def test_pvm_year_slices_one_pass(spark, sf_dir):
    """PVM: one year-grouped pass feeds both year slices (part-keyed
    join of two filters over the SAME aggregate); top-20 movers via
    TakeOrdered."""
    plan = _plan(spark, sf_dir, "agg_price_volume_mix")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_abc_xyz_windows_over_part_summary(spark, sf_dir):
    """ABC/XYZ: the Pareto cumsum and totals are windows over the PART
    summary, never the fact table — one lineitem scan."""
    plan = _plan(spark, sf_dir, "agg_abc_xyz_classification")
    assert plan.count("lineitem.parquet") == 1
    assert "Join" not in plan


def test_ql_dirichlet_broadcast_corpus_stats(spark, sf_dir):
    """Dirichlet QL: the 3-row corpus term stats broadcast onto the
    doc-length frame; top-50 via TakeOrdered."""
    plan = _plan(spark, sf_dir, "text_query_likelihood_dirichlet")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_span_corruption_pure_expression(spark, sf_dir):
    """Span corruption: the whole mask plan is a per-doc array
    expression — one narrow documents scan, no shuffle, no Python."""
    plan = _plan(spark, sf_dir, "curation_span_corruption_stats")
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_time_decay_attr_bounded_touch_join(spark, sf_dir):
    """Time-decay attribution: user-keyed equi-join with the hour
    window residual (same shape as the linear model); normalization is
    one purchase-partitioned window — no cartesian, no Python."""
    plan = _plan(spark, sf_dir, "window_attribution_time_decay")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_burn_rate_two_frames_one_pass(spark, sf_dir):
    """Burn rate: hourly conditional counts in one fact pass, the two
    alert windows are bounded ROWS frames — no self-joins."""
    plan = _plan(spark, sf_dir, "dq_slo_burn_rate_alerts")
    assert plan.count("events.parquet") == 1
    assert "Join" not in plan


def test_join_forecast_profiles_before_join(spark, sf_dir):
    """Join forecast: the prediction side joins two key PROFILES
    (grouped counts), not the fact tables; only the verification leg
    runs the real join."""
    plan = _plan(spark, sf_dir, "dq_join_cardinality_forecast")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4


def test_binseg_halving_segments_checkpointed(spark, sf_dir):
    """Binary segmentation: the daily series is checkpointed once and
    each stage's argmax is TakeOrdered — halves filter against the
    broadcast 1-row split, no cartesian."""
    plan = _plan(spark, sf_dir, "ts_binary_segmentation_pettitt")
    assert "CartesianProduct" not in plan
    assert plan.count("orders.parquet") == 0  # behind the checkpoint


def test_walks_lockstep_frontier_joins(spark, sf_dir):
    """Deterministic walks: each step is one equi-join of the walk
    frontier against the adjacency table — 4 joins total, no cartesian,
    no Python, no per-walk iteration."""
    plan = _plan(spark, sf_dir, "graph_deterministic_walks")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_gradient_orientation_arrow_narrow(spark, sf_dir):
    """Gradient histogram: Arrow-batched decode, narrow map, no
    shuffle, no row-at-a-time Python."""
    plan = _plan(spark, sf_dir, "mm_image_gradient_orientation")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_division_counting_not_double_not_exists(spark, sf_dir):
    """Relational division: the 'for all' is counting — divisor
    broadcast semi-restricts the facts, coverage compares to a 1-row
    broadcast |divisor|; no correlated anti-joins."""
    plan = _plan(spark, sf_dir, "set_relational_division")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_markov_next_broadcast_argmax(spark, sf_dir):
    """Markov baseline: the 25-cell transition argmax broadcasts back
    onto the checkpointed transition stream — one events scan behind
    the checkpoint, no fact-sized second window."""
    plan = _plan(spark, sf_dir, "ts_markov_next_event_accuracy")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_drawdown_two_stacked_windows_takeordered(spark, sf_dir):
    """Max drawdown: prefix sum + running max on one day ordering,
    argmax via TakeOrdered — no self-join, series checkpointed once."""
    plan = _plan(spark, sf_dir, "ts_max_drawdown_demeaned")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_kwic_slices_local_no_corpus_rejoin(spark, sf_dir):
    """KWIC: context windows slice the hit's own token array — no join
    back to the corpus, no position explosion beyond the query term."""
    plan = _plan(spark, sf_dir, "text_kwic_concordance")
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_registry_rejects_duplicate_names():
    """The registry must raise on duplicate query names — a silent
    dict-wins overwrite shadows the earlier implementation out of every
    correctness gate (found live: three collisions across sessions)."""
    import pytest as _pytest

    from extract_transform_load_template_multidb_spark.queries import (
        QUERIES,
        query,
    )

    existing = next(iter(QUERIES))
    with _pytest.raises(ValueError, match="duplicate query registration"):
        query(existing)(lambda spark, sf: None)


def test_retention_decay_collapsed_frames(spark, sf_dir):
    """Retention decay: OLS runs on the ≤weeks-count retention frame
    after the distinct (user, offset) collapse — no fact-sized window,
    no cartesian."""
    plan = _plan(spark, sf_dir, "ts_retention_decay_fit")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4


def test_cat_drift_single_conditional_pass(spark, sf_dir):
    """Categorical drift: time bounds broadcast back, one 5x2
    conditional-count pass, margins over the cell table — two events
    scans at most (bounds + counting)."""
    plan = _plan(spark, sf_dir, "dq_categorical_drift_chi2")
    assert plan.count("events.parquet") <= 2
    assert "CartesianProduct" not in plan


def test_beta_binomial_single_pass_no_join(spark, sf_dir):
    """Beta-binomial posterior: one conditional-count pass over orders;
    everything downstream is scalar algebra — no join, one scan."""
    plan = _plan(spark, sf_dir, "agg_beta_binomial_posterior")
    assert plan.count("orders.parquet") == 1
    assert "Join" not in plan


def test_base62_codegen_narrow(spark, sf_dir):
    """Base62 encode: pure higher-order expression — no Python, no
    shuffle, one narrow filtered scan."""
    plan = _plan(spark, sf_dir, "scalar_base62_encode")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_png_decode_is_arrow_only_narrow_map(spark, sf_dir):
    """mm_decode_png must plan as Arrow-batched MapInPandas (synthesize +
    decode), never BatchEvalPython, and with no exchange beyond the
    bounded media repartition — decode is a narrow map at 100 TB."""
    plan = _plan(spark, sf_dir, "mm_decode_png")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_hilbert_queries_stay_pure_codegen(spark, sf_dir):
    """The Hilbert layout queries unroll to integer expressions — any
    Python evaluation node or cartesian means the unrolling broke."""
    for name in ("layout_hilbert_order", "layout_pruning_simulation"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_fuzzy_levenshtein_is_blocked_equi_join(spark, sf_dir):
    """Record linkage must join on the blocking key (hash join), with the
    edit distance as a post-join filter — never a cartesian/nested-loop
    over the part table."""
    plan = _plan(spark, sf_dir, "join_fuzzy_levenshtein")
    assert (
        "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan


def test_url_canonicalization_is_jvm_only(spark, sf_dir):
    """URL surgery (parse_url + array filter/sort) must stay codegen —
    a Python UDF here would put string munging on the slow path for
    every scraped URL at 100 TB."""
    plan = _plan(spark, sf_dir, "dedup_url_canonical_groups")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_token_budget_select_no_corpus_global_sort(spark, sf_dir):
    """The budgeted-selection query must never single-task-sort the
    corpus: the ONLY Exchange SinglePartition allowed is the one over
    the per-score HashAggregate (score-domain-sized), and the window
    that touches corpus rows must be hash-partitioned on the score
    band. Pins the round-8 two-pass rewrite."""
    plan = _plan(spark, sf_dir, "curation_token_budget_select")
    assert plan.count("Exchange SinglePartition") == 1
    single = plan.split("Exchange SinglePartition", 1)[1]
    # Directly beneath the single-partition exchange: the per-score
    # aggregate, NOT a documents scan.
    head = single[:400]
    assert "HashAggregate" in head, head
    # The corpus-row window is partitioned (band column in the partition
    # spec produces a hashpartitioning exchange on n_chars).
    assert "Exchange hashpartitioning(n_chars" in plan


def test_bpe_apply_is_narrow_jvm_map(spark, sf_dir):
    """Corpus-wide BPE application must stay a zero-Python narrow map:
    the bounded merge table is baked into literal JVM replace calls, so
    the ONLY exchange is the per-source rollup — no shuffle by token,
    no explode, no pandas hop. Pins the round-8 text_bpe_apply shape."""
    plan = _plan(spark, sf_dir, "text_bpe_apply_fertility")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert plan.count("Exchange") == 1
    assert "Exchange hashpartitioning(source" in plan


def test_partitioned_write_read_prunes_partitions(spark, sf_dir):
    """The partitioned-layout read-back must prune at the DIRECTORY
    level: the priority filter appears as a PartitionFilters entry on
    the scan (never a post-scan Filter over all five partitions)."""
    plan = _plan(spark, sf_dir, "etl_partitioned_write_pruning")
    scan = plan[plan.index("PartitionFilters"):][:260]
    assert "o_orderpriority" in scan, scan
    assert "1-URGENT" in scan or "IN (" in scan.upper(), scan


def test_embedding_compression_audits_broadcast_and_stay_jvm(
    spark, sf_dir
):
    """The round-8 wave-3 embedding-compression audits must keep their
    16-query side broadcast (never a shuffled or cartesian join against
    the corpus) and stay entirely JVM-side — the quantized int math is
    array expressions, not a pandas hop."""
    for name in (
        "sim_int8_quantization_error",
        "sim_matryoshka_truncation_recall",
        "sim_binary_sign_hamming_recall",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    for name in (
        "sim_matryoshka_truncation_recall",
        "sim_binary_sign_hamming_recall",
    ):
        assert "BroadcastNestedLoopJoin" in _plan(spark, sf_dir, name), name


def test_cogrouped_profile_is_bucketed_not_per_entity(spark, sf_dir):
    """The cogroup demo must group by the 64-way hash BUCKET, not the raw
    user_id: one Arrow call per bucket with a vectorized pandas groupby
    inside (the 100 TB shape), never one interpreter crossing per entity
    (measured 18 s vs 2.8 s at sf0.1). The shuffle key appearing as
    `bucket` in the cogroup exchange pins that."""
    plan = _plan(spark, sf_dir, "pyfunc_cogrouped_user_profile")
    assert "FlatMapCoGroupsInPandas" in plan
    assert "hashpartitioning(bucket" in plan
    assert "hashpartitioning(user_id" not in plan


def test_band_join_is_equi_join_not_theta(spark, sf_dir):
    """The ε-band range self-join must plan as a hash/sort-merge EQUI
    join on (event_type, day, bucket) with the band predicate as a
    post-join filter — never a BroadcastNestedLoopJoin or cartesian
    with the range condition inside (the naive theta-join plan that
    dies at scale)."""
    plan = _plan(spark, sf_dir, "join_value_band_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_kalman_entity_is_bucketed_arrow_grouped_map(spark, sf_dir):
    """ts_kalman_entity_level must run its per-user fold as ONE
    Arrow-batched grouped map keyed by the 64-way hash bucket — a
    FlatMapGroupsInPandas over pmod(xxhash64(user_id)) — never a
    row-at-a-time Python eval, and never a per-user grouping (the
    bucket column, not user_id, must be the grouping key so Python
    call count scales with buckets, not entities)."""
    import re

    plan = _plan(spark, sf_dir, "ts_kalman_entity_level")
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # The grouped-map key is the bucket column, not the raw id (the
    # executedPlan string shows the grouping attribute list).
    assert re.search(r"FlatMapGroupsInPandas \[bucket#\d+\]", plan)
    # Exactly one Python hop.
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_labelprop_broadcasts_labels_never_shuffles_edges_for_join(
    spark, sf_dir
):
    """graph_label_propagation_semi's per-round edge→label joins must
    all be broadcast-hash joins (the label frame is bounded by |parts|);
    a sort-merge join would shuffle the edge list once per round. Pair
    generation must be the single groupBy chain — no self-join of the
    (order, part) projection (no SortMergeJoin anywhere), and no
    cartesian fallback."""
    plan = _plan(spark, sf_dir, "graph_label_propagation_semi")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_char_bigram_profile_no_per_position_python_or_fulltext_seek(
    spark, sf_dir
):
    """text_char_bigram_profile must stay a pure JVM array-expression
    plan (no Python nodes) whose generator explodes per-WORD bigram
    arrays — the O(len²) shape (substring against the full document
    inside a per-position lambda) is what cost 4.15 s at sf0.1."""
    plan = _plan(spark, sf_dir, "text_char_bigram_profile")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Generate explode" in plan or "Generate" in plan
    # The per-word shape splits on spaces; the old full-text shape did
    # substring(lower(text), k, 2) against the whole document.
    assert "split(lower(text" in plan
