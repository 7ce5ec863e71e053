"""Named-query registry: the driver-facing catalog of every operator.

Each query is registered under a stable name with (a) a PySpark callable
``(spark, sf_dir) -> DataFrame`` and (b) — when SQL-expressible — an ANSI-SQL
oracle string that DuckDB runs on the same parquet tables. The pair is the
correctness contract from SURVEY.md §5: row count + schema + order-insensitive
value hash must match.

Float discipline: order-insensitive hashing means double aggregation must be
order-independent, so every SUM/AVG over doubles goes through
``DECIMAL(38,6)`` (exact, associative) and is cast back to double — both in
the Spark plan and in the oracle SQL — making the results bit-identical
regardless of partitioning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a named query and (optionally) its DuckDB oracle.

    Raises on duplicate names: a second registration under an existing
    name would silently WIN the dict slot and shadow the first
    implementation out of every correctness gate (this happened to
    three queries across sessions before this guard existed)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(existing: {QUERIES[name].__module__}, "
                f"new: {fn.__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(ORACLES)


_loaded = False

# The correctness driver checks the FIRST 50 queries in registry order
# each round. Registry order is therefore evidence policy: queries whose
# driver evidence is missing or stale go first, the reference's §2-mapped
# surface stays inside the window every round, and the most expensive
# pairs go last so a budget cut re-verifies proven heavy queries rather
# than denying first evidence to cheap ones.
_CHECK_FIRST = (
    # ROUND-6 WINDOW. Two priorities: (a) every query whose
    # implementation changed this round (the exact-percentile
    # running-sum rewrite + perf/ADVICE fixes) needs fresh driver
    # evidence; (b) the families never driver-sampled in r1–r5 (graph,
    # scalar, subquery, stream tail, set ops, window tail, join tail,
    # pyfunc, TPC-H tail) convert already-green local runs into
    # driver-proven union coverage (106/349 after r5; ≥156 after this
    # window).
    #
    # (a) re-implemented this round — re-verify first.
    "agg_percentiles",
    "agg_approx_sketches",
    "ts_inter_order_gaps",
    "agg_priority_sla_compliance",
    "agg_trimmed_winsorized_means",
    "agg_gini_split_finder",
    "dq_outlier_iqr",
    "dq_mad_robust_spread",
    "curation_corpus_datacard",
    "dq_join_fanout_profile",
    "dedup_lexical_semantic_agreement",
    "dq_format_conformance",
    "dedup_source_shingle_overlap",
    "mm_ppm_channel_histogram",
    # New in round 6: real baseline-JPEG codec (operators/jpeg.py) and
    # the round-6 operator additions — new code gets driver evidence
    # first.
    "mm_decode_jpeg",
    "scalar_datetime_functions",
    "ts_acf_multi_lag",
    "text_flesch_reading_ease",
    "agg_benjamini_hochberg",
    "window_gaps_islands",
    "agg_theil_sen_trend",
    "sim_range_search_cosine",
    "ts_seasonal_decompose_additive",
    "agg_quantile_bands_by_group",
    "agg_kaplan_meier_survival",
    "window_range_trailing_7d",
    "agg_association_rules_lift",
    "agg_mutual_information",
    "text_bigram_pmi_topk",
    "subquery_correlated_scalar",
    "dq_key_sequence_gaps",
    "mm_jpeg_resize_reencode",
    "ts_durbin_watson",
    # (b) never driver-checked in any round (all green in the full
    # local run of the driver's own compare logic).
    "graph_degree_distribution",
    "graph_pagerank_docs",
    "graph_triangle_stats",
    "graph_kcore",
    "graph_linkpred_common_neighbors",
    "graph_degree_assortativity",
    "graph_modularity_dedup_partition",
    "graph_bfs_khop_reach",
    "graph_rich_club_coefficient",
    "scalar_variant_ops",
    "scalar_trig_functions",
    "scalar_conditional_funcs",
    "scalar_bitwise_ops",
    "scalar_url_parsing",
    "scalar_ipv4_subnet_rollup",
    "subquery_exists_flags",
    "subquery_any_all_quantified",
    "stream_interval_join_left",
    # Positions 51+: just outside the 50-slot window — the §2-mapped
    # reference surface (driver-green in r5, unchanged this round)
    # stays at the head of the remainder should the driver check more,
    # followed by the never-checked tail displaced by the round-6
    # additions (rotate these into round 7's window).
    "etl_full_snapshot",
    "etl_window_extract",
    "etl_retention_complement",
    "etl_inf_null_clean",
    "etl_nvarchar_promotion",
    "sink_window_overwrite_roundtrip",
    "stream_tumbling_distinct_users",
    "set_intersect_all",
    "set_except_all",
    "window_moving_median",
    "window_ntile_quartiles",
    "window_percent_rank_cume",
    "window_session_gap_ids",
    "window_cusum_changepoint",
    "window_cohort_retention",
    "window_longest_streak",
    "join_null_safe_equal",
    "join_lateral_topn_orders",
    "join_scd2_point_in_time",
    "join_theta_price_band",
    "pyfunc_udtf_chunks",
    "pyfunc_cogrouped_user_profile",
    "feature_normalize_per_group",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
)

_CHECK_LAST = (
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_clusters_minhash",
    "dedup_minhash_lsh",
)

# ROUND-7 ROTATION PLAN (do this FIRST next round): once CORRECTNESS_r06
# confirms the round-6 window, replace _CHECK_FIRST with the next ~50
# still-never-driver-green names. Lead with the 61 session-29 additions
# (newest code first: dq_population_stability, agg_grubbs_outlier,
# agg_isotonic_calibration, feature_woe_iv, sim_rrf_fusion, text_ndcg_at_10,
# agg_nelson_aalen_hazard, ts_spectral_entropy, graph_hits_bipartite,
# window_user_lifecycle_states, agg_vif_multicollinearity,
# join_allen_interval_relations, graph_bipartite_projection,
# agg_cms_heavy_hitters, agg_simpson_paradox_detector, ts_peak_prominence,
# window_concurrency_sweep, agg_contingency_residuals,
# agg_average_precision, ts_ljung_box_q, ts_kruskal_wallis_weekday,
# ts_haar_wavelet_energy, mm_image_tile_stats, pyfunc_mapinpandas_minmax,
# stream_hist_quantile_sketch, window_alert_debounce,
# join_disjunctive_union_rewrite, agg_confusion_threshold_metrics,
# text_phrase_search_positional, window_clamped_running_balance,
# dq_duplicate_payment_detector, scd2_as_was_vs_as_is,
# join_nearest_price_neighbor, window_interval_coalesce,
# ts_western_electric_rules, curation_weighted_sample_es,
# mm_wav_zero_crossing_rate, dq_interval_integrity_audit,
# window_rolling_ols_slope, agg_ratio_metric_delta_ci,
# join_asof_forward_next_order, scalar_mod97_checksum,
# ts_record_breaking_days, agg_price_volume_mix,
# agg_abc_xyz_classification, text_query_likelihood_dirichlet,
# curation_span_corruption_stats, window_attribution_time_decay,
# dq_slo_burn_rate_alerts, dq_join_cardinality_forecast,
# ts_binary_segmentation_pettitt, graph_deterministic_walks,
# mm_image_gradient_orientation, set_relational_division,
# ts_markov_next_event_accuracy, ts_max_drawdown_demeaned,
# text_kwic_concordance, ts_retention_decay_fit,
# dq_categorical_drift_chi2, agg_beta_binomial_posterior,
# scalar_base62_encode — 61 in all, plus the three de-shadowed
# revivals agg_hill_tail_index_top200, agg_diff_in_differences_orders
# and the per-user ts_max_drawdown, which were silently overwritten by
# same-name registrations in earlier sessions and have now been
# renamed apart and verified)
# and the session-28 additions
# (sim_mmr_diversified_topk, curation_dsir_importance, text_rake_keywords,
# sim_davies_bouldin_index, sim_lsh_candidate_recall,
# ts_holt_linear_forecast, ts_holt_winters_weekly, agg_negative_binomial_fit,
# agg_tukey_hsd_qstats, mm_image_edge_density, text_mattr_lexical_diversity,
# agg_cuped_variance_reduction, ts_sprt_ab_monitor, agg_srm_guardrail,
# agg_diff_in_differences, join_range_count_prefix_sum, join_bloom_prefilter,
# ts_croston_intermittent_demand, text_burrows_delta, dq_shuffle_skew_planner,
# window_attribution_linear, graph_katz_centrality,
# text_jsd_source_divergence, agg_empirical_bayes_shrinkage,
# window_rfm_segmentation, agg_conformal_interval,
# dedup_boilerplate_ngrams) plus the earlier late-round-6 additions
# (ts_mann_kendall_trend, ts_page_hinkley_drift, ts_pacf_durbin_levinson,
# ts_hurst_aggregated_variance, agg_cohens_d_effect_size,
# agg_kendall_tau_daily, agg_cramers_v, agg_levene_brown_forsythe, and
# any newer) — new code gets driver evidence first. Largest remaining never-checked
# families after r6: ts_* (~35: rolling_zscore, ohlc_rollup,
# hour_of_day_profile, time_weighted_avg, interpolate_linear,
# autocorr_lag1, session/cohort/stickiness/churn analytics, EWMA/CUSUM/
# RSI/periodogram/CVaR), agg_* statistical tail (~35: mode_per_group,
# linear_trend, weighted_median, chi_square/welch/mann_whitney/KS tests,
# covariance/PCA/mahalanobis/OLS/kmeans, bootstrap/capture_recapture),
# text_* IR tail (~25: tfidf/bm25/unigram/bigram logprob, zipf/heaps/
# good_turing, hashing_vectorizer, code_detection), dedup audits (~16),
# dq_* profiling tail (~15), mm_* (decode_wav/dominant_freq/resize/
# dhash pairs), sim_* (pq/matmul/knn/drift), etl CDC tail, remaining
# TPC-H variants (q10-q22). All pass the strict local gate at sf0.001
# AND sf0.01; rotation converts that into driver-proven union coverage.


def _load_all() -> None:
    global _loaded
    if _loaded:
        return
    # Import for registration side effects.
    from extract_transform_load_template_multidb_spark.queries import (  # noqa: F401
        advanced,
        etl,
        governance,
        ir,
        multimodal,
        pyfunc,
        relational,
        time_windows,
        tpch_patterns,
    )

    try:
        from extract_transform_load_template_multidb_spark.queries import (  # noqa: F401
            llm_data,
        )
    except ImportError:
        pass
    order = [n for n in _CHECK_FIRST if n in QUERIES]
    order += [
        n for n in QUERIES if n not in _CHECK_FIRST and n not in _CHECK_LAST
    ]
    order += [n for n in _CHECK_LAST if n in QUERIES and n not in _CHECK_FIRST]
    for mapping in (QUERIES, ORACLES):
        items = {n: mapping[n] for n in order if n in mapping}
        mapping.clear()
        mapping.update(items)
    _loaded = True
