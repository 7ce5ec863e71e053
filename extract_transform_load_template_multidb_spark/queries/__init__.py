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
    # Round-8 waves 3/4: two new wave-4 queries, the changed-plan
    # bucketed-cogroup rewrite, and the three new embedding-compression
    # audits — never driver-checked, so they take the head of the
    # window. The six names this pushes past position 50 land as:
    # set_relational_division + window_attribution_time_decay at 51-52
    # (right before the §2 six at 53-58, pytest-guarded ≤60), and
    # dq_slo_burn_rate_alerts through curation_weighted_sample_es at
    # 59-62 (right after the six).
    "dq_median_imputation_audit",
    "ts_kalman_level_filter",
    "join_value_band_bucketed",
    "curation_k_anonymity_audit",
    "pyfunc_cogrouped_user_profile",
    "sim_int8_quantization_error",
    "sim_matryoshka_truncation_recall",
    "sim_binary_sign_hamming_recall",
    "dedup_dup_rate_report",
    "dedup_nearest_neighbor_doc",
    "graph_triangle_stats",
    "curation_token_budget_select",
    "text_bpe_apply_fertility",
    "ts_theil_sen_daily_trend",
    "ts_poisson_tail_anomalies",
    "agg_theil_index_by_source",
    "agg_winsorized_trimmed_mean",
    "window_mad_outlier_days",
    "dq_content_fingerprint_by_source",
    "dq_referential_orphans_multi",
    "curation_gopher_quality_rules",
    "dedup_band_scurve_tuning",
    "dedup_char_kgram_spans",
    "graph_degree_centralization",
    "mm_gif_color_histogram",
    "text_source_vocab_overlap",
    "dq_primary_key_audit",
    "agg_ship_latency_percentiles",
    "graph_knn_degree_curve",
    "etl_xml_roundtrip",
    "etl_partitioned_write_pruning",
    "dq_completeness_matrix",
    "mm_gif_palette_remap_reencode",
    "dedup_ngram_containment",
    "curation_dedup_weights",
    "curation_keep_longest",
    "dedup_lsh_recall_audit",
    "dedup_cluster_size_histogram",
    "dedup_mixture_shift_audit",
    "dedup_threshold_sensitivity",
    "dedup_rate_by_source",
    "dedup_keep_policy_comparison",
    "dedup_cluster_source_mix",
    "graph_katz_centrality",
    "ts_retention_decay_fit",
    "graph_deterministic_walks",
    "ts_binary_segmentation_pettitt",
    "text_query_likelihood_dirichlet",
    "mm_image_gradient_orientation",
    "text_kwic_concordance",
    "ts_max_drawdown_demeaned",
    "ts_markov_next_event_accuracy",
    "set_relational_division",
    "window_attribution_time_decay",
    # §2 six: immediately after the 50-slot window (≤60, pytest-guarded).
    "etl_full_snapshot",
    "etl_window_extract",
    "etl_inf_null_clean",
    "etl_retention_complement",
    "etl_nvarchar_promotion",
    "sink_window_overwrite_roundtrip",
    # Parked past the window by waves 3-4 — first in line for round 9.
    "dq_slo_burn_rate_alerts",
    "dq_join_cardinality_forecast",
    "scalar_mod97_checksum",
    "curation_weighted_sample_es",
    "agg_abc_xyz_classification",
    "dq_interval_integrity_audit",
    "mm_wav_zero_crossing_rate",
    "ts_western_electric_rules",
    "agg_price_volume_mix",
    "ts_record_breaking_days",
    "agg_ratio_metric_delta_ci",
    "window_rolling_ols_slope",
    "mm_ppm_channel_histogram",
    "text_hashing_vectorizer",
    "mm_decode_png",
    "mm_png_resize_reencode",
    "mm_png_alpha_profile",
    "graph_linkpred_jaccard",
    "window_bollinger_bands",
    "ts_sax_symbolic",
    "scalar_luhn_checksum",
    "scalar_haversine_pairs",
    "join_fuzzy_levenshtein",
    "feature_robust_scaler",
    "feature_hashed_cross",
    "agg_poisson_rate_ratio",
    "dedup_url_canonical_groups",
    "dq_benford_first_two_digits",
    "agg_hodges_lehmann",
    "agg_kmv_distinct_sketch",
    "scalar_uuid3_surrogate_keys",
    "scalar_geohash_encode",
    "window_anchored_vwap",
    "sim_ivf_nprobe_recall",
    "text_contrastive_source_keywords",
    "curation_perplexity_filter",
    "etl_compaction_bin_packing",
    "layout_hilbert_order",
    "feature_target_encoding_loo",
    "mm_image_histogram_equalization",
    "dedup_bbit_minhash_estimate",
    "dq_partition_merkle_checksums",
    "etl_unpivot_metrics",
    "agg_histogram_fd_bins",
    "stream_sliding_topk_types",
    "agg_permutation_test_mean_diff",
    "curation_tokenizer_fertility",
    "layout_pruning_simulation",
    "graph_label_propagation_semi",
    "scd2_overlap_repair",
    "dq_functional_dependency_audit",
    "text_kneser_ney_bigram_logprob",
    "agg_ipf_raking_2d",
    "mm_decode_gif",
    "text_char_entropy",
    "graph_linkpred_adamic_adar",
    "join_asof_latest_order",
    "join_asof_forward_next_order",
    "curation_span_corruption_stats",
    "scalar_base62_encode",
    "agg_beta_binomial_posterior",
    "dq_categorical_drift_chi2",
    "window_interval_coalesce",
    "join_nearest_price_neighbor",
    "scd2_as_was_vs_as_is",
    "dq_duplicate_payment_detector",
    "window_clamped_running_balance",
    "text_phrase_search_positional",
    "agg_confusion_threshold_metrics",
    "join_disjunctive_union_rewrite",
    "window_alert_debounce",
    "stream_hist_quantile_sketch",
    "pyfunc_mapinpandas_minmax",
    "mm_image_tile_stats",
    "ts_haar_wavelet_energy",
    "ts_kruskal_wallis_weekday",
    "ts_ljung_box_q",
    "agg_average_precision",
    "agg_contingency_residuals",
    "window_concurrency_sweep",
    "ts_peak_prominence",
    "agg_simpson_paradox_detector",
    "agg_cms_heavy_hitters",
    "graph_bipartite_projection",
    "join_allen_interval_relations",
    "agg_vif_multicollinearity",
    "window_user_lifecycle_states",
    "graph_hits_bipartite",
    "ts_spectral_entropy",
    "agg_nelson_aalen_hazard",
    "text_ndcg_at_10",
    "sim_rrf_fusion",
    "feature_woe_iv",
    "agg_isotonic_calibration",
    "agg_grubbs_outlier",
    "dq_population_stability",
    "agg_hill_tail_index_top200",
    "agg_diff_in_differences_orders",
    "ts_max_drawdown",
    "sim_mmr_diversified_topk",
    "curation_dsir_importance",
    "text_rake_keywords",
    "sim_davies_bouldin_index",
    "sim_lsh_candidate_recall",
    "ts_holt_linear_forecast",
    "ts_holt_winters_weekly",
    "agg_negative_binomial_fit",
    "agg_tukey_hsd_qstats",
    "mm_image_edge_density",
    "text_mattr_lexical_diversity",
    "agg_cuped_variance_reduction",
    "ts_sprt_ab_monitor",
    "agg_srm_guardrail",
    "agg_diff_in_differences",
    "join_range_count_prefix_sum",
    "join_bloom_prefilter",
    "ts_croston_intermittent_demand",
    "text_burrows_delta",
    "dq_shuffle_skew_planner",
    "window_attribution_linear",
    "text_jsd_source_divergence",
    "agg_empirical_bayes_shrinkage",
    "window_rfm_segmentation",
    "agg_conformal_interval",
    "dedup_boilerplate_ngrams",
    "ts_mann_kendall_trend",
    "ts_page_hinkley_drift",
    "ts_pacf_durbin_levinson",
    "ts_hurst_aggregated_variance",
    "agg_cohens_d_effect_size",
    "agg_kendall_tau_daily",
    "agg_cramers_v",
    "agg_levene_brown_forsythe",
)

_CHECK_LAST = (
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_clusters_minhash",
    "dedup_minhash_lsh",
)

# NOTE for round 9: the §2 six now sit at positions 55-60 — the exact
# pytest-guarded limit. Any further head insertion REQUIRES the round-9
# rebalance below first (replace positions 1-50 wholesale).
# ROUND-9 ROTATION PLAN (do this FIRST next round): once CORRECTNESS_r08
# confirms the round-8 window (positions 1-50 above: 6 wave-3/4 entries
# — the band range join, the k-anonymity audit, the bucketed-cogroup
# rewrite, 3 embedding-compression audits — then the 4 round-8
# perf/plan changes, 21 new round-8 queries, the 11 never-checked
# ngram-pair consumers whose plans changed with the _fan_out fix, and
# the planned tail through position 50), replace positions 1-50 with
# the next ~50 still-never-driver-green names — round-9
# changes/additions first, then the names displaced past the window by
# waves 3/4 (set_relational_division, window_attribution_time_decay at
# 51-52; dq_slo_burn_rate_alerts, dq_join_cardinality_forecast,
# scalar_mod97_checksum, curation_weighted_sample_es at 59-62), then
# the earlier parked set (agg_abc_xyz_classification,
# dq_interval_integrity_audit, mm_wav_zero_crossing_rate,
# agg_price_volume_mix, ts_record_breaking_days,
# agg_ratio_metric_delta_ci, window_rolling_ols_slope,
# ts_western_electric_rules), then the demoted tail in order
# (window_interval_coalesce, join_nearest_price_neighbor,
# scd2_as_was_vs_as_is, ... through agg_levene_brown_forsythe), then
# the large never-checked families: ts_* (~30 left), agg_* statistical
# tail (~35), text_* IR tail (~25), dq_* profiling tail (~12), mm_*,
# sim_*, remaining TPC-H variants (q10-q22). Keep the §2 six
# immediately after the window (pytest-guarded ≤60; currently 53-58).
# All tail names pass the strict local gate at sf0.001 AND sf0.01;
# rotation converts that into driver-proven union coverage.


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

    # Deliberately NOT wrapped in try/except: swallowing an ImportError
    # here would silently shrink the registry the driver sees (~150
    # queries would vanish from the gate without any error). There is no
    # optional dependency left in llm_data that justifies a soft import.
    from extract_transform_load_template_multidb_spark.queries import (  # noqa: F401
        llm_data,
    )
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
