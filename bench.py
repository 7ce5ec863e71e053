"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Queries are timed end-to-end (plan build + execution to a count/collect of
the result), after a warm-up action that pays the one-time session and
parquet-footer costs. Each query is run $SPARK_GRAFT_BENCH_REPEATS times
(default 2) and the per-query MINIMUM is reported — this host is a shared
VM with multi-x CPU-steal bursts (the same plan has been observed at 10 s
and 150 s minutes apart with the machine otherwise idle), and min-of-N is
the standard way to measure the engine rather than the neighbors.

BENCH_DETAIL.json is MERGED across sweeps, never overwritten: per-query
minima are folded into the existing artifact (same sf only), raw repeat
arrays accumulate (last 12 kept), and a ``runs`` counter records how many
sweeps contributed. Re-running the bench therefore yields monotonically
non-increasing per-query values — UNLESS the query's physical plan
changed: each entry carries a fingerprint of its normalized formatted
physical plan, captured pre-execution, and a prior min whose fingerprint
no longer matches the current plan is dropped automatically before the
merge (round-11 verdict: the min-merge protocol must never let a stale
fast min mask a plan regression). ``SPARK_GRAFT_BENCH_FRESH=1`` starts a
new artifact; ``SPARK_GRAFT_BENCH_INVALIDATE=a,b`` remains as a manual
override for non-plan changes (e.g. Python-side constant factors the
plan string can't see).

Stdout contract (round-12 verdict: the driver needs THIS-run numbers —
merged-minima on stdout poisoned the round-11 scaling comparison with
historical 32-core times): the one-line JSON reports THIS sweep —
``value`` IS ``this_sweep_total`` (the sum of this run's per-query
times, protocol-stable round-over-round) and ``queries`` holds THIS
run's per-query times. The merged best-ever composite survives as
``merged_value`` on the same line (clearly labeled; the old cross-round
record) and the full merged per-query minima live only in
BENCH_DETAIL.json. On SPARK_GRAFT_ONLY subsets ``value`` is the sum of
the timed subset only.

Core-count profiles don't share minima: the detail artifact records the
``cpus`` it was measured at, and a sweep at a different
``$SPARK_GRAFT_CPUS`` is merged into its own per-profile file
(``BENCH_DETAIL_c<cpus>.json``) instead — so a driver scaling run at 8
cores can never re-report 32-core records (round-11 PERF artifact).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from extract_transform_load_template_multidb_spark.queries import all_queries
from extract_transform_load_template_multidb_spark.session import get_spark

# Round-8 policy: EVERY registered query is benched, so the
# 2×-of-DuckDB-baseline bar is audited registry-wide (rounds ≤7 benched a
# 377-name curated subset, leaving 30% of the registry unmeasured).
# HEADLINE is derived from the registry at import time; a query may be
# excluded ONLY with a committed reason in EXCLUDED.
EXCLUDED: dict[str, str] = {}

# The legacy curated list is kept (now a prefix-ordering hint only): these
# names run first so partial sweeps and truncated logs lead with the
# flagship shapes.
_CURATED_FIRST = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q13_order_count_distribution",
    "q18_large_volume_orders",
    "join_broadcast_dim",
    "window_rank_topn_per_group",
    "agg_rollup",
    "etl_window_extract",
    "agg_count_distinct",
    "join_asof_latest_order",
    "stream_tumbling_counts",
    "stream_interval_join",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters_ngram",
    "sim_cosine_topk_bruteforce",
    "sim_cosine_topk_lsh",
    "text_quality_score",
    "text_lang_id",
    "agg_salted_hot_keys",
    "curation_chunk_documents",
    "curation_pack_sequences",
    "scd2_priority_history",
    "dq_null_profile_events",
    "mm_extract_features",
    "ts_resample_carry_forward",
    "scalar_map_ops",
    "pyfunc_vec_l2_norm",
    "pyfunc_grouped_median",
    "dedup_clusters_minhash",
    "dedup_clusters_star",
    "dedup_canonical_docs",
    "sim_cosine_topk_ivf",
    "curation_decontaminate",
    "dedup_minhash_paragraphs",
    "mm_decode_ppm",
    "dedup_simhash_pairs",
    "text_rare_ngram_ratio",
    "curation_dedup_paragraphs",
    "dedup_incremental_minhash",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "text_tfidf_topterms",
    "text_bm25_search",
    "text_unigram_logprob",
    "ts_rolling_zscore",
    "window_cohort_retention",
    "mm_decode_wav",
    "sim_cosine_topk_pq",
    "ts_ohlc_rollup",
    "text_bpe_pair_stats",
    "dq_value_histogram",
    "text_char_entropy",
    "stream_interval_join_left",
    "graph_triangle_stats",
    "dedup_ngram_containment",
    "join_salted_skew",
    "agg_mode_per_group",
    "graph_kcore",
    "window_ntile_quartiles",
    "curation_dedup_weights",
    "curation_keep_longest",
    "text_bigram_logprob",
    "set_intersect_all",
    "set_except_all",
    "join_null_safe_equal",
    "mm_audio_dominant_freq",
    "mm_resize_ppm",
    "dedup_nearest_neighbor_doc",
    "dq_benford_first_digit",
    "window_percent_rank_cume",
    "agg_linear_trend",
    "scalar_bitwise_ops",
    "ts_time_weighted_avg",
    "ts_interpolate_linear",
    "etl_cdc_latest_state",
    "etl_mv_incremental_refresh",
    "window_last_touch_attribution",
    "dq_outlier_iqr",
    "curation_domain_cap",
    "graph_degree_distribution",
    "mm_image_dhash",
    "sim_cosine_topk_matmul",
    "dq_table_checksum",
    "dq_mad_robust_spread",
    "mm_dhash_hamming_pairs",
    "agg_entropy_categorical",
    "agg_skew_kurtosis",
    "agg_corr_per_group",
    "etl_dead_letter_json",
    "ts_autocorr_lag1",
    "scalar_variant_ops",
    "agg_hll_sketch_merge",
    "text_lang_id_confusion",
    "curation_corpus_datacard",
    "join_scd2_point_in_time",
    "dedup_prefix_truncates",
    "curation_source_gini",
    "ts_session_conversion",
    "etl_cdc_apply_with_deletes",
    "text_hashing_vectorizer",
    "ts_cumulative_unique_users",
    "window_time_to_purchase",
    "window_share_of_parent",
    "ts_wow_growth",
    "dedup_dup_rate_report",
    "dq_missing_hours",
    "curation_token_budget_select",
    "dq_freshness_watermarks",
    "subquery_exists_flags",
    "window_moving_median",
    "agg_chi_square_independence",
    "ts_ewma_revenue",
    "graph_linkpred_common_neighbors",
    "sim_knn_label_vote",
    "window_cusum_changepoint",
    "agg_welch_t_test",
    "sim_label_centroid_margin",
    "scalar_url_parsing",
    "join_lateral_topn_orders",
    "subquery_any_all_quantified",
    "graph_modularity_dedup_partition",
    "agg_mann_whitney_u",
    "ts_seasonality_strength",
    "dedup_source_shingle_overlap",
    "sim_hard_negative_mining",
    "dedup_exact_normalized",
    "sim_pq_reconstruction_error",
    "dq_candidate_key_discovery",
    "ts_bounce_rate",
    "curation_temperature_mixture_weights",
    "text_code_detection",
    "scalar_ipv4_subnet_rollup",
    "agg_argmax_min_by_max_by",
    "ts_seasonal_naive_backtest",
    "ts_rolling_corr_clicks_purchases",
    "sim_embedding_drift_by_label",
    "agg_hill_tail_index",
    "window_top_movers_wow",
    "dq_referential_health_dashboard",
    "text_zipf_fit",
    "agg_trimmed_winsorized_means",
    "stream_tumbling_distinct_users",
    "join_theta_price_band",
    "mm_wav_silence_ratio",
    "mm_ppm_channel_histogram",
    "agg_ks_two_sample",
    "text_word_burstiness",
    "ts_fourier_top_periods",
    "agg_empirical_bayes_rates",
    "curation_sampling_manifest",
    "graph_rich_club_coefficient",
    "text_prf_query_expansion",
    "dq_format_conformance",
    "ts_expected_shortfall",
    "agg_ab_power_analysis",
    "ts_rsi_momentum",
    "dedup_lexical_semantic_agreement",
    "agg_two_proportion_z_test",
    "agg_diff_in_differences",
    "agg_gini_split_finder",
    "text_lang_id_cohens_kappa",
    "sim_precision_at_k",
    "mm_image_channel_entropy",
    "ts_session_path_trigrams",
    "ts_multi_touch_attribution",
    "dedup_cluster_source_mix",
    "agg_spearman_rank_corr",
    "agg_covariance_matrix",
    "agg_pca_top_component",
    "agg_mahalanobis_outliers",
    "agg_ols_two_features",
    "agg_kmeans_1d_two_centers",
    "ts_granger_predictive_lift",
    "ts_count_overdispersion",
    "ts_event_rate_ci",
    "ts_weekday_anova",
    "text_heaps_law_fit",
    "dq_double_fire_detector",
    "agg_capture_recapture",
    "text_good_turing_unseen",
    "agg_bootstrap_se_mean",
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
    "ts_mann_kendall_trend",
    "ts_page_hinkley_drift",
    "ts_pacf_durbin_levinson",
    "ts_hurst_aggregated_variance",
    "agg_cohens_d_effect_size",
    "agg_kendall_tau_daily",
    "agg_cramers_v",
    "agg_levene_brown_forsythe",
    "text_skipgram_ppmi",
    "ts_markov_entropy_rate",
    "ts_gumbel_daily_max_fit",
    "subquery_not_in_null_semantics",
    "set_symmetric_difference",
    "mm_audio_clipping_detect",
    "graph_linkpred_adamic_adar",
    "graph_local_clustering_histogram",
    "agg_fisher_exact_2x2",
    "text_token_simpson_diversity",
    "agg_negative_binomial_fit",
    "agg_tukey_hsd_qstats",
    "sim_mmr_diversified_topk",
    "text_rake_keywords",
    "mm_image_edge_density",
    "sim_lsh_candidate_recall",
    "sim_davies_bouldin_index",
    "curation_dsir_importance",
    "ts_holt_linear_forecast",
    "text_mattr_lexical_diversity",
    "agg_cuped_variance_reduction",
    "ts_sprt_ab_monitor",
    "join_range_count_prefix_sum",
    "ts_croston_intermittent_demand",
    "text_burrows_delta",
    "join_bloom_prefilter",
    "dq_shuffle_skew_planner",
    "window_attribution_linear",
    "graph_katz_centrality",
    "text_jsd_source_divergence",
    "agg_srm_guardrail",
    "agg_empirical_bayes_shrinkage",
    "ts_holt_winters_weekly",
    "window_rfm_segmentation",
    "agg_conformal_interval",
    "dedup_boilerplate_ngrams",
    "agg_cramer_von_mises_2sample",
    "ts_cohort_ltv_projection",
    "agg_mcnemar_paired_test",
    "text_textrank_keywords",
    "ts_interrupted_time_series",
    "ts_seasonal_naive_skill",
    "agg_gamma_mom_fit",
    "ts_seasonal_residual_anomalies",
    "window_signup_to_purchase_latency",
    "agg_stratified_ate",
    "ts_seasonal_strength",
    "window_markov_removal_attribution",
    "sim_lsh_mrr",
    "agg_wilcoxon_signed_rank",
    "agg_friedman_weekday_test",
    "feature_target_encoding",
    "agg_auc_rank_sum",
    "agg_expected_calibration_error",
    "agg_probabilistic_scores",
    "ts_kpss_stationarity",
    "agg_qini_uplift_deciles",
    "ts_adf_unit_root",
    "ts_pettitt_changepoint",
    "sim_simplified_silhouette",
    "graph_ktruss_edges",
    "dq_population_stability",
    "agg_grubbs_outlier",
    "agg_isotonic_calibration",
    "feature_woe_iv",
    "sim_rrf_fusion",
    "text_ndcg_at_10",
    "agg_nelson_aalen_hazard",
    "ts_spectral_entropy",
    "graph_hits_bipartite",
    "window_user_lifecycle_states",
    "agg_vif_multicollinearity",
    "join_allen_interval_relations",
    "graph_bipartite_projection",
    "agg_cms_heavy_hitters",
    "agg_simpson_paradox_detector",
    "ts_peak_prominence",
    "window_concurrency_sweep",
    "agg_contingency_residuals",
    "agg_average_precision",
    "ts_ljung_box_q",
    "ts_kruskal_wallis_weekday",
    "ts_haar_wavelet_energy",
    "mm_image_tile_stats",
    "pyfunc_mapinpandas_minmax",
    "stream_hist_quantile_sketch",
    "window_alert_debounce",
    "join_disjunctive_union_rewrite",
    "agg_confusion_threshold_metrics",
    "text_phrase_search_positional",
    "window_clamped_running_balance",
    "dq_duplicate_payment_detector",
    "scd2_as_was_vs_as_is",
    "join_nearest_price_neighbor",
    "window_interval_coalesce",
    "ts_western_electric_rules",
    "curation_weighted_sample_es",
    "mm_wav_zero_crossing_rate",
    "dq_interval_integrity_audit",
    "window_rolling_ols_slope",
    "agg_ratio_metric_delta_ci",
    "join_asof_forward_next_order",
    "scalar_mod97_checksum",
    "ts_record_breaking_days",
    "agg_price_volume_mix",
    "agg_abc_xyz_classification",
    "text_query_likelihood_dirichlet",
    "curation_span_corruption_stats",
    "window_attribution_time_decay",
    "dq_slo_burn_rate_alerts",
    "dq_join_cardinality_forecast",
    "ts_binary_segmentation_pettitt",
    "graph_deterministic_walks",
    "mm_image_gradient_orientation",
    "set_relational_division",
    "ts_markov_next_event_accuracy",
    "ts_max_drawdown_demeaned",
    "text_kwic_concordance",
    "agg_hill_tail_index_top200",
    "agg_diff_in_differences_orders",
    "ts_max_drawdown",
    "ts_retention_decay_fit",
    "dq_categorical_drift_chi2",
    "agg_beta_binomial_posterior",
    "scalar_base62_encode",
    # round 7 additions
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
]

HEADLINE = [n for n in _CURATED_FIRST if n not in EXCLUDED]
HEADLINE += [
    n
    for n in all_queries()
    if n not in EXCLUDED and n not in _CURATED_FIRST
]


# Bumped whenever _normalize_plan changes: stored fingerprints from an
# older normalizer aren't comparable to freshly-computed ones, so the
# merge re-grandfathers every entry (keeps the minima, records current
# fingerprints) instead of misreading the normalizer change as 571
# simultaneous plan changes and wiping the record.
FP_VERSION = 4


def _normalize_plan(s: str) -> str:
    """Strip session-varying tokens from a formatted plan string.

    Normalized out: expression IDs (``#123`` — monotonic per session),
    plan/subquery IDs, JVM object addresses, RDD ids and call-site
    strings in ``Scan ExistingRDD`` nodes (``MapPartitionsRDD[95] at
    localCheckpoint at NativeMethodAccessorImpl.java:0`` — the counter
    is session-global and AQE-nondeterministic, and the call-site frame
    flips to ``<unknown>`` once the JVM inflates the reflective call),
    and /tmp scratch paths (roundtrip queries re-read from a fresh
    ``mkdtemp`` dir every run).

    Each line is then canonicalized to its SORTED token bag:
    Catalyst's RewriteDistinctAggregates (and friends) order Expand
    arms / grouping keys by expression-id hash, so the same code
    permutes column lists within a line between sessions
    (``Keys [3]: [c#, r#, gid#]`` vs ``[r#, c#, gid#]``). Sorting
    tokens per line erases permutation while keeping what a plan
    change alters: the operator sequence (line order is preserved),
    exchange/join-strategy nodes, pushed filters, read schemas,
    partition counts.
    """
    s = re.sub(r"#\d+", "#", s)
    s = re.sub(r"plan_id=\d+", "plan_id=", s)
    s = re.sub(r"\[id=\d+\]", "[id=]", s)
    s = re.sub(r"@[0-9a-fA-F]{6,}", "@", s)
    s = re.sub(r"RDD\[\d*\] at \w+ at [^,]*", "RDD[] at", s)
    s = re.sub(r"RDD\[\d+\]", "RDD[]", s)
    s = re.sub(r"(file:)?/tmp/[^\s,\]\)]*", "file:/tmp/", s)
    return "\n".join(
        " ".join(sorted(re.sub(r"[\[\](),]", " ", line).split()))
        for line in s.splitlines()
    ).strip("\n")


def plan_fingerprint(df) -> str:
    """Stable hash of the query's formatted physical plan.

    Captured on the freshly-built (pre-execution) DataFrame so AQE
    runtime re-planning (`isFinalPlan=true` specifics, coalesced
    partition specs) can't make the same code fingerprint differently
    between sweeps; ``_normalize_plan`` strips session-varying tokens.
    """
    qe = df._jdf.queryExecution()
    s = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
    s = _normalize_plan(s)
    dump_dir = os.environ.get("SPARK_GRAFT_BENCH_DUMP_PLANS", "")
    if dump_dir:
        os.makedirs(dump_dir, exist_ok=True)
        name = getattr(plan_fingerprint, "_dump_name", "plan")
        with open(os.path.join(dump_dir, name + ".txt"), "w") as fh:
            fh.write(s)
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def merge_detail(
    prior: dict,
    timings: dict[str, float],
    raw: dict[str, list[float]],
    fps: dict[str, str],
    known: set[str],
    manual_invalid: set[str],
) -> tuple[dict, dict, dict, list[str]]:
    """Fold this sweep's (timings, raw, fps) into a prior detail artifact.

    Returns (merged_queries, merged_repeats, merged_fingerprints,
    invalidated_by_plan_change). Pure so tests can drive the reset path
    without a Spark session: a prior min whose stored fingerprint
    differs from this sweep's is DROPPED (the plan it measured no
    longer exists); entries with no stored fingerprint are
    grandfathered once and fingerprinted now.
    """
    prior_fp = prior.get("fingerprints") or {}
    plan_changed = sorted(
        n for n in fps if n in prior_fp and prior_fp[n] != fps[n]
    )
    invalid = manual_invalid | set(plan_changed)
    prior_q = {
        n: v
        for n, v in (prior.get("queries") or {}).items()
        if n in known and n not in invalid
    }
    prior_raw = {
        n: v
        for n, v in (prior.get("repeats") or {}).items()
        if n in known and n not in invalid
    }
    merged_q = dict(prior_q)
    merged_raw = {n: list(v) for n, v in prior_raw.items()}
    merged_fp = {
        n: v for n, v in prior_fp.items() if n in known and n not in invalid
    }
    for name, t in timings.items():
        merged_q[name] = min(t, prior_q.get(name, t))
        merged_raw[name] = (merged_raw.get(name, []) + raw[name])[-12:]
    merged_fp.update(fps)
    return merged_q, merged_raw, merged_fp, plan_changed


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="etl-multidb-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # Warm up: JVM, parquet footers, codegen.
    qs["q1_pricing_summary"](spark, sf_dir).count()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    # Repeat caps for the heavy tail so the bench's wall-clock stays
    # bounded when the driver raises SPARK_GRAFT_BENCH_REPEATS: the
    # multi-ten-second pair/cluster pipelines cap at min-of-2.
    # (dedup_clusters_minhash was capped at 1 when its label-prop
    # closure ran ~3 min at sf0.1; the round-10 two-phase closure
    # brought the query to ~8-25 s, so it gets the normal cap.)
    heavy = {
        "dedup_clusters_minhash": 3,
        "dedup_clusters_star": 2,
        "dedup_canonical_docs": 2,
        "dedup_minhash_lsh": 2,
        "dedup_ngram_jaccard": 2,
        "dedup_minhash_paragraphs": 2,
        "dedup_simhash_pairs": 2,
        "dedup_incremental_minhash": 2,
        "curation_dedup_paragraphs": 2,
        "dedup_ngram_containment": 2,
        "graph_triangle_stats": 2,
        "graph_kcore": 2,
        "curation_dedup_weights": 2,
        "curation_keep_longest": 2,
        "dedup_nearest_neighbor_doc": 2,
    }
    # SPARK_GRAFT_ONLY="a,b,c" restricts the sweep to a comma-separated
    # subset of HEADLINE — for targeted re-timing of individual queries
    # (e.g. adjudicating a host-noise burst) without the full sweep.
    only_env = os.environ.get("SPARK_GRAFT_ONLY", "").strip()
    only = {n for n in only_env.split(",") if n} if only_env else None
    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    fps: dict[str, str] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        if only is not None and name not in only:
            continue
        runs = []
        for i in range(max(1, min(repeats, heavy.get(name, repeats)))):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            if i == 0:
                # Fingerprint the pre-execution plan of the first repeat
                # (plan build is already paid inside the timed region;
                # the explain string itself is driver-side and cheap).
                plan_fingerprint._dump_name = name
                fps[name] = plan_fingerprint(df)
            n = df.count()
            runs.append(round(time.perf_counter() - t0, 4))
            assert n >= 0
        # Per-repeat raw times ship alongside the min so host-noise bursts
        # (documented in BASELINE.md) are adjudicable from the artifact
        # itself — a wide spread with a tight min is noise, not a plan
        # regression.
        raw[name] = runs
        timings[name] = min(runs)
    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query minima + raw per-repeat arrays go to a detail file on
    # disk (committed per round); stdout gets ONE compact final line. The
    # driver's stdout capture keeps only the last ~2000 characters, so the
    # round-5 14 KB single-line output came back unparseable ("parsed":
    # null). Budget the line: per-query entries are added slowest-first
    # until ~1800 chars, the rest collapse into an "other" bucket whose
    # count and summed seconds keep the total reconcilable.
    # Subset runs (SPARK_GRAFT_ONLY) go to a separate detail file so a
    # targeted re-timing never overwrites the committed full-sweep record.
    # The canonical closing record is the sf0.1 full sweep; full sweeps at
    # any other sf get their own per-sf artifact so a verification run at
    # sf0.01 can never displace the committed sf0.1 record.
    if only is not None:
        detail_name = "BENCH_DETAIL_SUBSET.json"
    elif sf_val == 0.1:
        detail_name = "BENCH_DETAIL.json"
    else:
        detail_name = f"BENCH_DETAIL_sf{sf}.json"
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(repo_dir, detail_name)
    # Per-core-count profiles (round-12 verdict): minima measured at one
    # core count must never be re-reported at another. If the artifact on
    # disk records a different cpus than this session's, redirect the
    # whole merge to a per-profile file instead.
    cpus = spark.sparkContext.defaultParallelism
    try:
        with open(detail_path) as fh:
            _prior_probe = json.load(fh)
    except (OSError, ValueError):
        _prior_probe = {}
    # Artifacts committed before round 12 carry no "cpus" key; every one
    # of them was measured at the 32-core canonical profile (BENCH_r*.json
    # record "cpus": 32 for all prior rounds), so missing is grandfathered
    # as 32 rather than silently adopted by whatever profile runs first.
    prior_cpus = _prior_probe.get("cpus", 32 if _prior_probe else None)
    if prior_cpus not in (None, cpus):
        detail_name = detail_name.replace(".json", f"_c{cpus}.json")
        detail_path = os.path.join(repo_dir, detail_name)
    # MERGE, don't overwrite: a single sweep on this host can burst 2-15x
    # on unchanged code (documented in BASELINE.md), so the committed
    # artifact keeps the per-query MINIMUM across sweeps and accumulates
    # the raw per-repeat arrays (capped) plus a run counter. One noisy
    # sweep can therefore never clobber an adjudicated quiet record.
    # Controls:
    #   SPARK_GRAFT_BENCH_FRESH=1          start a new artifact (ignore old)
    #   SPARK_GRAFT_BENCH_INVALIDATE=a,b   reset named queries before the
    #                                      merge (use after a plan change,
    #                                      so a stale fast min can't mask a
    #                                      regression)
    prior: dict = {}
    if os.environ.get("SPARK_GRAFT_BENCH_FRESH", "") != "1":
        try:
            with open(detail_path) as fh:
                prior = json.load(fh)
        except (OSError, ValueError):
            prior = {}
    if prior.get("sf") != sf_val:
        prior = {}  # different scale factor: minima aren't comparable
    if prior.get("fp_version") != FP_VERSION:
        # Stored fingerprints were produced by an older normalizer —
        # not comparable to this sweep's. Drop THEM (not the minima):
        # every entry re-grandfathers once under the current
        # normalizer, exactly like a pre-fingerprint legacy artifact.
        prior = {k: v for k, v in prior.items() if k != "fingerprints"}
    invalid = {
        n
        for n in os.environ.get("SPARK_GRAFT_BENCH_INVALIDATE", "").split(",")
        if n
    }
    # Auto-invalidation (round-11 verdict): a prior min is only
    # comparable while the query still produces the same physical plan —
    # merge_detail drops any entry whose stored fingerprint differs from
    # the one captured THIS sweep. Legacy entries with no stored
    # fingerprint are grandfathered once (kept, fingerprint recorded
    # now); from then on the reset is automatic.
    merged_q, merged_raw, merged_fp, plan_changed = merge_detail(
        prior, timings, raw, fps, set(qs), invalid
    )
    merged_total = round(sum(merged_q.values()), 4)
    # Protocol-stable per-sweep total: the sum of THIS run's per-query
    # times over the full registry — comparable round-over-round no
    # matter how many sweeps fed the merged record. This IS the stdout
    # ``value`` (round-12 verdict); the merged best-ever composite rides
    # along as ``merged_value``.
    sweep_total = round(sum(timings.values()), 4)
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_total_wall",
                "value": merged_total,
                "unit": "sec",
                "merged_value": merged_total,
                "this_sweep_total": sweep_total if only is None else None,
                "runs": int(prior.get("runs") or 0) + 1,
                "cpus": cpus,
                "invalidated_by_plan_change": plan_changed,
                "queries": merged_q,
                "this_sweep_queries": timings,
                "repeats": merged_raw,
                "fingerprints": merged_fp,
                "fp_version": FP_VERSION,
                "sf": sf_val,
            },
            fh,
            indent=1,
        )

    def _line(qmap: dict) -> str:
        return json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": sweep_total,
                "unit": "sec",
                "this_sweep_total": sweep_total if only is None else None,
                "merged_value": merged_total,
                "n_queries": len(timings),
                "runs": int(prior.get("runs") or 0) + 1,
                "cpus": cpus,
                "detail": detail_name,
                "queries": qmap,
                "sf": sf_val,
            },
            separators=(",", ":"),
        )

    compact: dict[str, float] = {}
    rest_n, rest_sum = 0, 0.0
    for name in sorted(timings, key=timings.get, reverse=True):
        candidate = dict(compact)
        candidate[name] = round(timings[name], 3)
        if len(_line(candidate)) > 1800:
            rest_n += 1
            rest_sum += timings[name]
        else:
            compact = candidate
    if rest_n:
        compact[f"other_{rest_n}_queries"] = round(rest_sum, 3)
    sys.stdout.flush()
    print(_line(compact), flush=True)


if __name__ == "__main__":
    main()
