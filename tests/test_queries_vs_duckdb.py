"""Spot-check a representative subset of queries() against oracle_sql()
via DuckDB at sf0.001 (the driver does the full sweep at sf0.01;
tools/driver_sim.py runs everything)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SUBSET = [
    "extract_interleaved",
    "extract_span_stats",
    "q1_pricing_summary",
    "q10_returned_revenue",
    "supplier_balance_by_nation",
    "top3_orders_per_segment",
    "union_all_keys",
    "props_k_by_type",
    "sessionize",
    "asof_latest_order",
    "dedup_exact",
    "knn_brute_force",
    "fingerprints",
    "q13_customer_distribution",
    "q18_large_volume_orders",
    "segment_dedup",
    "order_rank_in_segment",
    "media_word_boxes",
    # round-3 additions
    "heavy_hitter_terms",
    "neardup_clusters",
    "events_hopping",
    "event_value_moments",
    "balance_rollup",
    "funnel_signup_purchase",
    "fuzzy_name_pairs",
    "nearest_centroid_assign",
    "stratified_sample",
    "media_dimensions_jpeg",
    "media_lit_stats",
    "label_centroid_norms",
    # round-3b additions
    "q7_volume_shipping",
    "q11_important_parts",
    "q16_supplier_counts",
    "q17_small_quantity_revenue",
    "q2_min_cost_supplier",
    "events_hourly_delta",
    "user_value_anomalies",
    "pivot_user_event_values",
    "part_triangle_counts",
    "part_pagerank",
    "events_hourly_filled",
    "filtered_knn",
    "repeat_orders_within_week",
    "embedding_dim_variance",
    "cohort_retention",
    "user_behavior_profile",
    "media_frame_sample",
    "profile_lineitem",
    "session_concurrency",
    "event_transitions",
    "median_extendedprice",
    "source_term_divergence",
    # round-3c additions
    "price_quantity_regression",
    "order_price_cube",
    "price_skew_kurtosis",
    "doc_perplexity",
    "benchmark_contamination",
    "duplicate_ngram_spans",
    "order_window_stats",
    "user_order_full_outer",
    "pii_counts",
    "winsorized_quantity_mean",
    "order_part_list",
    "latest_event_state",
    "quantity_mad",
    "nation_balance_share",
    # round-3d additions
    "pack_sequences",
    "chunk_documents",
    "char_entropy",
    "bm25_scores",
    "mixture_sample",
    "spearman_price_discount",
    "media_dimensions_bmp",
    "intersect_all_keys",
    "price_deciles",
    "pmi_collocations",
    "inverted_index_sample",
    "dedup_keep_longest",
    "lineitem_unpivot_stats",
    "multivar_ols_price",
    "rolling_distinct_types",
    "table_checksum",
    # round-3e additions
    "except_all_keys",
    "table_diff",
    "scd2_state_dwell",
    "lineitem_corr_matrix",
    "sentence_stats",
    "extract_numbers",
    "events_dow_profile",
    "copurchase_bfs_hops",
    "weighted_median_price",
    "state_as_of",
    "dedup_normalized",
    "interval_union_coverage",
    "top_terms_per_source",
    "source_vocab_jaccard",
    "part_skyline",
    "uniqueness_profile",
    "referential_integrity",
    "star_join_checksum",
    "events_time_rollup",
    "embedding_norm_stats",
    "median_price_by_flag",
    "chi2_type_dow",
    "length_psi_by_source",
    "decayed_user_value",
    "rolling_median_value",
    "order_gap_by_segment",
    "type_cooccurrence_matrix",
    "hourly_value_bands",
    "dedup_events_window",
    "geo_mean_price_by_flag",
    "order_value_gini",
    "boolean_and_search",
    "partitioned_write_roundtrip",
    "top_orders_with_ties",
    "bucketed_checksums",
    "time_weighted_avg_value",
    "ks_length_sources",
    "cumulative_unique_users",
    "zipf_slope",
    "transition_entropy",
    "copurchase_lift",
    "top1pct_revenue_share",
    "bounce_rate",
    "asof_next_order",
    "centered_moving_avg",
    "doc_length_percentile",
    "user_type_bitmask",
    "price_percentiles_exact",
    "top_session_paths",
    "systematic_sample_orders",
    "partition_skew_report",
    # round-3g additions
    "user_activity_streaks",
    "interarrival_stats",
    "orderkey_gaps",
    "orders_wow_change",
    "welch_ttest_value",
    "rolling_corr_daily",
    "time_to_nth_purchase",
    "revenue_increase_runs",
    "brand_target_encoding",
    "changepoint_cusum",
    "hhi_revenue_by_segment",
    "dau_mau_stickiness",
    "grouped_regression_by_flag",
    "theil_sen_daily_slope",
    "neyman_allocation",
    "suspect_duplicate_orders",
    "ttr_by_source",
    "hapax_stats",
    "dup_cluster_size_hist",
    "embedding_quantization_error",
    "extract_error_audit",
    "priority_transition_counts",
    "anova_price_by_segment",
    "customer_interpurchase_cv",
    "compact_small_files",
    "zonemap_pruned_lookup",
    "cdc_merge_apply",
    "zorder_box_query",
    "snapshot_time_travel",
    "k_anonymity_audit",
    "pseudonymize_roundtrip",
    "histogram2d_price_quantity",
    "sorted_export_verify",
    "cramers_v_lang_source",
    "mixed_format_union",
    "supplier_part_breadth_hist",
    "seasonal_index_monthly",
    "extract_split_kinds",
    "heaps_law_fit",
    "constraint_check_report",
    "train_test_split_audit",
    "vocab_coverage_curve",
    "trailing_7d_active_users",
    "single_source_parts",
    "seasonal_naive_backtest",
    "pii_redact_audit",
    "range_partition_plan",
    "dsir_selection",
    # round-3h additions
    "kaplan_meier_repurchase",
    "ewma_daily_revenue",
    "item_item_cosine",
    "bootstrap_mean_ci",
    "cuped_value_adjustment",
    "sorted_neighborhood_dedup",
    "permutation_test_price_by_segment",
    "jackknife_mean_se",
    "dow_adjusted_revenue_anomalies",
    "mann_whitney_price",
    "holt_linear_daily",
    "mixture_rebalance_plan",
    "auc_length_english",
    "wilcoxon_signed_rank_prepost",
    "two_proportion_conversion",
    "hard_negative_mining",
    "reciprocal_rank_fusion",
    "price_percentile_cont_by_flag",
    "part_name_clusters",
    "segment_influence",
    "view_then_purchase_days",
    "cohens_kappa_labelers",
    "score_decile_lift",
    "ljung_box_daily",
    "selfjoin_size_stats",
    "binned_mutual_information",
    "fano_factor_hourly_by_type",
    "wasserstein_length_sources",
    "conformal_price_interval",
    "fold_balance_audit",
    "latency_sla_by_type",
    "view_purchase_lag_xcorr",
    "blocklist_filter_report",
    "laspeyres_price_index",
    "simpsons_paradox_check",
    "diff_in_diff_value",
    "dedup_token_savings",
    "mahalanobis_outliers",
    "ab_power_mde",
    "yules_k_by_lang",
    "copurchase_assortativity",
    "intrinsic_dimension_twonn",
    "peak_user_rate",
    "poisson_gof_linecount",
    "contingency_residuals",
    "routine_users_entropy",
    "revenue_decomposition_mom",
    "customer_value_migration",
    "negative_samples_cf",
    "price_stickiness_monthly",
    "erasure_audit",
    "fisher_ratio_labels",
    "copurchase_rich_club",
    "return_rate_wilson_by_brand",
    "markov_order_test",
    "term_dispersion_top",
    "embedding_clip_calibration",
    "purchase_attribution",
    "reorder_gap_by_index",
    "label_silhouette_centroid",
    "analyze_all_tables",
    "seasonality_strength",
    "cohort_ltv_curve",
    "customer_trend_slopes",
    "brand_attach_rates",
    "two_way_anova_price",
    "source_ngram_overlap",
    "quantile_treatment_effect",
    "matched_att_value",
    "avg_neighbor_degree_curve",
    "rdd_discount_at_quantity",
    "hill_tail_index",
    "burst_minutes",
    "term_keyness_g2",
    "eb_shrunk_return_rates",
    "lorenz_curve_orders",
    "msprt_crossing_day",
    "price_cents_histogram",
    "iqr_outlier_fences_by_segment",
    "brand_modularity",
    "trade_flow_matrix",
    "partial_corr_price_qty_given_discount",
    "spectral_peaks_daily",
    "decision_stump_returnflag",
    "lognormal_fit_user_value",
    "naive_bayes_lang",
    "knn1_label_accuracy",
    "char_trigram_entropy_by_lang",
    "discount_waterfall",
    "popularity_hitrate_at10",
    "cvm_arm_event_counts",
    "sort_key_advisor",
    "part_active_months_hist",
    "similar_docs_by_shingles",
    "user_sequence_edit_distance",
    "best_split_changepoint",
    "top3_customer_share_by_nation",
    "jl_projection_distortion",
    "markov_heldout_perplexity",
    "fixed_effects_elasticity",
    "triangle_excess_ratio",
    "huber_one_step_price",
    "user_day_surprise",
    "capture_recapture_users",
    "retention_decay_fit",
    "shift_share_decomposition",
    "feature_info_gain",
    "month_end_loading",
    "order_gap_lognormal_by_segment",
    "brand_repeat_rate",
    "order_brand_diversity",
    "post_error_intensity",
    "token_stutter_top",
    "forecast_leaderboard",
    "gap_acceleration_sign_test",
    "revenue_half_count",
    "mcnemar_labelers",
    "topk_customer_stability",
    # round-3j additions
    "kruskal_wallis_quantity",
    "kendall_tau_daily",
    "cochran_q_labelers",
    "friedman_segment_monthly",
    "logrank_repurchase_by_segment",
    "mantel_haenszel_urgent_status",
    "gumbel_daily_max_fit",
    "runs_test_daily_revenue",
    "durbin_watson_daily_trend",
    "theil_index_customer_revenue",
    "burrows_delta_sources",
    "hypergeom_enrichment_discount_returns",
    "fleiss_kappa_labelers",
    "first_before_first_support",
    "ordinal_assoc_quantity_discount",
    "cronbach_alpha_labelers",
    # round-3k additions
    "atkinson_index_customer_revenue",
    "hoover_index_customer_revenue",
    "jonckheere_quantity_by_discount",
    "cliffs_delta_returned_quantity",
    "nelson_aalen_repurchase",
    "tornqvist_price_index_yearly",
    "permutation_entropy_daily_revenue",
    "hurst_exponent_daily_revenue",
    "t_closeness_audit",
    "logloss_length_english",
    "bartlett_quantity_by_flag",
    "brown_forsythe_quantity_by_flag",
    "chao1_vocab_richness",
    "good_turing_unseen_mass",
    "newey_west_daily_trend",
    "cochrane_orcutt_daily_trend",
    "mrr_popularity_at10",
    "simpson_diversity_parts",
    "krippendorff_alpha_labelers",
    "gwet_ac1_labelers",
    "gamma_fit_order_gaps",
    "negbin_fit_daily_orders",
    "yuen_trimmed_t_quantity",
    "cvm_two_sample_quantity",
    "spectral_entropy_daily_revenue",
    # round-3f additions
    "kendall_tau_b_quantity_discount",
    "stuart_tau_c_quantity_discount",
    "breusch_pagan_price_quantity",
    "white_test_price_quantity",
    "brunet_w_vocab",
    "honore_h_vocab",
    "gehan_breslow_repurchase_by_segment",
    "tarone_ware_repurchase_by_segment",
    "anova_omega_epsilon_price_segment",
    "kruskal_wallis_effect_sizes_quantity",
    "chatterjee_xi_daily_revenue",
    "reset_test_price_quantity",
    "chow_break_daily_revenue",
    "quandt_supf_daily_revenue",
    "phillips_perron_daily_revenue",
    "breusch_godfrey_daily_trend",
    "levene_mean_quantity_by_flag",
    "obrien_quantity_by_flag",
    "theil_decomposition_by_nation",
    "mld_decomposition_by_nation",
    "hosmer_lemeshow_length_english",
    "spiegelhalter_z_length_english",
    "bhattacharyya_quantity",
    "total_variation_quantity",
    "mase_seasonal_naive_monthly",
    "theil_u2_seasonal_naive_monthly",
    "gk_tau_priority_status",
    "pearson_contingency_priority_status",
    "hartley_fmax_price_by_segment",
    "cochran_c_price_by_segment",
    # round-3g additions
    "woolf_or_heterogeneity_urgent_finished",
    "peto_or_urgent_finished",
    "goldfeld_quandt_price_quantity",
    "glejser_price_quantity",
    "laplace_trend_events",
    "crow_amsaa_events",
    "rosenbluth_index_brand_revenue",
    "concentration_ratios_brand_revenue",
    "palma_ratio_customer_revenue",
    "quintile_share_ratio_customer_revenue",
    "transfer_entropy_views_purchases",
    "variation_of_information_label_signs",
    "western_electric_daily_revenue",
    "nelson_trend_rules_daily_revenue",
    "siegel_tukey_quantity",
    "fligner_policello_quantity",
    "dfa_daily_revenue",
    "higuchi_fd_daily_revenue",
    "l_moments_order_price",
    "gev_pwm_yearly_max_revenue",
    "confusion_metrics_length_english",
    "fowlkes_mallows_length_english",
    "getis_ord_g_customer_revenue",
    "join_counts_balance_sign",
    "ace_vocab_richness",
    "jackknife_vocab_richness",
    "lexical_richness_indices",
    "sichel_s_vocab",
    "marshall_edgeworth_walsh_index",
    "geometric_price_indexes",
    "brown_mood_median_quantity_by_linenumber",
    "ksample_ad_quantity_by_linenumber",
    "peto_peto_repurchase_by_segment",
    "fleming_harrington_repurchase_by_segment",
    "leverage_diagnostics_price_quantity",
    "cooks_distance_outliers_price_quantity",
    "icss_variance_change_daily_revenue",
    "variance_ratio_pre_post_break",
    "mcleod_li_daily_revenue",
    "engle_ng_sign_bias_daily_revenue",
    "ripley_k_events",
    "pair_correlation_events",
    "process_capability_quantity",
    "taguchi_cpm_quantity",
    "biweight_price",
    "hampel_m_price",
    "hill_numbers_vocab",
    "evenness_profile_vocab",
    "fishers_g_daily_revenue",
    "bartlett_cumulative_periodogram_daily_revenue",
    "hotelling_t2_returned_kept",
    "box_m_covariance_by_flag",
    "canonical_correlation_lineitem",
    "rv_coefficient_lineitem",
    "lo_modified_rs_daily_revenue",
    "gph_fractional_d_daily_revenue",
    "kendall_partial_tau_quantity_discount_given_tax",
    "partial_spearman_quantity_discount_given_tax",
    "g2_priority_status_marginal",
    "g2_priority_status_given_segment",
    "welch_anova_price_segment",
    "brown_forsythe_anova_price_segment",
    "v_test_noon_events",
    "circular_moments_events",
    "watson_williams_event_types",
    "peak_hour_by_event_type",
    "ancova_parallelism_retail_size_brand",
    "ancova_adjusted_means_retail_size_brand",
    "scheirer_ray_hare_quantity",
    "did_median_quantity_flag_status",
    "kendall_w_segment_monthly",
    "deming_views_purchases",
    "rma_views_purchases",
    "pielou_evenness_parts",
    "berger_parker_parts",
    "diffsign_runs_daily_revenue",
    "turning_points_daily_revenue",
    "icc_labelers",
    "scott_pi_labelers",
    "js_divergence_hourly_profiles",
    "hellinger_hourly_profiles",
    "lin_ccc_views_purchases",
    "bland_altman_views_purchases",
    "seasonal_mann_kendall_monthly_revenue",
    "cox_stuart_trend_daily_revenue",
    "grubbs_max_daily_revenue",
    "dixon_q_daily_revenue",
    "hourly_profile_stability",
    "weekday_weekend_hourly_js",
    "kpss_daily_revenue",
    "variance_ratio_daily_revenue",
    "cohens_d_price_returned",
    "f_test_price_returned",
    "weibull_fit_order_gaps",
    "source_vocab_dice_overlap",
    "participation_ratio_embeddings",
    "embedding_isotropy_offdiag",
    "goodman_kruskal_lambda_priority_status",
    "theil_u_priority_status",
    "monetary_unit_sample_orders",
    "benford_second_digit_prices",
    "abc_analysis_parts",
    "xyz_analysis_parts",
    "xmr_control_daily_revenue",
    "p_chart_daily_returns",
    "median_time_to_repurchase",
    "repurchase_incidence_horizons",
    "blomqvist_beta_quantity_discount",
    "footrule_nation_revenue_yoy",
    "risk_measures_urgent_return",
    "cohens_h_urgent_return",
    "allan_variance_event_rate",
    "variance_time_curve_events",
    "ks_balance_customer_supplier",
    "cochran_armitage_urgent_trend",
    "lorenz_asymmetry_customer_revenue",
    "mld_customer_revenue",
    "bowley_skewness_quantity",
    "moors_kurtosis_quantity",
    "hits_two_hop_authority",
    "seasonal_theil_sen_monthly_revenue",
    "buishand_range_daily_revenue",
    "kpss_trend_daily_revenue",
    "dickey_fuller_daily_revenue",
    "arch_lm_daily_revenue",
    "ar1_half_life_daily_revenue",
    "expected_shortfall_order_price",
    "trimmed_mean_order_price",
    "rate_ratio_weekend_events",
    "binomial_exact_weekend_purchases",
    "anderson_darling_two_sample_quantity",
    "kuiper_two_sample_quantity",
    "tail_dependence_quantity_price",
    "event_id_time_inversions",
    "winsorized_corr_price_quantity",
    "point_biserial_return_price",
    "ridge_price_model",
    "vif_quantity_discount",
    "cochran_armitage_return_by_quantity",
    "ztp_lines_per_order",
    "basket_size_entropy",
    "nation_hhi_trend",
    "nation_share_turbulence",
    # round-3c additions
    "energy_distance_quantity",
    "brunner_munzel_quantity",
    "ansari_bradley_quantity",
    "lepage_quantity",
    "tukey_hsd_price_by_segment",
    "games_howell_price_by_segment",
    "mood_median_test_quantity_by_flag",
    "cuzick_trend_quantity_by_linenumber",
    "distance_corr_quantity_discount",
    "hoeffding_d_quantity_discount",
    "cmh_test_urgent_finished",
    "breslow_day_urgent_finished",
    "stuart_maxwell_raters",
    "bhapkar_raters",
    "pickands_tail_index",
    "moment_tail_index",
    "quade_segment_monthly",
    "page_trend_segment_yearly",
    "embedding_coordinate_kurtosis",
    "embedding_spectral_moments",
    # round-3d additions
    "conover_squared_ranks_quantity",
    "dunn_pairwise_quantity_by_flag",
    "simpson_diversity_vocab",
    "shannon_entropy_vocab",
    "epps_pulley_daily_revenue",
    "dagostino_k2_daily_revenue",
    "bartels_rank_daily_revenue",
    "cucconi_quantity",
    "gumbel_fit_daily_max_value",
    "gpd_pot_fit_order_price",
    "morans_i_customer_balance",
    "gearys_c_customer_balance",
    "negbin_fit_lines_per_order",
    "bohning_dispersion_lines_per_order",
    "ledoit_wolf_shrinkage",
    "oas_shrinkage",
    # round-3e additions
    "siegel_slope_daily_revenue",
    "mad_outliers_daily_revenue",
    "cochrane_orcutt_daily_trend",
    "newey_west_trend_se",
    "gini_term_frequencies",
    "berger_parker_vocab",
    "friedman_aligned_ranks_segment_monthly",
    "tukey_nonadditivity_segment_monthly",
    "mantel_nations_balance_price",
    "anosim_region_balance",
    "circular_linear_corr_time_value",
    "kuiper_dow_uniformity",
    "cramers_v_corrected_priority_status",
    "tschuprow_t_priority_status",
    "weighted_kappa_raters",
    "bangdiwala_b_raters",
    # round-3h additions (this session)
    "mardia_skewness_quantity_discount",
    "mardia_kurtosis_quantity_discount",
    "sample_entropy_daily_revenue",
    "approximate_entropy_daily_revenue",
    "sato_vartia_index",
    "montgomery_vartia_index",
    "attributable_fractions_urgent_return",
    "likelihood_ratios_length_english",
    "c_chart_daily_orders",
    "u_chart_lines_per_order_daily",
    "snht_daily_revenue",
    "von_neumann_ratio_daily_revenue",
    "ratio_estimator_revenue",
    "regression_estimator_revenue",
    "life_table_repurchase",
    "greenwood_km_ci",
    "lisa_quadrants_customer_balance",
    "local_gistar_nation_balance",
    "dffits_outliers_price_quantity",
    "dfbetas_slope_outliers_price_quantity",
    "gumbel_return_levels_daily_max",
    "inverse_gaussian_fit_order_gaps",
    "margalef_menhinick_vocab",
    "err_popularity_at10",
    "croston_sba_part_demand",
    "tsb_part_demand",
    "records_test_daily_revenue",
    "ulcer_index_daily_revenue",
    "james_stein_segment_means",
    "robbins_eb_order_counts",
    "gini_correlation_quantity_price",
    "gini_mean_difference_price",
    "cross_k_views_purchases",
    "cross_pcf_views_purchases",
    "hl_shift_ci_quantity_returned",
    "shift_function_deciles_quantity_returned",
    "weibull_median_rank_regression_gaps",
    "gini_exponentiality_gaps",
    "fisher_quantity_index_yearly",
    "factor_reversal_audit",
    "lorenz_dominance_segments",
    "generalized_lorenz_segments",
    "katz_k_mixture_top_term",
    "term_adaptation_top_terms",
    "embedding_resultant_uniformity",
    "embedding_mean_pairwise_cosine",
    "copurchase_conviction_leverage",
    "copurchase_null_invariant_measures",
    "fsd_check_segments",
    "ssd_check_segments",
    "post_stratified_revenue_estimate",
    "hajek_vs_ht_revenue",
    # round-3i additions (this session)
    "random_effects_meta_urgent_finished",
    "funnel_asymmetry_urgent_finished",
    "elementary_price_indexes",
    "carli_jevons_formula_effect",
    "fairness_rates_by_source",
    "fairness_gaps_by_source",
    "brand_return_prr_ror",
    "brand_return_bcpnn_ic",
    "weekly_cross_spectrum_views_purchases",
    "weekly_band_coherence_views_purchases",
    "kernel_return_rate_by_quantity",
    "kernel_return_rate_derivative",
    "revenue_retention_customers",
    "nrr_decomposition_customers",
    "lilliefors_daily_revenue",
    "anderson_darling_daily_revenue",
    "region_brand_braycurtis",
    "region_brand_morisita_horn",
    "fay_herriot_nation_balance",
    "fay_herriot_shrinkage_summary",
    "discount_progressivity_kakwani",
    "discount_progressivity_suits",
    "benford_first_two_digits",
    "benford_summation_test",
    "fisher_exact_urgent_finished",
    "fisher_exact_by_segment",
    "pnl_ratios_daily_revenue",
    "downside_risk_daily_revenue",
    "fd_g3_errors",
    "fd_lattice_pruning",
    "watson_u2_time_of_day",
    "rao_spacing_time_of_day",
    "ratio_metric_delta_ci",
    "ratio_metric_fieller_ci",
    "mean_excess_order_price",
    "mean_excess_linearity",
    "interaction_information_events",
    "o_information_events",
    "vocab_rarefaction_curve",
    "vocab_expected_singletons",
    "harmonic_seasonality_monthly_orders",
    "hewitt_seasonality_monthly_orders",
    "partial_auc_length_english",
    "somers_d_length_english",
    "kish_cluster_deff_orders",
    "kish_weighting_deff_pps",
    "rbg_variance_mh_or",
    "gr_variance_mh_rd",
    "wolfson_bipolarization_customers",
    "esteban_ray_polarization_customers",
    "drobisch_stuvel_indexes",
    "bortkiewicz_decomposition",
    "ttt_transform_gaps",
    "gnedenko_f_gaps",
    "last_two_digit_uniformity",
    "round_number_bias_prices",
    "erlang_c_staffing",
    "erlang_b_blocking",
    "engle_granger_views_purchases",
    "error_correction_model_views_purchases",
    "hhi_decomposition_region_brand",
    "entropy_decomposition_region_brand",
    "newsvendor_stock_level",
    "stock_service_levels",
    # round-3j additions
    "bayes_ab_urgent_finished",
    "bayes_ab_expected_loss",
    "lotka_law_customer_orders",
    "gibrat_check_customer_spend",
    "gini_source_decomposition_orders",
    "gini_marginal_effects_orders",
    "fisher_lda_returned",
    "lda_accuracy_returned",
    "bass_diffusion_fit",
    "bass_model_implied",
    "competing_risks_cif",
    "km_vs_cif_fallacy",
    "mediation_sobel_discount",
    "mediation_proportion_discount",
    "linear_spline_price_quantity",
    "spline_vs_linear_ftest",
    "fgt_poverty_customers",
    "sen_poverty_customers",
    "press_predicted_r2_price_quantity",
    "information_criteria_price_quantity",
    "srm_check_user_buckets",
    "aa_bucket_conversion_homogeneity",
    "mcf_recurrent_purchases",
    "mcf_vs_naive_bias",
    "copurchase_adamic_adar_topk",
    "linkpred_precision_at_k",
    "yule_tetrachoric_urgent_return",
    "phi_max_urgent_return",
    "lowe_price_index_3period",
    "young_price_index_3period",
    "cox_score_test_repurchase_value",
    "weighted_trend_tests_repurchase_value",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, con):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    mine = fn(SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    mine = canon(mine)
    gold = canon(con.sql(sql).df())
    pd.testing.assert_frame_equal(mine, gold, check_dtype=False)


def test_kcore_matches_sequential_peel():
    """Pin the distributed k-core fixpoint to a sequential reference
    peel over the same co-purchase edge list (no SQL oracle: iterative)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from ocr_pipeline_ray.pipelines import relational

    k = 3
    pairs = relational.part_copurchase_pairs(SF)
    edges = [(int(a), int(b)) for a, b in zip(pairs["part_a"], pairs["part_b"])]

    # sequential peel
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    core_nodes = {n for n in adj if adj[n]}
    n_edges = sum(len(v) for v in adj.values()) // 2

    got = relational.kcore_copurchase(SF, k=k)
    assert int(got["n_core_nodes"].iloc[0]) == len(core_nodes)
    assert int(got["n_core_edges"].iloc[0]) == n_edges
    if core_nodes:
        assert int(got["min_core_node"].iloc[0]) == min(core_nodes)


def test_hits_matches_sequential_power_iteration():
    """Pin the distributed HITS fixpoint to a sequential numpy power
    iteration over the same distinct purchase edge list (no SQL
    oracle: iterative). The oracled hits_two_hop_authority query
    anchors the shared edge/broadcast machinery exactly."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    import duckdb

    from ocr_pipeline_ray.pipelines.relational import hits_copurchase

    got = hits_copurchase(SF, iters=10, k=10)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')")
    e = con.sql(
        "SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).df()
    cs = np.sort(e["c"].unique())
    ps = np.sort(e["p"].unique())
    ci = {v: i for i, v in enumerate(cs)}
    pi = {v: i for i, v in enumerate(ps)}
    a_mat = np.zeros((len(cs), len(ps)))
    for c, p in zip(e["c"], e["p"]):
        a_mat[ci[c], pi[p]] = 1.0
    h = np.ones(len(cs))
    for _ in range(10):
        a = a_mat.T @ h
        a = a / np.sqrt((a * a).sum())
        h = a_mat @ a
        h = h / np.sqrt((h * h).sum())
    order = np.lexsort((ps, -np.round(a, 12)))[:10]
    exp = pd.DataFrame(
        {"l_partkey": ps[order].astype("int64"), "authority": np.round(a[order], 6)}
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_isotonic_matches_sequential_pava():
    """Pin the distributed-grid isotonic fit to a sequential weighted
    PAVA over the gathered grid, plus monotonicity and weighted-mean
    preservation (no SQL oracle: iterative pooling)."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    from ocr_pipeline_ray.pipelines.relational import isotonic_return_rate_by_quantity

    out = isotonic_return_rate_by_quantity(SF)
    f = out["isotonic_rate"].to_numpy("float64")
    n = out["n"].to_numpy("int64").astype("float64")
    raw = out["raw_rate"].to_numpy("float64")
    assert (np.diff(f) >= -1e-9).all(), "fit must be non-decreasing"
    assert abs((f * n).sum() - (raw * n).sum()) < 1e-6 * (raw * n).sum() + 1e-9
    # independent O(n^2) reference: fitted value at i is max over j<=i of
    # min over k>=j of the weighted average raw[j..k] (minimax formula)
    m = len(raw)
    cumw = np.concatenate([[0.0], np.cumsum(n)])
    cumwy = np.concatenate([[0.0], np.cumsum(n * raw)])

    def avg(j, k):
        return (cumwy[k + 1] - cumwy[j]) / (cumw[k + 1] - cumw[j])

    ref = np.empty(m)
    for i in range(m):
        best = -np.inf
        for j in range(i + 1):
            mn = min(avg(j, k) for k in range(i, m))
            best = max(best, mn)
        ref[i] = best
    assert np.allclose(f, np.round(ref, 6), atol=2e-6), (f[:5], ref[:5])
