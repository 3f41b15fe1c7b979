"""Driver contract for the Ray-Data-native extraction engine.

Ray is initialised by the caller BEFORE this module is imported —
nothing here (or in ``ocr_pipeline_ray``) calls ``ray.init()`` /
``ray.shutdown()``.

``queries()`` maps operator names -> callables over an sf_dir of the
driver's parquet tables; ``oracle_sql()`` gives the DuckDB-equivalent
SQL for every SQL-expressible operator (column names match exactly).
Entries without SQL (heuristic scoring, sketches, ANN) get the
driver's rows-only check and are additionally property-tested in
``tests/``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: wrap sf0.001 ``documents`` into interleaved
    text+media docs, run explode -> HTML-strip -> OCR/PDF actor pools
    -> ordered reassembly, return per-doc extracted texts."""
    from ocr_pipeline_ray.pipelines.interleave import extract_interleaved

    return extract_interleaved(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_pipeline_ray.pipelines import (
        dedup,
        events,
        interleave,
        media,
        relational,
        similarity,
        text,
    )

    return {
        # flagship extraction engine (full pipeline, SQL oracle)
        "extract_interleaved": interleave.extract_interleaved,
        "extract_interleaved_ppm": interleave.extract_interleaved_ppm,
        "extract_span_stats": interleave.extract_span_stats,
        # relational: scans, joins, aggregates, sort/top-k, distinct
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q5_nation_revenue": relational.q5_nation_revenue,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "top_orders": relational.top_orders,
        "distinct_segments": relational.distinct_segments,
        "part_brand_stats": relational.part_brand_stats,
        "supplier_balance_by_nation": relational.supplier_balance_by_nation,
        "balance_rollup": relational.balance_rollup,
        "fuzzy_name_pairs": relational.fuzzy_name_pairs,
        "part_copurchase_pairs": relational.part_copurchase_pairs,
        "part_triangle_counts": relational.part_triangle_counts,
        "part_pagerank": relational.part_pagerank,
        "weighted_sample_orders": relational.weighted_sample_orders,
        "repeat_orders_within_week": relational.repeat_orders_within_week,
        "profile_lineitem": relational.profile_lineitem,
        "q10_returned_revenue": relational.q10_returned_revenue,
        "q14_promo_revenue": relational.q14_promo_revenue,
        "top3_orders_per_segment": relational.top3_orders_per_segment,
        "q4_order_priority": relational.q4_order_priority,
        "q12_priority_by_linestatus": relational.q12_priority_by_linestatus,
        "q13_customer_distribution": relational.q13_customer_distribution,
        "q18_large_volume_orders": relational.q18_large_volume_orders,
        "q22_idle_high_balance": relational.q22_idle_high_balance,
        "q20_surplus_suppliers": relational.q20_surplus_suppliers,
        "q21_waiting_suppliers": relational.q21_waiting_suppliers,
        "q2_min_cost_supplier": relational.q2_min_cost_supplier,
        "q7_volume_shipping": relational.q7_volume_shipping,
        "q8_market_share": relational.q8_market_share,
        "q9_profit_by_nation_year": relational.q9_profit_by_nation_year,
        "q11_important_parts": relational.q11_important_parts,
        "q15_top_supplier": relational.q15_top_supplier,
        "q16_supplier_counts": relational.q16_supplier_counts,
        "q17_small_quantity_revenue": relational.q17_small_quantity_revenue,
        "q19_disjunctive_revenue": relational.q19_disjunctive_revenue,
        "order_rank_in_segment": relational.order_rank_in_segment,
        "order_window_stats": relational.order_window_stats,
        "user_order_full_outer": relational.user_order_full_outer,
        "price_quantity_regression": relational.price_quantity_regression,
        "order_price_cube": relational.order_price_cube,
        "price_skew_kurtosis": relational.price_skew_kurtosis,
        "winsorized_quantity_mean": relational.winsorized_quantity_mean,
        "quantity_mad": relational.quantity_mad,
        "nation_balance_share": relational.nation_balance_share,
        "order_part_list": relational.order_part_list,
        "customers_without_orders": relational.customers_without_orders,
        "parts_with_lineitems": relational.parts_with_lineitems,
        "parts_with_lineitems_bloom": relational.parts_with_lineitems_bloom,
        "nations_without_suppliers": relational.nations_without_suppliers,
        "union_all_keys": relational.union_all_keys,
        # set ops + quantiles
        "keys_in_both": relational.keys_in_both,
        "custkeys_not_suppkeys": relational.custkeys_not_suppkeys,
        "quantity_quantiles": relational.quantity_quantiles,
        "median_extendedprice": relational.median_extendedprice,
        "order_price_quantiles_sketch": relational.order_price_quantiles_sketch,
        "price_quantiles_by_flag_sketch": relational.price_quantiles_by_flag_sketch,
        "quantity_quantiles_by_flag": relational.quantity_quantiles_by_flag,
        # stream-shaped
        "events_hourly": events.events_hourly,
        "sessionize": events.sessionize,
        "events_hopping": events.events_hopping,
        "events_hourly_incremental": events.events_hourly_incremental,
        "asof_latest_order": events.asof_latest_order,
        "rolling_user_value": events.rolling_user_value,
        "cumulative_user_value": events.cumulative_user_value,
        "distinct_users_per_type": events.distinct_users_per_type,
        "distinct_users_hll": events.distinct_users_hll,
        "props_k_by_type": events.props_k_by_type,
        "event_value_moments": events.event_value_moments,
        "funnel_signup_purchase": events.funnel_signup_purchase,
        "events_hourly_delta": events.events_hourly_delta,
        "user_value_anomalies": events.user_value_anomalies,
        "pivot_user_event_values": events.pivot_user_event_values,
        "events_hourly_filled": events.events_hourly_filled,
        "user_behavior_profile": events.user_behavior_profile,
        "cohort_retention": events.cohort_retention,
        "session_concurrency": events.session_concurrency,
        "event_transitions": events.event_transitions,
        "latest_event_state": events.latest_event_state,
        # dedup family
        "dedup_exact": dedup.dedup_exact,
        "minhash_lsh_dedup": dedup.minhash_lsh_dedup,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "simhash_neardup": dedup.simhash_neardup,
        "exact_jaccard_pairs": dedup.exact_jaccard_pairs,
        "neardup_clusters": dedup.neardup_clusters,
        # exact blocked pair join (DuckDB oracle); the LSH-bucketed
        # scale path (embedding_neardup_lsh) targets the >=0.9-cosine
        # regime where random test corpora have no pairs, so its
        # correctness story is the planted-dup recall tests in
        # tests/test_similarity.py rather than a 0-row driver check
        "embedding_neardup": similarity.embedding_neardup,
        # similarity search
        "knn_brute_force": similarity.knn_brute_force,
        "knn_lsh": similarity.knn_lsh,
        "knn_ivf": similarity.knn_ivf,
        "filtered_knn": similarity.filtered_knn,
        "embedding_dim_variance": similarity.embedding_dim_variance,
        "embedding_pca_top": similarity.embedding_pca_top,
        "embedding_neardup_lsh_planted": similarity.embedding_neardup_lsh_planted,
        # multimodal decode stages over real P6 rasters
        "media_dimensions": media.media_dimensions,
        "media_dimensions_png": media.media_dimensions_png,
        "media_dimensions_jpeg": media.media_dimensions_jpeg,
        "media_channel_stats": media.media_channel_stats,
        "media_lit_stats": media.media_lit_stats,
        "media_word_boxes": media.media_word_boxes,
        "media_frame_sample": media.media_frame_sample,
        # text analysis
        "token_counts": text.token_counts,
        "bpe_token_counts": text.bpe_token_counts,
        "fingerprints": text.fingerprints,
        "language_id": text.language_id,
        "quality_scores": text.quality_scores,
        "winnowing": text.winnowing,
        "vocab_top_terms": text.vocab_top_terms,
        "source_term_divergence": text.source_term_divergence,
        "doc_length_histogram": text.doc_length_histogram,
        "hash_sample": text.hash_sample,
        "tfidf_top_term": text.tfidf_top_term,
        "curate_corpus": text.curate_corpus,
        "repetition_stats": text.repetition_stats,
        "segment_dedup": text.segment_dedup,
        "doc_perplexity": text.doc_perplexity,
        "benchmark_contamination": text.benchmark_contamination,
        "duplicate_ngram_spans": text.duplicate_ngram_spans,
        "pii_counts": text.pii_counts,
        "compression_ratio": text.compression_ratio,
        "heavy_hitter_terms": text.heavy_hitter_terms,
        "stratified_sample": text.stratified_sample,
        "bpe_learn_merges": text.bpe_learn_merges,
        # vector aggregates over the embeddings table
        "label_centroid_stats": similarity.label_centroid_stats,
        "nearest_centroid_assign": similarity.nearest_centroid_assign,
        "label_centroid_norms": similarity.label_centroid_norms,
    }


def oracle_sql() -> dict[str, str]:
    from ocr_pipeline_ray.pipelines import (
        dedup,
        events,
        interleave,
        media,
        relational,
        similarity,
        text,
    )

    return {
        "extract_interleaved": interleave.EXTRACT_INTERLEAVED_SQL,
        "extract_interleaved_ppm": interleave.EXTRACT_INTERLEAVED_PPM_SQL,
        "extract_span_stats": interleave.EXTRACT_SPAN_STATS_SQL,
        "q1_pricing_summary": relational.Q1_SQL,
        "q3_shipping_priority": relational.Q3_SQL,
        "q5_nation_revenue": relational.Q5_SQL,
        "q6_forecast_revenue": relational.Q6_SQL,
        "top_orders": relational.TOP_ORDERS_SQL,
        "distinct_segments": relational.DISTINCT_SEGMENTS_SQL,
        "part_brand_stats": relational.PART_BRAND_SQL,
        "supplier_balance_by_nation": relational.SUPPLIER_BALANCE_SQL,
        "balance_rollup": relational.BALANCE_ROLLUP_SQL,
        "fuzzy_name_pairs": relational.FUZZY_NAME_PAIRS_SQL,
        "part_copurchase_pairs": relational.PART_COPURCHASE_SQL,
        "weighted_sample_orders": relational.WEIGHTED_SAMPLE_SQL,
        "q10_returned_revenue": relational.Q10_SQL,
        "q14_promo_revenue": relational.Q14_SQL,
        "top3_orders_per_segment": relational.TOP3_PER_SEGMENT_SQL,
        "q4_order_priority": relational.Q4_SQL,
        "q12_priority_by_linestatus": relational.Q12_SQL,
        "q13_customer_distribution": relational.Q13_SQL,
        "q18_large_volume_orders": relational.Q18_SQL,
        "q22_idle_high_balance": relational.Q22_SQL,
        "q20_surplus_suppliers": relational.Q20_SURPLUS_SUPPLIERS_SQL,
        "q21_waiting_suppliers": relational.Q21_WAITING_SUPPLIERS_SQL,
        "q2_min_cost_supplier": relational.Q2_SQL,
        "q7_volume_shipping": relational.Q7_SQL,
        "q8_market_share": relational.Q8_SQL,
        "q9_profit_by_nation_year": relational.Q9_SQL,
        "q11_important_parts": relational.Q11_SQL,
        "q15_top_supplier": relational.Q15_SQL,
        "q16_supplier_counts": relational.Q16_SQL,
        "q17_small_quantity_revenue": relational.Q17_SQL,
        "q19_disjunctive_revenue": relational.Q19_SQL,
        "part_triangle_counts": relational.PART_TRIANGLE_SQL,
        "part_pagerank": relational.PART_PAGERANK_SQL,
        "filtered_knn": similarity.FILTERED_KNN_SQL,
        "embedding_dim_variance": similarity.EMBEDDING_DIM_VARIANCE_SQL,
        "repeat_orders_within_week": relational.REPEAT_ORDERS_SQL,
        "profile_lineitem": relational.PROFILE_LINEITEM_SQL,
        "events_hourly_delta": events.EVENTS_HOURLY_DELTA_SQL,
        "user_value_anomalies": events.USER_VALUE_ANOMALIES_SQL,
        "pivot_user_event_values": events.PIVOT_USER_EVENT_VALUES_SQL,
        "events_hourly_filled": events.EVENTS_HOURLY_FILLED_SQL,
        "user_behavior_profile": events.USER_BEHAVIOR_PROFILE_SQL,
        "media_frame_sample": media.MEDIA_FRAME_SAMPLE_SQL,
        "cohort_retention": events.COHORT_RETENTION_SQL,
        "session_concurrency": events.SESSION_CONCURRENCY_SQL,
        "event_transitions": events.EVENT_TRANSITIONS_SQL,
        "latest_event_state": events.LATEST_EVENT_STATE_SQL,
        "order_rank_in_segment": relational.ORDER_RANK_IN_SEGMENT_SQL,
        "order_window_stats": relational.ORDER_WINDOW_STATS_SQL,
        "user_order_full_outer": relational.USER_ORDER_FULL_OUTER_SQL,
        "price_quantity_regression": relational.PRICE_QUANTITY_REGRESSION_SQL,
        "order_price_cube": relational.ORDER_PRICE_CUBE_SQL,
        "price_skew_kurtosis": relational.PRICE_SKEW_KURTOSIS_SQL,
        "winsorized_quantity_mean": relational.WINSORIZED_QUANTITY_MEAN_SQL,
        "quantity_mad": relational.QUANTITY_MAD_SQL,
        "nation_balance_share": relational.NATION_BALANCE_SHARE_SQL,
        "order_part_list": relational.ORDER_PART_LIST_SQL,
        "customers_without_orders": relational.CUSTOMERS_WITHOUT_ORDERS_SQL,
        "parts_with_lineitems": relational.PARTS_WITH_LINEITEMS_SQL,
        # bloom prefilter + exact verify == exact semi join
        "parts_with_lineitems_bloom": relational.PARTS_WITH_LINEITEMS_SQL,
        "nations_without_suppliers": relational.NATIONS_WITHOUT_SUPPLIERS_SQL,
        "union_all_keys": relational.UNION_ALL_KEYS_SQL,
        "keys_in_both": relational.KEYS_IN_BOTH_SQL,
        "custkeys_not_suppkeys": relational.CUSTKEYS_NOT_SUPPKEYS_SQL,
        "quantity_quantiles": relational.QUANTITY_QUANTILES_SQL,
        "median_extendedprice": relational.MEDIAN_EXTENDEDPRICE_SQL,
        "quantity_quantiles_by_flag": relational.QUANTITY_QUANTILES_BY_FLAG_SQL,
        "events_hourly": events.EVENTS_HOURLY_SQL,
        "sessionize": events.SESSIONIZE_SQL,
        "events_hopping": events.EVENTS_HOPPING_SQL,
        # incremental maintenance must reproduce the one-shot batch
        # aggregate exactly -> same oracle as events_hourly
        "events_hourly_incremental": events.EVENTS_HOURLY_SQL,
        "asof_latest_order": events.ASOF_SQL,
        "rolling_user_value": events.ROLLING_SQL,
        "cumulative_user_value": events.CUMULATIVE_SQL,
        "distinct_users_per_type": events.DISTINCT_USERS_SQL,
        "props_k_by_type": events.PROPS_K_SQL,
        "event_value_moments": events.EVENT_VALUE_MOMENTS_SQL,
        "funnel_signup_purchase": events.FUNNEL_SQL,
        "dedup_exact": dedup.DEDUP_EXACT_SQL,
        "exact_jaccard_pairs": dedup.EXACT_JACCARD_PAIRS_SQL,
        "neardup_clusters": dedup.NEARDUP_CLUSTERS_SQL,
        "token_counts": text.TOKEN_COUNTS_SQL,
        "bpe_token_counts": text.BPE_TOKEN_COUNTS_SQL,
        "fingerprints": text.FINGERPRINTS_SQL,
        "winnowing": text.WINNOWING_SQL,
        "language_id": text.LANGUAGE_ID_SQL,
        "quality_scores": text.QUALITY_SCORES_SQL,
        "repetition_stats": text.REPETITION_STATS_SQL,
        "segment_dedup": text.SEGMENT_DEDUP_SQL,
        "doc_perplexity": text.DOC_PERPLEXITY_SQL,
        "benchmark_contamination": text.BENCHMARK_CONTAMINATION_SQL,
        "duplicate_ngram_spans": text.DUPLICATE_NGRAM_SPANS_SQL,
        "pii_counts": text.PII_COUNTS_SQL,
        "heavy_hitter_terms": text.HEAVY_HITTER_TERMS_SQL,
        "stratified_sample": text.STRATIFIED_SAMPLE_SQL,
        "curate_corpus": text.CURATE_CORPUS_SQL,
        "vocab_top_terms": text.VOCAB_TOP_TERMS_SQL,
        "source_term_divergence": text.SOURCE_TERM_DIVERGENCE_SQL,
        "doc_length_histogram": text.DOC_LENGTH_HISTOGRAM_SQL,
        "hash_sample": text.HASH_SAMPLE_SQL,
        "tfidf_top_term": text.TFIDF_TOP_TERM_SQL,
        "label_centroid_stats": similarity.LABEL_CENTROID_STATS_SQL,
        "nearest_centroid_assign": similarity.NEAREST_CENTROID_ASSIGN_SQL,
        "knn_brute_force": similarity.knn_sql(),
        "embedding_neardup": similarity.EMBEDDING_NEARDUP_SQL,
        "embedding_neardup_lsh_planted": similarity.EMBEDDING_NEARDUP_LSH_PLANTED_SQL,
        "media_dimensions": media.MEDIA_DIMENSIONS_SQL,
        "media_dimensions_png": media.MEDIA_DIMENSIONS_SQL,
        "media_dimensions_jpeg": media.MEDIA_DIMENSIONS_SQL,
        "media_lit_stats": media.MEDIA_LIT_STATS_SQL,
        "label_centroid_norms": similarity.LABEL_CENTROID_NORMS_SQL,
        "media_word_boxes": media.MEDIA_WORD_BOXES_SQL,
        # no oracle (sketch / ANN / non-SQL hash / codec, approximate
        # or non-SQL-expressible by design): minhash_lsh_dedup,
        # ngram_jaccard_pairs, simhash_neardup, knn_lsh, knn_ivf,
        # distinct_users_hll, order_price_quantiles_sketch,
        # price_quantiles_by_flag_sketch, media_channel_stats,
        # embedding_pca_top, bpe_learn_merges, compression_ratio
        # -> driver rows-only check + pytest property tests
    }
