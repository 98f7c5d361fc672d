"""Named query registry — the engine's declared operator surface.

Every operator from SURVEY.md §2 lands here as a named query: a function
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string the driver runs side-by-side for the correctness gate.

Import order populates the registry; the explicit reorder below controls
the order ``queries()`` exposes. The correctness driver processes
queries in registration order and records only the FIRST 50, so the
registry is curated to hold every oracle-carrying query inside that
window: the similarity/streaming family (unchecked in round 2 purely by
position) leads, and the handful of genuinely rows-only queries
(impl-specific RNG/sketches/codecs — pytest-asserted instead) sit last.
"""

from .registry import QUERIES, oracle_sql, queries, register  # noqa: F401

# Registration side effects — each module adds its queries on import.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import reference_model  # noqa: E402,F401
from . import reference_ext  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import streaming_batch  # noqa: E402,F401

#: Queries the driver window must cover first. Round-7 rotation
#: (VERDICT r6 "Next round #1"): the first 12 of the 37 round-6-born
#: operators that sat in ``_OVERFLOW`` (never driver-seen) move INTO
#: the window; 12 r6-driver-green stable queries rotate out, each
#: family keeping at least one in-window witness (ANN: minhash_lsh +
#: hyperplane_buckets + embedding_neardup + calibration; span-dedup:
#: span_dedup_trim; retrieval: hybrid_rrf_fusion [runs BM25 inside];
#: dedup: exact/fingerprint/ref_dedup + dedup_rate_by_source; quality:
#: quality_scores + quality_percentile_by_lang; sampling:
#: token_budget_per_source; as-of joins: asof_latest + asof_tolerance;
#: streaming: tumbling + dedup + static-enrich + availablenow +
#: stream-stream inner + left-outer; ref family: extract_functions +
#: sink_roundtrip + ingest/etherscan/content_id/bundle_hash/error_routing).
_PRIORITY = [
    "llm_minhash_lsh_pairs",
    "llm_ngram_jaccard_topk",
    "llm_neardup_clusters",
    "llm_ann_hyperplane_buckets",
    "stream_tumbling_window_counts",
    "stream_dedup_first_event",
    "stream_static_enrich_segments",
    "stream_true_tumbling_availablenow",
    "ref_extract_functions",
    "ref_sink_roundtrip",
    "llm_embedding_neardup_clusters",
    "stream_stream_join_attribution",
    "agg_percentile_prices",
    "llm_knn_join_topk",
    "llm_decontaminate_overlap",
    "llm_sequence_packing",
    "llm_token_budget_per_source",
    "llm_chunk_documents",
    "cdc_merge_latest_snapshot",
    "llm_span_dedup_trim",
    "llm_curation_pipeline",
    "llm_hybrid_rrf_fusion",
    # --- rotated IN for round 7 (round-6-born, never driver-seen) ---
    "llm_token_entropy",
    "llm_unigram_surprisal",
    "llm_quality_percentile_by_lang",
    "agg_histogram_prices",
    "funnel_conversion_events",
    "join_asof_tolerance",
    "stream_stream_left_outer",
    "window_rolling_zscore_events",
    "llm_bigram_lm_top",
    "llm_dedup_rate_by_source",
    "llm_heavy_hitters",
    "llm_minhash_estimate_calibration",
]

#: Oracle-CARRYING queries deliberately registered just past the
#: driver's 50-query window (it is full): their oracles still run in
#: pytest (tests/test_oracle_parity.py sweeps every oracle at sf0.01),
#: they just lose the per-round driver row. Grow this list consciously
#: — whatever sits here trades driver-visible correctness evidence for
#: a slot. Round-6 occupants are the rotation's other half: queries
#: with driver-green rows in r5 (and mostly r3/r4 too) whose plan code
#: has not changed since — each family keeps at least one in-window
#: witness (see the _PRIORITY comment).
#: ROUND-8 ROTATION PLAN (for the next session): two blocks below have
#: never earned a driver CORRECTNESS row — the round-7-born operators
#: (agg_order_count_distribution … window_ewma_daily_revenue) and the
#: remaining round-6-born ones (llm_triangle_counts … llm_ivf_topk).
#: The window holds 50; rotate the next ~12 into _PRIORITY — start
#: with the ROUND-6-BORN block (it has waited longest:
#: llm_triangle_counts, llm_pmi_collocations, agg_retention_cohorts,
#: llm_kmeans_lloyd, agg_cumulative_users, llm_kmeans_silhouette,
#: agg_profit_by_nation_type, agg_key_skew_report,
#: window_streaks_gaps_islands, agg_pivot_daily_event_matrix,
#: agg_metric_correlation_daily, llm_chunk_documents_udtf) — and move
#: an equal number of r7-driver-green stable queries (the 12 "rotated
#: IN for round 7" names above, plus un-curated core queries) into the
#: rotated-out block below, keeping ≥1 in-window witness per family
#: exactly as the r6/r7 rotations did. Verify with
#: tests/test_registry_window.py (add a _ROTATED_IN_R8 contract).
_OVERFLOW = [
    # round-7 NEW operators (born after the window was finalized;
    # rotate into the window in round 8+)
    "agg_order_count_distribution",
    "agg_small_quantity_revenue",
    "agg_important_parts",
    "agg_parts_supplier_counts",
    "window_ntile_quartiles",
    "agg_mad_outliers",
    "scalar_gapfill_daily_revenue",
    "agg_ohlc_daily_value",
    "llm_edit_distance_pairs",
    "llm_ngram_novelty",
    "llm_semdedup_representatives",
    "llm_mode_token_by_lang",
    "llm_readability_scores",
    "llm_zipf_slope_report",
    "llm_bpe_train_merges",
    "llm_bpe_segment_vocab",
    "llm_langid_confusion_matrix",
    "window_rolling_7day_revenue",
    "llm_pagerank_candidates",
    "stream_hourly_ohlc",
    "agg_idle_rich_customers",
    "join_excess_quantity_suppliers",
    "llm_bpe_encode_stats",
    "agg_event_type_lift",
    "llm_ivfpq_topk",
    "window_ewma_daily_revenue",
    "llm_curation_pipeline_v2",
    "window_seasonal_naive_mape",
    "agg_weekday_seasonality",
    "llm_curriculum_order",
    "llm_incremental_neardup",
    "llm_simhash_hamming_pairs",
    "agg_rolling_wau",
    "llm_winnow_collisions",
    "llm_kmeans_purity",
    "agg_nation_revenue_yoy",
    # round-6 NEW operators still awaiting their window slot (rotate
    # into the window in round 8)
    "llm_triangle_counts",
    "llm_pmi_collocations",
    "agg_retention_cohorts",
    "llm_kmeans_lloyd",
    "agg_cumulative_users",
    "llm_kmeans_silhouette",
    "agg_profit_by_nation_type",
    "agg_key_skew_report",
    "window_streaks_gaps_islands",
    "agg_pivot_daily_event_matrix",
    "agg_metric_correlation_daily",
    "llm_chunk_documents_udtf",
    "cdc_point_in_time_join",
    "agg_data_quality_report",
    "llm_ann_recall_report",
    "llm_bm25_batch_topk",
    "llm_decontaminate_multi",
    "llm_pps_sample_by_tokens",
    "cdc_scd2_history",
    "llm_pq_topk",
    "llm_containment_pairs",
    "llm_interleave_by_source",
    "llm_cluster_best_representative",
    "llm_corpus_length_report",
    # round-6 oracle graduations (left the rows-only tail this round)
    "llm_ivf_topk",
    # rotated OUT for round 7 (r6 driver-green, code untouched)
    "llm_ann_multitable_pairs",
    "llm_duplicate_spans",
    "llm_bm25_topk",
    "llm_stratified_sample",
    "llm_incremental_dedup",
    "llm_gopher_quality_filter",
    "llm_training_order",
    "ref_sources_explode",
    "ref_abi_signature_render",
    "llm_simhash_documents",
    "llm_langid_stopword",
    "join_range_event_pairs",
    # rotated OUT for round 6 (r5 driver-green, code untouched)
    "llm_ann_bucketed_cosine_pairs",
    "llm_cosine_topk_bruteforce",
    "llm_tfidf_top_terms",
    "stream_sliding_window_avg",
    "stream_session_windows",
    "scalar_map_explode_props",
    "llm_repetition_signals",
    "llm_mix_sample_by_lang",
    "llm_vocab_coverage",
    "llm_pii_redaction",
    "filter_point_lookup",
    "filter_type_predicate",
    "filter_suffix_predicate",
    "join_semi_anti_customers",
    "agg_distinct_counts",
    "agg_grouping_shapes",
    "window_top3_orders_per_customer",
    "window_running_revenue_by_date",
    "window_lag_lead_first_last",
    "window_rank_variants",
    "topk_orders_by_price",
    "set_ops_customer_keys",
    "scalar_date_parts_orders",
    "scalar_math_lineitem",
]

#: Genuinely rows-only queries (no cross-engine oracle can exist:
#: engine-internal RNG streams, HLL sketch internals, spark.ml hash
#: seeds, binary codec stubs) — registered last, beyond the driver
#: window; their assertions live in pytest.
_TAIL = [
    "agg_approx_distinct_users",
    "llm_approx_top_terms_sketch",
    "agg_percentile_prices_approx",
    "sample_orders_seeded",
    "llm_ml_minhash_join",
    "llm_multimodal_image_features",
    "llm_multimodal_audio_features",
    "llm_multimodal_resize",
    "llm_multimodal_frame_sampling",
    "stream_stateful_running_totals",
]

# A typo'd name here would silently no-op the reorder; fail at import
# instead so a renamed query breaks loudly, not by drifting out of the
# driver's correctness window.
_unknown = [n for n in _PRIORITY + _OVERFLOW + _TAIL if n not in QUERIES]
if _unknown:
    raise RuntimeError(
        f"plans registry reorder names unknown queries: {_unknown}"
    )

_curated = set(_PRIORITY) | set(_OVERFLOW) | set(_TAIL)
_order = (
    _PRIORITY
    + [n for n in QUERIES if n not in _curated]
    + _OVERFLOW
    + _TAIL
)
_resorted = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_resorted)
