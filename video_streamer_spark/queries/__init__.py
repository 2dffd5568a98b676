"""Query registry: every declared query (SURVEY.md §2.3) plus the
LLM-data-pipeline extension queries, each as a (spark, sf_dir) -> DataFrame
callable with (where SQL-expressible) a DuckDB oracle string.

Import side effect: importing this package populates QUERIES/ORACLES.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _elide_presentation_sort(df: DataFrame) -> DataFrame:
    """Engine rule at the query boundary: declared queries return SETS.

    The driver's correctness gate and every differential test sort rows
    before comparing, so a top-level global Sort on a query's result is
    dead work — and in Spark it is expensive dead work: a total sort
    plans as ``Exchange rangepartitioning`` whose boundary-SAMPLING job
    re-executes the entire upstream plan (measured ~2x on scan-shaped
    queries; PLANS.md round-5 sort study). This mirrors Catalyst's
    ``EliminateSorts`` (which removes sorts whose ordering no operator
    consumes), extended with the registry's declared unordered-result
    contract. Only a LITERAL root Sort is elided — a Sort feeding a
    Limit sits under the Limit node and is untouched, so top-k queries
    keep their TakeOrderedAndProject plans.
    """
    jdf = df._jdf
    plan = jdf.queryExecution().logical()
    if plan.getClass().getSimpleName() != "Sort":
        return df
    if not getattr(plan, "global")():  # sortWithinPartitions: not ours
        return df
    spark = df.sparkSession
    child = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, plan.children().head()
    )
    return DataFrame(child, spark)


def _strip_final_order_by(sql: str) -> str:
    """The oracle-side twin of `_elide_presentation_sort`: drop a final
    ORDER BY clause so DuckDB runs the same unordered query Spark does.
    Conservative by construction — the clause is kept whenever it is
    semantic or ambiguous: a LIMIT rides it (top-k), or the last ORDER
    BY sits inside parentheses (window spec / subquery, detected by
    unbalanced parens in the tail)."""
    upper = sql.upper()
    idx = upper.rfind("ORDER BY")
    if idx == -1:
        return sql
    tail = sql[idx:]
    if "LIMIT" in tail.upper():
        return sql
    if tail.count("(") != tail.count(")"):
        return sql
    return sql[:idx].rstrip() + "\n    "


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and its DuckDB oracle SQL.

    Registration applies the unordered-result contract to BOTH sides:
    a top-level presentation Sort is elided from the Spark plan and the
    matching final ORDER BY from the oracle SQL (see
    `_elide_presentation_sort` / `_strip_final_order_by`). Ordered
    top-k (ORDER BY + LIMIT) passes through untouched on both sides.
    """

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _elide_presentation_sort(fn(spark, sf_dir))

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = _strip_final_order_by(oracle)
        return fn

    return deco


def _load_all() -> None:
    # late imports so registration happens exactly once, in a stable order
    from video_streamer_spark.queries import relational  # noqa: F401
    from video_streamer_spark.queries import temporal  # noqa: F401
    from video_streamer_spark.queries import curation  # noqa: F401
    from video_streamer_spark.queries import pipeline  # noqa: F401
    from video_streamer_spark.queries import streaming_queries  # noqa: F401
    from video_streamer_spark.queries import coverage  # noqa: F401
    from video_streamer_spark.queries import joins  # noqa: F401
    from video_streamer_spark.queries import analytics  # noqa: F401
    from video_streamer_spark.queries import advanced  # noqa: F401
    from video_streamer_spark.queries import corpus  # noqa: F401


# The driver hash-checks the FIRST 50 registered queries per round. Round-5
# ordering rule (invariant since r3: every green row should describe the
# code as currently written, and no query's evidence should go stale):
#   1. Queries whose CODE changed this round (q07 bigint-micros window,
#      encode-path byte-slicing behind x43/x55/x74, hash_split rounding
#      behind x72, CDC compaction behind x56) need fresh rows most.
#   2. Round-5-new queries (x85+) as they land (missing names skipped).
#   3. The events family whose last green row predates the r4
#      TIMESTAMP_NTZ catalog rewrite (VERDICT r4 top item): x28, q12,
#      q13, q14, x38, x48, x24, x52, x53.
#   4. Everything else without an r4 row, oldest evidence first.
_SAMPLE_FIRST = [
    # 1. code changed this round
    "q07_window_running_total",
    "q15_sessionization",
    "x43_decode_infer_replay",
    "x55_decode_bmp_infer",
    "x74_decode_wav_stats",
    "x72_train_val_test_split",
    "x56_merge_upsert_result",
    # 2. events family whose last green row predates the r4
    #    TIMESTAMP_NTZ catalog rewrite (VERDICT r4 top item) — kept
    #    inside the 50-query driver sample ahead of the newest x-names,
    #    which carry fresh in-repo differential evidence instead
    "x28_asof_purchase_click",
    "q12_json_extract_sum",
    "q13_distinct_users_per_type",
    "q14_tumbling_hourly",
    "x38_multi_granularity_rollup",
    "x48_sliding_window_agg",
    "x24_approx_distinct",
    "x52_approx_percentile_contract",
    "x53_hll_sketch_rollup",
    # 3. round-5 new queries (appended as they land; the driver's
    #    50-row sample reaches through x119 — the tail past it gets its
    #    first driver row next round)
    "x85_decode_png_infer",
    "x86_bloom_filter_join",
    "x87_group_quantiles_exact",
    "x88_skyline_pareto",
    "x89_triangle_count",
    "x90_gaps_islands",
    "x91_interval_overlap_join",
    "x92_collocation_pmi",
    "x93_jaccard_prefix_join",
    "x94_windowed_dedup_stream",
    "x95_embedding_dispersion",
    "x96_equidepth_histogram",
    "x97_chi_square_independence",
    "x98_snapshot_diff",
    "x99_stream_stream_join",
    "x100_zorder_clustering",
    "x101_variant_json",
    "x102_lateral_topk",
    "x103_python_udtf_chunks",
    "x104_decode_jpeg_infer",
    "x105_decode_video_stats",
    "x106_recursive_chain_rollup",
    "x107_regression_by_nation",
    "x108_bm25_ranking",
    "x109_tfidf_profile_drift",
    "x110_markov_transitions",
    "x111_basket_lift",
    "x112_kmeans_assign",
    "x113_outlier_mad",
    "x114_bfs_hops",
    "x115_event_trigrams",
    "x116_scripted_threshold_search",
    "x117_data_quality_audit",
    "x118_linear_interpolation",
    "x119_decode_mp4_stats",
    "x120_journey_pattern_count",
    "x121_benford_digit_audit",
    "x122_group_by_all",
    "x123_null_safe_join",
    "x124_audio_window_features",
    "x125_session_window_native",
    "x126_spatial_nearest_warehouse",
    "x127_map_functions",
    "x128_union_by_name",
    "x129_decode_quarantine_report",
    "x130_time_range_frame",
    "x131_array_custom_sort",
    "x132_pii_scrub",
    "x133_rfm_segmentation",
    "x134_conversion_latency",
    "x135_salted_aggregation",
    "x136_join_cardinality_estimate",
    "x137_cumulative_distinct_users",
    "x138_weighted_median",
    "x139_topn_plus_other",
    "x140_source_novelty",
    "x141_share_of_parent",
    "x142_ngram_decontamination",
    "x143_repetition_filter",
    "x144_mixture_rebalance",
    "x145_semantic_dedup",
    "x146_canonical_selection",
    "x147_curation_pipeline_v3",
    "x148_source_overlap",
    "x149_hard_negatives",
    "x150_bpe_pair_counts",
    "x151_pq_encode",
    "x152_pq_adc_topk",
    "x153_bpe_train_merges",
    "x154_bpe_segment_stats",
    "x155_ivf_index_search",
    "x156_coverage_selection",
    "x157_record_linkage",
    "x158_mmr_rerank",
    "x159_ivfpq_index_search",
    "x160_ann_recall_eval",
    "x161_psi_quality_drift",
    "x162_containment_dedup",
    "x163_contrastive_triplets",
    "x164_index_upsert_search",
    "x165_rake_keywords",
    "x166_winnowing_fingerprints",
    "x167_zipf_fit",
    "x168_leakage_safe_split",
    "x169_dedup_impact_report",
    "x170_bigram_lm_score",
    "x171_doc_stitching",
    "x172_boilerplate_ngrams",
    "x173_temperature_mixture",
    "x174_k_anonymity",
    "x175_oov_ratio",
    "x176_generalization_step",
    "x177_embedding_dim_health",
    "x178_corpus_health_dashboard",
    "x179_dim_correlation_topk",
    "x180_class_separation",
    "x181_hybrid_rrf",
    "x182_lsh_recall_eval",
    "x183_similarity_profile",
    "x184_scene_changes",
    "x185_track_segments",
    "x186_event_peaks",
    "x187_anomalous_users",
    "x188_vocab_growth",
    "x189_sequence_gap_audit",
    "x190_rag_context_assembly",
    "x191_filter_overlap_matrix",
    "x192_composite_score_topk",
    "x193_source_pareto_segments",
    "x194_ivf_cell_balance",
    # 4. everything else, oldest evidence first
    "x40_range_frame_trailing_sum",
    "x49_stat_aggregates",
    "x50_arrays_zip_positions",
    "x25_left_outer_customer_orders",
    "x26_full_outer_nation_counts",
    "x27_cross_join_grid",
    "x29_setops_all_multiplicity",
    "x30_pivot_status_by_year",
    "q01_scan_filter",
    "q02_agg_pricing_summary",
    "q03_multijoin_region_counts",
    "q04_topk_customers",
    "q05a_semi_customers_with_orders",
    "q05b_anti_customers_without_orders",
    "q06_window_rank_top3",
    "q08_rollup_region_nation",
    "q09_set_ops",
    "q10_scalar_functions",
    "q11_orders_per_year_priority",
    "q16_exact_dedup_stats",
    "q17_top_tokens",
    "q18_cosine_topk",
    "x01_dedup_keep_first",
    "x02_dedup_minhash_pairs",
    "x45_dedup_components",
    "x03_dedup_simhash_pairs",
    "x04_dedup_ngram_jaccard",
    "x06_ann_topk_multi",
    "x07_ann_lsh_topk",
    "x08_token_stats",
    "x09_lang_id",
    "x10_quality_scores",
    "x11_fingerprint_dupes",
    "x12_payload_stats",
    "x31_sampled_resize_stats",
    "x32_ivf_topk",
    "x44_annotate_render",
    "x46_hash_sample",
    "x47_stratified_language_cap",
    "x51_curation_pipeline",
    "x37_tfidf",
    "q19a_detections_per_label",
    "x13_inference_replay",
    "q19b_detections_per_frame",
    "x54_date_spine_moving_avg",
]


def _reorder() -> None:
    head = {n: QUERIES[n] for n in _SAMPLE_FIRST if n in QUERIES}
    tail = {n: fn for n, fn in QUERIES.items() if n not in head}
    QUERIES.clear()
    QUERIES.update(head)
    QUERIES.update(tail)


_load_all()
_reorder()
