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


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
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


# The driver hash-checks the FIRST 50 registered queries per round. Round-4
# ordering rule (same principle as r3: every green row should describe the
# code as currently written, and no query's evidence should go stale):
#   1. q15/q20 errored in r3 (TIMESTAMP_NTZ testdata regeneration) and are
#      fixed this round — they need fresh green rows most.
#   2. x05's plan construction changed this round (n_rows hint).
#   3. round-4-new queries (x55+) as they land.
#   4. the 26 queries r3's sample did not cover (last green row r1/r2).
# Everything else keeps its r3 green row and fills the tail.
_SAMPLE_FIRST = [
    # fixed this round after r3 errors
    "q15_sessionization",
    "q20_theta_self_join",
    # plan construction changed this round
    "x05_embedding_near_pairs",
    # round-4 new queries (appended as they land; missing names are skipped)
    "x55_decode_bmp_infer",
    "x56_merge_upsert_result",
    "x57_quantile_bucket_join",
    "x58_event_funnel",
    "x59_topk_per_group",
    "x60_weighted_sample",
    "x61_embedding_centroids",
    "x62_unigram_logprob",
    "x63_chunk_documents",
    "x64_unpivot_part_metrics",
    "x65_fuzzy_dedup_levenshtein",
    "x66_profile_orders",
    "x67_count_min_sketch_topk",
    "x68_pack_chunks",
    "x69_cohort_retention",
    "x70_decayed_engagement",
    "x71_minhash_jaccard_estimate",
    "x72_train_val_test_split",
    "x73_decontaminate_phrases",
    "x74_decode_wav_stats",
    "x75_pagerank_dedup_graph",
    "x76_percent_rank_cume_dist",
    "x77_array_set_algebra",
    "x78_curation_pipeline_v2",
    "x79_hierarchy_depth_pointer_jump",
    "x80_filtered_aggregates",
    "x81_explode_outer_semantics",
    "x82_try_functions",
    "x83_string_agg_nations",
    "x84_equiwidth_histogram",
    # not covered by r3's 50-slot sample — refresh their evidence
    "x41_bpe_token_counts",
    "x42_rolling_hash_fingerprint",
    "x14_stream_tumbling",
    "x15_stream_sessions",
    "x16_cube_year_priority",
    "x17_grouping_sets",
    "x18_window_family",
    "x19_string_functions",
    "x20_date_functions",
    "x21_json_struct",
    "x22_union_by_name",
    "x23_array_functions",
    "x33_grouped_minmax_scale",
    "x34_grouped_median_udaf",
    "x35_null_semantics",
    "x36_correlated_subquery",
    "x39_regex_functions",
    "x40_range_frame_trailing_sum",
    "x49_stat_aggregates",
    "x50_arrays_zip_positions",
    "x25_left_outer_customer_orders",
    "x26_full_outer_nation_counts",
    "x27_cross_join_grid",
    "x28_asof_purchase_click",
    "x29_setops_all_multiplicity",
    "x30_pivot_status_by_year",
]


def _reorder() -> None:
    head = {n: QUERIES[n] for n in _SAMPLE_FIRST if n in QUERIES}
    tail = {n: fn for n, fn in QUERIES.items() if n not in head}
    QUERIES.clear()
    QUERIES.update(head)
    QUERIES.update(tail)


_load_all()
_reorder()
