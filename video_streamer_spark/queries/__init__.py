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


# The round-1 driver hash-checked the FIRST 50 registered queries and never
# reached the rest (CORRECTNESS_r01.json: 50 of 64 sampled, all misses from
# the tail modules). Surface the queries with no driver-green row yet —
# plus the ones newly promoted to value oracles — at the head of the dict
# so the next sample covers them; everything else keeps registration order.
_SAMPLE_FIRST = [
    "x25_left_outer_customer_orders",
    "x26_full_outer_nation_counts",
    "x27_cross_join_grid",
    "x28_asof_purchase_click",
    "x29_setops_all_multiplicity",
    "x30_pivot_status_by_year",
    "x23_array_functions",
    "x24_approx_distinct",
    "x33_grouped_minmax_scale",
    "x34_grouped_median_udaf",
    "x35_null_semantics",
    "x36_correlated_subquery",
    "x39_regex_functions",
    "x40_range_frame_trailing_sum",
    "x07_ann_lsh_topk",
    "x32_ivf_topk",
    "x43_decode_infer_replay",
    "x44_annotate_render",
    "x45_dedup_components",
    "x46_hash_sample",
    "x47_stratified_language_cap",
    "x48_sliding_window_agg",
    "x49_stat_aggregates",
    "x50_arrays_zip_positions",
    "x51_curation_pipeline",
    "x52_approx_percentile_contract",
    "x53_hll_sketch_rollup",
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
