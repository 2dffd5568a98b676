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


# The driver hash-checks the FIRST 50 registered queries per round. Round-3
# ordering rule (VERDICT r2, item 1): lead with queries whose IMPLEMENTATION
# (or a shared operator) was rebuilt AFTER their last driver-green row, so
# every green row describes the code as currently written —
#   x05: r1 row tested the deleted collect-based impl; now blocked cogroup
#   q19a/q19b, x12, x13, x31, x02, x03: share detections/inference/
#     multimodal/dedup code that moved in round 2 after their r1 rows
# — then round-3-new queries, then the r2-green tail as filler.
_SAMPLE_FIRST = [
    # rebuilt since last green driver row
    "x05_embedding_near_pairs",
    "q19a_detections_per_label",
    "q19b_detections_per_frame",
    "x12_payload_stats",
    "x13_inference_replay",
    "x31_sampled_resize_stats",
    "x02_dedup_minhash_pairs",
    "x03_dedup_simhash_pairs",
    # round-3 new queries (appended below as they land)
    "x55_decode_bmp_infer",
    "x56_merge_upsert_result",
    "x57_quantile_bucket_join",
    "x58_sessionize_events",
    "x59_topk_per_group",
    "x60_weighted_sample",
    # r2-green rows whose code also saw round-2/3 touches (cheap re-evidence)
    "x43_decode_infer_replay",
    "x44_annotate_render",
    "x45_dedup_components",
    "x51_curation_pipeline",
    "x24_approx_distinct",
    "x52_approx_percentile_contract",
    "x53_hll_sketch_rollup",
    "x07_ann_lsh_topk",
    "x32_ivf_topk",
    "x46_hash_sample",
    "x47_stratified_language_cap",
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
