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


_load_all()
