"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference pipeline replay,
Q19a) at sf0.001; ``queries()``/``oracle_sql()`` expose the full declared
suite (SURVEY.md §2.3 Q1–Q20) plus the LLM-data-pipeline extension suite,
each implemented in video_streamer_spark.queries.*.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from video_streamer_spark.queries import ORACLES, QUERIES

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's detection pipeline replay
    (filter → scale → broadcast label join → per-label counts)."""
    return QUERIES["q19a_detections_per_label"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
