"""Streaming queries in the correctness gate: each drains a Structured
Streaming pipeline with Trigger.AvailableNow and returns the sink as a
DataFrame, so the driver hash-compares the STREAMING result against the
batch SQL oracle — the streaming↔batch equivalence contract (SURVEY.md
§5.2) enforced per round.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

from video_streamer_spark.queries import ORACLES, query
from video_streamer_spark.streaming import pipeline as sp

_sink_seq = itertools.count()


def _drain(stream_df: DataFrame, prefix: str, output_mode: str) -> str:
    name = f"{prefix}_{next(_sink_seq)}"
    return sp.run_available_now(stream_df, name, output_mode)


# Same oracle as q14: the streaming tumbling aggregation must be
# indistinguishable from the batch query to any observer.
@query("x14_stream_tumbling", oracle=ORACLES["q14_tumbling_hourly"])
def x14_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sp.tumbling_stream(sp.events_stream(spark, sf_dir))
    name = _drain(stream, "x14_sink", "complete")
    return spark.sql(
        f"SELECT hour_start, event_type, n_events, sum_value FROM {name}"
    )


# Session windows vs the LAG-based batch sessionization: session ids are
# engine-internal, but the multiset of (user_id, session size) must match.
_X15_ORACLE = """
    WITH lagged AS (
      SELECT user_id, ts, event_id,
        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN prev_ts IS NULL OR (epoch(ts) - epoch(prev_ts)) > 1800
             THEN 1 ELSE 0 END AS is_new
      FROM lagged),
    sessions AS (
      SELECT user_id,
        SUM(is_new) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    ORDER BY user_id, n_events
"""


@query("x15_stream_sessions", oracle=_X15_ORACLE)
def x15_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sp.session_stream(sp.events_stream(spark, sf_dir))
    name = _drain(stream, "x15_sink", "complete")
    return spark.sql(
        f"SELECT user_id, n_events FROM {name} ORDER BY user_id, n_events"
    )


# x94: STREAMING DEDUPLICATION with state eviction —
# dropDuplicatesWithinWatermark, the streaming twin of q16/x01 exact
# dedup: the input stream is deliberately DOUBLED (the same events
# directory unioned with itself, the at-least-once delivery every real
# ingest pipeline must survive), the operator keeps the first arrival
# per event_id, and the watermark bounds how long each key lives in
# state — the property that makes streaming dedup viable at 100 TB
# (state is a sliding window of keys, not the full history; an exact
# global dedup would grow state forever). The sink holds deduped ROWS
# (append mode); the count-per-type aggregation runs batch-side on the
# sink, so the hash comparison pins exactly the operator's output.
# Oracle: the batch relation itself — dedup of (events ∪ events) must
# be indistinguishable from events.
_X94_ORACLE = """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
"""


@query("x94_windowed_dedup_stream", oracle=_X94_ORACLE)
def x94_windowed_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = sp.events_stream(spark, sf_dir)
    doubled = src.unionByName(sp.events_stream(spark, sf_dir))
    deduped = (
        doubled.select("event_id", "event_type", "ts")
        # delay far beyond the dataset's time span: every duplicate is
        # still in state when its twin arrives, so the dedup is exact
        # (a production pipeline sets this to its real delivery skew)
        .withWatermark("ts", "3650 days")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = _drain(deduped, "x94_sink", "append")
    return spark.sql(
        f"SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events "
        f"FROM {name} GROUP BY event_type ORDER BY event_type"
    )
