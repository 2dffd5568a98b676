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
