"""Custom stateful streaming on the MODERN state API:
``transformWithStateInPandas`` (Spark 4.x), the successor of
``applyInPandasWithState`` used by streaming/stateful.py.

Same operator semantics as the v1 sessionizer — per-user gap sessions,
event-time, closed sessions emitted, idle sessions flushed by timer when
the watermark passes last_event + gap — expressed through the new
StatefulProcessor surface: typed ValueState instead of a raw tuple, and
EXPLICIT per-key timers (registerTimer / handleExpiredTimer) instead of
GroupStateTimeout. The two implementations are asserted equivalent by
the same batch-sandwich test, which is the point: state logic should be
portable across Spark's state API generations.

ENVIRONMENT GATE: transformWithState's Python<->JVM state protocol is
protobuf-based; this container ships no google.protobuf (and package
installs are out of scope), so the sandwich test import-skips here and
runs wherever protobuf exists. streaming/stateful.py (v1 API) is the
in-container verified sessionizer.

Scale shape is unchanged: state is one small record per active user,
sharded by the groupBy hash; watermark bounds state lifetime.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from video_streamer_spark.functions.shipping import ship_module
from video_streamer_spark.streaming.stateful import (
    SESSION_SCHEMA,
    _STATE_SCHEMA,
)

ship_module(sys.modules[__name__])


def _emit(user_id: int, start_us: int, end_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
        }
    )


class SessionProcessor(StatefulProcessor):
    def __init__(self, gap_seconds: int):
        self._gap_us = gap_seconds * 1_000_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._session = handle.getValueState("session", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        ts_us: list[int] = []
        for pdf in rows:
            ts_us.extend(int(v) for v in pdf["ts"].astype("int64") // 1000)
        ts_us.sort()
        if self._session.exists():
            start_us, end_us, n = self._session.get()
        else:
            start_us = end_us = n = None
        for t in ts_us:
            if start_us is None:
                start_us, end_us, n = t, t, 1
            elif t - end_us <= self._gap_us:
                end_us = max(end_us, t)
                n += 1
            else:
                yield _emit(user_id, start_us, end_us, n)
                start_us, end_us, n = t, t, 1
        if start_us is not None:
            self._session.update((start_us, end_us, n))
            # (re-)arm the idle-flush timer at session_end + gap; stale
            # timers from earlier batches fire harmlessly (guarded below)
            self._handle.registerTimer(end_us // 1000 + self._gap_us // 1000)

    def handleExpiredTimer(
        self, key, timer_values, expired_timer_info
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if self._session.exists():
            start_us, end_us, n = self._session.get()
            wm_ms = timer_values.getCurrentWatermarkInMs()
            if wm_ms >= end_us // 1000 + self._gap_us // 1000:
                self._session.clear()
                yield _emit(user_id, start_us, end_us, n)

    def close(self) -> None:
        pass


def stateful_sessions_v2(events: DataFrame, gap_seconds: int) -> DataFrame:
    """v2 sessionizer: same contract as stateful.stateful_sessions."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
