"""Custom stateful streaming operator: applyInPandasWithState sessionizer.

The built-in ``session_window`` covers gap-based sessions; this operator
exists for session logic the built-in can't express — per-key arbitrary
state carried across micro-batches (the reference's only stateful code
is its unbounded in-memory query buffer, gst-detection-tf.py:322; here
state is per-key, watermark-bounded, and spill-safe in the state store).

Semantics: events grouped by ``user_id``; a session closes when no event
arrives within ``gap_seconds`` of its last event (event-time, enforced
via GroupStateTimeout.EventTimeTimeout against the watermark). Emitted
rows are CLOSED sessions only: (user_id, session_start, session_end,
n_events).

Scale: state is one small dict per active user key, partitioned by the
groupBy hash — adding executors shards the keyspace. The watermark both
bounds state size (idle keys time out and flush) and defines correctness
under late data.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from video_streamer_spark.functions.shipping import ship_module

ship_module(sys.modules[__name__])

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def _to_us(ts: Any) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[tuple[int, int, int, int]] = []

    if state.hasTimedOut:
        # watermark passed last_event + gap with no new data: flush
        if state.exists:
            start_us, end_us, n = state.get
            closed.append((user_id, start_us, end_us, n))
            state.remove()
    else:
        cur = list(state.get) if state.exists else None
        # micro-batches deliver unordered rows: sort within the batch;
        # cross-batch order is guaranteed by the watermark (late rows
        # beyond it were dropped before reaching us)
        ts_all = sorted(
            _to_us(t) for pdf in pdfs for t in pdf["ts"] if not pd.isna(t)
        )
        for t in ts_all:
            if cur is None:
                cur = [t, t, 0]
            elif t - cur[1] > gap_us:
                closed.append((user_id, cur[0], cur[1], cur[2]))
                cur = [t, t, 0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
        if cur is not None:
            state.update(tuple(cur))
            # wake up when the watermark passes the gap after the last
            # event, closing the session if nothing newer arrived
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)

    if closed:
        out = pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out


def stateful_sessions(
    events: DataFrame,
    gap_seconds: int = 30 * 60,
    watermark: str = "1 hour",
) -> DataFrame:
    """Closed sessions per user via arbitrary per-key state.

    ``events`` must be a streaming DataFrame with (user_id, ts) columns.
    Output appears once a session is provably closed (watermark has
    passed its end + gap), so results are final — no complete-mode
    re-emission.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_us)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
