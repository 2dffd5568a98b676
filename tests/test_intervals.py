"""Interval pair counting + auto skew routing (operators/intervals.py,
round-12 VERDICT item 5): the window plan and the bucketed join plan
must be bit-identical on every input, and mode="auto" must pick the
join variant exactly when a sampled probe finds a hot user past the
threshold — the property that keeps one user from pinning a single
task's sort at 100 TB. q20 (window) and x243 (join) pin both plans'
values against the DuckDB theta-join oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_streamer_spark.operators.intervals import (
    estimate_max_user_count,
    interval_pair_counts,
    join_pair_counts,
    window_pair_counts,
)


def _events(spark, hot_n: int):
    rows = []
    for i in range(hot_n):  # hot user: one event every 30 s
        rows.append((i, "hot", float(30 * i), "view"))
    for i in range(300):  # background users, ragged cadence
        rows.append((10_000 + i, f"u{i % 23}", float(97 * i), "click"))
    return spark.createDataFrame(
        rows, "event_id long, user_id string, t double, event_type string"
    ).select(
        "event_id",
        "user_id",
        F.timestamp_seconds("t").alias("ts"),
        "event_type",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_window_and_join_plans_are_bit_identical(spark):
    e = _events(spark, hot_n=4000)
    assert _rows(window_pair_counts(e)) == _rows(join_pair_counts(e))
    # ties: duplicate timestamps must count symmetrically in both
    dup = _events(spark, hot_n=0).unionByName(
        spark.createDataFrame(
            [(1, "x", 100.0, "a"), (2, "x", 100.0, "a"), (3, "x", 100.0, "b")],
            "event_id long, user_id string, t double, event_type string",
        ).select(
            "event_id", "user_id",
            F.timestamp_seconds("t").alias("ts"), "event_type",
        )
    )
    assert _rows(window_pair_counts(dup)) == _rows(join_pair_counts(dup))


def test_auto_routes_hot_user_to_join_and_matches_window(spark):
    """The done-criterion: a synthetic hot-user table routes to the
    join variant AND the routed output equals the window plan's."""
    e = _events(spark, hot_n=4000).cache()
    try:
        est = estimate_max_user_count(e, probe_fraction=0.05)
        assert est > 1000, "probe must surface the hot user"
        routed = interval_pair_counts(
            e, mode="auto", hot_user_threshold=1000, probe_fraction=0.05
        )
        # the routed plan is the JOIN shape: two scans joined (the
        # window plan has a Window node and no join)
        plan = routed._jdf.queryExecution().executedPlan().toString()
        assert "Join" in plan and "Window" not in plan
        assert _rows(routed) == _rows(window_pair_counts(e))
    finally:
        e.unpersist()


def test_auto_routes_cold_table_to_window(spark):
    e = _events(spark, hot_n=0)
    routed = interval_pair_counts(
        e, mode="auto", hot_user_threshold=1_000_000, probe_fraction=0.5
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert _rows(routed) == _rows(join_pair_counts(e))


def test_bad_mode_refused(spark):
    with pytest.raises(ValueError, match="mode"):
        interval_pair_counts(_events(spark, 0), mode="nope")
