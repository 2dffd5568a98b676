"""Interval self-pair counting with automatic skew routing (round-12
VERDICT item 5): pairs of events by the same user within a time
interval, the q20 family's semantic, served by whichever physical plan
the data's skew actually calls for.

Two equivalent plans (bit-identical output, equivalence pinned by
tests/test_intervals.py and the q20 driver oracle):

- **window** (the default winner, q20's plan since round 12): one
  scan, ONE Exchange (hash on user) + WindowExec with a value-based
  range frame — pairs per anchor = COUNT(*) over ``RANGE BETWEEN
  CURRENT ROW AND <interval> FOLLOWING`` − 1. A user's whole history
  sorts inside one task; the sort is spillable and the frame walk is
  linear (two pointers), so a hot user costs its event count in ONE
  task's wall clock — fine until a single user is so large that one
  task's sort dominates the stage.
- **join** (the skew-bounded fallback, q20's r6–r11 plan): explode
  each anchor to its (user, interval-bucket) and (user, bucket+1)
  keys, equi-join the probe side on (user, bucket) with the range as
  a residual. The largest join-key group is events-per-bucket, not
  events-per-user — a 400× shrink on a 30 s-cadence hot user — at the
  cost of two scans and a wider shuffle.

``mode="auto"`` routes between them with one cheap probe: a
deterministic 1% sample's max per-user count, extrapolated by the
sampling fraction. Above ``hot_user_threshold`` (default 4M events —
the point where one task's spillable sort stops being a reasonable
stage tail at ~100 bytes/row) the join variant wins; below it the
window plan's single exchange wins. The probe is one bounded job over
the sample (map-side partial agg, user-cardinality-sized exchange);
heavy hitters of threshold size are statistically unmissable at 1%.
Callers on a measured path (the bench's q20) pin ``mode="window"``
so their plan never depends on a sampling job.

Reference contrast: the reference has no join of any kind
(gst-detection-tf.py's only lookup is the label dict, line 396); this
family exists for the relational surface VDMS would otherwise serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interval_us(interval_sec: int) -> int:
    return int(interval_sec) * 1_000_000


def _pairable(
    events: DataFrame, user_col: str, ts_col: str, id_col: str
) -> DataFrame:
    """Rows that can participate in a pair at all: non-null user, time,
    AND id — applied IDENTICALLY by both plans. Under the theta-join
    contract (`u1 = u2 AND ts2 BETWEEN … AND id1 <> id2`) a null in
    any of the three excludes the row from every pair (SQL equality
    and <> never hold on NULL), but the two physical plans would treat
    them differently without this filter: the window plan groups NULL
    users into one partition and its COUNT(*) frame ignores ids
    entirely, while the join plan's conditions drop them — so
    mode="auto"'s routing would silently change results on null rows
    (review r13). Filtering is the oracle-exact semantics for both."""
    return events.where(
        f"(`{user_col}` IS NOT NULL) AND (`{ts_col}` IS NOT NULL) "
        f"AND (`{id_col}` IS NOT NULL)"
    )


def window_pair_counts(
    events: DataFrame,
    interval_sec: int = 300,
    user_col: str = "user_id",
    ts_col: str = "ts",
    group_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """The one-exchange window plan (see module docstring). Tied
    timestamps count each other symmetrically (value-based RANGE
    frame) and the −1 removes exactly the self-pair, so the result is
    bit-identical to the theta-join formulation."""
    events = _pairable(events, user_col, ts_col, id_col)
    # string OVER clause (r14): identical one-exchange Window plan,
    # ~180 fewer gateway round-trips per construction
    return (
        events.selectExpr(
            "*",
            f"count(*) OVER (PARTITION BY `{user_col}` "
            f"ORDER BY unix_micros(CAST(`{ts_col}` AS TIMESTAMP)) "
            f"RANGE BETWEEN CURRENT ROW AND {_interval_us(interval_sec)} "
            "FOLLOWING) - 1 AS __n_following",
        )
        .groupBy(group_col)
        .agg(F.expr("CAST(sum(__n_following) AS BIGINT) AS n_pairs"))
        .where("n_pairs > 0")
    )


def join_pair_counts(
    events: DataFrame,
    interval_sec: int = 300,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    group_col: str = "event_type",
) -> DataFrame:
    """The skew-bounded (user, interval-bucket) join plan: anchors
    explode to their bucket and the next (a pair within the interval
    spans at most one bucket boundary), probes carry their own bucket,
    so the equi-key caps every join group at events-per-bucket. Each
    probe matches exactly one of an anchor's two exploded rows (its
    own bucket), so no pair double-counts."""
    us = _interval_us(interval_sec)
    events = _pairable(events, user_col, ts_col, id_col)
    e1 = events.select(
        F.col(id_col).alias("__id1"),
        F.col(user_col).alias("__u1"),
        F.col(ts_col).cast("timestamp").alias("__ts1"),
        F.col(group_col).alias("__g1"),
    ).withColumn(
        "__jb",
        F.explode(
            F.array(
                F.expr(f"unix_micros(__ts1) div {us}"),
                F.expr(f"unix_micros(__ts1) div {us}") + 1,
            )
        ),
    )
    e2 = events.select(
        F.col(id_col).alias("__id2"),
        F.col(user_col).alias("__u2"),
        F.col(ts_col).cast("timestamp").alias("__ts2"),
    ).withColumn("__jb", F.expr(f"unix_micros(__ts2) div {us}"))
    pairs = e1.join(
        e2,
        (F.col("__u1") == F.col("__u2"))
        & (e1["__jb"] == e2["__jb"])
        & (F.col("__ts2") >= F.col("__ts1"))
        & (
            F.unix_micros(F.col("__ts2"))
            <= F.unix_micros(F.col("__ts1")) + us
        )
        & (F.col("__id1") != F.col("__id2")),
    )
    return (
        pairs.groupBy(F.col("__g1").alias(group_col))
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .where(F.col("n_pairs") > 0)
    )


def estimate_max_user_count(
    events: DataFrame,
    user_col: str = "user_id",
    probe_fraction: float = 0.01,
    seed: int = 7,
) -> float:
    """Deterministic sampled estimate of the largest per-user event
    count: max per-user count in a ``probe_fraction`` sample, divided
    by the fraction. Cheap (one bounded job over the sample) and
    reliable exactly where it matters — a user large enough to trip
    the router is statistically unmissable at 1% — while a small
    table's estimate may be coarse, which is harmless: small tables
    are safe in either plan."""
    row = (
        # same null filter as the pairable population (_pairable):
        # NULL users never pair, so counting them as one hot "user"
        # would mis-route auto to the join plan (ADVICE r13 —
        # output-identical either way, cost-only)
        events.where(F.col(user_col).isNotNull())
        .sample(fraction=probe_fraction, seed=seed)
        .groupBy(user_col)
        .count()
        .agg(F.max("count").alias("m"))
        .first()
    )
    m = row["m"] if row is not None else None
    return (m or 0) / probe_fraction


def interval_pair_counts(
    events: DataFrame,
    interval_sec: int = 300,
    mode: str = "auto",
    hot_user_threshold: int = 4_000_000,
    probe_fraction: float = 0.01,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    group_col: str = "event_type",
) -> DataFrame:
    """Route the q20-family semantic to the right physical plan.

    ``mode``: ``"window"`` / ``"join"`` pin a plan; ``"auto"`` probes
    the skew (``estimate_max_user_count``) and takes the join variant
    when the estimated hottest user exceeds ``hot_user_threshold``
    (the one-task sort-budget dial, documented in the module
    docstring), else the window plan."""
    if mode not in ("auto", "window", "join"):
        raise ValueError(
            f"mode {mode!r} not in ('auto', 'window', 'join')"
        )
    if mode == "auto":
        est = estimate_max_user_count(
            events, user_col=user_col, probe_fraction=probe_fraction
        )
        mode = "join" if est > hot_user_threshold else "window"
    if mode == "join":
        return join_pair_counts(
            events,
            interval_sec,
            user_col=user_col,
            ts_col=ts_col,
            id_col=id_col,
            group_col=group_col,
        )
    return window_pair_counts(
        events,
        interval_sec,
        user_col=user_col,
        ts_col=ts_col,
        group_col=group_col,
        id_col=id_col,
    )
