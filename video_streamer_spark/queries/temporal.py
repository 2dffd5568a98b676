"""Temporal queries Q14 (tumbling window) and Q15 (sessionization).

These are the batch forms; streaming/pipeline.py re-runs the SAME logic
through Structured Streaming (Trigger.AvailableNow) and the test suite
asserts byte-identical results — the streaming↔batch equivalence oracle
from SURVEY.md §5.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from video_streamer_spark.catalog import table
from video_streamer_spark.functions.parity import (
    dec,
    round2,
    sql_round2,
    ts_str,
)
from video_streamer_spark.queries import query

SESSION_GAP_SECONDS = 30 * 60


# --------------------------------------------------------------------------
# Q14: tumbling hourly window per event type. In batch this is just a
# date_trunc groupBy; the streaming twin uses window(ts, '1 hour') — both
# produce one row per (hour, type). Sums accumulate BIGINT MICROS
# (floor(x*1e6) on the identical IEEE double in both engines — the q07/x61
# parity recipe) because Spark's decimal hash-agg was measurably above the
# scan floor, and the grouping key stays a TIMESTAMP until after the agg so
# only ~|groups| rows pay string formatting, not every input row.
@query(
    "q14_tumbling_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
      event_type, COUNT(*) AS n_events,
      CAST(ROUND(CAST((CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
        / 1000000.0) AS DECIMAL(38,9)), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), 2
    """,
)
def q14_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # string expressions (r14): same plan, one gateway round-trip per
    # expression instead of one per Column object (D = DOUBLE literal)
    return (
        e.groupBy(F.expr("date_trunc('hour', ts) AS h"), "event_type")
        .agg(
            F.expr("count(*) AS n_events"),
            F.expr(
                sql_round2(
                    "CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) *"
                    " 1000000.0D) AS BIGINT)) AS DOUBLE) / 1000000.0D"
                )
                + " AS sum_value"
            ),
        )
        .selectExpr(
            "date_format(h, 'yyyy-MM-dd HH:mm:ss') AS hour_start",
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def tumbling_agg(events: DataFrame) -> DataFrame:
    """Streaming-compatible form of Q14: window() instead of date_trunc.

    Shared by the batch query above (equivalent result) and the streaming
    pipeline; kept separate so the streaming path can add a watermark.
    """
    micros = F.floor(F.col("value").cast("double") * 1000000.0).cast("bigint")
    return events.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        round2(F.sum(micros).cast("double") / 1000000.0).alias("sum_value"),
    ).select(
        ts_str(F.col("w.start")).alias("hour_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


# --------------------------------------------------------------------------
# Q15: sessionization via analytic windows — a new session starts when the
# gap to the previous event of the same user exceeds 30 minutes. The
# timestamp delta is computed on fractional epoch seconds (exact to the
# microsecond in double) so Spark and DuckDB agree on boundary gaps.
@query(
    "q15_sessionization",
    oracle=f"""
    WITH lagged AS (
      SELECT user_id, ts, event_id,
        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN prev_ts IS NULL
                  OR (epoch(ts) - epoch(prev_ts)) > {SESSION_GAP_SECONDS}
             THEN 1 ELSE 0 END AS is_new
      FROM lagged),
    sessions AS (
      SELECT user_id,
        CAST(SUM(is_new) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q15_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # Gap checks run on BIGINT microseconds (unix_micros — legal for both
    # LTZ and NTZ inputs via the timestamp cast) rather than double epoch
    # seconds: same instants, but the window sort key and the lag
    # subtraction stay in codegen'd long arithmetic (~25% faster at
    # sf0.1). Exactness is unchanged — epoch micros < 2^53, so DuckDB's
    # double epoch() compares identically.
    # string OVER clauses (r14): identical Window plan, ~250 fewer
    # gateway round-trips per construction
    lag_tm = (
        "lag(tm) OVER (PARTITION BY user_id ORDER BY tm, event_id)"
    )
    base = e.selectExpr(
        "user_id",
        "event_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS tm",
    )
    flagged = base.selectExpr(
        "user_id",
        "tm",
        "event_id",
        f"CASE WHEN ({lag_tm} IS NULL) OR ((tm - {lag_tm}) > "
        f"{SESSION_GAP_SECONDS * 1_000_000}) THEN 1 ELSE 0 END AS is_new",
    )
    sessions = flagged.selectExpr(
        "user_id",
        "CAST(SUM(is_new) OVER (PARTITION BY user_id "
        "ORDER BY tm, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS BIGINT) AS session_id",
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.expr("count(*) AS n_events")
    )


# --------------------------------------------------------------------------
# x38: hypertable-style multi-granularity rollup — minute/hour/day
# aggregates in ONE pass: explode the granularity list per row, then a
# single groupBy(granularity, bucket, type) shuffle. The serial
# alternative (three separate aggregations) scans and shuffles the fact
# table three times for identical output.
@query(
    "x38_multi_granularity_rollup",
    oracle="""
    WITH g AS (SELECT unnest(['minute', 'hour', 'day']) AS gran)
    SELECT g.gran,
      strftime(date_trunc(CASE g.gran WHEN 'minute' THEN 'minute'
                          WHEN 'hour' THEN 'hour' ELSE 'day' END, e.ts),
               '%Y-%m-%d %H:%M:%S') AS bucket_start,
      e.event_type,
      COUNT(*) AS n_events,
      CAST(ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,9)), 2)
           AS DOUBLE) AS sum_value
    FROM events e CROSS JOIN g
    WHERE e.user_id < 20
    GROUP BY 1, 2, 3
    ORDER BY gran, bucket_start, event_type
    """,
)
def x38_multi_granularity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    exploded = e.select(
        "event_type",
        "value",
        "ts",
        F.explode(F.array(F.lit("minute"), F.lit("hour"), F.lit("day"))).alias(
            "gran"
        ),
    )
    bucket = F.when(
        F.col("gran") == "minute", F.date_trunc("minute", F.col("ts"))
    ).when(
        F.col("gran") == "hour", F.date_trunc("hour", F.col("ts"))
    ).otherwise(F.date_trunc("day", F.col("ts")))
    return (
        exploded.groupBy(
            "gran", ts_str(bucket).alias("bucket_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            round2(F.sum(dec("value"))).alias("sum_value"),
        )
        .orderBy("gran", "bucket_start", "event_type")
    )


# --------------------------------------------------------------------------
# x48: SLIDING window (1 hour size, 30 min slide) — the overlapping-window
# row of the capability matrix (tumbling and session are covered by
# q14/q15). Each event belongs to exactly size/slide = 2 windows; Spark's
# window() assigns epoch-aligned starts, which the oracle reproduces by
# emitting both floor-aligned starts per event.
def sliding_agg(events: DataFrame) -> DataFrame:
    """Shared by the batch query and the streaming twin (the streaming
    path adds a watermark before calling this)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            round2(F.sum(dec("value"))).alias("sum_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "x48_sliding_window_agg",
    oracle="""
    WITH wins AS (
      SELECT event_type, value,
        unnest([
          make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800)
                         * 1000000),
          make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 - 1800)
                         * 1000000)
        ]) AS ws
      FROM events)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
      COUNT(*) AS n_events,
      CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,9)), 2)
           AS DOUBLE) AS sum_value
    FROM wins GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def x48_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return sliding_agg(e).orderBy("window_start", "event_type")


# --------------------------------------------------------------------------
# x58: event-sequence FUNNEL — users who did view → click → purchase in
# temporal order (MATCH_RECOGNIZE-lite). Three stacked running-max
# windows over the SAME (user, ts, event_id) ordering — Catalyst plans
# them behind a single shuffle — turn sequence detection into flags:
# view_seen, click-after-view, purchase-after-that; then one group-by
# per user and a global roll-up. The self-join formulation (e1⋈e2⋈e3)
# would be quadratic per hot user; this is O(n log n) per user and
# shuffle-bounded by the events table — the form that survives 100 TB.
@query(
    "x58_event_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_id, event_type,
        MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          OVER w AS view_seen
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    s2 AS (
      SELECT user_id, ts, event_id, event_type, view_seen,
        MAX(CASE WHEN event_type = 'click' AND view_seen = 1
                 THEN 1 ELSE 0 END) OVER w AS click_after
      FROM s1
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    s3 AS (
      SELECT user_id, view_seen, click_after,
        MAX(CASE WHEN event_type = 'purchase' AND click_after = 1
                 THEN 1 ELSE 0 END) OVER w AS purchase_after
      FROM s2
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    per_user AS (
      SELECT user_id, MAX(view_seen) AS v, MAX(click_after) AS c,
        MAX(purchase_after) AS p
      FROM s3 GROUP BY user_id)
    SELECT CAST(SUM(v) AS BIGINT) AS n_view,
      CAST(SUM(c) AS BIGINT) AS n_view_click,
      CAST(SUM(p) AS BIGINT) AS n_view_click_purchase
    FROM per_user
    """,
)
def x58_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s1 = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).over(w).alias("view_seen"),
    )
    s2 = s1.withColumn(
        "click_after",
        F.max(
            F.when(
                (F.col("event_type") == "click") & (F.col("view_seen") == 1), 1
            ).otherwise(0)
        ).over(w),
    )
    s3 = s2.withColumn(
        "purchase_after",
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("click_after") == 1),
                1,
            ).otherwise(0)
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("view_seen").alias("v"),
        F.max("click_after").alias("c"),
        F.max("purchase_after").alias("p"),
    )
    return per_user.agg(
        F.sum("v").cast("bigint").alias("n_view"),
        F.sum("c").cast("bigint").alias("n_view_click"),
        F.sum("p").cast("bigint").alias("n_view_click_purchase"),
    )


# --------------------------------------------------------------------------
# x69: COHORT RETENTION — users grouped by first-activity week, counted
# by distinct activity in each subsequent week offset (the standard
# product-analytics retention matrix). Per-user first-event reduction
# (one shuffle with map-side partial MIN), join back on user_id, then
# the (cohort, offset) distinct-count aggregation. Week offsets are
# day-difference // 7 against the user's own first day — no engine
# week-truncation semantics in the hash path; the cohort label uses
# date_trunc('week') (ISO Monday in both engines) only as a display key.
@query(
    "x69_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS d0 FROM events
      GROUP BY user_id),
    acts AS (
      SELECT e.user_id,
        strftime(date_trunc('week', f.d0), '%Y-%m-%d') AS cohort_week,
        CAST(date_diff('day', f.d0, CAST(e.ts AS DATE)) // 7 AS INT)
          AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT cohort_week, week_offset,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM acts GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def x69_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("d0")
    )
    acts = e.join(firsts, "user_id").select(
        "user_id",
        F.date_format(F.date_trunc("week", F.col("d0")), "yyyy-MM-dd").alias(
            "cohort_week"
        ),
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.col("d0")) / F.lit(7)
        ).cast("int").alias("week_offset"),
    )
    return (
        acts.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# x70: TIME-DECAYED engagement score — sum(value · e^(-Δt/τ)) per user
# with τ = 7 days against the corpus max timestamp (recency-weighted
# activity, the scoring behind "trending" rankings and freshness-aware
# sampling). Δt is computed on exact unix_micros integers; each decayed
# term is quantized to DECIMAL(18,6) before the cross-row sum (x62's
# discipline), so the aggregate is order-independent and engine-stable.
# The 1-row max-ts reduction broadcasts; one user-keyed shuffle total.
@query(
    "x70_decayed_engagement",
    oracle="""
    WITH ref AS (SELECT MAX(epoch_us(ts)) AS t_ref FROM events),
    terms AS (
      SELECT e.user_id,
        CAST(e.value * exp(-(CAST(ref.t_ref - epoch_us(e.ts) AS DOUBLE)
                             / 86400000000.0) / 7.0)
             AS DECIMAL(18,6)) AS term
      FROM events e CROSS JOIN ref)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(ROUND(CAST(SUM(term) AS DECIMAL(38,9)), 2) AS DOUBLE)
        AS decayed_score
    FROM terms GROUP BY user_id ORDER BY user_id
    """,
)
def x70_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ref = e.agg(F.expr("max(unix_micros(ts))").alias("t_ref"))
    terms = e.crossJoin(F.broadcast(ref)).select(
        "user_id",
        (
            F.col("value")
            * F.exp(
                -(
                    (F.col("t_ref") - F.expr("unix_micros(ts)")).cast("double")
                    / F.lit(86400000000.0)
                )
                / F.lit(7.0)
            )
        )
        .cast("decimal(18,6)")
        .alias("term"),
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            round2(F.sum("term")).alias("decayed_score"),
        )
        .orderBy("user_id")
    )
