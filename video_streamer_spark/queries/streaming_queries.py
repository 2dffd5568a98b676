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


# x99: STREAM-STREAM JOIN — the one Structured Streaming join shape not
# yet in the suite (stream-static is; this is two UNBOUNDED sides):
# clicks ⋈ purchases per user within a 30-minute window. Both sides
# carry watermarks and the join condition carries the time bound, so
# Spark can evict click state once no qualifying purchase can still
# arrive — the property that makes stream-stream joins viable at
# 100 TB/day (state is a rolling window, not the full history). The
# sink holds the joined PAIRS (append mode — the only mode stream-
# stream inner joins support); the per-user count runs batch-side on
# the sink. Oracle: the identical join as batch SQL over events.
_X99_ORACLE = """
    WITH c AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
    SELECT c.user_id,
      CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM c JOIN p ON c.user_id = p.user_id
      AND p.ts >= c.ts
      AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
    GROUP BY c.user_id ORDER BY c.user_id
"""


@query("x99_stream_stream_join", oracle=_X99_ORACLE)
def x99_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    clicks = (
        sp.events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        sp.events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (
            F.unix_micros("p_ts")
            <= F.unix_micros("c_ts") + F.lit(1_800_000_000)
        ),
    ).select("c_user", "c_id", "p_id")
    name = _drain(joined, "x99_sink", "append")
    return spark.sql(
        f"SELECT c_user AS user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs "
        f"FROM {name} GROUP BY c_user ORDER BY user_id"
    )


# x196: INCREMENTAL MATERIALIZED ROLLUP — the (day, event_type) rollup
# maintained from micro-batch partial-aggregate journal entries
# (streaming/incremental.py), then combined on read. The oracle is the
# plain batch GROUP BY: the maintained table must be indistinguishable
# from a full recompute no matter how events were split into batches —
# the materialized-view-maintenance contract. Exact BIGINT micros in
# the journal (order/batching-invariant), round2 DOUBLE presentation
# (parity rules 1/2/4).
_X196_ORACLE = """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(ROUND(CAST((CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
        / 1000000.0) AS DECIMAL(38,9)), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
"""


@query("x196_incremental_rollup", oracle=_X196_ORACLE)
def x196_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_streamer_spark.streaming.incremental import incremental_rollup

    return incremental_rollup(spark, sf_dir)


# x249: NESTED COLUMNS THROUGH THE STREAMING CHANGE FEED (the cdf half
# of r13 VERDICT item 2, r14): a versioned table whose payload is the
# embeddings array<float> takes one merge commit mixing inserts,
# reversed-array updates, and deletes, and the table_cdf stream (four-
# type feed) is drained and aggregated per change type with an
# element-level checksum. This pins the r14 nested cdf machinery under
# driver evidence — ArrowDtype cell transport (null elements never
# NaN-conflated), recursive converters, and the canonical-form change
# comparison (a reversed array must classify as update; rows the
# changeset rewrote identically must emit NOTHING). The oracle
# restates the feed closed-form from the raw embeddings, so a missed
# pre-image, a no-op update leaking through, or an element lost in the
# Arrow boundary lands as a checksum mismatch. Scale: the feed reads
# only rewritten buckets (manifest pruning); the checksum is a codegen
# fold, no UDF.
_X249_ORACLE = """
    WITH v1 AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0),
    ins AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 1),
    del AS (SELECT vec_id, embedding FROM v1 WHERE vec_id % 15 = 10),
    upd AS (
      SELECT vec_id, embedding FROM v1
      WHERE vec_id % 10 = 0 AND vec_id % 15 <> 10),
    feed AS (
      SELECT 'insert' AS change_type, embedding FROM ins
      UNION ALL SELECT 'delete', embedding FROM del
      UNION ALL SELECT 'update_preimage', embedding FROM upd
      UNION ALL SELECT 'update_postimage', list_reverse(embedding)
        FROM upd)
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(SUM(CAST(list_sum(list_transform(embedding,
        (e, i) -> COALESCE(
          CAST(floor(CAST(e AS DOUBLE) * 100.0) AS BIGINT), 0)
                  * CAST(i AS BIGINT)))
        AS BIGINT)) AS BIGINT) AS checksum
    FROM feed GROUP BY change_type
"""


@query("x249_cdf_stream_nested", oracle=_X249_ORACLE)
def x249_cdf_stream_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from video_streamer_spark.catalog import table
    from video_streamer_spark.operators.table_format import (
        create_table,
        merge_table,
    )
    from video_streamer_spark.queries.extended2 import _fresh_run_dir
    from video_streamer_spark.sources.cdf_source import register_cdf_source

    path = _fresh_run_dir(spark, sf_dir, "vss-nestcdf")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    create_table(
        emb.where("vec_id % 5 = 0"), path, ["vec_id"], n_buckets=4
    )  # v1
    changes = (
        emb.where("vec_id % 5 IN (0, 1)")
        .where("vec_id % 5 = 1 OR vec_id % 10 = 0 OR vec_id % 15 = 10")
        .withColumn(
            "__op",
            F.when(F.col("vec_id") % 15 == 10, F.lit("D"))
            .when(F.col("vec_id") % 5 == 1, F.lit("I"))
            .otherwise(F.lit("U")),
        )
        .withColumn(
            "embedding",
            F.when(
                (F.col("vec_id") % 10 == 0) & (F.col("vec_id") % 15 != 10),
                F.reverse("embedding"),
            ).otherwise(F.col("embedding")),
        )
    )
    merge_table(spark, path, changes)  # v2
    register_cdf_source(spark)
    feed = (
        spark.readStream.format("table_cdf")
        .option("path", path)
        .option("startingVersion", 1)
        .option("preimages", "true")
        .load()
    )
    name = _drain(feed, "x249_sink", "append")
    # POSITION-WEIGHTED element checksum (1-based, mirroring DuckDB's
    # indexed lambda): the update rewrites arrays by REVERSAL, which
    # preserves an unweighted element sum — weighting by position is
    # what makes a pre/post image swap, or an element landing at the
    # wrong index across the Arrow boundary, a value mismatch. NULL
    # elements fold as 0 on BOTH sides (coalesce here, COALESCE in the
    # oracle — DuckDB's list_sum skips nulls while Spark's aggregate
    # would propagate them; review r14)
    cs = F.aggregate(
        F.transform(
            "embedding",
            lambda x, i: F.coalesce(
                F.floor(x.cast("double") * 100.0).cast("bigint"),
                F.lit(0).cast("bigint"),
            )
            * (i + F.lit(1)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        spark.table(name)
        .select(F.col("_change_type").alias("change_type"), cs.alias("cs"))
        .groupBy("change_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("cs").cast("bigint").alias("checksum"),
        )
    )
