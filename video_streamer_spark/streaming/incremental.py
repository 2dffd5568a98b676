"""Incremental materialized rollup maintenance.

The pattern a 100 TB event warehouse uses to keep an aggregate table
fresh without recomputing it: each micro-batch contributes a PARTIAL
aggregate row per key to a journal, and readers combine the journal on
read (or a compaction folds it periodically). Two properties make it
safe at scale:

- **Replay idempotence.** Structured Streaming's foreachBatch may replay
  an epoch after a failure. Additive MERGE into the rollup would then
  double-count; journaling partials keyed by ``batch-{epoch_id}`` with
  ``mode("overwrite")`` makes a replay rewrite the same rows instead
  (the same per-epoch discipline as ``pipeline.run_foreach_batch_sink``
  and the reference's end-of-run flush, gst-detection-tf.py:339-344).
- **Partial-aggregability.** Journal rows are (n_events, sum_micros)
  in exact BIGINT — combinable in any order/grouping, so the read-side
  combine is a plain codegen hash agg and a compaction is the identical
  query writing its output back. This is the same shape Spark's own
  map-side partial aggregation uses, persisted across time instead of
  across tasks.

The journal grows by |keys touched| per batch, not |events|; the
read-side combine shuffles journal rows only. At 1000 executors the
journal is partition-pruned by day like any fact table.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_streamer_spark.catalog import table
from video_streamer_spark.functions.parity import round2

_seq = itertools.count()


def _work_dir(spark: SparkSession, sf_dir: str) -> str:
    # per-application + per-invocation path: concurrent sessions (or
    # re-runs within one session) never share a mutable directory
    # (r5 ADVICE discipline, corpus.py index paths)
    tag = os.path.basename(os.path.normpath(sf_dir))
    app = spark.sparkContext.applicationId
    return f"/tmp/vss-incr/{app}-{tag}-{next(_seq)}"


def write_partial_batch(batch_df: DataFrame, epoch_id: int, journal: str) -> None:
    """One micro-batch's contribution: a partial rollup per
    (day, event_type), journaled under its epoch id.

    The epoch dir is STAGED (written to a dot-prefixed temp the
    ``batch-*`` reader glob never matches) and renamed into place, so a
    concurrent ``combine_rollup`` sees each epoch either completely or
    not at all — never a half-written parquet directory. Replay of an
    epoch re-stages and swaps the same rows (idempotent); a crash
    between the remove and the rename loses only that epoch dir, which
    the checkpoint replays on restart — exactly the failure the journal
    design exists to absorb."""
    import shutil

    micros = F.floor(F.col("value").cast("double") * 1000000.0).cast("bigint")
    partial = batch_df.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        "event_type",
    ).agg(
        F.count("*").cast("bigint").alias("n_partial"),
        F.sum(micros).cast("bigint").alias("micros_partial"),
    )
    staged = f"{journal}/.staging-batch-{epoch_id}"
    final = f"{journal}/batch-{epoch_id}"
    partial.write.mode("overwrite").parquet(staged)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(staged, final)


def combine_rollup(spark: SparkSession, journal: str) -> DataFrame:
    """Read-side combine of the partial journal: exact BIGINT sums, then
    the presentation round (parity rules 1/2/4)."""
    parts = spark.read.parquet(f"{journal}/batch-*")
    return (
        parts.groupBy("day", "event_type")
        .agg(
            F.sum("n_partial").cast("bigint").alias("n_events"),
            F.sum("micros_partial").cast("bigint").alias("sum_micros"),
        )
        .select(
            "day",
            "event_type",
            "n_events",
            round2(F.col("sum_micros").cast("double") / 1000000.0).alias(
                "sum_value"
            ),
        )
    )


def compact_journal(spark: SparkSession, journal: str) -> dict:
    """Fold all journal epochs into one: read every ``batch-*`` partial,
    combine per key (partials are order/grouping-invariant BIGINT sums,
    so the fold IS the same aggregation), and swap the folded journal in
    atomically with the ``compact_parquet_dir`` two-rename + self-heal
    discipline (maintenance.py:33). ``combine_rollup`` results are
    identical before and after — compaction only bounds journal growth
    (|keys| rows instead of |keys touched| × |epochs|)."""
    folded = (
        spark.read.parquet(f"{journal}/batch-*")
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_partial").cast("bigint").alias("n_partial"),
            F.sum("micros_partial").cast("bigint").alias("micros_partial"),
        )
    )
    tmp = journal.rstrip("/") + ".compact-tmp"
    old = journal.rstrip("/") + ".compact-old"
    import shutil

    if os.path.exists(old):  # self-heal a crash between the two renames
        if not os.path.exists(journal):
            os.rename(old, journal)
        else:
            shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    n_epochs = len(
        [d for d in os.listdir(journal) if d.startswith("batch-")]
    )
    folded.write.mode("overwrite").parquet(f"{tmp}/batch-compacted")
    os.rename(journal, old)
    os.rename(tmp, journal)
    shutil.rmtree(old)
    return {"epochs_folded": n_epochs}


def incremental_rollup(
    spark: SparkSession,
    sf_dir: str,
    n_splits: int = 8,
    timeout_sec: int = 300,
) -> DataFrame:
    """Maintain a (day, event_type) rollup incrementally over a replayed
    event stream, then return the combined rollup.

    The events table is re-laid-out as ``n_splits`` files and streamed
    with ``maxFilesPerTrigger=1``, so the rollup is genuinely built from
    ``n_splits`` separate micro-batch contributions; the result is
    invariant to how events landed in batches — the equivalence the
    journal design guarantees and the oracle checks.
    """
    work = _work_dir(spark, sf_dir)
    src = f"{work}/src"
    journal = f"{work}/journal"
    events = table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    )
    events.repartition(n_splits).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, epoch: write_partial_batch(df, epoch, journal)
        )
        .option("checkpointLocation", f"{work}/checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return combine_rollup(spark, journal)
