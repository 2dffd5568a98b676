"""MERGE / upsert: the ACID-table-format role (Delta/Iceberg MERGE INTO)
re-expressed over plain DataFrames and parquet.

The reference's only sink is a bulk end-of-run flush into a queryable
store (gst-detection-tf.py:339-344 — VDMS AddBoundingBox batching); a
production 100 TB curation pipeline instead maintains a keyed table that
each batch of changes UPSERTS into. No table-format package ships in this
container, so the capability lands in two honest layers:

1. ``apply_changeset`` — the LOGICAL merge: given a base relation and a
   keyed changeset carrying an op column ('U' upsert / 'I' insert /
   'D' delete), produce the post-merge relation. This is exactly the
   join Delta's MERGE plans (changes ⟕ base on key): one shuffle on the
   key, no driver materialization, fully expressible to Catalyst.

2. ``merge_parquet_table`` — the PHYSICAL stand-in: the table lives as
   parquet hash-partitioned into N fixed buckets on the key
   (``pb=<bucket>`` directories). A merge reads ONLY the buckets the
   changeset touches (partition pruning on a pushed-down IN filter),
   merges them, and dynamically overwrites just those partitions —
   the same touched-file-rewrite shape as Delta MERGE, with the bucket
   as the rewrite granularity. Idempotent: re-applying the same
   changeset is a no-op by construction (upserts replace, deletes stay
   deleted). At 100 TB the bucket count scales with the table so a
   point-update rewrites ~1/N of the data, never the whole table.

``run_merge_upsert_sink`` drives layer 2 from Structured Streaming via
foreachBatch — the streaming CDC-apply pattern.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from video_streamer_spark.streaming.drain import drain_or_raise

OP_COL = "__op"
BUCKET_COL = "pb"


def apply_changeset(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """Post-merge relation: surviving changes ∪ untouched base rows.

    ``changes`` carries ``op_col`` ∈ {'U','I','D'} plus the full row
    payload for U/I. Semantics match MERGE INTO ... WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT / WHEN MATCHED DELETE with whole-row update:
    every base row whose key appears in the changeset is replaced (U) or
    removed (D); I rows append. One key must appear at most once in the
    changeset (the CDC-compacted form; enforce upstream with a
    last-write-wins window if the feed has per-key history).

    Plan shape: one shuffle of the (small) changeset against base on the
    key for the anti join — broadcastable when the changeset is small —
    plus a union. No base-side duplication, no driver round-trip.
    """
    surviving = changes.where(F.col(op_col) != F.lit("D")).drop(op_col)
    untouched = base.join(
        changes.select(*key_cols), on=key_cols, how="left_anti"
    )
    return surviving.unionByName(untouched)


def _bucketed(df: DataFrame, key_cols: list[str], n_buckets: int) -> DataFrame:
    """Route every row to its key-hash bucket — and REFUSE null key
    components at this chokepoint (every table write, changeset and
    point-lookup passes through here).

    The key is the row identity (PRIMARY KEY semantics): the format's
    identity joins (``apply_changeset``'s anti join, the point-lookup
    semi join, the change-feed full outer, tombstone anti joins) use
    SQL equality, under which NULL never matches — so a null-keyed row
    would be un-updatable, un-deletable, and would duplicate on every
    upsert of "the same" key. xxhash64 additionally SKIPS null inputs,
    so (NULL, x) and a different-arity key could even share routing.
    Raising inside the projection costs no extra pass (it rides the
    write/lookup job itself), and a mid-write raise publishes nothing:
    the manifest link is the commit point."""
    null_key = None
    for k in key_cols:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)
    return df.withColumn(
        BUCKET_COL,
        F.when(
            null_key,
            F.raise_error(
                F.lit(
                    "NULL key component: key columns are the row "
                    "identity (PRIMARY KEY semantics) and must be "
                    "non-null — filter or coalesce upstream"
                )
            ).cast("int"),
        )
        .otherwise(
            F.pmod(
                F.xxhash64(*[F.col(k) for k in key_cols]),
                F.lit(n_buckets),
            )
        )
        .cast("int"),
    )


def init_merge_table(
    df: DataFrame, path: str, key_cols: list[str], n_buckets: int = 16
) -> None:
    """Materialize the initial table state, hash-partitioned on the key
    into ``pb=<bucket>`` directories (the rewrite granularity)."""
    (
        _bucketed(df, key_cols, n_buckets)
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def merge_parquet_table(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key_cols: list[str],
    n_buckets: int = 16,
    op_col: str = OP_COL,
) -> None:
    """MERGE the changeset into the parquet table at ``path``.

    Reads only the hash buckets the changeset touches (the IN filter on
    the partition column prunes at the source listing), applies the
    logical merge, and dynamically overwrites exactly those partitions.
    The touched-bucket list is the one small driver-side value (≤
    n_buckets ints — a plan parameter, like a partition list).

    Crash contract (explicit — this is the one gap vs a real table
    format's manifest commit): the dynamic overwrite commits PER
    PARTITION, so a crash mid-merge can leave some touched ``pb=``
    buckets merged and others at their pre-merge state. Recovery is
    idempotent replay: re-applying the SAME changeset converges every
    bucket to the post-merge state regardless of which subset committed
    (upserts replace by key, deletes anti-join away whether or not the
    key is still present, inserts re-land in their own bucket's
    rewrite). A caller that persists changesets until the merge returns
    therefore gets effective at-least-once → exactly-state semantics;
    tests/test_sources_and_ops.py::test_merge_partial_commit_replay
    simulates a partial commit and replays.
    """
    bucketed_changes = _bucketed(changes, key_cols, n_buckets)
    touched = [
        r[BUCKET_COL]
        for r in bucketed_changes.select(BUCKET_COL).distinct().collect()
    ]
    if not touched:
        return
    base = spark.read.parquet(path).where(F.col(BUCKET_COL).isin(touched))
    merged = apply_changeset(
        base.drop(BUCKET_COL),
        bucketed_changes.drop(BUCKET_COL),
        key_cols,
        op_col=op_col,
    )
    # dynamic overwrite per-write (NOT session-level — see
    # streaming/pipeline.run_bucketed_table_sink for why): only the
    # touched pb partitions are replaced, the rest of the table is
    # untouched on disk
    merged_bucketed = _bucketed(merged, key_cols, n_buckets)
    # dynamic overwrite only rewrites partitions PRESENT in the output:
    # a changeset that deletes EVERY row of a touched bucket produces no
    # rows for it, so its stale directory must be dropped explicitly
    # (found by test_run_merge_upsert_sink_with_seq — a lone key deleted
    # from its own bucket survived the merge). ≤ n_buckets ints collect,
    # evaluated BEFORE the write (the lineage reads the pre-merge base;
    # after the overwrite those files are gone).
    non_empty = {
        r[BUCKET_COL]
        for r in merged_bucketed.select(BUCKET_COL).distinct().collect()
    }
    (
        merged_bucketed
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )
    for b in set(touched) - non_empty:
        bucket_dir = os.path.join(path, f"{BUCKET_COL}={b}")
        if os.path.exists(bucket_dir):
            shutil.rmtree(bucket_dir)


def read_merge_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(BUCKET_COL)


def compact_changeset(
    changes: DataFrame, key_cols: list[str], seq_col: str | None
) -> DataFrame:
    """Per-key last-write-wins compaction of a CDC batch.

    With ``seq_col`` (the feed's monotone sequence — Kafka offset, LSN,
    event ts): keep the row with the highest sequence per key
    (row_number over the key ordered by seq desc — one shuffle on the
    key, same key the merge itself shuffles on). Without one there is NO
    well-defined winner — ``dropDuplicates`` would keep an ARBITRARY row
    — so the caller must guarantee at-most-one op per key per batch;
    that contract is asserted cheaply inside the merge's own pass rather
    than silently picking a row.
    """
    if seq_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        return (
            changes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", seq_col)
        )
    # no sequence: enforce the pre-compacted contract instead of guessing
    dup = (
        changes.groupBy(*key_cols).count().where(F.col("count") > 1).limit(1)
    )
    if dup.take(1):
        raise ValueError(
            "changeset batch carries multiple ops for one key and no "
            "seq_col was given — last-write-wins is undefined; pass "
            "seq_col or pre-compact the feed"
        )
    return changes


def run_merge_upsert_sink(
    stream_df: DataFrame,
    path: str,
    key_cols: list[str],
    n_buckets: int = 16,
    op_col: str = OP_COL,
    seq_col: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming CDC-apply: each micro-batch MERGEs into the keyed table.

    In-batch per-key compaction keeps last-write-wins before the merge
    when ``seq_col`` names the feed's ordering column; without one the
    batch must already be at-most-one-op-per-key (asserted — see
    ``compact_changeset``), because foreachBatch preserves source order
    only per partition and an unordered pick would be nondeterministic.
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        compacted = compact_changeset(batch_df, key_cols, seq_col)
        merge_parquet_table(
            batch_df.sparkSession,
            path,
            compacted,
            key_cols,
            n_buckets=n_buckets,
            op_col=op_col,
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, timeout_sec, "run_merge_upsert_sink")


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    op_col: str = OP_COL,
) -> DataFrame:
    """INVERSE of ``apply_changeset``: the minimal changeset that
    transforms ``old`` into ``new`` — the snapshot-diff every
    incremental-materialization / CDC-backfill pipeline needs when only
    table states (not a change log) exist.

    Classification is one full outer join on the key: key only in new →
    'I'; only in old → 'D'; in both with any payload column differing →
    'U'; identical rows are dropped (minimality). Round-trip law, pinned
    by test: ``apply_changeset(old, diff_snapshots(old, new)) ≡ new``.

    Plan shape: ONE shuffle of each side on the key (the same key a
    downstream merge shuffles on), payload comparison as a codegen'd
    struct equality — no driver involvement, safe at any scale.
    """
    payload_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *key_cols,
        F.struct(*payload_cols).alias("__old_payload"),
    )
    n = new.select(
        *key_cols,
        F.struct(*payload_cols).alias("__new_payload"),
    )
    joined = o.join(n, on=key_cols, how="full_outer")
    op = (
        F.when(F.col("__old_payload").isNull(), F.lit("I"))
        .when(F.col("__new_payload").isNull(), F.lit("D"))
        .when(
            F.col("__new_payload") != F.col("__old_payload"), F.lit("U")
        )
        .otherwise(F.lit(None))
    )
    payload = F.coalesce(F.col("__new_payload"), F.col("__old_payload"))
    return (
        joined.withColumn(op_col, op)
        .where(F.col(op_col).isNotNull())
        .select(
            *key_cols,
            *[payload[c].alias(c) for c in payload_cols],
            op_col,
        )
    )
