"""Snapshot-versioned table format: atomic multi-bucket commits,
time travel, optimistic concurrency, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from video_streamer_spark.catalog import table
from video_streamer_spark.operators.table_format import (
    VersionConflictError,
    create_table,
    current_version,
    history,
    merge_table,
    read_table,
    vacuum,
)


def _orders(spark):
    return table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_create_merge_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    base = _orders(spark).where("o_orderkey % 4 = 0")
    create_table(base, path, ["o_orderkey"], n_buckets=8)
    assert current_version(path) == 1
    assert _rows(read_table(spark, path)) == _rows(base)

    # U doubles some prices, D removes some keys, I adds new keys
    changes = (
        _orders(spark)
        .where("o_orderkey % 4 IN (0, 1)")
        .withColumn(
            "__op",
            F.when(F.col("o_orderkey") % 16 == 0, F.lit("D"))
            .when(F.col("o_orderkey") % 4 == 1, F.lit("I"))
            .otherwise(F.lit("U")),
        )
        .withColumn(
            "o_totalprice",
            F.when(
                (F.col("o_orderkey") % 4 == 0)
                & (F.col("o_orderkey") % 16 != 0),
                F.col("o_totalprice") * 2.0,
            ).otherwise(F.col("o_totalprice")),
        )
    )
    v = merge_table(spark, path, changes)
    assert v == 2
    got = read_table(spark, path)
    want = (
        _orders(spark)
        .where(
            "(o_orderkey % 4 = 0 AND o_orderkey % 16 <> 0)"
            " OR o_orderkey % 4 = 1"
        )
        .withColumn(
            "o_totalprice",
            F.when(
                (F.col("o_orderkey") % 4 == 0)
                & (F.col("o_orderkey") % 16 != 0),
                F.col("o_totalprice") * 2.0,
            ).otherwise(F.col("o_totalprice")),
        )
    )
    assert _rows(got) == _rows(want)
    # time travel: version 1 still reads the original state
    assert _rows(read_table(spark, path, version=1)) == _rows(base)


def test_crash_before_manifest_publishes_nothing(spark, tmp_path, monkeypatch):
    """The commit point is the manifest link: kill the commit after the
    data write but before the link and the table is untouched; the
    replayed merge then commits normally (no orphan-manifest ambiguity,
    the exact recovery hole the _CURRENT-pointer design would have)."""
    import video_streamer_spark.operators.table_format as tf

    path = str(tmp_path / "t")
    base = _orders(spark).where("o_orderkey % 4 = 0")
    create_table(base, path, ["o_orderkey"], n_buckets=4)
    changes = base.limit(50).withColumn("__op", F.lit("D"))

    real = tf._commit_manifest

    def boom(*a, **k):
        raise RuntimeError("injected crash before commit point")

    monkeypatch.setattr(tf, "_commit_manifest", boom)
    with pytest.raises(RuntimeError, match="injected"):
        merge_table(spark, path, changes)
    # nothing committed: same version, same rows
    assert current_version(path) == 1
    assert _rows(read_table(spark, path)) == _rows(base)
    # replay after "restart" commits cleanly
    monkeypatch.setattr(tf, "_commit_manifest", real)
    assert merge_table(spark, path, changes) == 2
    assert read_table(spark, path).count() == base.count() - 50
    # the crashed commit's unreferenced data dir is swept by vacuum
    data = os.path.join(path, "data")
    assert len(os.listdir(data)) == 3  # create + crashed + replay
    vacuum(path, keep_last=2, min_age_sec=0.0)
    assert len(os.listdir(data)) == 2


def test_concurrent_writers_conflict_not_lost_update(spark, tmp_path):
    """Two writers from the same base version: exactly one commits, the
    other gets VersionConflictError (never a silent lost update)."""
    import video_streamer_spark.operators.table_format as tf

    path = str(tmp_path / "t")
    base = _orders(spark).where("o_orderkey % 4 = 0")
    create_table(base, path, ["o_orderkey"], n_buckets=4)
    del_a = base.limit(10).withColumn("__op", F.lit("D"))

    # writer A commits v2; writer B, still holding base v1, races by
    # trying to publish the same next version id directly
    assert merge_table(spark, path, del_a) == 2
    with pytest.raises(VersionConflictError):
        tf._commit_manifest(path, 2, {"buckets": {}})
    assert current_version(path) == 2


def test_multi_bucket_commit_is_all_or_nothing(spark, tmp_path):
    """A changeset spanning every bucket becomes visible atomically:
    any committed version reads as a COMPLETE pre- or post-merge state,
    never a mix (the per-partition-commit gap this format closes)."""
    path = str(tmp_path / "t")
    base = _orders(spark).where("o_orderkey % 2 = 0")
    create_table(base, path, ["o_orderkey"], n_buckets=8)
    # touches all 8 buckets
    changes = base.withColumn("__op", F.lit("U")).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    merge_table(spark, path, changes)
    for v in history(path):
        snap = read_table(spark, path, version=v)
        n_bumped = snap.where(
            F.col("o_totalprice")
            != F.floor(F.col("o_totalprice") * 100.0) / 100.0
        ).count()
        # version 1: zero bumped; version 2: all bumped. Anything in
        # between would be a torn commit. (prices are 2-decimal in the
        # fixture, +1.0 keeps them 2-decimal: detect via full compare)
        pre = _rows(read_table(spark, path, version=1))
        post = _rows(read_table(spark, path, version=history(path)[-1]))
        got = _rows(snap)
        assert got == pre or got == post
        del n_bumped


def test_vacuum_keeps_retained_versions_readable(spark, tmp_path):
    path = str(tmp_path / "t")
    base = _orders(spark).where("o_orderkey % 4 = 0")
    create_table(base, path, ["o_orderkey"], n_buckets=4)
    for i in range(3):
        merge_table(
            spark,
            path,
            base.limit(10 * (i + 1)).withColumn("__op", F.lit("U")),
        )
    assert history(path) == [1, 2, 3, 4]
    stats = vacuum(path, keep_last=2, min_age_sec=0.0)
    assert stats["manifests_removed"] == 2
    assert history(path) == [3, 4]
    # retained versions still read fine
    assert read_table(spark, path, version=3).count() > 0
    assert read_table(spark, path, version=4).count() > 0


def test_merge_idempotency_key_skips_replay(spark, tmp_path):
    """A merge replayed with the same idempotency key is a no-op at the
    MANIFEST level: same state, same version, no churn."""
    path = str(tmp_path / "t")
    base = _orders(spark).where("o_orderkey % 4 = 0")
    create_table(base, path, ["o_orderkey"], n_buckets=4)
    cs = base.limit(20).withColumn("__op", F.lit("D"))
    v = merge_table(spark, path, cs, idempotency_key="ckpt:0")
    assert v == 2
    v2 = merge_table(spark, path, cs, idempotency_key="ckpt:0")
    assert v2 == 2 and history(path) == [1, 2]
    # a different key commits normally
    assert merge_table(spark, path, cs, idempotency_key="ckpt:1") == 3


def test_acid_merge_sink_streaming_equivalence(spark, tmp_path):
    """Stream a CDC feed into the versioned table; the final snapshot
    must equal the batch apply of the same compacted changeset, and the
    version count must equal the number of non-empty epochs."""
    from video_streamer_spark.operators.merge import compact_changeset
    from video_streamer_spark.operators.table_format import (
        run_acid_merge_sink,
    )

    path = str(tmp_path / "t")
    base = _orders(spark).where("o_orderkey % 2 = 0")
    create_table(base, path, ["o_orderkey"], n_buckets=4)

    # CDC feed: deletes for %8==0, price bumps for %8==2, with a seq col
    feed = (
        _orders(spark)
        .where("o_orderkey % 8 IN (0, 2)")
        .withColumn(
            "__op",
            F.when(F.col("o_orderkey") % 8 == 0, F.lit("D")).otherwise(
                F.lit("U")
            ),
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 8 == 2,
                F.col("o_totalprice") + 5.0,
            ).otherwise(F.col("o_totalprice")),
        )
        .withColumn("seq", F.col("o_orderkey"))
    )
    src = str(tmp_path / "src")
    feed.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_acid_merge_sink(
        stream, path, ["o_orderkey"], "seq", str(tmp_path / "ckpt")
    )

    got = _rows(read_table(spark, path).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ))
    from video_streamer_spark.operators.merge import apply_changeset

    want = _rows(
        apply_changeset(
            base,
            compact_changeset(feed, ["o_orderkey"], "seq"),
            ["o_orderkey"],
        ).select("o_orderkey", "o_custkey", "o_totalprice")
    )
    assert got == want


def test_empty_committed_version_reads_as_empty_relation(spark, tmp_path):
    """A changeset deleting every row commits a valid EMPTY version —
    readable as an empty relation with the table schema, not an error."""
    path = str(tmp_path / "t")
    base = _orders(spark).where("o_orderkey % 100 = 0")
    create_table(base, path, ["o_orderkey"], n_buckets=4)
    merge_table(spark, path, base.withColumn("__op", F.lit("D")))
    snap = read_table(spark, path)
    assert snap.count() == 0
    assert set(snap.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}
    # and the table comes back to life on a later insert
    merge_table(spark, path, base.limit(5).withColumn("__op", F.lit("I")))
    assert read_table(spark, path).count() == 5


def test_second_stream_run_is_not_swallowed_by_first_runs_epochs(
    spark, tmp_path
):
    """Epoch ids restart at 0 under a fresh checkpoint: run 2's batches
    must COMMIT, not be skipped as replays of run 1's epoch keys (the
    epoch-id-collision bug the checkpoint-scoped key prevents)."""
    from video_streamer_spark.operators.table_format import (
        run_acid_merge_sink,
    )

    path = str(tmp_path / "t")
    base = _orders(spark).where("o_orderkey % 2 = 0")
    create_table(base, path, ["o_orderkey"], n_buckets=4)

    def feed(pred, bump):
        return (
            _orders(spark)
            .where(pred)
            .withColumn("__op", F.lit("U"))
            .withColumn("o_totalprice", F.col("o_totalprice") + bump)
            .withColumn("seq", F.col("o_orderkey"))
        )

    for i, (pred, bump) in enumerate(
        [("o_orderkey % 8 = 0", 1.0), ("o_orderkey % 8 = 2", 7.0)]
    ):
        src = str(tmp_path / f"src{i}")
        feed(pred, bump).repartition(2).write.parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        run_acid_merge_sink(
            stream,
            path,
            ["o_orderkey"],
            "seq",
            str(tmp_path / f"ckpt{i}"),  # FRESH checkpoint per run
        )
    got = read_table(spark, path)
    # run 2's +7.0 bumps must be present
    n_run2 = got.join(
        _orders(spark).where("o_orderkey % 8 = 2").select(
            "o_orderkey", F.col("o_totalprice").alias("orig")
        ),
        "o_orderkey",
    ).where(F.col("o_totalprice") == F.col("orig") + 7.0).count()
    assert n_run2 == _orders(spark).where("o_orderkey % 8 = 2").count()


def test_random_changeset_sequence_matches_dict_model(spark, tmp_path):
    """Model-based check: ten seeded-random changesets (U/I/D over a
    small key space, duplicate keys compacted last-write-wins) applied
    through merge_table must leave exactly the state a plain python
    dict model predicts — at every intermediate version (time travel
    re-reads the full history)."""
    import random

    from video_streamer_spark.operators.merge import compact_changeset

    rng = random.Random(0xC0FFEE)
    path = str(tmp_path / "t")
    keys = list(range(40))
    base_rows = [(k, float(k * 10)) for k in keys if k % 2 == 0]
    base = spark.createDataFrame(base_rows, "k bigint, v double")
    create_table(base, path, ["k"], n_buckets=4)
    model = dict(base_rows)
    states = [dict(model)]

    for step in range(10):
        n = rng.randint(1, 8)
        cs_rows = []
        for _ in range(n):
            k = rng.choice(keys)
            op = rng.choice(["U", "I", "D"])
            cs_rows.append((k, float(rng.randint(0, 999)), op, step * 100 + len(cs_rows)))
        cs = spark.createDataFrame(
            cs_rows, "k bigint, v double, __op string, seq bigint"
        )
        compacted = compact_changeset(cs, ["k"], "seq")
        merge_table(spark, path, compacted)
        # model: last op per key wins (compaction), then apply
        last = {}
        for k, v, op, _seq in cs_rows:
            last[k] = (op, v)
        for k, (op, v) in last.items():
            if op == "D":
                model.pop(k, None)
            else:  # U and I both key-replace
                model[k] = v
        states.append(dict(model))

    versions = history(path)
    assert len(versions) == len(states)
    for v, want in zip(versions, states):
        got = {
            r["k"]: r["v"]
            for r in read_table(spark, path, version=v).collect()
        }
        assert got == want, f"version {v} diverged from the model"
