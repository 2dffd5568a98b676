"""Snapshot-versioned table format: atomic multi-bucket commits,
time travel, optimistic concurrency, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from video_streamer_spark.catalog import table
from video_streamer_spark.operators.log_store import (
    ConditionalPutLogStore,
    register_log_store,
    unregister_log_store,
)
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


@pytest.fixture(params=["posix", "condput"])
def store_path(tmp_path, request):
    """A table path routed through either the default POSIX hard-link
    LogStore or the object-store-shaped conditional-put store (no
    rename/link in its client protocol) — the commit-protocol tests run
    against BOTH so the format's correctness is proven independent of
    filesystem link semantics (round-7 VERDICT, What's missing 2)."""
    path = str(tmp_path / "t")
    if request.param == "condput":
        register_log_store(str(tmp_path), ConditionalPutLogStore())
        yield path
        unregister_log_store(str(tmp_path))
    else:
        yield path


def test_null_key_components_are_refused(spark, store_path):
    """NULL key components are refused loudly at the routing
    chokepoint (ADVICE r11 follow-through): the format's identity
    joins use SQL equality, under which a null-keyed row would be
    un-updatable and would duplicate on every upsert — so the write
    path raises instead of storing one, and a failed write publishes
    nothing (the manifest link is the commit point)."""
    from pyspark.errors import PySparkException

    path = store_path
    with pytest.raises(PySparkException, match="NULL key component"):
        create_table(
            spark.createDataFrame([(None, 1.0)], "k bigint, v double"),
            path,
            ["k"],
            n_buckets=2,
        )
    # nothing published: the table does not exist
    with pytest.raises(FileNotFoundError):
        current_version(path)
    # composite key: ANY null component is refused, on merge too
    base = spark.createDataFrame(
        [(1, 1, 1.0), (2, 2, 2.0)], "k1 bigint, k2 bigint, v double"
    )
    create_table(base, path, ["k1", "k2"], n_buckets=2)
    bad = spark.createDataFrame(
        [(3, None, 3.0, "I")], "k1 bigint, k2 bigint, v double, __op string"
    )
    with pytest.raises(PySparkException, match="NULL key component"):
        merge_table(spark, path, bad)
    assert current_version(path) == 1  # the failed merge landed nothing
    assert read_table(spark, path).count() == 2


def test_create_merge_read_roundtrip(spark, store_path):
    path = store_path
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


def test_crash_before_manifest_publishes_nothing(spark, store_path, monkeypatch):
    """The commit point is the manifest link: kill the commit after the
    data write but before the link and the table is untouched; the
    replayed merge then commits normally (no orphan-manifest ambiguity,
    the exact recovery hole the _CURRENT-pointer design would have)."""
    import video_streamer_spark.operators.table_format as tf

    path = store_path
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


def test_concurrent_writers_conflict_not_lost_update(spark, store_path):
    """Two writers from the same base version: exactly one commits, the
    other gets VersionConflictError (never a silent lost update)."""
    import video_streamer_spark.operators.table_format as tf

    path = store_path
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


def test_vacuum_keeps_retained_versions_readable(spark, store_path):
    path = store_path
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


def test_zone_map_pruned_read_skips_disjoint_buckets(spark, tmp_path):
    """Per-bucket value ranges made disjoint BY CONSTRUCTION (value =
    bucket*1000 + i), so the zone maps must resolve a range predicate
    to exactly one bucket — verified both by inputFiles (skipped
    buckets never listed) and by exact row equality vs filter-after-
    full-read."""
    from video_streamer_spark.operators.merge import BUCKET_COL, _bucketed
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        read_table_where,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 400).select(F.col("id").alias("k"))
    with_b = _bucketed(base, ["k"], 8).withColumn(
        "val", (F.col(BUCKET_COL).cast("long") * 1000 + F.col("k")).cast("long")
    ).drop(BUCKET_COL)
    create_table(with_b, path, ["k"], n_buckets=8)

    doc = _read_manifest(path, 1)
    assert doc["stats"], "zone maps must be recorded at create"
    # every recorded bucket range is [b*1000, b*1000+399]-shaped
    for b, cols in doc["stats"].items():
        mn, mx = cols["val"]
        assert mn // 1000 == int(b) and mx // 1000 == int(b)

    pruned = read_table_where(spark, path, "val", lo=3000, hi=3399)
    full = read_table(spark, path).where("val >= 3000 AND val <= 3399")
    assert _rows(pruned.select("k", "val")) == _rows(full.select("k", "val"))
    # exactly one bucket's files are listed
    dirs = {f.rsplit("/", 2)[-2] for f in pruned.inputFiles()}
    assert len(dirs) == 1, dirs


def test_zone_maps_carried_and_refreshed_on_merge(spark, tmp_path):
    from video_streamer_spark.operators.merge import BUCKET_COL, _bucketed
    from video_streamer_spark.operators.table_format import _read_manifest

    path = str(tmp_path / "t")
    base = spark.range(0, 200).select(F.col("id").alias("k"))
    with_b = _bucketed(base, ["k"], 8).withColumn(
        "val", (F.col(BUCKET_COL).cast("long") * 1000 + F.col("k")).cast("long")
    ).drop(BUCKET_COL)
    create_table(with_b, path, ["k"], n_buckets=8)
    before = _read_manifest(path, 1)["stats"]

    # touch only key 7's bucket: raise its val far above every range
    change = (
        read_table(spark, path)
        .where("k = 7")
        .withColumn("val", F.lit(999_999).cast("long"))
        .withColumn("__op", F.lit("U"))
    )
    merge_table(spark, path, change)
    after = _read_manifest(path, 2)["stats"]

    touched = {
        str(r[BUCKET_COL])
        for r in _bucketed(
            spark.range(7, 8).select(F.col("id").alias("k")), ["k"], 8
        ).select(BUCKET_COL).collect()
    }
    for b in before:
        if b in touched:
            assert after[b]["val"][1] == 999_999
        else:
            assert after[b] == before[b], "untouched stats carried over"


def test_key_lookup_reads_at_most_k_buckets(spark, tmp_path):
    from video_streamer_spark.operators.table_format import read_table_for_keys

    path = str(tmp_path / "t")
    base = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=16)
    keys = spark.createDataFrame([(11,), (42,), (433,)], ["k"])
    got = read_table_for_keys(spark, path, keys)
    assert _rows(got) == [(11, 33), (42, 126), (433, 1299)]
    dirs = {f.rsplit("/", 2)[-2] for f in got.inputFiles()}
    assert len(dirs) <= 3, dirs


def test_table_changes_is_exactly_the_applied_delta(spark, tmp_path):
    from video_streamer_spark.operators.table_format import table_changes

    path = str(tmp_path / "t")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=8)
    changes = spark.createDataFrame(
        [(3, 99, "U"), (100, 1, "I"), (5, 0, "D")], ["k", "val", "__op"]
    ).withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, changes)

    cdf = table_changes(spark, path, 1, 2)
    got = sorted((r["k"], r["val"], r["_change_type"]) for r in cdf.collect())
    assert got == [
        (3, 99, "update_postimage"),
        (5, 5 % 7, "delete"),  # delete carries the pre-image
        (100, 1, "insert"),
    ]
    # manifest-level pruning: only rewritten buckets' files are read
    from video_streamer_spark.operators.merge import BUCKET_COL, _bucketed

    touched = {
        f"{BUCKET_COL}={r[BUCKET_COL]}"
        for r in _bucketed(changes, ["k"], 8).select(BUCKET_COL).collect()
    }
    dirs = {f.rsplit("/", 2)[-2] for f in cdf.inputFiles()}
    assert dirs <= touched, (dirs, touched)


def test_table_changes_across_multiple_commits(spark, tmp_path):
    """v1→v3 must reflect the NET delta (an insert later updated shows
    once, as an insert with the final value; an insert later deleted
    vanishes)."""
    from video_streamer_spark.operators.table_format import table_changes

    path = str(tmp_path / "t")
    base = spark.range(0, 50).select(
        F.col("id").alias("k"), F.col("id").alias("val")
    )
    create_table(base, path, ["k"], n_buckets=4)
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(200, 1, "I"), (201, 1, "I")], ["k", "val", "__op"]
        ).withColumn("val", F.col("val").cast("long")),
    )
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(200, 7, "U"), (201, 0, "D")], ["k", "val", "__op"]
        ).withColumn("val", F.col("val").cast("long")),
    )
    cdf = table_changes(spark, path, 1, 3)
    got = sorted((r["k"], r["val"], r["_change_type"]) for r in cdf.collect())
    assert got == [(200, 7, "insert")]


def test_add_column_is_metadata_only_and_null_backfilled(spark, tmp_path):
    import glob

    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        add_column,
        table_changes,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=8)
    files_before = sorted(glob.glob(f"{path}/data/**/*.parquet", recursive=True))

    v2 = add_column(path, "score", "double")
    assert v2 == 2
    # metadata-only: same data files, same bucket dirs, stats carried
    assert sorted(glob.glob(f"{path}/data/**/*.parquet", recursive=True)) == files_before
    assert _read_manifest(path, 2)["buckets"] == _read_manifest(path, 1)["buckets"]
    assert _read_manifest(path, 2)["stats"] == _read_manifest(path, 1)["stats"]

    # current read null-backfills; time travel to v1 has no such column
    cur = read_table(spark, path)
    assert cur.schema["score"].dataType.simpleString() == "double"
    assert cur.where("score IS NOT NULL").count() == 0
    assert "score" not in read_table(spark, path, version=1).columns

    # a metadata-only commit produces an EMPTY change feed
    assert table_changes(spark, path, 1, 2).count() == 0

    # a merge materializes values for its touched bucket; sparse
    # changesets (written pre-evolution, no score column) stay valid
    with_score = spark.createDataFrame([(7, 7 % 5, 0.5, "U")],
                                       ["k", "val", "score", "__op"]) \
        .withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, with_score)
    sparse = spark.createDataFrame([(8, 99, "U")], ["k", "val", "__op"]) \
        .withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, sparse)
    final = {r["k"]: (r["val"], r["score"]) for r in read_table(spark, path).collect()}
    assert final[7] == (2, 0.5)
    assert final[8] == (99, None)
    assert final[9] == (4, None)

    # the feed across the evolution shows exactly the two updates
    cdf = table_changes(spark, path, 1, 4)
    got = sorted((r["k"], r["val"], r["score"], r["_change_type"]) for r in cdf.collect())
    assert got == [
        (7, 2, 0.5, "update_postimage"),
        (8, 99, None, "update_postimage"),
    ]


def test_add_column_duplicate_semantics(spark, tmp_path):
    """Same name + same type is an idempotent repeat (returns the
    current version, commits nothing — the retry-after-ambiguous-put
    contract, review r9); same name + DIFFERENT type is a genuine
    conflict and stays a loud error."""
    from video_streamer_spark.operators.table_format import add_column

    path = str(tmp_path / "t")
    create_table(
        spark.range(0, 10).select(F.col("id").alias("k")), path, ["k"], 4
    )
    with pytest.raises(ValueError, match="already exists with type"):
        add_column(path, "k", "string")
    assert add_column(path, "k", "bigint") == 1  # idempotent, no commit
    assert history(path) == [1]


def test_streaming_cdf_source_delivers_snapshot_then_increments(spark, tmp_path):
    """format('table_cdf'): drain 1 (startingVersion=0) delivers the v1
    snapshot as inserts; a merge then drain 2 on the SAME checkpoint
    delivers exactly the net delta of the new commit — matching the
    batch table_changes — with per-rewritten-bucket partitions."""
    from video_streamer_spark.operators.table_format import (
        merge_table,
        table_changes,
    )
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    base = spark.range(0, 80).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=8)
    register_cdf_source(spark)

    def drain():
        q = (
            spark.readStream.format("table_cdf")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 120, "cdf_drain")

    drain()
    feed1 = spark.read.parquet(out)
    assert feed1.count() == 80
    assert feed1.where("_change_type <> 'insert'").count() == 0
    assert feed1.where("_commit_version <> 1").count() == 0

    changes = spark.createDataFrame(
        [(3, 99, "U"), (200, 1, "I"), (5, 0, "D"), (6, 6 % 9, "U")],
        ["k", "val", "__op"],
    ).withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, changes)
    drain()

    inc = spark.read.parquet(out).where("_commit_version = 2")
    got = sorted((r["k"], r["val"], r["_change_type"]) for r in inc.collect())
    # k=6 is a no-op update (same value) — must NOT appear in the feed
    assert got == [
        (3, 99, "update_postimage"),
        (5, 5 % 9, "delete"),
        (200, 1, "insert"),
    ]
    batch = table_changes(spark, path, 1, 2)
    assert got == sorted(
        (r["k"], r["val"], r["_change_type"]) for r in batch.collect()
    )
    # nothing new: a third drain appends zero rows (metadata poll only)
    drain()
    assert spark.read.parquet(out).count() == 83


def test_zone_map_temporal_pruning_parses_not_string_compares(spark, tmp_path):
    """A user bound of '...05.123' and a stored stat of '...05.123000'
    are the same instant; a lexicographic compare would wrongly skip
    the bucket (padded stat > unpadded bound). The parsed compare must
    keep it — and still return the exact filter result."""
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        read_table_where,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 64).select(
        F.col("id").alias("k"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 1_000  # .00X ms steps
        ).alias("ts"),
    )
    create_table(df, path, ["k"], n_buckets=4)
    stats = _read_manifest(path, 1)["stats"]
    assert all("ts" in s for s in stats.values())
    # one row: k=0 at exactly ...000.000; bound with no fractional part
    lo = hi = "2023-11-14 22:13:20"
    got = read_table_where(spark, path, "ts", lo=lo, hi=hi)
    assert [r["k"] for r in got.collect()] == [0]
    full = read_table(spark, path).where(
        "ts >= timestamp'2023-11-14 22:13:20' AND ts <= timestamp'2023-11-14 22:13:20'"
    )
    assert got.count() == full.count() == 1


def test_optimize_tightens_file_zone_maps_and_is_cdf_invisible(spark, tmp_path):
    """optimize_table rewrites buckets value-sorted: same rows, empty
    change feed (layout maintenance is invisible to CDC consumers),
    and a narrow range read opens strictly fewer files than before
    because the per-file zone maps became selective."""
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        optimize_table,
        read_table_where,
        table_changes,
    )

    path = str(tmp_path / "t")
    # val is a scrambled permutation of k: pre-optimize every file's
    # [min,max] spans nearly the whole domain, so nothing can be skipped
    base = spark.range(0, 4000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 2654435761) % 100000).alias("val"),
    )
    create_table(base, path, ["k"], n_buckets=4)
    assert _read_manifest(path, 1)["file_stats"], "per-file maps recorded"

    before = read_table_where(spark, path, "val", lo=10_000, hi=12_000)
    n_files_before = len(before.inputFiles())
    rows_before = _rows(before)

    v2 = optimize_table(spark, path, "val", files_per_bucket=4)
    assert v2 == 2
    # logically a no-op ...
    assert _rows(read_table(spark, path)) == _rows(read_table(spark, path, 1))
    assert table_changes(spark, path, 1, 2).count() == 0
    # ... but physically selective: same answer from fewer files
    after = read_table_where(spark, path, "val", lo=10_000, hi=12_000)
    assert _rows(after) == rows_before
    n_files_after = len(after.inputFiles())
    assert n_files_after < n_files_before, (n_files_after, n_files_before)
    # ~2% of the domain against ~4 value-sorted files per bucket →
    # at most one intersecting file per bucket
    assert n_files_after <= 4 * 2

    # zone maps after optimize: within each bucket, file ranges are
    # non-overlapping (sorted layout) — the property pruning relies on
    fstats = _read_manifest(path, 2)["file_stats"]
    for b, files in fstats.items():
        ranges = sorted(r["val"] for r in files.values())
        for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
            assert a_hi <= b_lo, (b, ranges)


def test_optimize_preserves_txn_keys_and_merge_continuity(spark, tmp_path):
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        optimize_table,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=4)
    ch = spark.createDataFrame([(1, 42, "U")], ["k", "val", "__op"]) \
        .withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, ch, idempotency_key="ck:0")
    optimize_table(spark, path, "val")
    assert _read_manifest(path, 3)["txns"] == ["ck:0"]
    # a replayed epoch after optimize is still a no-op
    assert merge_table(spark, path, ch, idempotency_key="ck:0") == 3
    # and a real merge continues normally
    ch2 = spark.createDataFrame([(2, 43, "U")], ["k", "val", "__op"]) \
        .withColumn("val", F.col("val").cast("long"))
    assert merge_table(spark, path, ch2, idempotency_key="ck:1") == 4
    final = {r["k"]: r["val"] for r in read_table(spark, path).collect()}
    assert final[1] == 42 and final[2] == 43


def test_cdf_skips_layout_only_commits_without_reading(spark, tmp_path):
    """After OPTIMIZE, the change feed must not diff the table at all:
    the layout_only manifest flag turns the (v, v_opt] window into a
    metadata walk — zero input files — while a later real merge still
    surfaces exactly its own bucket."""
    from video_streamer_spark.operators.table_format import (
        merge_table,
        optimize_table,
        table_changes,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 300).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 1000).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=8)
    optimize_table(spark, path, "val")  # v2, layout-only

    feed = table_changes(spark, path, 1, 2)
    assert feed.count() == 0
    assert feed.inputFiles() == [], "layout-only window must read nothing"

    ch = spark.createDataFrame([(5, 9999, "U")], ["k", "val", "__op"]) \
        .withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, ch)  # v3
    feed2 = table_changes(spark, path, 1, 3)
    got = [(r["k"], r["val"], r["_change_type"]) for r in feed2.collect()]
    assert got == [(5, 9999, "update_postimage")]
    # only the merged key's bucket is read, not the optimized rest
    from video_streamer_spark.operators.merge import BUCKET_COL, _bucketed

    touched = {
        f"{BUCKET_COL}={r[BUCKET_COL]}"
        for r in _bucketed(ch, ["k"], 8).select(BUCKET_COL).collect()
    }
    dirs = {f.rsplit("/", 2)[-2] for f in feed2.inputFiles()}
    assert dirs <= touched, (dirs, touched)


def test_streaming_cdf_drain_after_optimize_emits_nothing(spark, tmp_path):
    from video_streamer_spark.operators.table_format import optimize_table
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    create_table(
        spark.range(0, 60).select(
            F.col("id").alias("k"), ((F.col("id") * 7) % 100).alias("val")
        ),
        path,
        ["k"],
        n_buckets=4,
    )
    register_cdf_source(spark)

    def drain():
        q = (
            spark.readStream.format("table_cdf")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 120, "cdf_drain_opt")

    drain()  # snapshot: 60 inserts
    optimize_table(spark, path, "val")
    drain()  # layout-only increment: nothing
    assert spark.read.parquet(out).count() == 60


def test_off_type_keys_still_route_to_the_right_bucket(spark, tmp_path):
    """xxhash64 is type-sensitive: int 42 and bigint 42 hash
    differently, so an off-type lookup or changeset key would silently
    route to the wrong bucket. Both paths must cast to the table's
    declared key type first."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from video_streamer_spark.operators.table_format import (
        read_table_for_keys,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("val")
    )  # k is BIGINT
    create_table(base, path, ["k"], n_buckets=16)

    int_keys = spark.createDataFrame(
        [(42,), (7,)], StructType([StructField("k", IntegerType())])
    )
    got = read_table_for_keys(spark, path, int_keys)
    assert _rows(got) == [(7, 21), (42, 126)]

    int_change = spark.createDataFrame(
        [(42, 999, "U")],
        StructType(
            [
                StructField("k", IntegerType()),
                StructField("val", IntegerType()),
                StructField("__op", StringType()),
            ]
        ),
    )
    merge_table(spark, path, int_change)
    final = {r["k"]: r["val"] for r in read_table(spark, path).collect()}
    assert final[42] == 999
    # no duplicated key across buckets
    assert read_table(spark, path).where("k = 42").count() == 1


def test_unknown_changeset_column_raises_not_silently_drops(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(
        spark.range(0, 20).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("score")
        ),
        path,
        ["k"],
        4,
    )
    typo = spark.createDataFrame([(1, 9, "U")], ["k", "scor", "__op"])
    with pytest.raises(ValueError, match="scor"):
        merge_table(spark, path, typo)
    # table untouched
    assert read_table(spark, path).where("score = 9").count() == 0


def test_streaming_cdf_fails_loudly_on_mid_stream_schema_change(
    spark, tmp_path
):
    from video_streamer_spark.operators.table_format import add_column
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    create_table(
        spark.range(0, 20).select(F.col("id").alias("k")), path, ["k"], 4
    )
    register_cdf_source(spark)
    stream = spark.readStream.format("table_cdf").option("path", path).load()

    def drain():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 120, "cdf_schema_change")

    drain()
    add_column(path, "score", "double")
    ch = spark.createDataFrame([(1, 0.5, "U")], ["k", "score", "__op"])
    merge_table(spark, path, ch)
    with pytest.raises(Exception, match="restart the table_cdf stream"):
        drain()


def test_streaming_cdf_bigint_values_beyond_2_53_are_exact(spark, tmp_path):
    """An insert/delete in a bucket upcasts pandas int64 columns to
    float64 unless nullable Int64 is used; beyond 2^53 that round trip
    is lossy. The feed must carry such ids bit-exactly."""
    from video_streamer_spark.operators.table_format import merge_table
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    big = 10**18 + 7  # not representable in float64 (2^53 ≈ 9e15)
    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(big, 1), (big + 3, 2), (big + 6, 3)], ["k", "val"]
    )
    create_table(base, path, ["k"], n_buckets=2)
    register_cdf_source(spark)

    def drain():
        q = (
            spark.readStream.format("table_cdf")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 120, "cdf_bigint")

    drain()
    ch = spark.createDataFrame(
        [(big + 9, 4, "I"), (big, 0, "D")], ["k", "val", "__op"]
    )
    merge_table(spark, path, ch)
    drain()
    feed = spark.read.parquet(out)
    got = {(r["k"], r["val"], r["_change_type"]) for r in feed.collect()}
    assert (big + 9, 4, "insert") in got
    assert (big, 1, "delete") in got
    assert all(isinstance(k, int) for k, _, _ in got)


def test_table_changes_matches_dict_model_on_random_sequences(spark, tmp_path):
    """Model test: apply a deterministic-random changeset sequence,
    mirror every state in a plain dict, and check table_changes between
    EVERY version pair against the model diff (insert/delete/update
    with post-image; unchanged keys absent)."""
    import random

    from video_streamer_spark.operators.table_format import table_changes

    rng = random.Random(7)
    path = str(tmp_path / "t")
    model = {k: k % 11 for k in range(40)}
    snapshots = [dict(model)]
    create_table(
        spark.createDataFrame(sorted(model.items()), ["k", "val"]),
        path,
        ["k"],
        n_buckets=4,
    )
    for _step in range(4):
        ops = []
        for k in rng.sample(sorted(model), 6):
            if rng.random() < 0.3:
                ops.append((k, model[k], "D"))
                del model[k]
            else:
                nv = rng.randrange(1000, 2000)
                if rng.random() < 0.25:
                    nv = snapshots[-1].get(k, nv)  # sometimes a no-op
                ops.append((k, nv, "U"))
                model[k] = nv
        newk = 100 + _step
        ops.append((newk, rng.randrange(5000, 6000), "I"))
        model[newk] = ops[-1][1]
        merge_table(
            spark, path, spark.createDataFrame(ops, ["k", "val", "__op"])
        )
        snapshots.append(dict(model))

    def model_diff(a, b):
        out = set()
        for k in set(a) | set(b):
            if k in a and k not in b:
                out.add((k, a[k], "delete"))
            elif k not in a and k in b:
                out.add((k, b[k], "insert"))
            elif a[k] != b[k]:
                out.add((k, b[k], "update_postimage"))
        return out

    for i in range(len(snapshots)):
        for j in range(i + 1, len(snapshots)):
            got = {
                (r["k"], r["val"], r["_change_type"])
                for r in table_changes(spark, path, i + 1, j + 1).collect()
            }
            assert got == model_diff(snapshots[i], snapshots[j]), (i, j)


def test_table_changes_falls_back_when_chain_is_incomplete(spark, tmp_path):
    """If an intermediate manifest is gone (out-of-policy deletion),
    the layout-only walk can't run; the endpoint pointer diff must
    still produce the correct net delta."""
    from video_streamer_spark.operators.table_format import (
        merge_table,
        table_changes,
    )

    path = str(tmp_path / "t")
    create_table(
        spark.range(0, 50).select(F.col("id").alias("k"), F.col("id").alias("val")),
        path,
        ["k"],
        4,
    )
    merge_table(
        spark,
        path,
        spark.createDataFrame([(1, 100, "U")], ["k", "val", "__op"])
        .withColumn("val", F.col("val").cast("long")),
    )
    merge_table(
        spark,
        path,
        spark.createDataFrame([(2, 200, "U")], ["k", "val", "__op"])
        .withColumn("val", F.col("val").cast("long")),
    )
    os.remove(os.path.join(path, "_manifests", "v000000002.json"))
    got = sorted(
        (r["k"], r["val"], r["_change_type"])
        for r in table_changes(spark, path, 1, 3).collect()
    )
    assert got == [(1, 100, "update_postimage"), (2, 200, "update_postimage")]


def test_acid_sink_retries_version_conflicts(spark, tmp_path, monkeypatch):
    """A concurrent commit racing a streaming micro-batch is liveness,
    not failure: the sink re-reads the new current and re-applies.
    Inject conflicts on the first two attempts; the drain must succeed
    and the final state must include the batch."""
    import video_streamer_spark.operators.table_format as tf
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    create_table(
        spark.range(0, 30).select(
            F.col("id").alias("k"), F.col("id").alias("val"),
        ),
        path,
        ["k"],
        4,
    )
    spark.createDataFrame(
        [(3, 333, "U", 1)], ["k", "val", "__op", "seq"]
    ).write.parquet(src)

    real = tf.merge_table
    fails = {"n": 2}

    def flaky(*a, **kw):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise tf.VersionConflictError("injected concurrent commit")
        return real(*a, **kw)

    monkeypatch.setattr(tf, "merge_table", flaky)
    stream = spark.readStream.schema(
        "k bigint, val bigint, __op string, seq bigint"
    ).parquet(src)
    tf.run_acid_merge_sink(
        stream, path, ["k"], "seq", ckpt, timeout_sec=120
    )
    assert fails["n"] == 0
    final = {r["k"]: r["val"] for r in read_table(spark, path).collect()}
    assert final[3] == 333


def test_cdc_replication_converges_dst_to_src(spark, tmp_path):
    """Replication = the streaming change feed of A applied into B via
    the ACID merge sink. Every pass ships only the new commits; B's
    snapshot equals A's after each pass, including deletes, OPTIMIZE
    on the source (shipped as nothing), and a replayed pass (no-op)."""
    from video_streamer_spark.operators.table_format import (
        merge_table,
        optimize_table,
    )
    from video_streamer_spark.sources.cdf_source import (
        register_cdf_source,
        replicate_table,
    )

    src = str(tmp_path / "a")
    dst = str(tmp_path / "b")
    ckpt = str(tmp_path / "ckpt")
    base = spark.range(0, 120).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("val")
    )
    create_table(base, src, ["k"], n_buckets=8)
    # dst starts EMPTY with the same keys/schema
    create_table(base.limit(0), dst, ["k"], n_buckets=4)
    register_cdf_source(spark)

    replicate_table(spark, src, dst, ckpt, timeout_sec=120)
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))

    ch = spark.createDataFrame(
        [(5, 999, "U"), (500, 1, "I"), (7, 0, "D")], ["k", "val", "__op"]
    ).withColumn("val", F.col("val").cast("long"))
    merge_table(spark, src, ch)
    optimize_table(spark, src, "val")  # must ship as NOTHING
    replicate_table(spark, src, dst, ckpt, timeout_sec=120)
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))

    # replayed pass with nothing new: metadata poll, same state
    v_before = current_version(dst)
    replicate_table(spark, src, dst, ckpt, timeout_sec=120)
    assert current_version(dst) == v_before
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))


def test_rebucket_grows_layout_without_changing_rows(spark, tmp_path):
    """rebucket_table: same rows, empty change feed, new bucket count
    in force for subsequent merges, keys reachable by point lookup
    through the NEW hash routing."""
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        read_table_for_keys,
        rebucket_table,
        table_changes,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 17).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=2)
    ch0 = spark.createDataFrame([(1, 777, "U")], ["k", "val", "__op"]) \
        .withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, ch0, idempotency_key="ck:0")

    v = rebucket_table(spark, path, 16)
    doc = _read_manifest(path, v)
    assert doc["n_buckets"] == 16 and len(doc["buckets"]) > 2
    assert doc["txns"] == ["ck:0"]
    # rows identical, feed empty, old version still readable
    assert _rows(read_table(spark, path)) == _rows(read_table(spark, path, 2))
    assert table_changes(spark, path, 2, v).count() == 0
    assert table_changes(spark, path, 2, v).inputFiles() == []

    # a merge now routes through the 16-bucket hash
    ch = spark.createDataFrame([(2, 888, "U")], ["k", "val", "__op"]) \
        .withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, ch)
    got = read_table_for_keys(
        spark, path, spark.createDataFrame([(1,), (2,)], ["k"])
    )
    assert _rows(got) == [(1, 777), (2, 888)]
    assert merge_table(spark, path, ch0, idempotency_key="ck:0") == v + 1


def test_streaming_cdf_null_transitions_are_updates_not_crashes(
    spark, tmp_path
):
    """null→value and value→null transitions in a streamed bucket:
    nullable-dtype comparison yields pd.NA, which must be treated as a
    CHANGE (and never poison the boolean mask). null→null is no
    change."""
    from video_streamer_spark.operators.table_format import merge_table
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(1, None), (2, 20), (3, None), (4, 40)], "k bigint, val bigint"
    )
    create_table(base, path, ["k"], n_buckets=1)  # one bucket: all rows join
    register_cdf_source(spark)

    def drain():
        q = (
            spark.readStream.format("table_cdf")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 120, "cdf_nulls")

    drain()
    ch = spark.createDataFrame(
        [(1, 11, "U"), (2, None, "U"), (3, None, "U")],
        "k bigint, val bigint, __op string",
    )
    merge_table(spark, path, ch)
    drain()
    inc = spark.read.parquet(out).where("_commit_version = 2")
    got = sorted(
        (r["k"], r["val"], r["_change_type"]) for r in inc.collect()
    )
    # k=1 null→11, k=2 20→null; k=3 null→null must NOT appear
    assert got == [
        (1, 11, "update_postimage"),
        (2, None, "update_postimage"),
    ]


def test_optimize_is_idempotent_and_feed_stays_empty(spark, tmp_path):
    """Two consecutive OPTIMIZE passes: rows invariant through both,
    the change feed empty over the whole layout-only window, and the
    second pass's file ranges still non-overlapping per bucket."""
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        optimize_table,
        table_changes,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 600).select(
        F.col("id").alias("k"), ((F.col("id") * 97) % 5000).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=4)
    optimize_table(spark, path, "val")
    optimize_table(spark, path, "val")
    assert _rows(read_table(spark, path)) == _rows(read_table(spark, path, 1))
    feed = table_changes(spark, path, 1, 3)
    assert feed.count() == 0 and feed.inputFiles() == []
    fstats = _read_manifest(path, 3)["file_stats"]
    for b, files in fstats.items():
        ranges = sorted(r["val"] for r in files.values())
        for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
            assert a_hi <= b_lo, (b, ranges)


def test_table_changes_across_rebucket_window_is_key_exact(spark, tmp_path):
    """A version window spanning rebucket_table PLUS data commits:
    bucket ids name different key partitions in the two hash layouts,
    so the per-bucket walk must be abandoned for the key-level endpoint
    diff — carried-over keys net out (no false inserts for rows that
    merely moved buckets), and a delete whose pre-image lived in an
    old-layout bucket still produces its feed row."""
    from video_streamer_spark.operators.table_format import (
        rebucket_table,
        table_changes,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=2)  # v1
    ch0 = spark.createDataFrame([(1, 100, "U")], ["k", "val", "__op"]) \
        .withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, ch0)  # v2
    rebucket_table(spark, path, 16)  # v3 (layout_only)
    ch1 = spark.createDataFrame(
        [(2, 999, "U"), (3, 0, "D"), (1000, 5, "I")], ["k", "val", "__op"]
    ).withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, ch1)  # v4

    got = sorted(
        (r["k"], r["val"], r["_change_type"])
        for r in table_changes(spark, path, 2, 4).collect()
    )
    assert got == [
        (2, 999, "update_postimage"),
        (3, 3 % 7, "delete"),
        (1000, 5, "insert"),
    ]
    # a window ending ON the rebucket stays zero rows AND zero reads
    feed = table_changes(spark, path, 2, 3)
    assert feed.count() == 0 and feed.inputFiles() == []
    # a wider window also nets the pre-rebucket commit's change
    wide = sorted(
        (r["k"], r["val"], r["_change_type"])
        for r in table_changes(spark, path, 1, 4).collect()
    )
    assert wide == [
        (1, 100, "update_postimage"),
        (2, 999, "update_postimage"),
        (3, 3 % 7, "delete"),
        (1000, 5, "insert"),
    ]


def test_streaming_cdf_window_spanning_rebucket_is_exact(spark, tmp_path):
    """One micro-batch window covering merge + rebucket + merge: the
    source must not pair old/new dirs by bucket id across the two
    layouts (false inserts for every moved key, missing deletes) — it
    falls back to one global endpoint-diff partition and matches the
    batch table_changes exactly."""
    from video_streamer_spark.operators.table_format import (
        merge_table,
        rebucket_table,
        table_changes,
    )
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    base = spark.range(0, 80).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=2)  # v1
    register_cdf_source(spark)

    def drain():
        q = (
            spark.readStream.format("table_cdf")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 120, "cdf_drain")

    drain()  # snapshot: 80 inserts at v1
    ch0 = spark.createDataFrame(
        [(3, 99, "U"), (5, 0, "D")], ["k", "val", "__op"]
    ).withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, ch0)  # v2
    rebucket_table(spark, path, 16)  # v3
    ch1 = spark.createDataFrame(
        [(200, 1, "I"), (7, 77, "U")], ["k", "val", "__op"]
    ).withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, ch1)  # v4
    drain()  # ONE window (1, 4] spanning the rebucket

    inc = spark.read.parquet(out).where("_commit_version = 4")
    got = sorted((r["k"], r["val"], r["_change_type"]) for r in inc.collect())
    assert got == [
        (3, 99, "update_postimage"),
        (5, 5 % 9, "delete"),
        (7, 77, "update_postimage"),
        (200, 1, "insert"),
    ]
    batch = table_changes(spark, path, 1, 4)
    assert got == sorted(
        (r["k"], r["val"], r["_change_type"]) for r in batch.collect()
    )
    assert spark.read.parquet(out).count() == 84
    # rebucket alone is still feed-invisible: new drain appends nothing
    rebucket_table(spark, path, 4)  # v5
    drain()
    assert spark.read.parquet(out).count() == 84


def test_ntz_zone_maps_are_timezone_independent(spark, tmp_path):
    """timestamp_ntz zone maps must live in wall-clock space end to
    end: a table written under one spark.sql.session.timeZone and
    range-read under another (across the US DST spring-forward date,
    the worst case) returns exactly the rows in [lo, hi] — the old
    cast-through-session-tz stats would shift the prune bounds by the
    offset difference and silently drop matching buckets."""
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        read_table_where,
    )

    path = str(tmp_path / "t")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.range(0, 48).select(
            F.col("id").alias("k"),
            F.expr(
                "timestamp_ntz'2026-03-08 00:00:00' "
                "+ make_interval(0, 0, 0, 0, id, 0, 0)"
            ).alias("ts"),
        )
        create_table(df, path, ["k"], n_buckets=4)
        # stats are recorded as wall strings, not session-tz micros
        stats = _read_manifest(path, 1)["stats"]
        for b in stats:
            lo_s, hi_s = stats[b]["ts"]
            assert isinstance(lo_s, str) and isinstance(hi_s, str)

        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = read_table_where(
            spark, path, "ts",
            lo="2026-03-08 05:00:00", hi="2026-03-08 10:00:00",
        )
        assert sorted(r["k"] for r in got.collect()) == list(range(5, 11))
        # fully-disjoint range prunes to an empty relation (no files)
        miss = read_table_where(
            spark, path, "ts", lo="2027-01-01 00:00:00",
            hi="2027-02-01 00:00:00",
        )
        assert miss.count() == 0 and miss.inputFiles() == []
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_cdc_replication_converges_across_rebucket(spark, tmp_path):
    """Replication over a feed window that spans rebucket_table plus
    data commits: the destination must converge exactly — the old
    per-bucket pairing across the two layouts would ship false deletes
    of live keys (diverging dst permanently) and false inserts for
    every moved key."""
    from video_streamer_spark.operators.table_format import (
        merge_table,
        rebucket_table,
    )
    from video_streamer_spark.sources.cdf_source import (
        register_cdf_source,
        replicate_table,
    )

    src = str(tmp_path / "a")
    dst = str(tmp_path / "b")
    ckpt = str(tmp_path / "ckpt")
    base = spark.range(0, 120).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("val")
    )
    create_table(base, src, ["k"], n_buckets=2)
    create_table(base.limit(0), dst, ["k"], n_buckets=4)
    register_cdf_source(spark)
    replicate_table(spark, src, dst, ckpt, timeout_sec=120)

    ch0 = spark.createDataFrame(
        [(5, 999, "U"), (7, 0, "D")], ["k", "val", "__op"]
    ).withColumn("val", F.col("val").cast("long"))
    merge_table(spark, src, ch0)
    rebucket_table(spark, src, 16)
    ch1 = spark.createDataFrame(
        [(500, 1, "I"), (9, 77, "U")], ["k", "val", "__op"]
    ).withColumn("val", F.col("val").cast("long"))
    merge_table(spark, src, ch1)

    # ONE pass ships the whole rebucket-spanning window
    replicate_table(spark, src, dst, ckpt, timeout_sec=120)
    assert _rows(read_table(spark, dst)) == _rows(read_table(spark, src))
    assert read_table(spark, dst).count() == 120  # -1 delete +1 insert


def test_rebucket_occ_conflicts_with_racing_writer(spark, tmp_path):
    """rebucket_table participates in OCC like any commit: a writer
    holding the pre-rebucket version cannot publish over it — it
    conflicts, and its retry hashes against the NEW bucket count."""
    import video_streamer_spark.operators.table_format as tf
    from video_streamer_spark.operators.table_format import rebucket_table

    path = str(tmp_path / "t")
    base = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=2)  # v1
    rebucket_table(spark, path, 8)  # v2

    # a racing writer that read v1 tries to publish v2 directly
    with pytest.raises(VersionConflictError):
        tf._commit_manifest(path, 2, {"buckets": {}})
    assert current_version(path) == 2

    # the retry path (a fresh merge) routes through the new layout
    ch = spark.createDataFrame([(3, 999, "U")], ["k", "val", "__op"]) \
        .withColumn("val", F.col("val").cast("long"))
    v = merge_table(spark, path, ch)
    assert tf._read_manifest(path, v)["n_buckets"] == 8
    got = dict(
        (r["k"], r["val"]) for r in read_table(spark, path).collect()
    )
    assert got[3] == 999 and len(got) == 60


def test_merge_without_op_column_defaults_to_upsert(spark, tmp_path):
    """A changeset with no __op column is a plain upsert feed: existing
    keys replaced, new keys inserted — no opaque unresolved-column
    error (the external verify drive hit exactly that)."""
    path = str(tmp_path / "t")
    create_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"),
        path,
        ["k"],
        n_buckets=4,
    )
    merge_table(
        spark,
        spark_path := path,
        spark.createDataFrame([(2, "B"), (3, "c")], "k bigint, v string"),
    )
    assert _rows(read_table(spark, spark_path)) == [
        (1, "a"),
        (2, "B"),
        (3, "c"),
    ]


def test_bloom_skipping_exact_and_no_false_negatives(spark, tmp_path):
    """Equality reads on a bloom-tracked unclustered column stay EXACT
    across merge/optimize/rebucket, an absent value bloom-skips every
    bucket, and a value merged in later is never wrongly skipped."""
    from video_streamer_spark.operators.table_format import (
        _bloom_absent,
        _bloom_conf,
        _bloom_value_hashes,
        _read_manifest,
        optimize_table,
        read_table_where,
        rebucket_table,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 800).selectExpr(
        "id AS k", "id * 7919 % 200 AS cust", "concat('v', id) AS v"
    )
    create_table(df, path, ["k"], n_buckets=8, bloom_cols=["cust"])

    def eq_read(val):
        return sorted(
            r["k"]
            for r in read_table_where(
                spark, path, "cust", lo=val, hi=val
            ).collect()
        )

    def want(val, extra=()):
        base = sorted(
            r["k"] for r in df.where(F.col("cust") == val).collect()
        )
        return sorted(base + list(extra))

    for val in (0, 3, 199):
        assert eq_read(val) == want(val)

    # absent value: provably skipped in every bucket, and still exact
    doc = _read_manifest(path, 1)
    bloom = _bloom_conf(doc)
    h = _bloom_value_hashes(spark, 999_999, "bigint")
    assert all(
        _bloom_absent(bloom, b, "cust", *h) for b in doc["buckets"]
    ), "an absent value should bloom-skip all 8 buckets at this fill"
    assert eq_read(999_999) == []

    # merge a row carrying the absent value: carry-over must not keep
    # the stale all-absent verdict (that would be a false negative)
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(9000, 999_999, "late")], "k bigint, cust bigint, v string"
        ),
    )
    assert eq_read(999_999) == [9000]

    # layout maintenance rebuilds blooms for the rewritten dirs
    optimize_table(spark, path, "cust")
    rebucket_table(spark, path, 16)
    assert eq_read(3) == want(3)
    assert eq_read(999_999) == [9000]

    # NO FALSE NEGATIVES, exhaustively: every value present in the
    # table must be maybe-present in the bloom of every bucket that
    # holds one of its rows
    doc = _read_manifest(path, max(history(path)))
    bloom = _bloom_conf(doc)
    import os as _os

    from video_streamer_spark.operators.table_format import BUCKET_COL

    for b, rel in doc["buckets"].items():
        vals = {
            r["cust"]
            for r in spark.read.parquet(
                _os.path.join(path, rel)
            ).collect()
        }
        for v in vals:
            hv = _bloom_value_hashes(spark, v, "bigint")
            assert not _bloom_absent(bloom, b, "cust", *hv), (b, v)


def test_key_lookup_bloom_veto(spark, tmp_path):
    """With a bloom on the key column, a point lookup for keys the
    table never held reads ZERO buckets (inputFiles empty), while
    present keys still return exactly their rows alongside the misses."""
    from video_streamer_spark.operators.table_format import (
        read_table_for_keys,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 400).selectExpr("id AS k", "concat('v', id) AS v")
    create_table(df, path, ["k"], n_buckets=8, bloom_cols=["k"])

    # all-miss probe: bloom vetoes every routed bucket
    misses = spark.createDataFrame(
        [(10_001,), (10_002,), (10_003,)], "k bigint"
    )
    out = read_table_for_keys(spark, path, misses)
    assert out.count() == 0
    assert out.inputFiles() == [], "miss probe should open no files"

    # mixed probe stays exact
    mixed = spark.createDataFrame([(7,), (10_001,), (399,)], "k bigint")
    got = _rows(read_table_for_keys(spark, path, mixed))
    assert got == [(7, "v7"), (399, "v399")]


def test_delete_keys_merge_on_read(spark, tmp_path):
    """Tombstone deletes: O(keys) commit, every reader effective, debt
    repaid on rewrite, CDC sees deletes, vacuum keeps live tombstones."""
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        delete_keys,
        optimize_table,
        read_table_for_keys,
        read_table_where,
        table_changes,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 500).selectExpr(
        "id AS k", "id % 37 AS g", "concat('v', id) AS v"
    )
    create_table(df, path, ["k"], n_buckets=8, bloom_cols=["g"])
    dead = spark.range(0, 500).where("id % 7 = 0").selectExpr("id AS k")
    v = delete_keys(spark, path, dead)
    assert v == 2
    want = sorted(r["k"] for r in df.where("k % 7 != 0").collect())

    # snapshot read, time travel, pruned read, point lookup: effective
    assert sorted(r["k"] for r in read_table(spark, path).collect()) == want
    assert read_table(spark, path, version=1).count() == 500
    got = sorted(
        r["k"]
        for r in read_table_where(spark, path, "g", lo=0, hi=0).collect()
    )
    assert got == sorted(
        r["k"] for r in df.where("g = 0 AND k % 7 != 0").collect()
    )
    probe = spark.createDataFrame([(7,), (8,)], "k bigint")
    assert sorted(
        r["k"] for r in read_table_for_keys(spark, path, probe).collect()
    ) == [8]

    # CDC: the tombstone commit is pure deletes, exactly the dead keys
    ch = [(r["k"], r["_change_type"])
          for r in table_changes(spark, path, 1, 2).collect()]
    assert all(t == "delete" for _, t in ch)
    assert sorted(k for k, _ in ch) == sorted(
        r["k"] for r in dead.collect()
    )

    # a merge folds ONLY its touched buckets' tombstones
    merge_table(
        spark,
        path,
        spark.createDataFrame([(1, 99, "upd")], "k bigint, g bigint, v string"),
    )
    doc = _read_manifest(path, 3)
    assert 0 < len(doc["tombstones"]) < 8
    assert sorted(r["k"] for r in read_table(spark, path).collect()) == want

    # deleting an already-deleted / absent key is a no-op
    delete_keys(spark, path, spark.createDataFrame([(7,), (123456,)], "k bigint"))
    assert sorted(r["k"] for r in read_table(spark, path).collect()) == want

    # OPTIMIZE folds everything; the fold is invisible to CDC
    v_before = 4
    v_after = optimize_table(spark, path, "g")
    assert not _read_manifest(path, v_after).get("tombstones")
    assert table_changes(spark, path, v_before, v_after).count() == 0
    assert sorted(r["k"] for r in read_table(spark, path).collect()) == want

    # vacuum with the tombstoned version retained keeps its files
    from video_streamer_spark.operators.table_format import vacuum

    vacuum(path, keep_last=4, min_age_sec=0.0)
    assert (
        sorted(r["k"] for r in read_table(spark, path, version=4).collect())
        == want
    )


def test_delete_keys_occ_and_idempotency(spark, tmp_path, monkeypatch):
    from video_streamer_spark.operators import table_format as tf
    from video_streamer_spark.operators.table_format import delete_keys

    path = str(tmp_path / "t")
    create_table(
        spark.range(0, 100).selectExpr("id AS k", "concat('v', id) AS v"),
        path,
        ["k"],
        n_buckets=4,
    )
    # replayed epoch: same idempotency key is a no-op
    keys = spark.createDataFrame([(5,)], "k bigint")
    v = delete_keys(spark, path, keys, idempotency_key="ck:0")
    assert delete_keys(spark, path, keys, idempotency_key="ck:0") == v

    # keys routed ONLY to data-less buckets are a no-op: no version
    # churn, no orphan commit (existence inside a data bucket is NOT
    # checked — that would cost a read; such deletes commit a harmless
    # tombstone instead)
    t2 = str(tmp_path / "t2")
    create_table(
        spark.createDataFrame([(0, "x")], "k bigint, v string"),
        t2,
        ["k"],
        n_buckets=32,
    )
    probe = spark.createDataFrame([(i,) for i in range(1, 40)], "k bigint")
    routed = {
        r["k"]: r[tf.BUCKET_COL]
        for r in tf._bucketed(probe, ["k"], 32).collect()
    }
    b0 = tf._bucketed(
        spark.createDataFrame([(0,)], "k bigint"), ["k"], 32
    ).collect()[0][tf.BUCKET_COL]
    miss = next(k for k, b in routed.items() if b != b0)
    assert delete_keys(
        spark, t2, spark.createDataFrame([(miss,)], "k bigint")
    ) == 1
    assert current_version(t2) == 1

    # OCC: a REAL interleaved race — a merge commits between
    # delete_keys' manifest read and its manifest link (injected at the
    # tombstone-routing step). Since round 9, a loser whose buckets are
    # DISJOINT from the winner's REBASES and lands (see
    # test_log_store_faults rebase coverage); to get a genuine loud
    # conflict the race must touch the SAME bucket, so the racing merge
    # upserts the very key the delete targets.
    orig = tf._bucketed
    state = {"raced": False}

    def racing(df, key_cols, n):
        if not state["raced"]:
            state["raced"] = True  # set FIRST: the nested merge recurses
            merge_table(
                spark,
                path,
                spark.createDataFrame([(9, "race")], "k bigint, v string"),
            )
        return orig(df, key_cols, n)

    monkeypatch.setattr(tf, "_bucketed", racing)
    with pytest.raises(VersionConflictError):
        delete_keys(spark, path, spark.createDataFrame([(9,)], "k bigint"))
    monkeypatch.setattr(tf, "_bucketed", orig)

    # the winner's upsert is live, the loser's delete never applied,
    # and a clean retry (re-reading the new current version) succeeds
    snap = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    assert snap[9] == "race"
    v2 = delete_keys(spark, path, spark.createDataFrame([(9,)], "k bigint"))
    assert v2 == current_version(path)
    assert 9 not in {r["k"] for r in read_table(spark, path).collect()}


def test_streaming_cdf_sees_tombstone_deletes_and_replication_converges(
    spark, tmp_path
):
    """A delete_keys commit changes rows WITHOUT repointing any bucket
    dir: the stream's candidate set must come from the (pointer,
    tombstone-list) pair, and the task-side diff must load each side
    minus its tombstones — otherwise the feed silently misses deletes
    and a replica diverges forever."""
    from video_streamer_spark.operators.table_format import (
        delete_keys,
        merge_table,
        read_table,
    )
    from video_streamer_spark.sources.cdf_source import (
        register_cdf_source,
        replicate_table,
    )
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    create_table(
        spark.range(0, 120).selectExpr("id AS k", "concat('v', id) AS v"),
        path,
        ["k"],
        n_buckets=4,
    )
    register_cdf_source(spark)

    def drain():
        q = (
            spark.readStream.format("table_cdf")
            .option("path", path)
            .option("startingVersion", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 120, "cdf_drain")

    merge_table(
        spark, path, spark.createDataFrame([(500, "new")], "k bigint, v string")
    )
    drain()  # window 1->2: the insert
    delete_keys(
        spark, path, spark.createDataFrame([(3,), (500,), (9999,)], "k bigint")
    )
    drain()  # window 2->3: tombstone-only commit (no pointer changes)
    rows = sorted(
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [
        (3, "delete", 3),
        (500, "delete", 3),
        (500, "insert", 2),
    ], rows

    # replication applies the deletes and converges exactly
    dst = str(tmp_path / "dst")
    create_table(
        spark.createDataFrame([], "k bigint, v string"), dst, ["k"],
        n_buckets=4,
    )
    replicate_table(spark, path, dst, str(tmp_path / "repck"))
    a = sorted(tuple(r) for r in read_table(spark, path).collect())
    b = sorted(tuple(r) for r in read_table(spark, dst).collect())
    assert a == b and len(a) == 119


def test_delete_then_rebucket_folds_tombstones_layout_only(spark, tmp_path):
    """delete_keys → rebucket_table: the rebucket snapshot reads
    EFFECTIVELY, so the new layout materializes the deletes and carries
    no tombstones — while staying honestly layout_only (effective rows
    identical before/after the fold). A CDC window spanning the delete
    AND the rebucket cannot pair buckets by id (the key→bucket map
    changed), so it must fall back to the endpoint key-diff and still
    emit exactly the deletes; replication across the same window must
    converge."""
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        delete_keys,
        rebucket_table,
        table_changes,
    )
    from video_streamer_spark.sources.cdf_source import (
        register_cdf_source,
        replicate_table,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 200).selectExpr("id AS k", "concat('v', id) AS v")
    create_table(df, path, ["k"], n_buckets=4)
    delete_keys(
        spark, path, spark.range(0, 200).where("id % 5 = 0").selectExpr("id AS k")
    )  # v2: tombstones in every bucket
    v3 = rebucket_table(spark, path, 16)  # v3: fold + re-hash, one commit
    doc = _read_manifest(path, v3)
    assert doc["n_buckets"] == 16 and not doc.get("tombstones")
    assert doc.get("layout_only") is True
    want = sorted(i for i in range(200) if i % 5 != 0)
    assert sorted(r["k"] for r in read_table(spark, path).collect()) == want

    # batch diff across delete+rebucket: key-exact fallback, deletes only
    ch = [(r["k"], r["_change_type"])
          for r in table_changes(spark, path, 1, 3).collect()]
    assert all(t == "delete" for _, t in ch)
    assert sorted(k for k, _ in ch) == [i for i in range(200) if i % 5 == 0]
    # the rebucket-only window stays invisible
    assert table_changes(spark, path, 2, 3).count() == 0

    # replication across the folded history converges exactly
    register_cdf_source(spark)
    dst = str(tmp_path / "dst")
    create_table(
        spark.createDataFrame([], "k bigint, v string"), dst, ["k"],
        n_buckets=4,
    )
    replicate_table(spark, path, dst, str(tmp_path / "repck"))
    b = sorted(r["k"] for r in read_table(spark, dst).collect())
    assert b == want


def test_tombstone_broadcast_hint_is_size_gated(spark, tmp_path, monkeypatch):
    """Under the byte cap the dead-key anti-join is broadcast (no
    Exchange on the key side); past it (cap forced to 0) the hint is
    dropped — a TB-scale bulk delete must not be forced driver-side."""
    from video_streamer_spark.operators import table_format as tf

    path = str(tmp_path / "t")
    create_table(
        spark.range(0, 300).selectExpr("id AS k", "concat('v', id) AS v"),
        path,
        ["k"],
        n_buckets=4,
    )
    tf.delete_keys(
        spark, path, spark.createDataFrame([(1,), (2,)], "k bigint")
    )
    # a TINY single-key delete set folds into the scan as a NOT-isin
    # predicate: no join stage at all, still exact
    inline = tf.read_table(spark, path)
    assert "Join" not in inline._jdf.queryExecution().analyzed().toString()
    assert sorted(r["k"] for r in inline.collect()) == [0] + list(
        range(3, 300)
    )
    # past the inline gate: the anti-join path, broadcast-hinted under
    # the byte cap. The FORCED hint shows as a hint node in the
    # analyzed plan (the physical join may be broadcast either way on a
    # tiny test table — Spark's own cost model is allowed to pick it
    # when un-hinted)
    monkeypatch.setattr(tf, "_TOMBSTONE_INLINE_MAX_BYTES", 0)
    plan_small = tf.read_table(spark, path)._jdf.queryExecution() \
        .analyzed().toString()
    assert "hint" in plan_small.lower()

    monkeypatch.setattr(tf, "_TOMBSTONE_BROADCAST_MAX_BYTES", 0)
    df = tf.read_table(spark, path)
    plan_big = df._jdf.queryExecution().analyzed().toString()
    assert "hint" not in plan_big.lower()
    # and the un-hinted plan still reads exactly
    assert sorted(r["k"] for r in df.collect()) == [0] + list(range(3, 300))


def test_random_merge_delete_layout_sequence_matches_dict_model(
    spark, store_path
):
    """Model-based check over the WHOLE lifecycle: a seeded-random
    interleaving of merge_table, delete_keys (tombstones, including
    already-dead and never-present keys), optimize_table and
    rebucket_table must leave exactly the dict-model state at EVERY
    committed version (time travel re-reads full history), and
    table_changes over random version pairs must equal the model's
    netted key diff — regardless of how many tombstone/fold/layout
    boundaries the window spans. Two mid-sequence ``maintain_table``
    calls interleave advisor-recommended maintenance to prove it never
    changes any query result (round-8 VERDICT item 7); since
    maintenance may add layout commits, the model is tracked as
    (version, state) checkpoints rather than a 1:1 version list."""
    import random

    from video_streamer_spark.operators.table_format import (
        analyze_table,
        delete_keys,
        maintain_table,
        optimize_table,
        rebucket_table,
        table_changes,
    )

    rng = random.Random(0xBEEF)
    path = store_path
    keys = list(range(40))
    base_rows = [(k, float(k * 10)) for k in keys if k % 2 == 0]
    create_table(
        spark.createDataFrame(base_rows, "k bigint, v double"),
        path,
        ["k"],
        n_buckets=4,
    )
    model = dict(base_rows)
    checkpoints = [(1, dict(model))]
    n_buckets = 4

    for step in range(12):
        roll = rng.random()
        if roll < 0.45:  # merge: upserts + deletes in one changeset
            cs_rows = []
            for k in rng.sample(keys, rng.randint(1, 6)):
                op = rng.choice(["U", "I", "D"])
                cs_rows.append((k, float(rng.randint(0, 999)), op))
                if op == "D":
                    model.pop(k, None)
                else:
                    model[k] = cs_rows[-1][1]
            merge_table(
                spark,
                path,
                spark.createDataFrame(
                    cs_rows, "k bigint, v double, __op string"
                ),
                # exercise both delete economics: eager bucket rewrite
                # and single-commit tombstoning of pure-delete buckets
                tombstone_pure_deletes=rng.random() < 0.5,
            )
        elif roll < 0.75:  # tombstone delete: live, dead + absent keys
            dead = rng.sample(keys, rng.randint(1, 5)) + [999 + step]
            delete_keys(
                spark,
                path,
                spark.createDataFrame([(k,) for k in dead], "k bigint"),
            )
            for k in dead:
                model.pop(k, None)
        elif roll < 0.9:  # layout: value-sorted rewrite (folds all debt)
            optimize_table(spark, path, "v")
        else:  # layout: re-hash every key
            n_buckets = 8 if n_buckets == 4 else 4
            rebucket_table(spark, path, n_buckets)
        checkpoints.append((current_version(path), dict(model)))
        if step in (4, 9):
            # advisor-recommended maintenance mid-lifecycle: whatever
            # it decides to do must be semantically invisible
            report = maintain_table(spark, path)
            # a skew rebucket changes the layout under the sequence;
            # resync so the next random rebucket stays a real change
            n_buckets = analyze_table(path)["n_buckets"]
            assert report["version_after"] >= report["version_before"]
            checkpoints.append((current_version(path), dict(model)))

    versions = history(path)
    assert versions == list(range(1, len(versions) + 1))
    assert {v for v, _ in checkpoints} <= set(versions)
    for v, want in checkpoints:
        got = {
            r["k"]: r["v"]
            for r in read_table(spark, path, version=v).collect()
        }
        assert got == want, f"version {v} diverged from the model"

    # netted change feed over random windows == model key diff
    for _ in range(6):
        ia, ib = sorted(rng.sample(range(len(checkpoints)), 2))
        (va, a), (vb, b) = checkpoints[ia], checkpoints[ib]
        if va == vb:
            continue
        want_diff = {}
        for k in set(a) | set(b):
            if k not in a:
                want_diff[k] = ("insert", b[k])
            elif k not in b:
                want_diff[k] = ("delete", a[k])
            elif a[k] != b[k]:
                want_diff[k] = ("update_postimage", b[k])
        got_diff = {
            r["k"]: (r["_change_type"], r["v"])
            for r in table_changes(spark, path, va, vb).collect()
        }
        assert got_diff == want_diff, f"window v{va}->v{vb} diverged"


def test_merge_tombstone_pure_deletes_single_commit(spark, tmp_path):
    """tombstone_pure_deletes=True: in ONE commit, buckets with any
    upsert rewrite (folding their debt) while pure-delete buckets keep
    their dir pointer and gain a tombstone ref — delete_keys economics
    with merge_table atomicity. CDC must emit exactly the changeset;
    replay must be a no-op; OPTIMIZE folds everything."""
    from video_streamer_spark.operators.merge import BUCKET_COL, _bucketed
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        optimize_table,
        table_changes,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 400).selectExpr("id AS k", "concat('v', id) AS v")
    create_table(df, path, ["k"], n_buckets=8)

    # route every key: pick an upsert bucket and two delete-only buckets
    routed = {
        r["k"]: r[BUCKET_COL]
        for r in _bucketed(
            spark.range(0, 400).selectExpr("id AS k"), ["k"], 8
        ).collect()
    }
    by_bucket: dict = {}
    for k, b in routed.items():
        by_bucket.setdefault(b, []).append(k)
    buckets = sorted(by_bucket)
    up_b, del_b1, del_b2 = buckets[0], buckets[1], buckets[2]
    up_key = by_bucket[up_b][0]
    dels = by_bucket[del_b1][:3] + by_bucket[del_b2][:3]
    cs = spark.createDataFrame(
        [(up_key, "upd", "U")] + [(k, None, "D") for k in dels],
        "k bigint, v string, __op string",
    )
    doc1 = _read_manifest(path, 1)
    v = merge_table(
        spark, path, cs, idempotency_key="m:0", tombstone_pure_deletes=True
    )
    assert v == 2
    doc2 = _read_manifest(path, 2)
    # upsert bucket repointed, delete-only buckets kept by reference
    assert doc2["buckets"][str(up_b)] != doc1["buckets"][str(up_b)]
    for b in (del_b1, del_b2):
        assert doc2["buckets"][str(b)] == doc1["buckets"][str(b)]
    assert sorted(doc2["tombstones"]) == sorted([str(del_b1), str(del_b2)])

    # snapshot: upsert applied, deletes effective
    snap = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    assert snap[up_key] == "upd"
    assert not set(dels) & set(snap)
    assert len(snap) == 400 - len(dels)

    # CDC of the single commit = exactly the changeset
    ch = {
        r["k"]: r["_change_type"]
        for r in table_changes(spark, path, 1, 2).collect()
    }
    assert ch == {up_key: "update_postimage", **{k: "delete" for k in dels}}

    # replayed epoch: idempotency key spans both shapes
    assert merge_table(
        spark, path, cs, idempotency_key="m:0", tombstone_pure_deletes=True
    ) == 2

    # a pure-delete-only changeset repoints NOTHING
    more = by_bucket[del_b1][3:5]
    cs2 = spark.createDataFrame(
        [(k, None, "D") for k in more], "k bigint, v string, __op string"
    )
    merge_table(spark, path, cs2, tombstone_pure_deletes=True)
    doc3 = _read_manifest(path, 3)
    assert doc3["buckets"] == doc2["buckets"]
    assert len(doc3["tombstones"][str(del_b1)]) == 2

    # OPTIMIZE folds all debt; rows unchanged
    v4 = optimize_table(spark, path, "v")
    assert not _read_manifest(path, v4).get("tombstones")
    want = {k: ("upd" if k == up_key else f"v{k}")
            for k in range(400) if k not in set(dels) | set(more)}
    got = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    assert got == want


def test_tombstone_debt_cap_forces_fold(spark, tmp_path):
    """A delete-heavy CDC feed must not grow tombstone lists without
    bound: once a bucket holds _TOMBSTONE_MAX_REFS refs, the next
    tombstoning merge rewrites it (folding ALL its debt), and a
    deletes-only changeset against data-less buckets commits nothing."""
    from video_streamer_spark.operators import table_format as tf
    from video_streamer_spark.operators.merge import BUCKET_COL, _bucketed
    from video_streamer_spark.operators.table_format import _read_manifest

    path = str(tmp_path / "t")
    create_table(
        spark.range(0, 200).selectExpr("id AS k", "concat('v', id) AS v"),
        path,
        ["k"],
        n_buckets=1,  # one bucket: every delete is a pure-delete there
    )
    dead = iter(range(200))
    for i in range(tf._TOMBSTONE_MAX_REFS):
        v = merge_table(
            spark,
            path,
            spark.createDataFrame(
                [(next(dead), None, "D")], "k bigint, v string, __op string"
            ),
            tombstone_pure_deletes=True,
        )
        doc = _read_manifest(path, v)
        assert len(doc["tombstones"]["0"]) == i + 1
        assert doc["buckets"] == _read_manifest(path, 1)["buckets"]

    # at the cap: the next tombstoning merge folds via rewrite
    v = merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(next(dead), None, "D")], "k bigint, v string, __op string"
        ),
        tombstone_pure_deletes=True,
    )
    doc = _read_manifest(path, v)
    assert not doc.get("tombstones")
    assert doc["buckets"] != _read_manifest(path, 1)["buckets"]
    n_dead = tf._TOMBSTONE_MAX_REFS + 1
    assert read_table(spark, path).count() == 200 - n_dead

    # deletes-only changeset routed ONLY to data-less buckets: no commit
    t2 = str(tmp_path / "t2")
    create_table(
        spark.createDataFrame([(0, "x")], "k bigint, v string"),
        t2,
        ["k"],
        n_buckets=32,
    )
    b0 = _bucketed(
        spark.createDataFrame([(0,)], "k bigint"), ["k"], 32
    ).collect()[0][BUCKET_COL]
    routed = {
        r["k"]: r[BUCKET_COL]
        for r in _bucketed(
            spark.createDataFrame([(i,) for i in range(1, 40)], "k bigint"),
            ["k"],
            32,
        ).collect()
    }
    miss = next(k for k, b in routed.items() if b != b0)
    assert merge_table(
        spark,
        t2,
        spark.createDataFrame(
            [(miss, None, "D")], "k bigint, v string, __op string"
        ),
        tombstone_pure_deletes=True,
    ) == 1
    assert current_version(t2) == 1


def test_crashed_tombstone_commit_is_invisible_and_vacuumed(
    spark, tmp_path, monkeypatch
):
    """A delete_keys that dies AFTER writing its tombstone files but
    BEFORE linking the manifest published nothing: readers see the
    pre-delete rows, a replay commits cleanly, and vacuum reclaims the
    orphan commit dir once it ages past the in-flight window."""
    from video_streamer_spark.operators import table_format as tf

    path = str(tmp_path / "t")
    create_table(
        spark.range(0, 100).selectExpr("id AS k", "concat('v', id) AS v"),
        path,
        ["k"],
        n_buckets=4,
    )

    def boom(*a, **k):
        raise RuntimeError("crash before manifest link")

    monkeypatch.setattr(tf, "_commit_manifest", boom)
    with pytest.raises(RuntimeError):
        tf.delete_keys(
            spark, path, spark.createDataFrame([(5,)], "k bigint")
        )
    monkeypatch.undo()

    # nothing published: full pre-delete snapshot, version unchanged
    assert current_version(path) == 1
    assert read_table(spark, path).count() == 100
    # the orphan tombstone dir exists but is referenced by no manifest
    data = os.path.join(path, "data")
    orphans = {
        d
        for d in os.listdir(data)
        if f"data/{d}" not in
        {r.split(f"/{tf.BUCKET_COL}=")[0]
         for r in tf._read_manifest(path, 1)["buckets"].values()}
    }
    assert orphans

    # replay after the crash commits cleanly
    v = tf.delete_keys(spark, path, spark.createDataFrame([(5,)], "k bigint"))
    assert v == 2
    assert read_table(spark, path).count() == 99

    # vacuum with min_age 0 sweeps the crashed dir, keeps live refs
    tf.vacuum(path, keep_last=2, min_age_sec=0.0)
    live = set()
    for ver in (1, 2):
        doc = tf._read_manifest(path, ver)
        for rel in doc["buckets"].values():
            live.add(rel.split(f"/{tf.BUCKET_COL}=")[0].split("/", 1)[1])
        for refs in doc.get("tombstones", {}).values():
            for rel in refs:
                live.add(rel.split(f"/{tf.BUCKET_COL}=")[0].split("/", 1)[1])
    assert set(os.listdir(data)) == live
    assert read_table(spark, path).count() == 99


def test_streaming_cdf_vacuumed_start_offset_names_the_remedy(
    spark, tmp_path
):
    """If vacuum drops the manifest at a stream's checkpointed start
    offset, the stream must fail with an actionable message (fresh
    checkpoint / raise keep_last), not a raw FileNotFoundError
    crash-loop (ADVICE r7). Exercised at the reader layer — the same
    partitions() call the data-source runner makes."""
    from pyspark.sql.types import StructType

    from video_streamer_spark.sources.cdf_source import _CdfStreamReader

    path = str(tmp_path / "t")
    create_table(
        spark.range(0, 20).select(F.col("id").alias("k")), path, ["k"], 4
    )
    for i in range(3):
        merge_table(
            spark,
            path,
            spark.createDataFrame([(100 + i, "U")], ["k", "__op"]),
        )
    vacuum(path, keep_last=1, min_age_sec=0.0)
    assert history(path) == [4]
    doc_schema = read_table(spark, path).schema
    feed_schema = StructType(
        doc_schema.fields
        + StructType.fromDDL(
            "_change_type string, _commit_version bigint"
        ).fields
    )
    reader = _CdfStreamReader(path, feed_schema, start_version=0)
    with pytest.raises(RuntimeError, match="removed by vacuum"):
        reader.partitions({"v": 2}, {"v": 4})


def test_zorder_optimize_prunes_both_dimensions(spark, tmp_path):
    """OPTIMIZE zorder_by=(a, b) must (1) keep the rows bit-identical,
    (2) make single-column range reads on EITHER column open fewer
    files than the full snapshot (the 2-D zone-map box property a
    value sort cannot give), and (3) stay invisible to the change feed
    (layout_only commit) — round-7 VERDICT item 8."""
    from video_streamer_spark.operators.table_format import (
        optimize_table,
        read_table_where,
        table_changes,
    )

    path = str(tmp_path / "t")
    orders = _orders(spark)  # o_orderkey, o_custkey, o_totalprice
    create_table(orders, path, ["o_orderkey"], n_buckets=4)
    with pytest.raises(ValueError, match="exactly one"):
        optimize_table(spark, path)
    v = optimize_table(
        spark,
        path,
        zorder_by=("o_custkey", "o_totalprice"),
        files_per_bucket=8,
    )
    # (1) rows identical across the rewrite
    assert _rows(read_table(spark, path)) == _rows(orders)
    full_files = len(read_table(spark, path).inputFiles())
    # (2) both dimensions prune: narrow range on each column
    r_cust = read_table_where(spark, path, "o_custkey", lo=10, hi=40)
    r_price = read_table_where(
        spark, path, "o_totalprice", lo=50000.0, hi=60000.0
    )
    assert len(r_cust.inputFiles()) < full_files
    assert len(r_price.inputFiles()) < full_files
    # pruned reads stay EXACT
    assert r_cust.count() == orders.where(
        "o_custkey between 10 and 40"
    ).count()
    assert r_price.count() == orders.where(
        "o_totalprice between 50000.0 and 60000.0"
    ).count()
    # (3) the zorder commit is layout-only: CDC sees nothing
    assert table_changes(spark, path, v - 1, v).count() == 0


def test_pre_evolution_merge_preserves_materialized_columns(
    spark, tmp_path
):
    """A changeset written BEFORE an add_column (missing that column)
    must preserve the base row's materialized value on update — Delta
    MERGE semantics for columns absent from the source — instead of
    null-overwriting it (ADVICE r7). New keys from the same feed still
    null-backfill."""
    from video_streamer_spark.operators.table_format import add_column

    path = str(tmp_path / "t")
    create_table(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k bigint, v string"
        ),
        path,
        ["k"],
        n_buckets=2,
    )
    add_column(path, "score", "double")
    # materialize a real score for k=1 via a post-evolution merge
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a2", 7.5)], "k bigint, v string, score double"
        ),
    )
    # pre-evolution feed: no score column; updates k=1, inserts k=3
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a3"), (3, "c")], "k bigint, v string"
        ),
    )
    got = {r["k"]: (r["v"], r["score"]) for r in read_table(spark, path).collect()}
    assert got[1] == ("a3", 7.5)  # updated v, PRESERVED score
    assert got[2] == ("b", None)  # untouched pre-evolution row
    assert got[3] == ("c", None)  # new key: null backfill


def test_streaming_cdf_chaos_matches_batch_diff_per_commit(
    spark, tmp_path
):
    """CHAOS: a seeded-random interleaving of merge_table, delete_keys,
    optimize_table (sort AND zorder) and rebucket_table, with a LIVE
    format('table_cdf') stream drained per commit against one
    checkpoint lineage — each drain's rows must equal the batch
    table_changes over exactly that window, every query restart picks
    up from the checkpointed offset (each availableNow drain IS a
    restart; one mid-lifecycle drain is additionally forced to cover a
    multi-commit window, exercising the netting contract), and the
    union of all feed windows replays to the final snapshot (round-7
    VERDICT item 5).

    SCHEMA EVOLUTION MID-STREAM (round-8 VERDICT item 2): one step is
    an ``add_column`` whose drain is deliberately skipped, so the next
    drain — a RESTART that picks up the evolved declared schema —
    must net a window whose START manifest predates the evolution: the
    classic CDC trap where the two endpoint manifests disagree on
    columns. Old-side rows null-backfill the new column (matching the
    r8 batch-side fix), post-evolution merges carry real values in it,
    and every stream-vs-batch compare and the final replay include the
    evolved column."""
    import random

    from video_streamer_spark.operators.table_format import (
        add_column,
        delete_keys,
        optimize_table,
        rebucket_table,
        table_changes,
    )
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    rng = random.Random(0xC0FFEE)
    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    keys = list(range(48))
    base_rows = [(k, float(k)) for k in keys if k % 3 != 2]
    create_table(
        spark.createDataFrame(base_rows, "k bigint, v double"),
        path,
        ["k"],
        n_buckets=4,
    )
    register_cdf_source(spark)
    evolve_at = 4  # the add_column step; its drain is skipped too
    evolved = False

    def drain():
        q = (
            spark.readStream.format("table_cdf")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 180, "cdf_chaos_drain")

    def _with_w(df):
        # pre-evolution parquet files / pre-evolution change windows
        # have no w column; normalize both compare sides to (k, v, w)
        if "w" not in df.columns:
            df = df.withColumn("w", F.lit(None).cast("long"))
        return df

    def feed_rows(v_from, v_to):
        return sorted(
            (r["k"], r["v"], r["w"], r["_change_type"])
            for r in _with_w(
                spark.read.option("mergeSchema", "true").parquet(out)
            )
            .where(
                (F.col("_commit_version") > v_from)
                & (F.col("_commit_version") <= v_to)
            )
            .collect()
        )

    def batch_rows(v_from, v_to):
        return sorted(
            (r["k"], r["v"], r["w"], r["_change_type"])
            for r in _with_w(
                table_changes(spark, path, v_from, v_to)
            ).collect()
        )

    drain()  # initial snapshot window (0, 1]
    assert len(feed_rows(0, 1)) == len(base_rows)
    model = {k: (v, None) for k, v in base_rows}
    last_v = 1
    # one randomly chosen step skips its drain so the NEXT drain nets a
    # multi-commit window — the netting path a per-commit loop would
    # otherwise never exercise
    skip_drain_at = rng.randint(2, 9)
    for step in range(12):
        if step == evolve_at:
            add_column(path, "w", "bigint")
            evolved = True
            continue  # skip the drain: the next window SPANS the evolution
        roll = rng.random()
        if roll < 0.40:  # merge with mixed ops
            cs = []
            with_w = evolved and rng.random() < 0.7
            for k in rng.sample(keys, rng.randint(1, 6)):
                op = rng.choice(["U", "I", "D"])
                w_val = rng.randint(0, 9) if with_w else None
                row = (k, float(rng.randint(0, 99)))
                cs.append(row + ((w_val, op) if with_w else (op,)))
                if op == "D":
                    model.pop(k, None)
                else:
                    model[k] = (row[1], w_val)
            merge_table(
                spark,
                path,
                spark.createDataFrame(
                    cs,
                    "k bigint, v double, w bigint, __op string"
                    if with_w
                    else "k bigint, v double, __op string",
                ),
            )
        elif roll < 0.65:  # tombstone deletes (incl. absent keys)
            dead = rng.sample(keys, rng.randint(1, 5))
            delete_keys(
                spark,
                path,
                spark.createDataFrame([(k,) for k in dead], "k bigint"),
            )
            for k in dead:
                model.pop(k, None)
        elif roll < 0.80:
            optimize_table(spark, path, sort_by="v")
        elif roll < 0.90:
            optimize_table(
                spark, path, zorder_by=("k", "v"), files_per_bucket=2
            )
        else:
            rebucket_table(spark, path, current_version(path) % 3 + 4)
        new_v = current_version(path)
        if step == skip_drain_at:
            continue  # leave this commit for the next drain to net
        drain()
        assert feed_rows(last_v, new_v) == batch_rows(last_v, new_v), (
            step, last_v, new_v,
        )
        last_v = new_v
    drain()  # pick up tails left by the skipped step / the evolution
    final_v = current_version(path)
    assert feed_rows(last_v, final_v) == batch_rows(last_v, final_v)
    # replaying every feed window reconstructs the final snapshot,
    # evolved column included
    replay: dict = {}
    for r in sorted(
        _with_w(
            spark.read.option("mergeSchema", "true").parquet(out)
        ).collect(),
        key=lambda r: r["_commit_version"],
    ):
        if r["_change_type"] == "delete":
            replay.pop(r["k"], None)
        else:
            replay[r["k"]] = (r["v"], r["w"])
    assert replay == model
    assert {
        r["k"]: (r["v"], r["w"])
        for r in read_table(spark, path).collect()
    } == model
    # the evolution really was spanned by a netted window: some feed
    # rows carry a real w (post-evolution merges fired with 70%
    # probability over 7 steps — vanishing odds of all-None)
    assert evolved
    assert any(
        r["w"] is not None
        for r in _with_w(
            spark.read.option("mergeSchema", "true").parquet(out)
        ).collect()
    ), "no post-evolution merge carried the new column"


def test_multi_predicate_read_prunes_conjunctively(spark, tmp_path):
    """where=[(col, lo, hi), ...] must open only files BOTH predicates
    can hit (strictly fewer than either predicate alone on a Z-ordered
    layout), keep the result exact, and anti-join tombstones like any
    other read."""
    from video_streamer_spark.operators.table_format import (
        delete_keys,
        optimize_table,
        read_table_where,
    )

    path = str(tmp_path / "t")
    orders = _orders(spark)
    create_table(orders, path, ["o_orderkey"], n_buckets=4)
    optimize_table(
        spark,
        path,
        zorder_by=("o_custkey", "o_totalprice"),
        files_per_bucket=8,
    )
    preds = [("o_custkey", 10, 40), ("o_totalprice", 50000.0, 60000.0)]
    both = read_table_where(spark, path, where=preds)
    only_a = read_table_where(spark, path, "o_custkey", 10, 40)
    only_b = read_table_where(
        spark, path, "o_totalprice", 50000.0, 60000.0
    )
    assert len(both.inputFiles()) <= min(
        len(only_a.inputFiles()), len(only_b.inputFiles())
    )
    want = orders.where(
        "o_custkey between 10 and 40 "
        "and o_totalprice between 50000.0 and 60000.0"
    )
    assert _rows(both) == _rows(want)
    # exactness survives merge-on-read deletes
    delete_keys(
        spark,
        path,
        orders.where("o_orderkey % 5 = 0").select("o_orderkey"),
    )
    got = read_table_where(spark, path, where=preds)
    assert _rows(got) == _rows(want.where("o_orderkey % 5 <> 0"))


def test_streaming_cdf_starting_version_latest_skips_snapshot(
    spark, tmp_path
):
    """startingVersion='latest' subscribes to changes only: the first
    drain over an unchanged table delivers nothing (no initial
    snapshot), and a subsequent merge delivers exactly that commit's
    delta on the same checkpoint lineage."""
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    create_table(
        spark.range(0, 30).select(F.col("id").alias("k")), path, ["k"], 4
    )
    register_cdf_source(spark)

    def drain():
        q = (
            spark.readStream.format("table_cdf")
            .option("path", path)
            .option("startingVersion", "latest")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 120, "cdf_latest_drain")

    drain()
    import os as _os

    assert (
        not _os.path.exists(out)
        or spark.read.parquet(out).count() == 0
    )
    merge_table(
        spark,
        path,
        spark.createDataFrame([(100, "I"), (3, "D")], ["k", "__op"]),
    )
    drain()
    got = sorted(
        (r["k"], r["_change_type"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(3, "delete"), (100, "insert")]


def test_analyze_table_flags_and_clears_maintenance_debt(spark, tmp_path):
    """The metadata-only maintenance report: commit churn must surface
    SMALL_FILES and TOMBSTONE_DEBT (no Spark job, no data read — pure
    manifest walk + file sizes), and an OPTIMIZE must clear both."""
    from video_streamer_spark.operators.table_format import (
        analyze_table,
        delete_keys,
        optimize_table,
    )

    path = str(tmp_path / "t")
    create_table(
        spark.range(0, 4000).selectExpr("id AS k", "id * 1.5 AS v"),
        path,
        ["k"],
        n_buckets=2,
    )
    # churn: several tiny merges fragment the buckets, repeated
    # delete_keys builds tombstone debt (delete_keys is uncapped)
    for i in range(4):
        merge_table(
            spark,
            path,
            spark.createDataFrame(
                [(10_000 + i, 1.0)], "k bigint, v double"
            ),
        )
    for i in range(8):
        delete_keys(
            spark,
            path,
            spark.createDataFrame([(i * 2,), (i * 2 + 1,)], "k bigint"),
        )
    spark.sparkContext.setJobGroup("analyze-probe", "analyze_table")
    try:
        report = analyze_table(path)
        jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(
            "analyze-probe"
        )
        assert jobs == [], "analyze_table must be metadata-only"
    finally:
        spark.sparkContext.setJobGroup("", "")
    codes = {c for c, _ in report["findings"]}
    assert "SMALL_FILES" in codes
    assert "TOMBSTONE_DEBT" in codes
    # OPTIMIZE compacts the files and folds every tombstone
    optimize_table(spark, path, sort_by="k", files_per_bucket=1)
    after = analyze_table(path)
    after_codes = {c for c, _ in after["findings"]}
    assert "SMALL_FILES" not in after_codes
    assert "TOMBSTONE_DEBT" not in after_codes
    # and the table still reads exactly
    assert read_table(spark, path).count() == 4000 + 4 - 16


def test_streaming_cdf_through_conditional_put_store(spark, tmp_path):
    """The WHOLE lifecycle off the POSIX commit primitive: a table
    whose manifests publish through the conditional-put store (no
    rename/link in the client protocol) must serve create → stream
    drain → merge → incremental drain identically — including the
    data-source runner process, which reads published entries as plain
    files regardless of which store published them."""
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    register_log_store(str(tmp_path), ConditionalPutLogStore())
    try:
        path = str(tmp_path / "t")
        out = str(tmp_path / "feed")
        ckpt = str(tmp_path / "ckpt")
        create_table(
            spark.range(0, 25).select(F.col("id").alias("k")),
            path,
            ["k"],
            4,
        )
        register_cdf_source(spark)

        def drain():
            q = (
                spark.readStream.format("table_cdf")
                .option("path", path)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            drain_or_raise(q, 120, "condput_cdf_drain")

        drain()
        assert spark.read.parquet(out).count() == 25
        merge_table(
            spark,
            path,
            spark.createDataFrame([(99, "I"), (3, "D")], ["k", "__op"]),
        )
        drain()
        inc = spark.read.parquet(out).where("_commit_version = 2")
        assert sorted(
            (r["k"], r["_change_type"]) for r in inc.collect()
        ) == [(3, "delete"), (99, "insert")]
        assert sorted(
            r["k"] for r in read_table(spark, path).collect()
        ) == [k for k in range(25) if k != 3] + [99]
    finally:
        unregister_log_store(str(tmp_path))


def test_streaming_cdf_bigint_nulls_stay_exact(spark, tmp_path):
    """An int64 column carrying BOTH a >2^53 value and a NULL in the
    same file must round-trip the feed bit-exactly: without a pyarrow
    types_mapper the null forces a float64 detour that corrupts the
    huge value before the nullable-Int64 cast can run (review r8)."""
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    big = 10**18 + 7  # unrepresentable in float64
    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(1, big), (2, None), (3, big + 13)], "k bigint, val bigint"
    )
    create_table(base, path, ["k"], n_buckets=2)
    register_cdf_source(spark)
    q = (
        spark.readStream.format("table_cdf")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, 120, "cdf_bigint_nulls")
    got = {
        r["k"]: r["val"] for r in spark.read.parquet(out).collect()
    }
    assert got == {1: big, 2: None, 3: big + 13}


def test_streaming_cdf_timestamps_are_instants_in_any_session_tz(
    spark, tmp_path
):
    """Feed timestamps must be INSTANTS: a consumer session running in
    a non-UTC timezone must read the same unix micros the batch reader
    does. The runner now stamps UTC on the naive wall times pyarrow
    reads from Spark's INT96 files, so the instant no longer depends on
    the data-source runner PROCESS timezone (review r8; on this UTC box
    the old naive path is environment-masked, which is exactly why the
    dependency had to go — correctness by construction, not by deploy
    environment). This test pins the non-UTC-session contract."""
    import datetime as dt

    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    ts = dt.datetime(2024, 6, 1, 10, 0, 0, tzinfo=dt.timezone.utc)
    base = spark.createDataFrame(
        [(1, ts), (2, ts + dt.timedelta(hours=3))], "k bigint, ts timestamp"
    )
    create_table(base, path, ["k"], n_buckets=2)
    register_cdf_source(spark)
    want = {
        r["k"]: r["us"]
        for r in read_table(spark, path)
        .select("k", F.unix_micros("ts").alias("us"))
        .collect()
    }
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        q = (
            spark.readStream.format("table_cdf")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 120, "cdf_tz_instants")
        got = {
            r["k"]: r["us"]
            for r in spark.read.parquet(out)
            .select("k", F.unix_micros("ts").alias("us"))
            .collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == want


def test_maintain_table_executes_advisor_recommendations(spark, tmp_path):
    """maintain_table must run exactly the clearing action for each of
    analyze_table's four finding families — and leave query results
    untouched (round-8 VERDICT item 7)."""
    from video_streamer_spark.operators.table_format import (
        _commit_manifest,
        _read_manifest,
        analyze_table,
        delete_keys,
        maintain_table,
    )

    # -- SMALL_FILES + TOMBSTONE_DEBT → one optimize clears both ------
    path = str(tmp_path / "debt")
    create_table(
        spark.range(0, 4000).selectExpr("id AS k", "id * 1.5 AS v"),
        path,
        ["k"],
        n_buckets=2,
    )
    for i in range(4):
        merge_table(
            spark,
            path,
            spark.createDataFrame([(10_000 + i, 1.0)], "k bigint, v double"),
        )
    for i in range(8):
        delete_keys(
            spark,
            path,
            spark.createDataFrame([(i * 2,), (i * 2 + 1,)], "k bigint"),
        )
    before_rows = _rows(read_table(spark, path))
    res = maintain_table(spark, path)
    assert [a for a, _ in res["actions"]] == ["optimize"]
    assert set(res["actions"][0][1]) == {"SMALL_FILES", "TOMBSTONE_DEBT"}
    codes_after = {c for c, _ in res["findings_after"]}
    assert not {"SMALL_FILES", "TOMBSTONE_DEBT"} & codes_after
    assert _rows(read_table(spark, path)) == before_rows, (
        "maintenance must be semantically invisible"
    )
    # vacuum as an opted-in action trims retained history
    assert len(history(path)) > 2
    res2 = maintain_table(spark, path, vacuum_keep_last=1,
                          vacuum_min_age_sec=0.0)
    assert ("vacuum", ["keep_last=1"]) in res2["actions"]
    assert len(history(path)) == 1
    assert _rows(read_table(spark, path)) == before_rows

    # -- BUCKET_SKEW → one bounded rebucket ---------------------------
    from video_streamer_spark.operators.merge import BUCKET_COL, _bucketed

    skew = str(tmp_path / "skew")
    base = spark.range(0, 3000).selectExpr(
        "id AS k", "repeat(md5(cast(id AS string)), 8) AS pad"
    )
    routed = _bucketed(base, ["k"], 4)
    # keep every row of bucket 0 plus a sliver of each other bucket:
    # bytes become [big, small, small, small] → max > 4x median
    # (incompressible md5 pad so parquet bytes track row counts)
    hot = routed.where(F.col(BUCKET_COL) == 0)
    cold = routed.where(
        (F.col(BUCKET_COL) != 0) & (F.col("k") % 83 == 0)
    )
    skewed = hot.unionByName(cold).drop(BUCKET_COL)
    create_table(skewed, skew, ["k"], n_buckets=4)
    # normalize file counts first so the ONLY finding is the skew
    from video_streamer_spark.operators.table_format import optimize_table

    optimize_table(spark, skew, sort_by="k", files_per_bucket=1)
    report = analyze_table(skew)
    assert "BUCKET_SKEW" in {c for c, _ in report["findings"]}
    before_rows = _rows(read_table(spark, skew))
    res = maintain_table(spark, skew)
    assert ("rebucket", ["BUCKET_SKEW"]) in res["actions"]
    assert analyze_table(skew)["n_buckets"] == 8
    assert _rows(read_table(spark, skew)) == before_rows
    # one step per call, never a loop: a second call may flag again but
    # must take at most one more rebucket, capped
    res_cap = maintain_table(spark, skew, max_buckets=8)
    assert ("rebucket", ["BUCKET_SKEW"]) not in res_cap["actions"], (
        "at the cap, maintain must not rebucket"
    )

    # -- NO_FILE_STATS (pre-feature manifest) → optimize re-profiles --
    nofs = str(tmp_path / "nofs")
    create_table(
        spark.range(0, 400).selectExpr("id AS k", "id * 2.0 AS v"),
        nofs,
        ["k"],
        n_buckets=4,
    )
    doc = _read_manifest(nofs, 1)
    assert doc["file_stats"], "create must profile per-file stats"
    doctored = dict(doc)
    doctored["file_stats"] = {
        b: s for b, s in doc["file_stats"].items() if b != "0"
    }
    _commit_manifest(nofs, 2, doctored)  # simulate a pre-feature commit
    assert "NO_FILE_STATS" in {
        c for c, _ in analyze_table(nofs)["findings"]
    }
    before_rows = _rows(read_table(spark, nofs))
    res = maintain_table(spark, nofs)
    opt = [codes for a, codes in res["actions"] if a == "optimize"]
    assert opt and "NO_FILE_STATS" in opt[0]
    assert "NO_FILE_STATS" not in {c for c, _ in res["findings_after"]}
    assert _rows(read_table(spark, nofs)) == before_rows

    # -- healthy table → strict no-op ---------------------------------
    # (create_table writes one file per shuffle task, so a fresh tiny
    # table legitimately flags SMALL_FILES; compact once to health)
    ok = str(tmp_path / "ok")
    create_table(
        spark.range(0, 2000).selectExpr("id AS k", "id * 1.0 AS v"),
        ok,
        ["k"],
        n_buckets=4,
    )
    optimize_table(spark, ok, sort_by="k", files_per_bucket=1)
    res = maintain_table(spark, ok)
    assert res["actions"] == []
    assert res["version_after"] == res["version_before"] == 2


# ---------------------------------------------------------------------------
# round 10: CDF pre-images + incremental view maintenance


def test_table_changes_preimages_widen_updates_only(spark, tmp_path):
    """include_preimages=True: each update emits BOTH images (old values
    on the preimage row), inserts/deletes are unchanged, carried-over
    and no-op-updated rows still emit nothing, and the default
    three-type feed is untouched."""
    from video_streamer_spark.operators.table_format import table_changes

    path = str(tmp_path / "t")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=8)
    changes = spark.createDataFrame(
        [
            (3, 99, "U"),  # real update: 3%7=3 -> 99
            (10, 10 % 7, "U"),  # no-op update: value unchanged
            (100, 1, "I"),
            (5, 0, "D"),
        ],
        ["k", "val", "__op"],
    ).withColumn("val", F.col("val").cast("long"))
    merge_table(spark, path, changes)

    four = sorted(
        (r["k"], r["val"], r["_change_type"])
        for r in table_changes(
            spark, path, 1, 2, include_preimages=True
        ).collect()
    )
    assert four == [
        (3, 3 % 7, "update_preimage"),
        (3, 99, "update_postimage"),
        (5, 5 % 7, "delete"),
        (100, 1, "insert"),
    ]
    three = sorted(
        (r["k"], r["val"], r["_change_type"])
        for r in table_changes(spark, path, 1, 2).collect()
    )
    assert three == [
        (3, 99, "update_postimage"),
        (5, 5 % 7, "delete"),
        (100, 1, "insert"),
    ]


def test_table_changes_preimages_through_tombstone_delete(spark, tmp_path):
    """Tombstone-only windows (delete_keys: pointer unchanged, debt
    grew) emit pre-image delete rows in BOTH modes — the four-type
    feed is a strict superset only on updates."""
    from video_streamer_spark.operators.table_format import (
        delete_keys,
        table_changes,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=4)
    delete_keys(spark, path, spark.createDataFrame([(7,), (21,)], ["k"]))
    for pre in (False, True):
        got = sorted(
            (r["k"], r["val"], r["_change_type"])
            for r in table_changes(
                spark, path, 1, 2, include_preimages=pre
            ).collect()
        )
        assert got == [(7, 21, "delete"), (21, 63, "delete")]


def test_incremental_agg_from_feed_equals_recompute(spark, tmp_path):
    """IVM invariance: a materialized aggregate maintained ONLY from
    the four-type feed (base at v1 + signed contributions) is bit-equal
    to recomputing against the final snapshot — across updates that
    move rows BETWEEN groups, inserts later updated, tombstone deletes,
    and a layout-only OPTIMIZE commit in the window."""
    from video_streamer_spark.operators.table_format import (
        delete_keys,
        optimize_table,
        table_changes,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("grp"),
        (F.col("id") * 10).alias("val"),
    )
    create_table(base, path, ["k"], n_buckets=8)
    # commit 2: move k%5==0 rows to group 9 (group-changing update),
    # insert 200..219 into group 1, delete k%7==1
    moved = (
        base.where("k % 5 = 0")
        .withColumn("grp", F.lit(9).cast("long"))
        .withColumn("__op", F.lit("U"))
    )
    ins = spark.range(200, 220).select(
        F.col("id").alias("k"),
        F.lit(1).cast("long").alias("grp"),
        (F.col("id") + 5).alias("val"),
        F.lit("I").alias("__op"),
    )
    dels = (
        # disjoint from the k%5=0 move set: one key must appear at
        # most once in a changeset (apply_changeset's contract)
        base.where("k % 7 = 1 AND k % 5 != 0")
        .withColumn("__op", F.lit("D"))
        .select("k", "grp", "val", "__op")
    )
    merge_table(spark, path, moved.unionByName(ins).unionByName(dels))
    # commit 3: layout-only — must contribute NOTHING to the feed
    optimize_table(spark, path, "val", files_per_bucket=2)
    # commit 4: tombstone-delete two of the fresh inserts
    delete_keys(spark, path, spark.createDataFrame([(205,), (211,)], ["k"]))
    # commit 5: bump every remaining inserted key's val (+1)
    merge_table(
        spark,
        path,
        spark.range(200, 220)
        .where("id NOT IN (205, 211)")
        .select(
            F.col("id").alias("k"),
            F.lit(1).cast("long").alias("grp"),
            (F.col("id") + 6).alias("val"),
            F.lit("U").alias("__op"),
        ),
    )

    v_to = current_version(path)
    basev1 = read_table(spark, path, version=1)
    base_agg = basev1.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"), F.sum("val").alias("s")
    )
    feed = table_changes(spark, path, 1, v_to, include_preimages=True)
    sign = (
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
    )
    delta = feed.groupBy("grp").agg(
        F.sum(sign).alias("dn"), F.sum(sign * F.col("val")).alias("ds")
    )
    maintained = (
        base_agg.join(delta, "grp", "full_outer")
        .select(
            "grp",
            (
                F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))
            ).alias("n"),
            (
                F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))
            ).alias("s"),
        )
        .where(F.col("n") > 0)
    )
    recomputed = (
        read_table(spark, path)
        .groupBy("grp")
        .agg(F.count("*").cast("long").alias("n"), F.sum("val").alias("s"))
    )
    assert _rows(maintained) == _rows(recomputed)


def test_table_changes_preimages_across_schema_evolution(spark, tmp_path):
    """A four-type window spanning add_column: the pre-image of an
    update is the OLD row projected to the TARGET schema — the evolved
    column null-backfilled — while the post-image carries the written
    value; an insert after the evolution never emits a pre-image."""
    from video_streamer_spark.operators.table_format import (
        add_column,
        table_changes,
    )

    path = str(tmp_path / "t")
    base = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=4)
    add_column(path, "score", "double")
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(4, 8, 0.5, "U"), (99, 1, 0.25, "I")],
            "k bigint, val bigint, score double, __op string",
        ),
    )
    got = sorted(
        (
            (r["k"], r["val"], r["score"], r["_change_type"])
            for r in table_changes(
                spark, path, 1, 3, include_preimages=True
            ).collect()
        ),
        key=repr,
    )
    assert got == sorted(
        [
            (4, 8, None, "update_preimage"),
            (4, 8, 0.5, "update_postimage"),
            (99, 1, 0.25, "insert"),
        ],
        key=repr,
    )


def test_vacuumed_version_reads_raise_named_error(spark, store_path):
    """A version behind the retention window raises the NAMED
    VersionVacuumedError — time travel, pruned reads, and BOTH
    table_changes endpoints — with the retained range in the message.
    A never-committed version stays a raw FileNotFoundError (corrupt
    log ≠ retention), and windows inside the retained range still
    work. (r10 verdict item: never read through a vacuum hole.)"""
    from video_streamer_spark.operators.table_format import (
        VersionVacuumedError,
        read_table_where,
        table_changes,
        vacuum,
    )

    path = store_path
    base = _orders(spark).where("o_orderkey % 4 = 0")
    create_table(base, path, ["o_orderkey"], n_buckets=4)
    for i in range(3):
        merge_table(
            spark,
            path,
            base.limit(10 * (i + 1)).withColumn(
                "o_totalprice", F.col("o_totalprice") + 1.0
            ).withColumn("__op", F.lit("U")),
        )
    assert history(path) == [1, 2, 3, 4]
    vacuum(path, keep_last=2, min_age_sec=0.0)

    with pytest.raises(VersionVacuumedError, match="removed by vacuum"):
        read_table(spark, path, version=1)
    with pytest.raises(VersionVacuumedError, match=r"retained versions are 3\.\.4"):
        read_table_where(
            spark, path, "o_orderkey", lo=0, hi=100, version=2
        )
    # both endpoints of a change window are user-addressed versions
    with pytest.raises(VersionVacuumedError, match="removed by vacuum"):
        table_changes(spark, path, 1, 4)
    with pytest.raises(VersionVacuumedError, match="removed by vacuum"):
        table_changes(spark, path, 2, 4)
    # inside the retained range the feed still serves
    assert table_changes(spark, path, 3, 4).count() > 0
    # a version that never existed is NOT blamed on vacuum
    with pytest.raises(FileNotFoundError):
        read_table(spark, path, version=99)


def test_stream_checkpoint_behind_retention_fails_loudly(spark, tmp_path):
    """A table_cdf stream whose CHECKPOINTED offset fell behind vacuum
    retention must fail with the named start-offset-vacuumed error on
    its next trigger — never compute a window through the hole. (The
    Delta 'startingVersion vacuumed' trap; minimum-retention contract
    documented on vacuum().)"""
    from video_streamer_spark.operators.table_format import vacuum
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = str(tmp_path / "t")
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("val")
    )
    create_table(base, path, ["k"], n_buckets=4)
    register_cdf_source(spark)

    def drain():
        q = (
            spark.readStream.format("table_cdf")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_or_raise(q, 120, "cdf_drain")

    drain()  # checkpoint now holds offset v=1
    for bump in (100, 200):
        merge_table(
            spark,
            path,
            base.limit(8)
            .withColumn("val", F.col("val") + bump)
            .withColumn("__op", F.lit("U")),
        )
    vacuum(path, keep_last=1, min_age_sec=0.0)  # drops v1, v2
    with pytest.raises(Exception, match="removed by vacuum"):
        drain()


def test_merge_into_clause_semantics(spark, store_path):
    """merge_into (Delta MERGE INTO in this format's vocabulary):
    delete clause wins over update on matched rows, unconditioned
    matched rows carry over untouched, unassigned columns keep target
    values, inserts null-backfill nothing here ('all' passthrough),
    and the insert condition filters the not-matched side."""
    from video_streamer_spark.operators.table_format import merge_into

    path = store_path
    base = spark.range(0, 20).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("cat"),
        (F.col("id") * 10.0).alias("price"),
    )
    create_table(base, path, ["k"], n_buckets=4)
    src = spark.range(10, 30).select(
        F.col("id").alias("k"),
        F.lit(9).cast("long").alias("cat"),
        (F.col("id") * 100.0).alias("price"),
    )
    v = merge_into(
        spark,
        path,
        src,
        when_matched_update={"price": "t.price + s.price"},
        when_matched_update_condition="s.k % 2 = 0",
        when_matched_delete_condition="s.k = 11",
        when_not_matched_insert="all",
        when_not_matched_insert_condition="s.k < 25",
    )
    assert v == 2
    got = {
        r["k"]: (r["cat"], r["price"])
        for r in read_table(spark, path).collect()
    }
    want = {k: (k % 3, k * 10.0) for k in range(20)}
    del want[11]  # matched + delete condition
    for k in range(10, 20):
        if k != 11 and k % 2 == 0:
            # update assigns price only; cat keeps the TARGET value
            want[k] = (k % 3, k * 10.0 + k * 100.0)
    for k in range(20, 25):  # not matched + insert condition
        want[k] = (9, k * 100.0)
    assert got == want
    # the change feed attributes the clauses exactly: 1 delete,
    # 5 updates (12..18 even minus nothing = 10,12,14,16,18), 5 inserts
    from video_streamer_spark.operators.table_format import table_changes

    kinds = {}
    for r in table_changes(spark, path, 1, 2).collect():
        kinds.setdefault(r["_change_type"], set()).add(r["k"])
    assert kinds["delete"] == {11}
    assert kinds["update_postimage"] == {10, 12, 14, 16, 18}
    assert kinds["insert"] == {20, 21, 22, 23, 24}


def test_merge_into_refusals(spark, store_path):
    from video_streamer_spark.operators.table_format import merge_into

    path = store_path
    base = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_table(base, path, ["k"], n_buckets=2)
    src = spark.range(5, 15).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    with pytest.raises(ValueError, match="at least one WHEN clause"):
        merge_into(spark, path, src, when_not_matched_insert=None)
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_into(spark, path, src.unionByName(src.limit(1)))
    with pytest.raises(ValueError, match="key column"):
        merge_into(
            spark, path, src, when_matched_update={"k": "s.k + 100"}
        )
    with pytest.raises(ValueError, match="unknown column"):
        merge_into(
            spark, path, src, when_matched_update={"ghost": "1"}
        )
    with pytest.raises(ValueError, match="lacks key column"):
        merge_into(spark, path, src.select(F.col("v")))
    with pytest.raises(ValueError, match="needs every table column"):
        merge_into(
            spark,
            path,
            src.select("k"),
            when_matched_update="all",
            when_not_matched_insert=None,
        )
    # default: plain upsert ('all' insert + no matched clause is fine)
    merge_into(spark, path, src.where("k >= 10"))
    assert read_table(spark, path).count() == 15


def test_shallow_clone_cow_and_isolation(spark, store_path, tmp_path):
    """clone_table: zero-copy snapshot (no data dirs), copy-on-write
    localizes exactly the touched buckets, mutations are isolated in
    BOTH directions, pruned reads and the change feed work over
    absolute refs, and vacuum on the clone can never eat source data."""
    import os

    from video_streamer_spark.operators.table_format import (
        clone_table,
        delete_keys,
        optimize_table,
        table_changes,
        vacuum,
    )

    src = store_path
    dst = str(tmp_path / "clone")
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    create_table(base, src, ["k"], n_buckets=4)
    delete_keys(spark, src, spark.createDataFrame([(7,)], ["k"]))
    clone_table(src, dst)

    def rows(p):
        return {r["k"]: r["v"] for r in read_table(spark, p).collect()}

    model = {k: k * 2.0 for k in range(100)}
    del model[7]  # the clone sees through the source's tombstones
    assert rows(dst) == model
    assert os.listdir(os.path.join(dst, "data")) == [], "zero-copy"

    # COW on the clone: one local commit dir, source untouched
    merge_table(
        spark,
        dst,
        spark.createDataFrame(
            [(3, 99.0, "U"), (200, 1.0, "I")],
            "k bigint, v double, __op string",
        ),
    )
    model_c = dict(model)
    model_c[3] = 99.0
    model_c[200] = 1.0
    assert rows(dst) == model_c
    assert rows(src) == model
    assert len(os.listdir(os.path.join(dst, "data"))) == 1

    # source mutation after the clone: the clone's pinned refs hold
    merge_table(
        spark,
        src,
        spark.createDataFrame([(5, -5.0, "U")], "k bigint, v double, __op string"),
    )
    model[5] = -5.0
    assert rows(src) == model
    assert rows(dst) == model_c

    # pruned read + change feed resolve absolute refs
    from video_streamer_spark.operators.table_format import read_table_where

    assert {
        r["k"] for r in read_table_where(spark, dst, "k", lo=10, hi=20).collect()
    } == set(range(10, 21))
    d12 = {
        (r["k"], r["_change_type"])
        for r in table_changes(spark, dst, 1, 2).collect()
    }
    assert d12 == {(3, "update_postimage"), (200, "insert")}

    # vacuum on the CLONE sweeps only local dirs — source unharmed
    vacuum(dst, keep_last=1, min_age_sec=0.0)
    assert rows(dst) == model_c
    assert rows(src) == model

    # OPTIMIZE localizes every ref; source vacuum is then harmless
    optimize_table(spark, dst, "k", files_per_bucket=1)
    vacuum(src, keep_last=1, min_age_sec=0.0)
    assert rows(dst) == model_c


def test_shallow_clone_source_vacuum_hazard_is_loud(spark, store_path, tmp_path):
    """The inherited Delta caveat: vacuum on the SOURCE may drop dirs a
    non-localized clone still references. The clone's read must then
    fail LOUDLY (the scan lists exact dirs) — never return silently
    partial rows."""
    from video_streamer_spark.operators.table_format import (
        clone_table,
        vacuum,
    )

    src = store_path
    dst = str(tmp_path / "clone")
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_table(base, src, ["k"], n_buckets=4)
    clone_table(src, dst)
    # rewrite every bucket in the source, then drop the old dirs the
    # clone still points at
    merge_table(
        spark,
        src,
        base.withColumn("v", F.col("v") + 1.0).withColumn("__op", F.lit("U")),
    )
    vacuum(src, keep_last=1, min_age_sec=0.0)
    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist|Path"):
        read_table(spark, dst).collect()


def test_optimize_localizes_clone_and_cuts_source_dependency(
    spark, store_path, tmp_path
):
    """Round-11 VERDICT item 5: OPTIMIZE on a shallow clone rewrites
    every bucket under the clone's OWN data/, so its manifest holds no
    absolute refs into the source afterwards — the documented
    cut-the-dependency move for the inherited Delta caveat. After
    localization, a source vacuum that drops the originally shared
    dirs cannot touch the clone: reads return the pinned snapshot, the
    optimize commit is invisible to the clone's change feed, and
    tombstone debt inherited from the source is folded (no tombstone
    refs either)."""
    from video_streamer_spark.operators.table_format import (
        _read_manifest,
        clone_table,
        delete_keys,
        optimize_table,
        table_changes,
        vacuum,
    )

    src = store_path
    dst = str(tmp_path / "clone")
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_table(base, src, ["k"], n_buckets=4)
    delete_keys(spark, src, spark.createDataFrame([(7,)], ["k"]))
    clone_table(src, dst)  # inherits absolute refs + a tombstone ref
    doc1 = _read_manifest(dst, 1)
    assert any(r.startswith("/") for r in doc1["buckets"].values())
    want = {r["k"]: r["v"] for r in read_table(spark, dst).collect()}

    assert optimize_table(spark, dst, sort_by="v") == 2
    doc2 = _read_manifest(dst, 2)
    assert all(
        not r.startswith("/") for r in doc2["buckets"].values()
    ), "localized refs must be relative to the clone root"
    assert not doc2.get("tombstones"), "folded during the rewrite"
    assert table_changes(spark, dst, 1, 2).count() == 0

    # the source can now rewrite + vacuum freely: the clone no longer
    # references any source dir (v1 still does — retention drops it)
    merge_table(
        spark,
        src,
        base.withColumn("v", F.col("v") + 1.0).withColumn("__op", F.lit("U")),
    )
    vacuum(src, keep_last=1, min_age_sec=0.0)
    vacuum(dst, keep_last=1, min_age_sec=0.0)  # drop the stale clone v1
    got = {r["k"]: r["v"] for r in read_table(spark, dst).collect()}
    assert got == want


def test_restore_table_roundtrip_and_feed(spark, store_path):
    """restore_table commits a NEW version with the old content
    (metadata-only; bad commits stay for audit), the change feed
    across the restore diffs CONTENTS (a shrunken tombstone list — a
    deleted key coming back — takes the exact outer-join path, not the
    growth-only shortcut), restore-to-present no-ops, and restoring to
    a vacuumed version is refused by name."""
    from video_streamer_spark.operators.table_format import (
        VersionVacuumedError,
        delete_keys,
        restore_table,
        table_changes,
        vacuum,
    )

    path = store_path
    base = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_table(base, path, ["k"], n_buckets=4)  # v1
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(3, 99.0, "U"), (100, 1.0, "I")],
            "k bigint, v double, __op string",
        ),
    )  # v2
    delete_keys(spark, path, spark.createDataFrame([(5,)], ["k"]))  # v3

    def rows(v=None):
        return {
            r["k"]: r["v"] for r in read_table(spark, path, version=v).collect()
        }

    v1 = rows(1)
    assert restore_table(path, 1) == 4
    assert history(path) == [1, 2, 3, 4], "history is append-only"
    assert rows() == v1
    # the feed across the restore: 3 reverts (update), 100 vanishes
    # (delete), tombstoned 5 comes BACK (insert — the shrunken-list case)
    d34 = {
        (r["k"], r["_change_type"])
        for r in table_changes(spark, path, 3, 4).collect()
    }
    assert d34 == {
        (3, "update_postimage"),
        (100, "delete"),
        (5, "insert"),
    }
    assert restore_table(path, 4) == 4, "restore-to-present no-ops"
    assert history(path) == [1, 2, 3, 4]

    merge_table(
        spark,
        path,
        spark.createDataFrame([(0, 7.0, "U")], "k bigint, v double, __op string"),
    )  # v5
    vacuum(path, keep_last=2, min_age_sec=0.0)  # retains 4, 5
    with pytest.raises(VersionVacuumedError):
        restore_table(path, 2)
    assert rows(4) == v1, "the retained restored snapshot still reads"


def test_sync_table_mirrors_exactly_and_prices_churn(spark, store_path):
    """sync_table: final state == source exactly; the change feed
    carries ONLY genuinely-changed rows (fingerprint diff — identical
    carried rows never enter the changeset); an unchanged re-sync
    commits NOTHING; the wipe guard refuses a truncated source; a
    narrower source is refused by name."""
    from video_streamer_spark.operators.table_format import (
        sync_table,
        table_changes,
    )

    path = store_path
    base = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_table(base, path, ["k"], n_buckets=4)
    src = (
        base.where("k % 10 <> 0")
        .withColumn(
            "v",
            F.when(F.col("k") % 10 == 5, F.col("v") + 100.0).otherwise(
                F.col("v")
            ),
        )
        .unionByName(
            spark.range(100, 105).select(
                F.col("id").alias("k"), F.lit(-1.0).alias("v")
            )
        )
    )
    assert sync_table(spark, path, src) == 2
    got = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    want = {r["k"]: r["v"] for r in src.collect()}
    assert got == want
    from collections import Counter

    c = Counter(
        r["_change_type"] for r in table_changes(spark, path, 1, 2).collect()
    )
    assert c == {"delete": 6, "update_postimage": 6, "insert": 5}, c
    # unchanged mirror: no version churn
    assert sync_table(spark, path, src) == 2
    assert history(path) == [1, 2]
    with pytest.raises(ValueError, match="max_delete_fraction"):
        sync_table(spark, path, src.limit(3))
    with pytest.raises(ValueError, match="lacks table column"):
        sync_table(spark, path, src.select("k"))
    # intentional mass delete: the override works and the state follows
    assert sync_table(spark, path, src.limit(3), max_delete_fraction=1.0) == 3
    assert read_table(spark, path).count() == 3


def test_clone_compositions_keep_refs_sound(spark, store_path, tmp_path):
    """The management surface COMPOSES: a clone of a clone copies
    already-absolute refs verbatim (still pointing at the original
    data), restore works ON a clone (metadata-only, abs refs
    preserved), and merge_into classifies correctly against a clone's
    mixed local/absolute buckets."""
    from video_streamer_spark.operators.table_format import (
        clone_table,
        merge_into,
        restore_table,
    )

    src = store_path
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_table(base, src, ["k"], n_buckets=4)
    clone_table(src, a)

    def rows(p):
        return {r["k"]: r["v"] for r in read_table(spark, p).collect()}

    model = {k: k * 1.0 for k in range(40)}
    # COW one bucket on clone A, then clone A -> B: B must see A's
    # state through a MIX of A-local and original-src refs
    merge_table(
        spark,
        a,
        spark.createDataFrame([(1, 11.0, "U")], "k bigint, v double, __op string"),
    )
    model_a = dict(model)
    model_a[1] = 11.0
    clone_table(a, b)
    assert rows(b) == model_a
    # B's own COW leaves both ancestors untouched
    merge_into(
        spark,
        b,
        spark.createDataFrame([(2, 5.0)], "k bigint, v double"),
        when_matched_update={"v": "t.v + s.v"},
    )
    assert rows(b) == {**model_a, 2: 7.0}
    assert rows(a) == model_a
    assert rows(src) == model
    # restore ON a clone: B back to its v1 (== A's state), history kept
    assert restore_table(b, 1) == 3
    assert rows(b) == model_a
    assert history(b) == [1, 2, 3]


def test_vacuum_dry_run_reports_without_touching(spark, store_path):
    """dry_run names exactly what a real pass would remove and changes
    NOTHING; the subsequent real pass removes exactly the reported
    set."""
    from video_streamer_spark.operators.table_format import vacuum

    path = store_path
    base = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_table(base, path, ["k"], n_buckets=4)
    for i in range(2):
        merge_table(
            spark,
            path,
            base.limit(5)
            .withColumn("v", F.col("v") + 1.0 + i)
            .withColumn("__op", F.lit("U")),
        )
    report = vacuum(path, keep_last=1, min_age_sec=0.0, dry_run=True)
    assert report["dry_run"] is True
    assert report["doomed_versions"] == [1, 2]
    assert report["data_dirs_removed"] >= 1
    # nothing moved: every version still reads
    assert history(path) == [1, 2, 3]
    assert read_table(spark, path, version=1).count() == 30
    real = vacuum(path, keep_last=1, min_age_sec=0.0)
    assert real["doomed_dirs"] == report["doomed_dirs"]
    assert real["doomed_versions"] == report["doomed_versions"]
    assert history(path) == [3]


def test_describe_history_infers_op_classes(spark, store_path, tmp_path):
    """describe_history classifies every commit from manifest shape
    alone: create/merge/delete/optimize/rebucket/restore on the
    source, clone on a clone's v1, retention-base after vacuum."""
    from video_streamer_spark.operators.table_format import (
        add_column,
        clone_table,
        delete_keys,
        describe_history,
        optimize_table,
        rebucket_table,
        restore_table,
        vacuum,
    )

    path = store_path
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_table(base, path, ["k"], n_buckets=4)                      # v1
    merge_table(
        spark,
        path,
        spark.createDataFrame([(50, 5.0, "I")], "k bigint, v double, __op string"),
    )                                                                  # v2
    delete_keys(spark, path, spark.createDataFrame([(3,)], ["k"]))     # v3
    optimize_table(spark, path, "k", files_per_bucket=1)               # v4
    rebucket_table(spark, path, 8)                                     # v5
    restore_table(path, 2)                                             # v6
    add_column(path, "w", "bigint")                                    # v7
    ops = {r["version"]: r["op"] for r in describe_history(path)}
    assert ops == {
        1: "create",
        2: "merge",
        3: "delete",
        4: "optimize",
        5: "rebucket",
        6: "restore",
        7: "schema",
    }, ops
    # a clone's v1 carries its provenance
    dst = str(tmp_path / "clone")
    clone_table(path, dst)
    crow = describe_history(dst)[0]
    assert crow["op"] == "clone" and crow["cloned_from"] == path
    # provenance survives retention: the restore commit stays
    # classifiable even as the oldest retained version...
    vacuum(path, keep_last=2, min_age_sec=0.0)
    ops2 = [r["op"] for r in describe_history(path)]
    assert ops2 == ["restore", "schema"], ops2
    # ...while a provenance-free oldest version is honest about its
    # unknowable predecessor
    vacuum(path, keep_last=1, min_age_sec=0.0)
    ops3 = [r["op"] for r in describe_history(path)]
    assert ops3 == ["retention-base"], ops3


def test_readd_after_drop_keeps_old_values_dead(spark, store_path):
    """Field-id column mapping (round-11 VERDICT item 4): re-adding a
    dropped column name is ALLOWED, and the new column mints a fresh
    PHYSICAL parquet name — so pre-drop files' bytes under the old
    physical name are unreachable (old values stay dead, never
    resurrected), new values materialize only where written, time
    travel to pre-drop versions still shows the original values, the
    change feed across the boundary diffs the re-added column as the
    fresh all-null state (not the ghosts), and the mapping survives
    merge / optimize / clone commits."""
    from video_streamer_spark.operators.table_format import (
        add_column,
        drop_column,
        optimize_table,
        table_changes,
    )

    path = store_path
    base = spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        (F.col("id") % 7).alias("w"),
    )
    create_table(base, path, ["k"], n_buckets=4)  # v1: w has values
    assert drop_column(path, "w") == 2
    assert add_column(path, "w", "bigint") == 3  # re-add: fresh field
    # old values are DEAD: every row reads null, despite pre-drop
    # files still carrying bytes under the old physical name
    cur = read_table(spark, path)
    assert cur.columns == ["k", "v", "w"]
    assert cur.where("w IS NOT NULL").count() == 0
    # time travel to v1 still shows the ORIGINAL values
    v1 = {r["k"]: r["w"] for r in read_table(spark, path, version=1).collect()}
    assert v1[10] == 3
    # the change feed across the boundary never resurrects: the v2->v3
    # commit is metadata-only (no rows), and a post-re-add merge diffs
    # against the null state
    assert table_changes(spark, path, 2, 3).count() == 0
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, 9.0, 50, "U")], "k bigint, v double, w bigint, __op string"
        ),
    )  # v4
    d = {r["k"]: r for r in table_changes(spark, path, 3, 4).collect()}
    assert d[1]["_change_type"] == "update_postimage" and d[1]["w"] == 50
    got = {r["k"]: r["w"] for r in read_table(spark, path).collect()}
    assert got[1] == 50 and got[10] is None
    # the mapping survives layout maintenance and cloning
    optimize_table(spark, path, sort_by="v")
    got = {r["k"]: r["w"] for r in read_table(spark, path).collect()}
    assert got[1] == 50 and got[10] is None
    from video_streamer_spark.operators.table_format import clone_table

    clone = path + "-clone"
    clone_table(path, clone)
    gotc = {r["k"]: r["w"] for r in read_table(spark, clone).collect()}
    assert gotc[1] == 50 and gotc[10] is None
    # drop + re-add AGAIN: the second re-add must mint yet another
    # fresh physical name (the first re-add's values die too)
    drop_column(path, "w")
    add_column(path, "w", "string")  # different type is fine now
    assert (
        read_table(spark, path).where("w IS NOT NULL").count() == 0
    )


def test_drop_column_retires_name_and_strips_skipping(spark, store_path):
    """drop_column: metadata-only removal (reads project the new
    schema; no file touched), dropping is retry-idempotent, key
    columns are refused, skipping metadata for the ghost column is
    stripped (a range read naming it fails at resolution, loudly), the
    change feed projects the post-drop schema, and DESCRIBE HISTORY
    classes it as schema. Re-add is covered by
    test_readd_after_drop_keeps_old_values_dead (field-id mapping)."""
    from video_streamer_spark.operators.table_format import (
        add_column,
        describe_history,
        drop_column,
        read_table_where,
        table_changes,
    )

    path = store_path
    base = spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        (F.col("id") % 7).alias("w"),
    )
    create_table(base, path, ["k"], n_buckets=4, bloom_cols=["w"])
    assert drop_column(path, "w") == 2
    df = read_table(spark, path)
    assert df.columns == ["k", "v"] and df.count() == 40
    assert drop_column(path, "w") == 2, "retry of a durable drop no-ops"
    with pytest.raises(ValueError, match="does not exist"):
        drop_column(path, "ghost")
    with pytest.raises(ValueError, match="key column"):
        drop_column(path, "k")
    # life goes on under a fresh name; post-drop files never write w
    add_column(path, "w2", "bigint")
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, 9.0, 5, "U")], "k bigint, v double, w2 bigint, __op string"
        ),
    )
    got = {r["k"]: (r["v"], r["w2"]) for r in read_table(spark, path).collect()}
    assert got[1] == (9.0, 5) and got[2] == (2.0, None)
    # skipping never consults the ghost: naming it fails at resolution
    with pytest.raises(Exception, match="UNRESOLVED_COLUMN|cannot be resolved"):
        read_table_where(spark, path, "w", lo=0, hi=3).collect()
    d = table_changes(spark, path, 2, 4)
    assert "w" not in d.columns and "w2" in d.columns
    ops = {r["version"]: r["op"] for r in describe_history(path)}
    assert ops[2] == "schema" and ops[4] == "merge"


def test_check_constraints_enforced_at_write(spark, store_path):
    """CHECK constraints (ALTER TABLE … ADD CONSTRAINT): validated
    over existing rows at add time (refused on violations), enforced
    executor-side on every later upsert (a violating write raises and
    publishes NOTHING — atomicity intact), exempt for deletes, NULL
    predicate results refused (stricter than SQL's unknown-passes,
    by design), carried across merge/optimize/clone commits, and
    dropped columns they reference are refused by name."""
    from video_streamer_spark.operators.table_format import (
        add_constraint,
        clone_table,
        drop_column,
        drop_constraint,
        optimize_table,
    )

    path = store_path
    base = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    create_table(base, path, ["k"], n_buckets=4)
    assert add_constraint(spark, path, "v_nonneg", "v >= 0") == 2
    assert add_constraint(spark, path, "v_nonneg", "v >= 0") == 2, (
        "retry of a durable add no-ops"
    )
    with pytest.raises(ValueError, match="different expression"):
        add_constraint(spark, path, "v_nonneg", "v >= 1")
    with pytest.raises(ValueError, match="existing rows violate"):
        add_constraint(spark, path, "v_big", "v >= 100")
    # violating upsert: raises, nothing published
    with pytest.raises(Exception, match="CHECK constraint"):
        merge_table(
            spark,
            path,
            spark.createDataFrame(
                [(3, -1.0, "U")], "k bigint, v double, __op string"
            ),
        )
    assert current_version(path) == 2
    # NULL predicate result = violation (a null v cannot prove v >= 0)
    with pytest.raises(Exception, match="CHECK constraint"):
        merge_table(
            spark,
            path,
            spark.createDataFrame(
                [(3, None, "U")], "k bigint, v double, __op string"
            ),
        )
    # deletes are exempt; passing upserts land
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(3, 5.0, "U"), (4, None, "D")],
            "k bigint, v double, __op string",
        ),
    )
    assert current_version(path) == 3
    # survives layout maintenance (merge built a fresh manifest; the
    # evolution carry keeps the constraint alive) and cloning
    optimize_table(spark, path, sort_by="v")
    with pytest.raises(Exception, match="CHECK constraint"):
        merge_table(
            spark,
            path,
            spark.createDataFrame(
                [(5, -9.0, "U")], "k bigint, v double, __op string"
            ),
        )
    clone = path + "-ccl"
    clone_table(path, clone)
    with pytest.raises(Exception, match="CHECK constraint"):
        merge_table(
            spark,
            clone,
            spark.createDataFrame(
                [(5, -9.0, "U")], "k bigint, v double, __op string"
            ),
        )
    with pytest.raises(ValueError, match="referenced by CHECK"):
        drop_column(path, "v")
    v = drop_constraint(path, "v_nonneg")
    assert drop_constraint(path, "v_nonneg") == v, "absent drop no-ops"
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(5, -9.0, "U")], "k bigint, v double, __op string"
        ),
    )  # unconstrained again


def test_cdf_stream_sees_readded_column_values(spark, store_path, tmp_path):
    """Review r12 finding: the table_cdf STREAM must resolve the
    field-id column mapping — after drop+re-add, a merge writing the
    re-added column must stream its real values (not NULL), and
    pre-drop files' dead bytes must never resurrect through the feed."""
    from video_streamer_spark.operators.table_format import (
        add_column,
        drop_column,
    )
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = store_path
    base = spark.range(0, 12).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        (F.col("id") % 7).alias("w"),
    )
    create_table(base, path, ["k"], n_buckets=2)  # v1: w has values
    drop_column(path, "w")  # v2
    add_column(path, "w", "bigint")  # v3: fresh physical name
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, 9.0, 50, "U")], "k bigint, v double, w bigint, __op string"
        ),
    )  # v4
    register_cdf_source(spark)
    out = str(tmp_path / "feed")
    q = (
        spark.readStream.format("table_cdf")
        .option("path", path)
        .option("startingVersion", 3)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, 120, "cdf_mapping")
    rows = {r["k"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["w"] == 50, "re-added column's value lost in the feed"
    assert rows[1]["_change_type"] == "update_postimage"
    # the bucket rewrite carried key 0's row with w=NULL (dead bytes
    # must not resurrect); carried-identical rows net out, so only the
    # genuinely changed row appears — and nothing carries old w values
    assert all(r["w"] in (None, 50) for r in rows.values())


def test_constraint_allows_narrow_preevolution_changeset(spark, store_path):
    """Review r12 finding: the CHECK guard evaluates the POST-MERGE
    relation, so a changeset written before an add_column (missing the
    constrained column) stays valid — updates are tested at their true
    post-merge values (backfilled from the BASE, not NULL), and
    delete-only narrow changesets pass untouched."""
    from video_streamer_spark.operators.table_format import (
        add_column,
        add_constraint,
    )

    path = store_path
    create_table(
        spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ),
        path,
        ["k"],
        n_buckets=2,
    )
    add_column(path, "w", "bigint")
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, 1.0, 7, "U")], "k bigint, v double, w bigint, __op string"
        ),
    )  # k=1 holds w=7
    add_constraint(spark, path, "w_ok", "w IS NULL OR w > 0")
    # narrow changeset (no w): the update must keep k=1's w=7 and pass
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, 5.0, "U"), (2, None, "D")], "k bigint, v double, __op string"
        ),
    )
    got = {r["k"]: (r["v"], r["w"]) for r in read_table(spark, path).collect()}
    assert got[1] == (5.0, 7) and 2 not in got
    # and the guard still bites when a wide changeset violates
    with pytest.raises(Exception, match="CHECK constraint"):
        merge_table(
            spark,
            path,
            spark.createDataFrame(
                [(3, 1.0, -4, "U")],
                "k bigint, v double, w bigint, __op string",
            ),
        )


def test_clone_gets_fresh_commit_timestamp(spark, store_path, tmp_path):
    """Review r12 finding: a clone of a VERSION-1 source must not
    inherit the source's committed_at (the _ts_v sentinel collides at
    version 1) — TIMESTAMP AS OF against the clone for a time before
    its creation must raise, not resolve."""
    import time as _time

    from video_streamer_spark.operators.table_format import (
        clone_table,
        version_at_timestamp,
    )

    src = store_path
    create_table(
        spark.range(0, 5).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ),
        src,
        ["k"],
        n_buckets=2,
    )
    t_between = _time.time()
    _time.sleep(0.02)
    dst = str(tmp_path / "clone")
    clone_table(src, dst)
    assert version_at_timestamp(src, t_between) == 1
    with pytest.raises(ValueError, match="as old as timestamp"):
        version_at_timestamp(dst, t_between)


def test_not_null_declared_and_enforced_at_write(spark, store_path):
    """Declared NOT NULL (ALTER COLUMN … SET NOT NULL, round-12
    VERDICT item 6): validated over existing rows at declaration
    (refused on violations), enforced executor-side on every later
    upsert/insert (a violating write raises and publishes NOTHING),
    exempt for deletes, satisfied by narrow pre-evolution changesets
    whose BASE value is non-null, carried across merge/optimize/clone,
    refused on key columns (implicitly null-free already), and dead
    after a drop+re-add of the column (field-id semantics: the
    re-added column is a NEW, nullable column)."""
    from video_streamer_spark.operators.table_format import (
        add_column,
        clone_table,
        drop_column,
        drop_not_null,
        optimize_table,
        set_not_null,
    )

    path = store_path
    base = spark.range(0, 12).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.when(F.col("id") < 6, F.col("id")).alias("w"),  # w null for k>=6
    )
    create_table(base, path, ["k"], n_buckets=2)
    # key columns are implicitly NOT NULL — declaring one is refused
    with pytest.raises(ValueError, match="implicitly NOT NULL"):
        set_not_null(spark, path, "k")
    with pytest.raises(ValueError, match="not in the table schema"):
        set_not_null(spark, path, "nope")
    # existing nulls refuse the declaration
    with pytest.raises(ValueError, match="existing rows hold NULL"):
        set_not_null(spark, path, "w")
    assert set_not_null(spark, path, "v") == 2
    assert set_not_null(spark, path, "v") == 2, "retry converges"
    # violating upsert raises, publishes nothing
    with pytest.raises(Exception, match="NOT NULL constraint"):
        merge_table(
            spark,
            path,
            spark.createDataFrame(
                [(3, None, 1, "U")],
                "k bigint, v double, w bigint, __op string",
            ),
        )
    assert current_version(path) == 2
    # deletes are exempt (their columns never reach the guard)
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(4, None, None, "D")],
            "k bigint, v double, w bigint, __op string",
        ),
    )
    assert current_version(path) == 3
    # narrow pre-evolution changeset: v backfills from the BASE value
    # (non-null) and passes; an insert of a NEW key via a narrow
    # changeset null-backfills and must REFUSE
    merge_table(
        spark,
        path,
        spark.createDataFrame([(5, 50, "U")], "k bigint, w bigint, __op string"),
    )
    assert current_version(path) == 4
    with pytest.raises(Exception, match="NOT NULL constraint"):
        merge_table(
            spark,
            path,
            spark.createDataFrame(
                [(100, 1, "U")], "k bigint, w bigint, __op string"
            ),
        )
    assert current_version(path) == 4
    # survives layout maintenance and cloning (evolution carry)
    optimize_table(spark, path, sort_by="v")
    with pytest.raises(Exception, match="NOT NULL constraint"):
        merge_table(
            spark,
            path,
            spark.createDataFrame(
                [(6, None, 1, "U")],
                "k bigint, v double, w bigint, __op string",
            ),
        )
    clone = path + "-nncl"
    clone_table(path, clone)
    with pytest.raises(Exception, match="NOT NULL constraint"):
        merge_table(
            spark,
            clone,
            spark.createDataFrame(
                [(6, None, 1, "U")],
                "k bigint, v double, w bigint, __op string",
            ),
        )
    # dropping the column drops its declaration; re-add starts nullable
    drop_column(path, "v")
    add_column(path, "v", "double")
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(7, None, 1, "U")], "k bigint, v double, w bigint, __op string"
        ),
    )  # no raise: the re-added v is a NEW nullable column
    # drop_not_null lifts enforcement; absent drop no-ops
    p2 = clone
    v = drop_not_null(p2, "v")
    assert drop_not_null(p2, "v") == v
    merge_table(
        spark,
        p2,
        spark.createDataFrame(
            [(6, None, 1, "U")], "k bigint, v double, w bigint, __op string"
        ),
    )  # unconstrained again


def test_concurrent_set_not_null_conflicts_stale_merge(spark, store_path):
    """Rebase eligibility treats a NOT NULL declaration like a CHECK
    constraint: a merge classified BEFORE a concurrent SET NOT NULL
    landed must re-raise VersionConflictError (its rows were never
    guarded against the new declaration), never rebase past it."""
    from video_streamer_spark.operators.table_format import set_not_null

    path = store_path
    create_table(
        spark.range(0, 8).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ),
        path,
        ["k"],
        n_buckets=2,
    )
    base_v = current_version(path)
    set_not_null(spark, path, "v")  # the concurrent winner
    with pytest.raises(VersionConflictError):
        merge_table(
            spark,
            path,
            spark.createDataFrame(
                [(1, 2.0, "U")], "k bigint, v double, __op string"
            ),
            base_version=base_v,
            read_buckets=set(),
        )


def test_widen_column_type_lifecycle(spark, store_path, tmp_path):
    """Type widening (schema-evolution leg 3): metadata-only commit,
    old narrow files read exactly under the widened schema, post-widen
    writes land wide values past the old type's range, time travel to
    the pre-widen version keeps the narrow schema, the change feed
    diffs across the boundary without phantom updates, and the
    refusals hold (key column, bloom column, narrowing, lossy pairs,
    unknown column); repeat-widening converges (retry contract)."""
    from video_streamer_spark.operators.table_format import (
        table_changes,
        widen_column_type,
    )

    path = store_path
    base = spark.range(0, 12).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") * 10).cast("int").alias("n"),
        (F.col("id") * 0.5).cast("float").alias("x"),
    )
    create_table(base, path, ["k"], n_buckets=2)  # v1
    with pytest.raises(ValueError, match="key column"):
        widen_column_type(path, "k", "double")
    with pytest.raises(ValueError, match="not lossless"):
        widen_column_type(path, "n", "smallint")  # narrowing
    with pytest.raises(ValueError, match="not lossless"):
        widen_column_type(path, "n", "double")  # not in the ladder
    with pytest.raises(ValueError, match="not in the table schema"):
        widen_column_type(path, "nope", "bigint")
    assert widen_column_type(path, "n", "bigint") == 2
    assert widen_column_type(path, "n", "bigint") == 2, "retry converges"
    assert widen_column_type(path, "x", "double") == 3
    # old (narrow) files read exactly under the widened schema
    snap = read_table(spark, path)
    assert dict(snap.dtypes)["n"] == "bigint"
    assert dict(snap.dtypes)["x"] == "double"
    got = {r["k"]: (r["n"], r["x"]) for r in snap.collect()}
    assert got[3] == (30, 1.5)
    # post-widen write: a value far past int32 lands
    big = 1 << 40
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, big, 9.25, "U")],
            "k bigint, n bigint, x double, __op string",
        ),
    )  # v4
    assert {
        r["n"] for r in read_table(spark, path).where("k = 1").collect()
    } == {big}
    # time travel: the pre-widen version keeps its narrow schema
    v1 = read_table(spark, path, version=1)
    assert dict(v1.dtypes)["n"] == "int"
    assert v1.where("k = 1").collect()[0]["n"] == 10
    # the change feed across the widening boundary: exactly one update
    # (the merged key), no phantom diffs from the upcast re-read
    feed = table_changes(spark, path, 1, 4)
    rows = {(r["k"], r["_change_type"]) for r in feed.collect()}
    assert rows == {(1, "update_postimage")}
    # bloom-column refusal: a bloom's hash streams were computed at
    # the old type, so widening the column would veto real keys
    from video_streamer_spark.operators.table_format import create_table as ct

    p2 = str(tmp_path / "bloomed")
    ct(
        spark.range(0, 8).select(
            F.col("id").alias("k"), F.col("id").cast("int").alias("n")
        ),
        p2,
        ["k"],
        n_buckets=2,
        bloom_cols=["n"],
    )
    with pytest.raises(ValueError, match="bloom"):
        widen_column_type(p2, "n", "bigint")


def test_cdf_stream_fails_loudly_on_mid_stream_widening(
    spark, store_path, tmp_path
):
    """A table_cdf stream whose declared schema predates a
    widen_column_type must fail BY NAME when the next window planning
    sees the widened manifest — emitting wide values through the
    pinned narrow type would overflow or silently coerce (same
    restart contract as the add_column guard)."""
    from pyspark.sql.streaming import StreamingQueryException

    from video_streamer_spark.operators.table_format import (
        widen_column_type,
    )
    from video_streamer_spark.sources.cdf_source import register_cdf_source
    from video_streamer_spark.streaming.drain import drain_or_raise

    path = store_path
    create_table(
        spark.range(0, 6).select(
            F.col("id").alias("k"), F.col("id").cast("int").alias("n")
        ),
        path,
        ["k"],
        n_buckets=2,
    )
    register_cdf_source(spark)
    feed = (
        spark.readStream.format("table_cdf").option("path", path).load()
    )  # declared schema pinned NARROW here
    out, ck = str(tmp_path / "o"), str(tmp_path / "c")
    q = (
        feed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, 120, "widen_guard_warm")
    widen_column_type(path, "n", "bigint")
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(1, 1 << 40, "U")], "k bigint, n bigint, __op string"
        ),
    )
    q2 = (
        feed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="type changed"):
        q2.awaitTermination()


def test_cdf_type_guard_is_directional(spark, store_path):
    """The mid-stream type guard must be DIRECTIONAL: a reader whose
    declared schema is WIDER than a window's end manifest (the
    restart-replaying-a-pre-widen-batch shape) is servable — a
    symmetric check would wedge the very restart the error message
    prescribes (review r13). Only manifest-wider-than-declared raises."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from video_streamer_spark.sources.cdf_source import (
        CHANGE_TYPE_COL,
        COMMIT_VERSION_COL,
        _CdfStreamReader,
    )

    path = store_path
    create_table(
        spark.range(0, 6).select(
            F.col("id").alias("k"), F.col("id").cast("int").alias("n")
        ),
        path,
        ["k"],
        n_buckets=2,
    )  # v1: n is INT
    wide = StructType(
        [
            StructField("k", LongType()),
            StructField("n", LongType()),  # declared WIDER than v1
            StructField(CHANGE_TYPE_COL, StringType()),
            StructField(COMMIT_VERSION_COL, LongType()),
        ]
    )
    r = _CdfStreamReader(path, wide, 0)
    r.key_cols = ["k"]
    parts = r.partitions({"v": 0}, {"v": 1})  # must NOT raise
    assert parts, "initial snapshot window should plan partitions"
    narrow = StructType(
        [
            StructField("k", LongType()),
            StructField("n", IntegerType()),
            StructField(CHANGE_TYPE_COL, StringType()),
            StructField(COMMIT_VERSION_COL, LongType()),
        ]
    )
    from video_streamer_spark.operators.table_format import (
        widen_column_type,
    )

    widen_column_type(path, "n", "bigint")  # v2: manifest wider
    r2 = _CdfStreamReader(path, narrow, 0)
    r2.key_cols = ["k"]
    with pytest.raises(RuntimeError, match="type changed"):
        r2.partitions({"v": 0}, {"v": 2})
