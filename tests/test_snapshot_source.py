"""Batch snapshot DataSource (sources/snapshot_source.py): plain
``spark.read.format("table_snapshot")`` must serve exactly what
``read_table`` serves at every pin — current, by version, by
timestamp — through every format feature: merge-on-read tombstones,
field-id column mapping after drop+re-add, pre-evolution
null-backfill, clones' absolute refs, and empty tables. The x242
driver row proves value parity against DuckDB; these tests pin the
feature matrix and the refusal surface."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from video_streamer_spark.operators.table_format import (
    add_column,
    clone_table,
    create_table,
    delete_keys,
    drop_column,
    merge_table,
    read_table,
    vacuum,
)
from video_streamer_spark.sources.snapshot_source import (
    register_snapshot_source,
)


@pytest.fixture
def t(spark, tmp_path):
    register_snapshot_source(spark)
    path = str(tmp_path / "t")
    base = spark.range(0, 24).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("v"),
        (F.col("id") % 3).cast("int").alias("tag"),
    )
    create_table(base, path, ["k"], n_buckets=4)
    return path


def _snap(spark, path, **opts):
    r = spark.read.format("table_snapshot").option("path", path)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_matches_read_table_at_every_pin(spark, t):
    t_mid = time.time()
    time.sleep(0.05)
    merge_table(
        spark,
        t,
        spark.createDataFrame(
            [(1, 9.0, 7, "U"), (50, 5.0, 1, "U")],
            "k bigint, v double, tag int, __op string",
        ),
    )
    delete_keys(spark, t, spark.createDataFrame([(2,)], "k bigint"))
    # current pin
    assert _rows(_snap(spark, t)) == _rows(read_table(spark, t))
    # version pin
    assert _rows(_snap(spark, t, version=1)) == _rows(
        read_table(spark, t, version=1)
    )
    # timestamp pin resolves to v1
    assert _rows(_snap(spark, t, timestamp=t_mid)) == _rows(
        read_table(spark, t, version=1)
    )
    # tombstoned key really is gone through the DataSource
    assert _snap(spark, t).where("k = 2").count() == 0
    # schema follows the PINNED manifest
    assert _snap(spark, t, version=1).columns == ["k", "v", "tag"]


def test_snapshot_resolves_field_id_mapping_and_backfill(spark, t):
    drop_column(t, "v")
    add_column(t, "v", "double")  # fresh physical name (mapping)
    merge_table(
        spark,
        t,
        spark.createDataFrame(
            [(3, 7, 4.25, "U")], "k bigint, tag int, v double, __op string"
        ),
    )
    got = {r["k"]: r["v"] for r in _snap(spark, t).collect()}
    assert got[3] == 4.25, "re-added column's live value lost"
    assert all(
        v is None for k, v in got.items() if k != 3
    ), "pre-drop dead bytes resurrected through the DataSource"
    # time travel to the pre-drop schema still shows the originals
    v1 = {r["k"]: r["v"] for r in _snap(spark, t, version=1).collect()}
    assert v1[4] == 6.0


def test_snapshot_serves_clones_and_plain_sql(spark, t, tmp_path):
    clone = str(tmp_path / "clone")
    clone_table(t, clone)  # refs are ABSOLUTE into the source table
    assert _rows(_snap(spark, clone)) == _rows(read_table(spark, t))
    _snap(spark, t, version=1).createOrReplaceTempView("snap_sql_v1")
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM snap_sql_v1 WHERE tag = 0"
    ).collect()[0]["n"]
    assert n == 8


def test_snapshot_refusals_are_loud(spark, t):
    with pytest.raises(Exception, match="not retained"):
        _snap(spark, t, version=99).collect()
    with pytest.raises(Exception, match="mutually exclusive"):
        _snap(spark, t, version=1, timestamp="5").collect()
    with pytest.raises(Exception, match="as old as"):
        _snap(spark, t, timestamp=1.0).collect()
    # vacuumed pin: the version option names the remedy
    for i in range(3):
        merge_table(
            spark,
            t,
            spark.createDataFrame(
                [(i, 0.5, 0, "U")], "k bigint, v double, tag int, __op string"
            ),
        )
    vacuum(t, keep_last=2)
    with pytest.raises(Exception, match="not retained"):
        _snap(spark, t, version=1).collect()


def test_snapshot_reads_widened_types(spark, t):
    """After widen_column_type, the DataSource's Arrow cast upcasts
    old narrow files to the widened declared schema exactly."""
    from video_streamer_spark.operators.table_format import (
        merge_table,
        widen_column_type,
    )

    widen_column_type(t, "tag", "bigint")
    merge_table(
        spark,
        t,
        spark.createDataFrame(
            [(1, 1.0, 1 << 40, "U")],
            "k bigint, v double, tag bigint, __op string",
        ),
    )
    got = {r["k"]: r["tag"] for r in _snap(spark, t).collect()}
    assert got[1] == (1 << 40) and got[4] == 1
    assert dict(_snap(spark, t).dtypes)["tag"] == "bigint"
    # the pre-widen pin keeps the narrow schema
    assert dict(_snap(spark, t, version=1).dtypes)["tag"] == "int"


def test_snapshot_serves_nested_columns_exactly(spark, tmp_path):
    """array/struct/map payload columns (the embeddings-table shape,
    r13 VERDICT item 2) round-trip through the DataSource bit-exact —
    including null cells, null ELEMENTS, genuine NaN (preserved, not
    NULL-coerced: the ADVICE r13 tombstone-path fix), through a
    tombstone anti-join and a pre-evolution backfill."""
    register_snapshot_source(spark)
    path = str(tmp_path / "nested")
    base = spark.sql(
        """
        SELECT id AS k,
          CASE WHEN id = 5 THEN NULL
               WHEN id = 6 THEN array(CAST(1.5 AS FLOAT), NULL)
               WHEN id = 7 THEN array(CAST('NaN' AS FLOAT))
               ELSE array(CAST(id AS FLOAT), CAST(id * 2 AS FLOAT))
          END AS emb,
          named_struct('a', CAST(id AS INT), 'b',
                       concat('s', CAST(id AS STRING))) AS meta,
          map(concat('m', CAST(id AS STRING)), id) AS props,
          CASE WHEN id = 3 THEN CAST('NaN' AS DOUBLE)
               ELSE CAST(id AS DOUBLE) END AS score
        FROM range(0, 12)
        """
    )
    create_table(base, path, ["k"], n_buckets=4)
    delete_keys(spark, path, spark.createDataFrame([(2,)], "k bigint"))

    got = _snap(spark, path)
    # repr-compare: tuple equality on float('nan') cells is identity-
    # dependent, and NaN-preservation is exactly what's under test
    assert sorted(repr(r) for r in got.collect()) == sorted(
        repr(r) for r in read_table(spark, path).collect()
    )
    by_k = {r["k"]: r for r in got.collect()}
    assert 2 not in by_k
    assert by_k[5]["emb"] is None
    assert by_k[6]["emb"][1] is None  # null ELEMENT survives
    assert by_k[7]["emb"][0] != by_k[7]["emb"][0]  # NaN stays NaN
    assert by_k[3]["score"] != by_k[3]["score"], (
        "tombstoned bucket read coerced NaN to NULL"
    )
    assert by_k[4]["meta"]["b"] == "s4" and by_k[4]["props"]["m4"] == 4

    # pre-evolution backfill: new nested column nulls on old rows
    add_column(path, "extra", "array<bigint>")
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(0, [7, 8], "U")], "k bigint, extra array<bigint>, __op string"
        ),
    )
    got2 = {r["k"]: r["extra"] for r in _snap(spark, path).collect()}
    assert got2[0] == [7, 8] and got2[1] is None
    # plain SQL over the nested snapshot (the point of the surface)
    _snap(spark, path).createOrReplaceTempView("nested_snap")
    s = spark.sql(
        "SELECT SUM(aggregate(emb, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + coalesce(CAST(x AS DOUBLE), 0.0))) AS s "
        "FROM nested_snap WHERE k IN (0, 1)"
    ).collect()[0]["s"]
    assert s == (0.0 + 0.0) + (1.0 + 2.0)


def test_unpinned_read_is_pinned_at_load(spark, t):
    """An option-less (current-version) load serves its LOAD-TIME
    version at every later action — a concurrent commit must not let
    one DataFrame pair a new manifest's buckets/mapping with the
    load-time schema (review r13). A fresh load sees the new version."""
    df = _snap(spark, t)
    assert df.count() == 24
    merge_table(
        spark,
        t,
        spark.createDataFrame(
            [(99, 9.0, 1, "U")], "k bigint, v double, tag int, __op string"
        ),
    )
    assert df.count() == 24, "loaded frame must stay pinned"
    assert _snap(spark, t).count() == 25
