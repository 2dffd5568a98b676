"""The planning-input memo caches must observe in-place table mutation.

VERDICT r14 (What's wrong 3): ``similarity._memoized_count`` and
``catalog.scatter`` memoized planning inputs by semanticHash, which is
stable across an in-place rewrite of the files under an unchanged path —
so within one application the quadratic-cliff guard (max_exact_rows) and
the split-count probe could consult a stale value. Both keys now fold in
the scan's file listing (``catalog.plan_fingerprint``); these tests
mutate a table in place and observe the guards re-derive.
"""

from __future__ import annotations

from video_streamer_spark.catalog import plan_fingerprint, scatter
from video_streamer_spark.operators.similarity import _memoized_count


def test_fingerprint_changes_when_semantic_hash_does_not(spark, tmp_path):
    """The hazard this round fixed: semanticHash alone does NOT change
    when the files under the path do (if the first assert ever fails,
    the fingerprint fold became redundant — not wrong, unnecessary)."""
    p = str(tmp_path / "t")
    spark.range(10).write.mode("overwrite").parquet(p)
    df1 = spark.read.parquet(p)
    h1, f1 = df1.semanticHash(), plan_fingerprint(df1)
    spark.range(25).repartition(2).write.mode("overwrite").parquet(p)
    df2 = spark.read.parquet(p)
    assert df2.semanticHash() == h1
    assert plan_fingerprint(df2) != f1


def test_memoized_count_sees_inplace_rewrite(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10).write.mode("overwrite").parquet(p)
    df1 = spark.read.parquet(p).selectExpr("CAST(id AS LONG) AS vid")
    assert _memoized_count(df1) == 10
    # mutate the table IN PLACE within the same application
    spark.range(25).repartition(2).write.mode("overwrite").parquet(p)
    df2 = spark.read.parquet(p).selectExpr("CAST(id AS LONG) AS vid")
    # the plans are semantically identical — the old key would hit stale
    assert df2.semanticHash() == df1.semanticHash()
    assert _memoized_count(df2) == 25


def test_scatter_sees_inplace_rewrite(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "t")
    # one file -> fewer splits than cores -> scatter must repartition
    spark.range(1000).coalesce(1).write.mode("overwrite").parquet(p)
    df1 = spark.read.parquet(p)
    out1 = scatter(df1)
    assert out1 is not df1
    assert out1.rdd.getNumPartitions() == par
    # rewrite the same path as >= parallelism files -> scatter must
    # become a no-op, which requires the cache key to change with the
    # file listing (semanticHash is identical across the rewrite)
    spark.range(1000).repartition(par).write.mode("overwrite").parquet(p)
    df2 = spark.read.parquet(p)
    assert df2.semanticHash() == df1.semanticHash()
    assert scatter(df2) is df2
