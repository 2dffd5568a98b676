"""Bucketed tables: shuffle-free co-located joins.

The heaviest recurring cost in a 100 TB deployment is re-shuffling fact
tables for every join on the same key. Bucketing pays the shuffle ONCE
at write time: both sides hash-partitioned into the same number of
buckets on the join key, so Catalyst plans the join with ZERO Exchange
operators — each task sort-merges bucket i of A with bucket i of B.
This is the Spark-native answer to the reference's static process-pinned
partitioning (run.sh:43-55): the data layout, not the scheduler, carries
the parallelism contract.

Bucketed writes go through the session catalog (``saveAsTable``) because
bucket metadata lives in the table catalog, not in parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``sort_cols`` additionally sorts within buckets, letting the
    sort-merge join skip its sort phase entirely.

    Overwrite is made session-independent: a managed-table LOCATION left
    by an earlier session (whose metastore entry is gone) would otherwise
    fail the write with LOCATION_ALREADY_EXISTS.
    """
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = f"{warehouse.removeprefix('file:')}/{table_name.lower()}"
    shutil.rmtree(loc, ignore_errors=True)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
