"""Table-maintenance operators: small-file compaction.

A streaming or highly-parallel writer leaves thousands of small parquet
files per partition (each micro-batch × each task writes one); at 100 TB
the resulting footer/open overhead dominates scan time and NameNode/
listing pressure. Compaction is the standard maintenance pass every
table format ships (Delta OPTIMIZE, Iceberg rewrite_data_files) — this
is the plain-parquet stand-in, same shape as operators/merge.py is for
MERGE.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one HDFS-block-ish file


def _dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> dict:
    """Rewrite the parquet directory into ⌈total/target_bytes⌉ files.

    - No-op (returns stats unchanged) when the directory already has
      fewer than ``min_files`` files or one file would not shrink it —
      compaction must be safe to run on a schedule.
    - The rewrite goes through a sibling temp directory and a directory
      swap, so a reader never sees a half-written table (the poor-man's
      version of a table format's atomic commit; on a real object store
      this is the manifest swap). The swap itself is two renames, so a
      crash BETWEEN them can leave the table path missing with the data
      stranded at ``<path>.compact-old``; every call therefore starts
      with a self-healing pass that restores a stranded ``-old`` dir and
      clears a leftover ``-tmp``, so a rerun recovers instead of failing
      on the missing path.
    - ``coalesce`` (not ``repartition``): compaction must not add a
      shuffle — it only merges input splits, which is exactly the
      narrow-dependency case coalesce exists for.
    """
    tmp = path.rstrip("/") + ".compact-tmp"
    old = path.rstrip("/") + ".compact-old"
    # self-heal a previous crash: a stranded -old with no live table means
    # we died between the two swap renames — restore it; a leftover -tmp
    # is a half-written rewrite — discard it (source of truth is path/old)
    if os.path.exists(old):
        if not os.path.exists(path):
            os.rename(old, path)
        else:
            shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    n_before, total = _dir_stats(path)
    n_target = max(1, -(-total // target_bytes))
    if n_before < min_files or n_target >= n_before:
        return {
            "compacted": False,
            "files_before": n_before,
            "files_after": n_before,
        }
    df = spark.read.parquet(path)
    df.coalesce(n_target).write.mode("overwrite").parquet(tmp)
    # swap: path -> old, tmp -> path, drop old (two renames, not copies)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after, _ = _dir_stats(path)
    return {
        "compacted": True,
        "files_before": n_before,
        "files_after": n_after,
    }
