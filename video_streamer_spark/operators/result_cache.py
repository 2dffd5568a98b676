"""Query result cache: materialize a query's result to parquet keyed by
its name and input state, and serve repeat calls from the cache until
the inputs change — the warehouse result-cache pattern (Snowflake-style
"same query + unchanged data → reuse"), built on the only two
primitives the env offers: parquet directories and file mtimes.

Staleness key = (max mtime, total bytes, file count) of the input
directory's parquet files: any rewrite, append, or compaction changes
it. The swap is the maintenance.py discipline — build into a sibling
temp dir, rename into place — so readers never observe a half-written
cache; a crash mid-build leaves the old cache (or nothing) plus a temp
dir that the next build clears.

At 100 TB this is a driver-side manifest check (one listing) that can
skip an arbitrarily expensive recompute; entries are per (name, input
dir), so a scale-out cluster shares them through the filesystem.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

CACHE_ROOT = "/tmp/vss-cache"


def _input_state(sf_dir: str) -> dict:
    files = sorted(
        f for f in os.listdir(sf_dir) if f.endswith(".parquet")
    )
    sizes = [os.path.getsize(os.path.join(sf_dir, f)) for f in files]
    mtimes = [os.path.getmtime(os.path.join(sf_dir, f)) for f in files]
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "max_mtime": max(mtimes) if mtimes else 0.0,
    }


def cached_result(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
    cache_root: str = CACHE_ROOT,
) -> tuple[DataFrame, bool]:
    """Return (df, hit): the cached result if the inputs are unchanged,
    else build, materialize atomically, and return the fresh copy.
    The returned DataFrame always READS FROM THE CACHE PATH, so
    downstream plans are a plain parquet scan either way."""
    entry = os.path.join(
        cache_root, f"{name}-{os.path.basename(os.path.normpath(sf_dir))}"
    )
    data_dir = os.path.join(entry, "data")
    meta_path = os.path.join(entry, "meta.json")
    state = _input_state(sf_dir)
    if os.path.exists(meta_path) and os.path.exists(data_dir):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("input_state") == state:
            return spark.read.parquet(data_dir), True
    tmp = data_dir + ".build-tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    build().write.mode("overwrite").parquet(tmp)
    os.makedirs(entry, exist_ok=True)
    old = data_dir + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(data_dir):
        os.rename(data_dir, old)
    os.rename(tmp, data_dir)
    if os.path.exists(old):
        shutil.rmtree(old)
    with open(meta_path, "w") as fh:
        json.dump({"input_state": state, "name": name}, fh)
    return spark.read.parquet(data_dir), False
