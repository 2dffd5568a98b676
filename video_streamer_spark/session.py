"""SparkSession factory with scale-oriented defaults.

The reference sizes parallelism as ``instances = cores/4`` NUMA-pinned
processes (reference ``run.sh:43-55``, ``benchmark.sh:17-18``); Spark's
equivalent is tasks-over-partitions, so the knobs that matter here are
shuffle partitioning, AQE, and Arrow transfer for the Python boundary.

All settings are chosen to survive a 1000-executor / 100 TB deployment:
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  SMJ→broadcast conversion when a side turns out small.
- Arrow on with a bounded batch size: frame/binary payloads are MB-scale
  (reference frames are ~width*height*3 bytes), so the per-batch row cap
  keeps Arrow batches within executor memory.
- Shuffle partition default is only a *hint*; AQE coalesces it down for
  small inputs and splits skew at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch row cap: binary frame payloads are MB-scale, so bound the
# batch row count rather than relying on the 10k default.
ARROW_MAX_RECORDS_PER_BATCH = 2048


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "video-streamer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[N]`` where N comes from
    ``$SPARK_GRAFT_CPUS`` (driver contract) or the machine CPU count. On a
    real cluster pass ``master=None`` after setting ``spark.master``
    externally (spark-submit) — everything here is master-agnostic.
    """
    n = _default_parallelism()
    if master is None:
        master = f"local[{n}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- shuffle & adaptivity -----------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # At 100 TB, a too-small advisory size explodes partition counts;
        # 64 MB is a good post-shuffle target for wide agg/join outputs.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        # --- scan sizing ---------------------------------------------------
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # --- python boundary ----------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        # --- joins ---------------------------------------------------------
        # dims like `labels` (80 rows, reference coco.label) always broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # --- codegen compile cache -----------------------------------------
        # The generated-class cache defaults to 100 entries PER JVM. An
        # analytics session serving this engine's query surface holds far
        # more distinct codegen units live (the 28-query bench alone
        # compiles ~300; a real deployment re-runs hundreds of distinct
        # plans), so at the default every re-run recompiles most of its
        # stages through Janino — measured on the bench's interleaved
        # schedule as ~20% of TOTAL runtime (6.41 s -> 5.15 s same-window
        # A/B, round 14). Cached entries are small compiled classes;
        # 2000 entries is bounded tens of MB on any executor size. This
        # is workload-sized (many distinct plans per long-lived session),
        # not box-sized — the same thrash hits a 1000-executor cluster,
        # where each executor pays the recompile in its own JVM.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # --- memory hygiene for local[N] runs ------------------------------
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # catalog tables (bucketed writes) land in /tmp, not the cwd
        .config("spark.sql.warehouse.dir", "/tmp/vss-warehouse")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
