#!/usr/bin/env python3
"""Per-query profile: DataFrame CONSTRUCTION time (Python + Py4J plan
building) vs EXECUTION time (toPandas), min-of-N each, under the bench
session config. Guide §1: measure first, isolate what's actually slow.

Usage: python plans/r14/profile_queries.py [reps] [name1,name2,...]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from video_streamer_spark.queries import QUERIES  # noqa: E402
from video_streamer_spark.session import get_spark  # noqa: E402

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
names = sys.argv[2].split(",") if len(sys.argv) > 2 else bench.HEADLINE

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
run_dir = bench.splittable_mirror(sf_dir)
extra = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
}
spark = get_spark(
    app_name="vss-profile", shuffle_partitions=16, extra_conf=extra
)
spark.sparkContext.setLogLevel("ERROR")

# warm like the bench: one pass at the smallest SF
warm_dir = "/root/testdata/sf0.001"
for name in names:
    try:
        QUERIES[name](spark, warm_dir).count()
    except Exception as exc:  # noqa: BLE001
        print(f"# warm FAILED {name}: {exc}")
spark.catalog.clearCache()
for name in (
    "x02_dedup_minhash_pairs",
    "x03_dedup_simhash_pairs",
    "x216_zonemap_range_read",
    "x217_tombstone_snapshot_read",
):
    if name in names:
        QUERIES[name](spark, run_dir).count()
spark.catalog.clearCache()

rows = []
for name in names:
    con_t, exe_t = [], []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = QUERIES[name](spark, run_dir)
        t1 = time.perf_counter()
        df.toPandas()
        t2 = time.perf_counter()
        con_t.append(t1 - t0)
        exe_t.append(t2 - t1)
    rows.append((name, min(con_t), min(exe_t)))
    print(
        f"{name}: construct={min(con_t):.3f}s exec={min(exe_t):.3f}s "
        f"total={min(con_t) + min(exe_t):.3f}s",
        flush=True,
    )
tot_c = sum(r[1] for r in rows)
tot_e = sum(r[2] for r in rows)
print(f"TOTAL construct={tot_c:.2f}s exec={tot_e:.2f}s sum={tot_c + tot_e:.2f}s")
spark.stop()
