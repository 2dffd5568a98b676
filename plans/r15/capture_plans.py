#!/usr/bin/env python3
"""Capture .explain("formatted") for every HEADLINE bench query into
plans/r15/<query>_<tag>.txt (tag = before/after, argv[1]).

Runs under the exact bench session config (same shuffle partitions, AQE
floor rule, splittable mirror layout) so the captured plans are the ones
the bench times. Usage: python plans/r15/capture_plans.py before
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

import bench  # noqa: E402
from video_streamer_spark.queries import QUERIES  # noqa: E402
from video_streamer_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
run_dir = bench.splittable_mirror(sf_dir)
extra = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
}
spark = get_spark(
    app_name="plan-capture", shuffle_partitions=16, extra_conf=extra
)
spark.sparkContext.setLogLevel("ERROR")

out_dir = os.path.join(REPO, "plans", "r15")
os.makedirs(out_dir, exist_ok=True)
names = only or bench.HEADLINE
for name in names:
    try:
        df = QUERIES[name](spark, run_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {n_ex} Exchange nodes", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: FAILED {exc}", flush=True)
spark.stop()
