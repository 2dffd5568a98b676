#!/usr/bin/env python3
"""Red-flag plan sweep across EVERY registered query (not just the 28
headline rows): capture each query's formatted physical plan at sf0.001
and report scale-killers — CartesianProduct / BroadcastNestedLoopJoin on
non-tiny sides, row-at-a-time BatchEvalPython, unexpected Exchange
explosions, and missing PushedFilters on filtered scans.

Guide §1 (measure first) applied to the full 273-query surface as the
"optimize every operator" audit for OPTIMIZATION_r14.md.

Usage: python plans/r14/sweep_all_plans.py [out.tsv]
"""
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from video_streamer_spark.queries import QUERIES  # noqa: E402
from video_streamer_spark.session import get_spark  # noqa: E402

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_sweep.tsv"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="plan-sweep", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

FLAGS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",  # row-at-a-time Python UDF (Arrow paths show
    #                     ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
)

rows = []
for name in sorted(QUERIES):
    try:
        df = QUERIES[name](spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        n_ex = txt.count("Exchange") - txt.count("ReusedExchange")
        hits = [f for f in FLAGS if f in txt]
        rows.append((name, n_ex, ";".join(hits)))
        if hits:
            print(f"FLAG {name}: {hits} (exchanges={n_ex})", flush=True)
    except Exception:  # noqa: BLE001
        rows.append((name, -1, "CONSTRUCT_FAILED"))
        print(f"FAIL {name}", flush=True)
        traceback.print_exc()

with open(out_path, "w") as fh:
    fh.write("query\texchanges\tflags\n")
    for name, n_ex, hits in rows:
        fh.write(f"{name}\t{n_ex}\t{hits}\n")

flagged = [r for r in rows if r[2]]
print(f"\n{len(rows)} queries swept, {len(flagged)} flagged -> {out_path}")
for name, n_ex, hits in sorted(rows, key=lambda r: -r[1])[:15]:
    print(f"  top-exchange {name}: {n_ex}")
spark.stop()
