#!/usr/bin/env python3
"""Count Py4J gateway round-trips (send_command calls) per query
CONSTRUCTION — deterministic, load-insensitive, so it can run on a busy
box. Guide §1: measure before trimming construction fat.

Usage: python plans/r14/count_gateway.py [name1,name2,...]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from video_streamer_spark.queries import QUERIES  # noqa: E402
from video_streamer_spark.session import get_spark  # noqa: E402

names = sys.argv[1].split(",") if len(sys.argv) > 1 else bench.HEADLINE

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
run_dir = bench.splittable_mirror(sf_dir)
spark = get_spark(app_name="vss-gwcount", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

client = spark.sparkContext._gateway._gateway_client
orig = client.send_command
counter = {"n": 0}


def counting_send(*a, **kw):
    counter["n"] += 1
    return orig(*a, **kw)


client.send_command = counting_send

# warm: first construction pays one-time session setup (catalog reads,
# memoized counts); count the SECOND construction.
rows = []
for name in names:
    QUERIES[name](spark, run_dir)
    counter["n"] = 0
    QUERIES[name](spark, run_dir)
    rows.append((name, counter["n"]))

client.send_command = orig
rows.sort(key=lambda r: -r[1])
for name, n in rows:
    print(f"{name}: {n}")
print(f"TOTAL: {sum(n for _, n in rows)}")
spark.stop()
