"""Planted-skew benchmark: salted join vs vanilla on a hot key.

Evidence harness for operators/skew.py — NOT part of the driver's
bench.py HEADLINE contract. Plants a dataset where one key owns ~90% of
the probe side, then measures the same inner-join+aggregate four ways:

  vanilla_aqe     plain join, AQE on (skew-join splitting active)
  vanilla_noaqe   plain join, AQE off — the naive plan a hot key gets
                  on engines without runtime re-planning
  salted_noaqe    operators/skew.salted_join, AQE off — the explicit
                  mitigation standing alone
  salted_aqe      salted join with AQE on

Expected shape: vanilla_noaqe serializes the hot key onto one task;
salting spreads it across n_salts tasks; AQE's skew splitting closes
most of the same gap at runtime, which is exactly why session.py turns
it on — the explicit salt remains for engines/paths AQE can't re-plan
(broadcast-ineligible skewed build sides, streaming joins).

Usage: python bench_skew.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import time

import pyspark.sql.functions as F

from video_streamer_spark.operators.skew import salted_join
from video_streamer_spark.session import get_spark

N_LEFT = 10_000_000
N_RIGHT_KEYS = 256
HOT_FRACTION = 0.9
N_SALTS = 16


def planted(spark):
    left = spark.range(N_LEFT).select(
        F.when(
            (F.col("id") % 10) < int(HOT_FRACTION * 10), F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_RIGHT_KEYS)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    right = spark.range(N_RIGHT_KEYS).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 100).alias("w"),
    )
    return left, right


def run(spark, fn, aqe: bool) -> float:
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    try:
        t0 = time.time()
        fn().collect()
        return round(time.time() - t0, 3)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def main() -> None:
    spark = get_spark(app_name="bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    left, right = planted(spark)
    # force shuffle joins: a broadcastable right side would dodge the
    # skew entirely (which is its own valid mitigation, benched last)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def vanilla():
        return (
            left.join(right, "k")
            .groupBy("k")
            .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
        )

    def salted():
        return (
            salted_join(left, right, ["k"], n_salts=N_SALTS)
            .groupBy("k")
            .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
        )

    # correctness gate before timing
    assert sorted(map(tuple, vanilla().collect())) == sorted(
        map(tuple, salted().collect())
    )

    results = {}
    for name, fn, aqe in (
        ("vanilla_aqe", vanilla, True),
        ("vanilla_noaqe", vanilla, False),
        ("salted_noaqe", salted, False),
        ("salted_aqe", salted, True),
    ):
        run(spark, fn, aqe)  # warm
        results[name] = min(run(spark, fn, aqe) for _ in range(3))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")

    def broadcast_ref():
        return (
            left.join(F.broadcast(right), "k")
            .groupBy("k")
            .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
        )

    run(spark, broadcast_ref, True)
    results["broadcast_ref"] = min(run(spark, broadcast_ref, True) for _ in range(3))

    print(
        json.dumps(
            {
                "metric": "planted_skew_join",
                "unit": "sec",
                "n_left": N_LEFT,
                "hot_fraction": HOT_FRACTION,
                "n_salts": N_SALTS,
                "variants": results,
            }
        )
    )


if __name__ == "__main__":
    main()
