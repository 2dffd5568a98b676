"""Join-family coverage: the §2.2 join types not exercised by Q3/Q4/Q5/Q20
— left/full outer, cross, as-of (point-in-time), set-ops with ALL
multiplicity, and pivot. Each oracle-checked against an independent SQL
formulation (the as-of oracle is a correlated top-1 subquery, not the
union-merge the engine uses — a genuine cross-check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_streamer_spark.catalog import table
from video_streamer_spark.functions.parity import dec, round2
from video_streamer_spark.queries import query


# --------------------------------------------------------------------------
# LEFT OUTER: every customer with order count/total, zero-order customers
# kept. Aggregate orders BEFORE the join (1 shuffle on the small agg
# output, then join) — at scale the agg-then-join order shrinks the
# probe side by |orders|/|customers|.
@query(
    "x25_left_outer_customer_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name,
      CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
      CAST(ROUND(CAST(COALESCE(o.spent, 0) AS DECIMAL(38,9)), 2) AS DOUBLE) AS spent
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders,
        SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS spent
      FROM orders GROUP BY o_custkey) o
    ON c.c_custkey = o.o_custkey
    ORDER BY c.c_custkey
    """,
)
def x25_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders_raw"),
            F.sum(dec("o_totalprice")).alias("spent_raw"),
        )
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("n_orders_raw", F.lit(0)).cast("bigint").alias("n_orders"),
            round2(F.coalesce(F.col("spent_raw"), F.lit(0))).alias("spent"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# FULL OUTER: customer-count vs supplier-count per nationkey, with the key
# ranges offset so both null sides actually occur. Aggregates first (25
# groups), so the full-outer join itself is trivially broadcastable.
@query(
    "x26_full_outer_nation_counts",
    oracle="""
    SELECT COALESCE(c.k, s.k) AS nationkey,
      CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_cust,
      CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp
    FROM
      (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer
       WHERE c_nationkey < 15 GROUP BY c_nationkey) c
    FULL OUTER JOIN
      (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier
       WHERE s_nationkey >= 10 GROUP BY s_nationkey) s
    ON c.k = s.k
    ORDER BY nationkey
    """,
)
def x26_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") < 15)
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count("*").alias("n_cust_raw"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") >= 10)
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count("*").alias("n_supp_raw"))
    )
    return (
        c.join(s, c.ck == s.sk, "full")
        .select(
            F.coalesce("ck", "sk").alias("nationkey"),
            F.coalesce("n_cust_raw", F.lit(0)).cast("bigint").alias("n_cust"),
            F.coalesce("n_supp_raw", F.lit(0)).cast("bigint").alias("n_supp"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# CROSS: region × nation grid (5 × 25 = 125 rows). Cross joins are only
# sane when one side is tiny — Spark plans this as BroadcastNestedLoop;
# anything bigger should be an equi/theta join instead.
@query(
    "x27_cross_join_grid",
    oracle="""
    SELECT r.r_name, n.n_name,
      CAST(r.r_regionkey = n.n_regionkey AS BOOLEAN) AS is_home
    FROM region r CROSS JOIN nation n
    ORDER BY r.r_name, n.n_name
    """,
)
def x27_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return (
        r.crossJoin(F.broadcast(n))
        .select(
            "r_name",
            "n_name",
            (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
        )
        .orderBy("r_name", "n_name")
    )


# --------------------------------------------------------------------------
# AS-OF: for each purchase event, the most recent prior click by the same
# user within 2 hours. Engine path: operators/temporal.asof_join (union
# merge, one shuffle); oracle path: correlated top-1 subquery — two
# independent formulations of point-in-time semantics.
@query(
    "x28_asof_purchase_click",
    oracle="""
    SELECT p.event_id,
      p.user_id,
      strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      (SELECT c.event_id FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts AND epoch(p.ts) - epoch(c.ts) <= 7200
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id,
      CAST((SELECT FLOOR(epoch(p.ts) - epoch(c.ts)) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts AND epoch(p.ts) - epoch(c.ts) <= 7200
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS BIGINT) AS lag_s
    FROM events p
    WHERE p.event_type = 'purchase'
    ORDER BY p.event_id
    """,
)
def x28_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_streamer_spark.operators.temporal import asof_join

    e = table(spark, sf_dir, "events")
    # string projections (r14 phase 6): this body was the worst remaining
    # constructor (332 gateway calls warm, ~260 of them in these three
    # Column-builder blocks); the string forms parse JVM-side in one call
    # per select and plan the identical tree (plan byte-identity checked)
    purchases = e.where("event_type = 'purchase'").selectExpr(
        "event_id", "user_id", "ts"
    )
    clicks = e.where("event_type = 'click'").selectExpr(
        "user_id", "ts", "event_id AS click_event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        right_cols=["click_event_id"],
        tolerance_seconds=7200,
    )
    return joined.selectExpr(
        "event_id",
        "user_id",
        "date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS purchase_ts",
        "click_event_id_asof AS click_id",
        "CAST(FLOOR(CAST(ts AS DOUBLE) - CAST(ts_asof AS DOUBLE)) AS BIGINT)"
        " AS lag_s",
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# INTERSECT ALL / EXCEPT ALL: bag semantics (multiplicity preserved) over
# per-customer vs per-supplier nation keys — distinguishes the *ALL*
# variants from Q9's set-semantics INTERSECT/EXCEPT.
@query(
    "x29_setops_all_multiplicity",
    oracle="""
    SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 200
      INTERSECT ALL
      SELECT s_nationkey AS k FROM supplier) GROUP BY k
    UNION ALL
    SELECT 'except_all' AS op, k, COUNT(*) AS n FROM (
      SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 200
      EXCEPT ALL
      SELECT s_nationkey AS k FROM supplier) GROUP BY k
    ORDER BY op, k
    """,
)
def x29_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= 200)
        .select(F.col("c_nationkey").alias("k"))
    )
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    inter = (
        c.intersectAll(s)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    exc = (
        c.exceptAll(s)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    return inter.unionByName(exc).orderBy("op", "k")


# --------------------------------------------------------------------------
# PIVOT: order counts per year pivoted on status. Pivot values are given
# EXPLICITLY — without them Spark runs a distinct-scan planning pass,
# which at 100 TB is a full extra job before the real one.
@query(
    "x30_pivot_status_by_year",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
      CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
      CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
      CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders GROUP BY 1 ORDER BY order_year
    """,
)
def x30_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select(F.year("o_orderdate").cast("int").alias("order_year"), "o_orderstatus")
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "order_year",
            F.coalesce("F", F.lit(0)).cast("bigint").alias("n_f"),
            F.coalesce("O", F.lit(0)).cast("bigint").alias("n_o"),
            F.coalesce("P", F.lit(0)).cast("bigint").alias("n_p"),
        )
        .orderBy("order_year")
    )
