"""Round-7 late extension queries (x213+): perceptual image-hash
near-duplicate detection over decoded pixels, bloom-filter data
skipping on the versioned table, and token-balanced shard export
planning — each scale-shaped and DuckDB-oracle checked under the same
exact-integer parity discipline as the rest of the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_streamer_spark.catalog import table
from video_streamer_spark.queries import query


# x213 — IMAGE dHASH NEAR-DUP: the multimodal twin of SimHash dedup.
# Documents are encoded as REAL zlib-deflated PNGs (the compressed-
# container decode path, CRC-checked chunks, per-row filter cycling),
# decoded back to pixel tensors by the pure-numpy PNG parser, and
# difference-hashed over integer luma (r+g+b; bit k = luma[y,x] >
# luma[y,x+1], k = y*7+x at 8x4). Near pairs (hamming <= 3) come from
# pigeonhole banding — 4 bands of 7 bits, so candidate generation is an
# equi-join on (band_id, band_value), never all-pairs; the oracle
# recomputes the hash arithmetically from the text column (PNG decode
# is bit-exactly lossless) and verifies with an all-pairs xor at
# sf0.01 scale. Scale: 8-byte hashes, banded join, bit_count filter on
# bucket collisions only (operators/imagehash.py docstring).
@query(
    "x213_image_dhash_pairs",
    oracle="""
    WITH body AS (
      SELECT doc_id, rpad(substr(text, 1, 96), 96, '.') AS s FROM documents),
    lum AS (
      SELECT doc_id,
        list_transform(range(32), i ->
          ascii(substr(s, 3*i+1, 1)) + ascii(substr(s, 3*i+2, 1))
          + ascii(substr(s, 3*i+3, 1))) AS l
      FROM body),
    h AS (
      SELECT doc_id,
        CAST(list_sum(list_transform(range(28), k ->
          CASE WHEN l[(k // 7) * 8 + (k % 7) + 1]
                  > l[(k // 7) * 8 + (k % 7) + 2]
               THEN 1 << k ELSE 0 END)) AS BIGINT) AS dhash
      FROM lum)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    ORDER BY doc_a, doc_b
    """,
)
def x213_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_streamer_spark.operators import imagehash, multimodal

    docs = table(spark, sf_dir, "documents")
    frames = multimodal.encode_png_payloads(docs, width=8, height=4)
    hashes = imagehash.dhash_frames(frames, width=8, height=4)
    return imagehash.dhash_near_pairs(hashes, bits=28, max_hamming=3).orderBy(
        "doc_a", "doc_b"
    )


# x214 — BLOOM-PRUNED EQUALITY LOOKUP: data skipping on an UNCLUSTERED
# non-key column of the versioned table, where zone maps are useless
# (o_custkey is hash-scattered by the o_orderkey bucketing, so every
# bucket's [min, max] spans the whole custkey domain). create_table
# declares bloom_cols=["o_custkey"]; each commit maintains a per-bucket
# bloom (xxhash64 double-hashed, Kirsch-Mitzenmacher, no false
# negatives), and read_table_where with lo == hi consults it before
# listing a bucket dir. The probe set mixes present custkeys with an
# absent one, so a wrong skip (false negative) surfaces as a hash
# mismatch against the oracle, which states the same equality filter
# over the raw rows. Scale: the bloom map is manifest metadata
# (buckets x 1 KiB), built by per-task partial blooms OR-folded — the
# probe never scans a bucket the value cannot be in.
@query(
    "x214_bloom_pruned_lookup",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
        / 100.0 AS total_price
    FROM orders
    WHERE o_custkey IN (2, 5, 424242)
    GROUP BY o_custkey
    """,
)
def x214_bloom_pruned_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import itertools
    import os

    from video_streamer_spark.operators.table_format import (
        create_table,
        read_table_where,
    )

    if not hasattr(x214_bloom_pruned_lookup, "_seq"):
        x214_bloom_pruned_lookup._seq = itertools.count()
    tag = os.path.basename(os.path.normpath(sf_dir))
    app = spark.sparkContext.applicationId
    path = (
        f"/tmp/vss-bloom/{app}-{tag}/run-"
        f"{next(x214_bloom_pruned_lookup._seq)}"
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    create_table(
        orders, path, ["o_orderkey"], n_buckets=8, bloom_cols=["o_custkey"]
    )
    parts = [
        read_table_where(spark, path, "o_custkey", lo=v, hi=v)
        for v in (2, 5, 424242)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        (
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0).cast("bigint")
            ).cast("double")
            / 100.0
        ).alias("total_price"),
    )


# x215 — MERGE-ON-READ DELETE (tombstones): the versioned table's
# O(keys) delete path under the oracle. create → delete_keys (a
# tombstone commit: no bucket rewrite, manifest lists grow by one ref)
# → snapshot aggregate; a reader that failed to anti-join the
# tombstones (or wrongly dropped a surviving row) hash-mismatches the
# oracle, which states the same aggregate over the raw rows minus the
# deleted key set. A follow-up merge exercises the partial FOLD (the
# touched bucket rewrites effectively and clears its debt) inside the
# same measured plan. Scale: the delete writes only the key rows —
# Delta deletion-vector / Iceberg delete-file economics, not a
# whole-bucket rewrite per retention pass.
@query(
    "x215_tombstone_delete_read",
    oracle="""
    WITH eff AS (
      SELECT o_orderkey, o_custkey,
        CASE WHEN o_orderkey = 32 THEN -1.0 ELSE o_totalprice END
          AS o_totalprice
      FROM orders
      WHERE o_orderkey % 32 >= 4 OR o_orderkey = 32)
    SELECT CAST(o_orderkey % 8 AS BIGINT) AS key_class,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
        / 100.0 AS total_price
    FROM eff GROUP BY key_class
    """,
)
def x215_tombstone_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import itertools
    import os

    from video_streamer_spark.operators.table_format import (
        create_table,
        delete_keys,
        merge_table,
        read_table,
    )

    if not hasattr(x215_tombstone_delete_read, "_seq"):
        x215_tombstone_delete_read._seq = itertools.count()
    tag = os.path.basename(os.path.normpath(sf_dir))
    app = spark.sparkContext.applicationId
    path = (
        f"/tmp/vss-tomb/{app}-{tag}/run-"
        f"{next(x215_tombstone_delete_read._seq)}"
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    create_table(orders, path, ["o_orderkey"], n_buckets=8)
    delete_keys(
        spark,
        path,
        orders.where(F.col("o_orderkey") % 32 < 4).select("o_orderkey"),
    )
    # fold path: re-insert one deleted key with a sentinel price — its
    # bucket rewrites effectively (tombstones folded), the rest stay
    # merge-on-read; both shapes flow into one aggregate
    merge_table(
        spark,
        path,
        spark.createDataFrame(
            [(32, 1, -1.0)], "o_orderkey bigint, o_custkey bigint, o_totalprice double"
        ),
    )
    return read_table(spark, path).groupBy(
        (F.col("o_orderkey") % 8).cast("bigint").alias("key_class")
    ).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        (
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0).cast("bigint")
            ).cast("double")
            / 100.0
        ).alias("total_price"),
    )
