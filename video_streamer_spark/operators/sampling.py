"""Deterministic sampling operators for training-data curation.

Random sampling is useless in a reproducible data pipeline (reruns must
produce the same corpus, and an oracle must be able to recompute the
selection), so both operators here sample by HASH of a stable id — the
standard trick for resumable, engine-independent sampling:

- ``hash_sample``: Bernoulli-style rate sampling — keep rows whose
  md5-derived bucket falls under the rate. Pure predicate: pushes into
  the scan, no shuffle, no state, identical selection at any
  parallelism or scale.
- ``stratified_cap``: per-group quota — keep the ``n_per_group``
  hash-smallest rows of each group (e.g. cap documents per language so
  a dominant language can't swamp a training mix). One window shuffle
  on the group key; for a pathologically hot group the rank work for
  that key lands on few tasks — at extreme scale pre-cap each partition
  first (any row outside a partition-local top-n is outside the global
  top-n a fortiori), which bounds the shuffle to n_per_group rows per
  partition per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SAMPLE_BUCKETS = 10_000


def _hash_bucket(id_col: str) -> F.Column:
    """Stable bucket in [0, SAMPLE_BUCKETS): first 8 md5 hex chars of the
    id's decimal string, as an integer, mod the bucket count. DuckDB
    computes the identical value from the identical expression."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(SAMPLE_BUCKETS),
    )


def hash_sample(df: DataFrame, rate: float, id_col: str = "doc_id") -> DataFrame:
    """Keep ≈rate of rows, deterministically, by id hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(_hash_bucket(id_col) < int(rate * SAMPLE_BUCKETS))


def weighted_hash_sample(
    df: DataFrame, weight: F.Column, id_col: str = "doc_id"
) -> DataFrame:
    """Per-row inclusion with probability = ``weight`` (a Column in
    [0, 1], clamped) — importance sampling for training-data mixes
    (e.g. keep long documents with higher probability). Still a pure
    row-local predicate: the hash bucket is compared against a per-row
    cutoff, so it pushes to the scan, shuffles nothing, and reruns
    reproduce the identical corpus at any parallelism.

    Cross-engine note: the cutoff is floor(weight × SAMPLE_BUCKETS) in
    IEEE doubles — an oracle recomputing it must use the SAME arithmetic
    expression shape so the rounding is bit-identical.
    """
    clamped = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    cutoff = F.floor(clamped * F.lit(float(SAMPLE_BUCKETS))).cast("bigint")
    return df.where(_hash_bucket(id_col) < cutoff)


def stratified_cap(
    df: DataFrame,
    group_cols: list[str],
    n_per_group: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the n_per_group hash-smallest rows per group — a uniform
    random-without-replacement quota that any engine can reproduce.
    Ties (same md5 prefix) break on the id itself."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .where(F.col("sample_rank") <= n_per_group)
    )


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the id-hash bucket falls
    into contiguous fraction ranges (e.g. {'train': .8, 'val': .1,
    'test': .1}). Same predicate machinery as ``hash_sample`` — a pure
    row-local expression, no shuffle, stable across reruns, engines, and
    cluster sizes, and every row lands in exactly one split (fractions
    must sum to 1 within float tolerance)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = _hash_bucket(id_col)
    expr = None
    cum = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        # round, not int(): float accumulation can land infinitesimally
        # below the exact boundary (0.3 -> 2999.999... -> 2999 under
        # truncation), silently shifting one bucket between splits
        cond = bucket < round(cum * SAMPLE_BUCKETS)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = expr.otherwise(F.lit(items[-1][0]))
    return df.withColumn(split_col, expr)


def mixture_rebalance(
    docs: DataFrame,
    group_col: str = "source",
    tokens: F.Column | None = None,
    budget_frac: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebalance a corpus toward a UNIFORM per-``group_col`` token
    mixture under a global token budget (``budget_frac`` of the corpus):
    each group gets acceptance rate min(1, target/group_tokens) where
    target = floor(budget_frac·total) ÷ n_groups, then rows are kept by
    the deterministic md5-bucket predicate — the static form of the
    domain-reweighting step (DoReMi-style mixtures resolve to exactly
    such per-domain rates before sampling).

    Returns one row per group: n_docs, tokens_total, accept_rate,
    n_kept, tokens_kept. Two scans of ``docs`` (one to price groups, one
    to apply rates); at scale the rate table is dimension-sized and
    broadcasts, and the keep predicate stays row-local so the second
    scan shuffles only the final per-group aggregate.
    """
    from video_streamer_spark.functions.parity import round4
    from video_streamer_spark.operators.dedup import tokens_col

    tok = tokens if tokens is not None else F.size(tokens_col("text"))
    base = docs.select(
        id_col, F.col(group_col).alias("grp"), tok.cast("bigint").alias("toks")
    )
    totals = base.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("tokens_total"),
    )
    w = Window.partitionBy()
    priced = totals.select(
        "grp",
        "n_docs",
        "tokens_total",
        F.floor(
            F.floor(
                F.sum("tokens_total").over(w).cast("double")
                * F.lit(float(budget_frac))
            )
            / F.count("*").over(w)
        )
        .cast("bigint")
        .alias("target"),
    ).select(
        "grp",
        "n_docs",
        "tokens_total",
        F.least(
            F.lit(1.0),
            F.col("target").cast("double") / F.col("tokens_total").cast("double"),
        ).alias("rate"),
    )
    cutoff = F.floor(F.col("rate") * F.lit(float(SAMPLE_BUCKETS))).cast("bigint")
    kept = (
        base.join(F.broadcast(priced.select("grp", "rate")), "grp")
        .where(_hash_bucket(id_col) < cutoff)
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum("toks").cast("bigint").alias("tokens_kept"),
        )
    )
    return (
        priced.join(kept, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "tokens_total",
            round4(F.col("rate")).alias("accept_rate"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce(F.col("tokens_kept"), F.lit(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
    )
