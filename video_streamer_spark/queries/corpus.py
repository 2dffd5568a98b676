"""Corpus-curation extension queries x142–x146: the published
LLM-training-data passes that sit between raw crawl and tokenizer —
benchmark decontamination by n-gram overlap (GPT-3 appendix C / Llama),
MassiveText repetition filters (Gopher), domain-mixture rebalancing
(DoReMi-style static rates), SemDeDup cluster-blocked semantic dedup,
and quality-aware canonical selection for exact-dup clusters.

The reference engine's analog is its per-frame curation loop
(gst-detection-tf.py: decode → threshold → keep); these are the same
keep/drop decisions at corpus scale, each expressed as one Catalyst plan
with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_streamer_spark.catalog import table
from video_streamer_spark.queries import query
from video_streamer_spark.queries.curation import _R4, _sql_cos

# Tokenization CTE shared with curation.py's oracles (lockstep with
# operators/dedup.tokens_col: split on single space, drop empties).
_TOKS = """
  toks AS (
    SELECT doc_id, source, lang, n_chars,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents)
"""


def _gram_cte(k: int, name: str = "g") -> str:
    """k-token n-grams, one row per position — DuckDB twin of
    operators/dedup.shingles_col(text, k) (list slices are 1-based and
    end-inclusive, so toks[i:i+k-1] is k tokens)."""
    return f"""
  {name} AS (
    SELECT doc_id, source, gram FROM (
      SELECT doc_id, source,
        unnest(list_transform(range(1, greatest(len(toks) - {k - 2}, 1)),
                              i -> array_to_string(toks[i:i+{k - 1}], ' '))) AS gram
      FROM toks WHERE len(toks) >= {k}))
"""


# --------------------------------------------------------------------------
# x142: BENCHMARK DECONTAMINATION BY N-GRAM OVERLAP — the standard
# leakage pass (GPT-3 appendix C; Llama 2): a training doc is
# contaminated iff it shares any 4-token n-gram with the held-out
# eval set (here: doc_id % 23 == 0, a deterministic stand-in for the
# benchmark table). Eval n-gram hashes BROADCAST (eval sets are small
# by construction); the train side probes them in-scan — no shuffle of
# train n-grams survives the stage.
@query(
    "x142_ngram_decontamination",
    oracle=f"""
    WITH {_TOKS},
    {_gram_cte(4)},
    h AS (SELECT doc_id, source, md5(gram) AS gh FROM g),
    ev AS (SELECT DISTINCT gh FROM h WHERE doc_id % 23 = 0),
    hits AS (
      SELECT DISTINCT doc_id FROM h
      WHERE doc_id % 23 <> 0 AND gh IN (SELECT gh FROM ev))
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_train,
      CAST(COUNT(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM hits))
           AS BIGINT) AS n_contaminated
    FROM documents
    WHERE doc_id % 23 <> 0
    GROUP BY source ORDER BY source
    """,
)
def x142_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_streamer_spark.operators.dedup import ngram_decontaminate

    docs = table(spark, sf_dir, "documents")
    flagged = ngram_decontaminate(
        docs, is_eval=F.col("doc_id") % 23 == 0, shingle_k=4
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_train"),
            F.count_if("contaminated").cast("bigint").alias("n_contaminated"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# x143: GOPHER REPETITION FILTERS — per-document top-2-gram coverage and
# duplicate-3-gram fraction (MassiveText quality rules, token-based),
# with the keep cut at top2_frac ≤ 0.2. Per-doc metrics only see the
# doc's own grams, so the shuffle key (doc_id, gram) spreads with the
# corpus — embarrassingly parallel at any scale.
@query(
    "x143_repetition_filter",
    oracle=f"""
    WITH {_TOKS},
    base AS (SELECT doc_id, len(toks) AS n_tokens FROM toks),
    g2 AS (
      SELECT doc_id,
        unnest(list_transform(range(1, greatest(len(toks), 1)),
                              i -> array_to_string(toks[i:i+1], ' '))) AS g
      FROM toks WHERE len(toks) >= 2),
    c2 AS (SELECT doc_id, g, COUNT(*) AS n FROM g2 GROUP BY 1, 2),
    t2 AS (SELECT doc_id, MAX(n) AS top2_count FROM c2 GROUP BY 1),
    g3 AS (
      SELECT doc_id,
        unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                              i -> array_to_string(toks[i:i+2], ' '))) AS g
      FROM toks WHERE len(toks) >= 3),
    c3 AS (SELECT doc_id, g, COUNT(*) AS n FROM g3 GROUP BY 1, 2),
    t3 AS (
      SELECT doc_id,
        SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup3,
        SUM(n) AS tot3
      FROM c3 GROUP BY 1)
    SELECT b.doc_id,
      CAST(b.n_tokens AS BIGINT) AS n_tokens,
      CAST(COALESCE(t2.top2_count, 0) AS BIGINT) AS top2_count,
      {_R4.format(
          "COALESCE(2.0 * t2.top2_count / b.n_tokens, 0.0)"
      )} AS top2_frac,
      {_R4.format(
          "COALESCE(CAST(t3.dup3 AS DOUBLE) / CAST(t3.tot3 AS DOUBLE), 0.0)"
      )} AS dup3_frac,
      CAST(COALESCE(2.0 * t2.top2_count / b.n_tokens, 0.0) <= 0.2
           AS BOOLEAN) AS keep
    FROM base b
    LEFT JOIN t2 USING (doc_id)
    LEFT JOIN t3 USING (doc_id)
    ORDER BY doc_id
    """,
)
def x143_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_streamer_spark.operators.text import repetition_signals

    docs = table(spark, sf_dir, "documents")
    return repetition_signals(docs, top2_max_frac=0.2).orderBy("doc_id")


# --------------------------------------------------------------------------
# x144: DOMAIN-MIXTURE REBALANCING — uniform per-source token targets
# under a 50% global budget, applied as deterministic md5-bucket
# acceptance (the static resolution of a DoReMi-style reweighting: any
# target mixture reduces to per-domain rates + reproducible sampling).
# The rate table is dimension-sized (one row per source) and
# broadcasts; the keep predicate is row-local.
@query(
    "x144_mixture_rebalance",
    oracle=f"""
    WITH {_TOKS},
    sized AS (SELECT doc_id, source, len(toks) AS toks FROM toks),
    totals AS (
      SELECT source, COUNT(*) AS n_docs, SUM(toks) AS tokens_total
      FROM sized GROUP BY source),
    priced AS (
      SELECT source, n_docs, tokens_total,
        least(1.0,
          CAST(CAST(floor(
            floor(CAST(SUM(tokens_total) OVER () AS DOUBLE) * 0.5)
            / COUNT(*) OVER ()) AS BIGINT) AS DOUBLE)
          / CAST(tokens_total AS DOUBLE)) AS rate
      FROM totals),
    kept AS (
      SELECT s.source, COUNT(*) AS n_kept, SUM(s.toks) AS tokens_kept
      FROM sized s JOIN priced p USING (source)
      WHERE CAST(('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 10000
            < CAST(floor(p.rate * 10000.0) AS BIGINT)
      GROUP BY s.source)
    SELECT p.source,
      CAST(p.n_docs AS BIGINT) AS n_docs,
      CAST(p.tokens_total AS BIGINT) AS tokens_total,
      {_R4.format("p.rate")} AS accept_rate,
      CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
      CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
    FROM priced p LEFT JOIN kept k USING (source)
    ORDER BY source
    """,
)
def x144_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_streamer_spark.operators.sampling import mixture_rebalance

    docs = table(spark, sf_dir, "documents")
    return mixture_rebalance(docs, group_col="source", budget_frac=0.5).orderBy(
        "source"
    )


# --------------------------------------------------------------------------
# x145: SEMANTIC DEDUP, CLUSTER-BLOCKED (SemDeDup) — within each
# embedding cluster (the testdata's label column), drop every vector
# with a lower-id cluster-mate at cosine ≥ 0.35 (threshold per x05's
# rationale: the corpus' max planted cosine is ≈0.51). The cluster is
# the blocking key, so cost is Σ|cell|², never |N|².
@query(
    "x145_semantic_dedup",
    oracle=f"""
    WITH drops AS (
      SELECT DISTINCT b.label, b.vec_id
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {_sql_cos('a.embedding', 'b.embedding')} >= 0.35)
    SELECT e.label,
      CAST(COUNT(*) AS BIGINT) AS n_vecs,
      CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped,
      CAST(COUNT(*) - COUNT(d.vec_id) AS BIGINT) AS n_kept
    FROM embeddings e
    LEFT JOIN drops d ON e.label = d.label AND e.vec_id = d.vec_id
    GROUP BY e.label ORDER BY e.label
    """,
)
def x145_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_streamer_spark.operators.similarity import (
        semantic_dedup_by_cluster,
    )

    emb = table(spark, sf_dir, "embeddings")
    return semantic_dedup_by_cluster(
        emb, cluster_col="label", threshold=0.35
    ).orderBy("label")


# --------------------------------------------------------------------------
# x146: CANONICAL SELECTION — exact-dup clusters keep their BEST copy
# (highest n_chars, ties to lowest doc_id) instead of x01's first-id
# rule; the keeper decision that matters when mirrors truncate. Same
# cost envelope as exact dedup: one shuffle on md5(text).
@query(
    "x146_canonical_selection",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, lang, n_chars,
        ROW_NUMBER() OVER (PARTITION BY md5(text)
                           ORDER BY n_chars DESC, doc_id ASC) AS rn,
        COUNT(*) OVER (PARTITION BY md5(text)) AS group_size
      FROM documents)
    SELECT doc_id, source, lang,
      CAST(n_chars AS BIGINT) AS n_chars,
      CAST(group_size AS BIGINT) AS group_size
    FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
)
def x146_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_streamer_spark.operators.dedup import canonical_selection

    docs = table(spark, sf_dir, "documents")
    return canonical_selection(docs).select(
        "doc_id",
        "source",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        "group_size",
    ).orderBy("doc_id")
