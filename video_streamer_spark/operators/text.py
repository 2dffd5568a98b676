"""Text analysis operators: tokenization, language ID, quality scoring,
content fingerprinting. All built-in expressions (codegen'd, no UDFs) —
at 100 TB these run at parquet scan speed with a single shuffle for the
aggregating variants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from video_streamer_spark.functions.caching import bounded_persist, pooled
from video_streamer_spark.functions.parity import round2, round4
from video_streamer_spark.operators.dedup import tokens_col, tokens_sql

# tiny English stopword list used by the n-gram-heuristic language ID;
# must stay in sync with the oracle SQL (queries/curation.py)
EN_STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with",
)
LANG_ID_THRESHOLD = 0.03  # stopword ratio above which we call it English


def token_explode(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    # string projection (r14 phase 6): one gateway round-trip per select
    # instead of one per Column; the parsed tree is identical (plan
    # byte-identity checked for every token_explode consumer).
    # id_col is backtick-quoted, so it refers to a TOP-LEVEL column
    # (dotted names are not traversed, unlike F.col) — embedded
    # backticks are escaped by doubling per SQL identifier rules
    # (ADVICE r14).
    quoted = id_col.replace("`", "``")
    return docs.selectExpr(
        f"`{quoted}` AS doc_id",
        f"explode({tokens_sql('text')}) AS token",
    )


def top_tokens(docs: DataFrame, k: int = 10) -> DataFrame:
    """Declared Q17: global top-k tokens by count (ties → token asc)."""
    return (
        token_explode(docs)
        .groupBy("token")
        .agg(F.expr("count(*) AS cnt"))
        .sort(F.desc("cnt"), "token")
        .limit(k)
    )


def token_stats_per_lang(docs: DataFrame) -> DataFrame:
    """Per-language token statistics (total/distinct/avg-per-doc)."""
    per_doc = docs.select(
        "doc_id", "lang", F.size(tokens_col("text")).alias("n_tokens")
    )
    distinct_tokens = (
        docs.select("lang", F.explode(tokens_col("text")).alias("token"))
        .groupBy("lang")
        .agg(F.countDistinct("token").alias("n_distinct_tokens"))
    )
    totals = per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        round2(F.avg(F.col("n_tokens").cast("double"))).alias("avg_tokens"),
    )
    return totals.join(distinct_tokens, "lang").orderBy("lang")


_TOKS_SQL = "filter(split(text, ' '), x -> x != '')"


def _stopword_ratio() -> F.Column:
    # one SQL string, one gateway round-trip: the lambda + isin(*10
    # literals) version cost ~65 ms of Py4J per construction (round-6
    # floor study, PLANS.md). D-suffixed literals keep every constant a
    # DOUBLE exactly like the F.lit() calls it replaces.
    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return F.expr(
        f"CASE WHEN size({_TOKS_SQL}) > 0 THEN "
        f"CAST(size(filter({_TOKS_SQL}, t -> t IN ({stops}))) AS DOUBLE)"
        f" / CAST(size({_TOKS_SQL}) AS DOUBLE) ELSE 0.0D END"
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: stopword-ratio thresholding.

    Returns confusion counts of (actual lang, predicted lang) so accuracy
    is inspectable; the predicted column is what a pipeline would filter
    on. N-gram-frequency models plug in the same shape.
    """
    pred = docs.select(
        "lang",
        F.when(_stopword_ratio() > LANG_ID_THRESHOLD, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("pred_lang"),
    )
    return (
        pred.groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def quality_score_col() -> Column:
    """The UNROUNDED composite quality score as a column expression —
    capped-length * 0.5 + stopword-signal * 0.5 over the text column.
    Shared by quality_scores (which parity-rounds it) and consumers
    that bucket on the raw double (x161 PSI drift)."""
    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    stop_ratio = (
        f"(CASE WHEN size({_TOKS_SQL}) > 0 THEN "
        f"CAST(size(filter({_TOKS_SQL}, t -> t IN ({stops}))) AS DOUBLE)"
        f" / CAST(size({_TOKS_SQL}) AS DOUBLE) ELSE 0.0D END)"
    )
    return F.expr(
        f"least(CAST(size({_TOKS_SQL}) AS DOUBLE), 200.0D) / 200.0D * 0.5D"
        f" + least({stop_ratio} * 10.0D, 1.0D) * 0.5D"
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document quality features + a composite score.

    Features mirror standard LLM-corpus filters: length, mean token
    length, stopword ratio. Composite = capped-length * 0.5 +
    stopword-signal * 0.5, all in double with parity rounding at the end.
    """
    # one string projection (r14): the SQL fragments mirror the F.expr
    # trees exactly (D-suffixed DOUBLE literals), one gateway round
    # trip for the whole select
    from video_streamer_spark.functions.parity import (
        sql_round2,
        sql_round4,
    )

    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    avg_tok_len = (
        f"CASE WHEN size({_TOKS_SQL}) > 0 THEN "
        f"aggregate({_TOKS_SQL}, 0.0D, (acc, t) -> acc +"
        " CAST(length(t) AS DOUBLE))"
        f" / CAST(size({_TOKS_SQL}) AS DOUBLE) ELSE 0.0D END"
    )
    stop_ratio = (
        f"CASE WHEN size({_TOKS_SQL}) > 0 THEN "
        f"CAST(size(filter({_TOKS_SQL}, t -> t IN ({stops}))) AS DOUBLE)"
        f" / CAST(size({_TOKS_SQL}) AS DOUBLE) ELSE 0.0D END"
    )
    score = (
        f"least(CAST(size({_TOKS_SQL}) AS DOUBLE), 200.0D) / 200.0D * 0.5D"
        f" + least(({stop_ratio}) * 10.0D, 1.0D) * 0.5D"
    )
    return docs.selectExpr(
        "doc_id",
        f"CAST(size({_TOKS_SQL}) AS INT) AS n_tokens",
        sql_round2(avg_tok_len) + " AS avg_token_len",
        sql_round4(stop_ratio) + " AS stopword_ratio",
        sql_round4(score) + " AS quality_score",
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprint (md5 of normalized text) + duplicate groups.

    The normalization (trim + lowercase + whitespace collapse) makes the
    fingerprint robust to trivial formatting variance — the cheap first
    pass before MinHash in a dedup cascade.
    """
    fp = docs.select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
        ).alias("fingerprint"),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy("fingerprint")
    )


def tf_idf(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, token) TF-IDF via joins and aggregates — no ML-lib
    hashing trick, so scores are exact and oracle-checkable.

    tf = n_token_in_doc / n_tokens_in_doc; idf = ln(N / doc_freq).
    Shuffle budget: token counts (doc-keyed), doc lengths (doc-keyed,
    same shuffle), doc-freq (token-keyed), then two joins where the
    doc-freq side aggregates to |vocab| rows — at 100 TB the vocab join
    is the broadcast candidate.
    """
    tok = token_explode(docs, id_col)
    tf_counts = tok.groupBy("doc_id", "token").agg(
        F.count("*").alias("n_tok")
    )
    doc_len = tf_counts.groupBy("doc_id").agg(
        F.sum("n_tok").alias("doc_tokens")
    )
    doc_freq = tf_counts.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.select(F.countDistinct(id_col).alias("n")).crossJoin(
        doc_freq.select("token", "df")
    )
    return (
        tf_counts.join(doc_len, "doc_id")
        .join(n_docs, "token")
        .select(
            "doc_id",
            "token",
            (
                (F.col("n_tok").cast("double") / F.col("doc_tokens").cast("double"))
                * F.log(F.col("n").cast("double") / F.col("df").cast("double"))
            ).alias("tfidf_raw"),
        )
    )


def bigram_lm_nll(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style n-gram LM scoring: per-document mean negative
    log-likelihood under an add-one-smoothed bigram model trained on
    the corpus itself — the canonical perplexity screen an LLM data
    pipeline runs before training (CCNet trains KenLM on a clean
    corpus and drops high-perplexity documents; here the model is the
    corpus's own bigram counts, the engine-shaped equivalent).

    Per bigram (w1, w2): NLL term = ln(c1(w1) + V) − ln(c2(w1 w2) + 1),
    i.e. −ln of the smoothed conditional; per doc: mean over its
    bigrams. ln() only ever sees INTEGERS (counts + smoothing), so the
    x195 parity recipe applies: each ln is qdec6 guard-digit
    quantized, per-doc sums are exact DECIMAL, and the final mean is a
    round6 DOUBLE on both engines.

    100 TB shape: bigram construction is codegen (zip_with over two
    array slices, no join); the two count tables are partial-
    aggregable shuffles (map-side combine collapses each partition to
    its distinct grams); scoring is two equi-joins against those
    counts — stop-bigram keys are the skew to watch, which AQE's
    skew-join split handles (the count side is already one row per
    gram, so only the probe side fans out). The vocab size is ONE
    aggregated row (a row-count over the unigram table — V is by
    definition |c1|, so no extra pass) cross-joined broadcast — no
    collect, no UDF. The bigram projection is pool-persisted so the
    corpus is scanned ONCE, not once per count table (plan audit:
    4 FileScans → 1). Returns (id_col, n_bigrams, nll); documents
    with < 2 tokens carry no bigram and are absent (they have no
    conditional likelihood).
    """
    from video_streamer_spark.functions.caching import bounded_persist
    from video_streamer_spark.functions.parity import qdec6, round6

    # the MODEL trains on every token (a 1-token doc still contributes
    # unigram mass and vocabulary); only the SCORED bigrams need >= 2
    toks = bounded_persist(
        docs.select(
            F.col(id_col), tokens_col(text_col).alias("__toks")
        ).where(F.size("__toks") >= 1),
        "bigram-lm-toks",
    )
    tok = toks.select(id_col, F.explode("__toks").alias("__w"))
    c1 = tok.groupBy("__w").agg(F.count("*").alias("__c1"))
    vocab = c1.agg(F.count("*").alias("__v"))
    bi = toks.where(F.size("__toks") >= 2).select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.expr("slice(__toks, 1, size(__toks) - 1)"),
                F.expr("slice(__toks, 2, size(__toks) - 1)"),
                lambda a, b: F.struct(
                    a.alias("w1"),
                    F.concat(a, F.lit(" "), b).alias("bg"),
                ),
            )
        ).alias("__p"),
    ).select(id_col, F.col("__p.w1").alias("__w1"), F.col("__p.bg").alias("__bg"))
    c2 = bi.groupBy("__bg").agg(F.count("*").alias("__c2"))
    terms = (
        bi.join(c2, "__bg")
        .join(c1, bi["__w1"] == c1["__w"])
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            qdec6(F.log((F.col("__c2") + 1).cast("double"))).alias(
                "__lp_num"
            ),
            qdec6(
                F.log((F.col("__c1") + F.col("__v")).cast("double"))
            ).alias("__lp_den"),
        )
    )
    per_doc = terms.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum("__lp_num").alias("__s_num"),
        F.sum("__lp_den").alias("__s_den"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        round6(
            (
                F.col("__s_den").cast("double")
                - F.col("__s_num").cast("double")
            )
            / F.col("n_bigrams").cast("double")
        ).alias("nll"),
    )


# GPT-2-style pretokenizer pattern, restricted to the RE2 ∩ Java-regex
# subset (no lookahead): contraction suffixes, letter runs, digit runs,
# punctuation runs — each optionally preceded by one space.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens_col(text: Column | str) -> Column:
    """BPE-ish subword pretokens via regexp_extract_all — the tokenizer
    shape LLM data pipelines count with, next to the whitespace
    ``tokens_col``. Leading spaces are part of the token (GPT-2
    convention), so counts reflect byte-pair segmentation boundaries."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), 0)


ROLLING_BASE = 131
ROLLING_WINDOW = 8


def rolling_hash_fingerprints(
    docs: DataFrame, window: int = ROLLING_WINDOW
) -> DataFrame:
    """Rabin–Karp rolling-hash fingerprint per document.

    Every ``window``-char substring hashes to Σ ascii(c_j)·B^(w-1-j);
    the doc fingerprint is the MIN window hash (winnowing-style: stable
    under edits that don't touch the minimizing window) plus the
    distinct-window-hash count as a length-insensitive content size.
    All codegen'd array expressions, exactly reproducible in SQL —
    values stay < 2^63 for window ≤ 8, base 131.
    """
    n = F.length("text")
    starts = F.sequence(F.lit(1), n - (window - 1))
    weights = [ROLLING_BASE ** (window - 1 - j) for j in range(window)]
    # every term computed in BIGINT: small weights would otherwise land
    # as IntegerType literals and ascii*int overflows under ANSI mode
    hashes = F.transform(
        starts,
        lambda i: sum(
            F.ascii(F.col("text").substr(i + F.lit(j), F.lit(1))).cast("bigint")
            * F.lit(w).cast("bigint")
            for j, w in enumerate(weights)
        ),
    )
    return docs.where(n >= window).select(
        "doc_id",
        F.array_min(hashes).alias("min_hash"),
        F.size(F.array_distinct(hashes)).cast("int").alias("n_distinct_windows"),
    )


def chunk_documents(
    docs: DataFrame, size: int = 50, stride: int = 40, id_col: str = "doc_id"
) -> DataFrame:
    """Fixed-size token windows with overlap (x63): split → sequence of
    chunk starts → posexplode → slice + array_join, all codegen'd. Sort-
    free and stateless, so the same plan runs unchanged under Structured
    Streaming (asserted by the stream↔batch equivalence test)."""
    toks = tokens_col("text")
    n = F.size(toks)
    with_chunks = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.posexplode(
            F.sequence(F.lit(0), F.floor((n - 1) / F.lit(stride)).cast("int"))
        ).alias("chunk_id", "_start_idx"),
    ).where(F.size(F.col("toks")) > 0)
    chunk = F.slice(F.col("toks"), F.col("chunk_id") * stride + 1, size)
    return with_chunks.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# intra-document repetition signals (Gopher/MassiveText-style filters)


def repetition_signals(docs: DataFrame, top2_max_frac: float = 0.2) -> DataFrame:
    """Per-document repetition metrics from the MassiveText quality
    filters (Gopher, Rae et al. 2021, Table A1), token-based:

    - ``top2_frac``: fraction of tokens covered by the single most
      frequent word 2-gram (2·count/n_tokens);
    - ``dup3_frac``: fraction of 3-gram positions whose 3-gram occurs
      more than once in the document;
    - ``keep``: top2_frac ≤ ``top2_max_frac`` (the Gopher cut).

    Plan: one explode per gram size, counts grouped on (doc_id, gram) —
    partial map-side combine applies, the shuffle key spreads with the
    corpus, and no state is per-corpus (each doc's metrics only see its
    own grams), so the operator scales embarrassingly with documents.
    """
    from video_streamer_spark.catalog import scatter
    from video_streamer_spark.functions.parity import round4
    from video_streamer_spark.operators.dedup import shingles_col, tokens_col

    base = scatter(docs).select(
        "doc_id", F.size(tokens_col("text")).alias("n_tokens"), "text"
    )
    g2 = (
        base.select("doc_id", F.explode(shingles_col("text", 2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top2_count"))
    )
    g3 = (
        base.select("doc_id", F.explode(shingles_col("text", 3)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(0)).alias("dup3"),
            F.sum("n").alias("tot3"),
        )
    )
    top2_frac = (
        F.lit(2.0) * F.col("top2_count").cast("double")
        / F.col("n_tokens").cast("double")
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(g2, "doc_id", "left")
        .join(g3, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("top2_count"), F.lit(0)).cast("bigint").alias("top2_count"),
            round4(F.coalesce(top2_frac, F.lit(0.0))).alias("top2_frac"),
            round4(
                F.coalesce(
                    F.col("dup3").cast("double") / F.col("tot3").cast("double"),
                    F.lit(0.0),
                )
            ).alias("dup3_frac"),
            (F.coalesce(top2_frac, F.lit(0.0)) <= top2_max_frac).alias("keep"),
        )
    )


#: Driver-loop budget for the greedy selection operators (BPE merge
#: rounds, coverage selection): each round is ONE bounded Spark job
#: (vocab-/candidate-sized aggregation + a 1-row TakeOrdered collect),
#: so the loop costs rounds × job-latency on the DRIVER's clock — fine
#: at the tens these operators are designed for, pathological at 10⁴
#: (a tokenizer-scale merge list belongs in a dedicated trainer, not a
#: per-query driver loop). Callers above the budget are refused loudly
#: (r13 VERDICT item 7); pass a bigger ``max_rounds`` to own the cost.
MAX_GREEDY_ROUNDS = 256


def _check_greedy_rounds(requested: int, param: str, max_rounds: int) -> None:
    if requested > max_rounds:
        raise ValueError(
            f"{param}={requested:,} exceeds max_rounds={max_rounds:,}: "
            "each greedy round is one driver-blocking Spark job, so "
            f"this call would run {requested:,} sequential jobs. Use a "
            "bounded selection here, or pass max_rounds explicitly to "
            "own the driver-loop cost (MAX_GREEDY_ROUNDS documents the "
            "default budget)."
        )


def _bpe_train(
    docs: DataFrame, n_merges: int = 3, max_rounds: int = MAX_GREEDY_ROUNDS
):
    """BPE tokenizer training (Sennrich et al. 2016): iteratively find
    the highest-count adjacent symbol pair and merge it everywhere,
    ``n_merges`` times; returns the merge table — (rank, left, right,
    merged, n) — which IS the tokenizer artifact.

    Scale shape: the iteration state is the DISTINCT-WORD vocabulary
    with frequencies (vocab-sized, not corpus-sized — the real BPE-at-
    scale trick), built with one corpus shuffle and persisted. Each
    round is one vocab-sized pair aggregation + a 1-row TakeOrdered
    collect (the chosen pair is a MODEL PARAMETER, the established
    centroid convention), then a codegen'd left-fold merge of the
    symbol arrays — left-to-right non-overlapping, the BPE rule.
    Ties break (count desc, left asc, right asc) so the merge sequence
    is engine-exact. Per-round cost: one vocab-sized shuffle + one
    1-row collect, sequential on the driver — ``max_rounds`` bounds it
    (see ``MAX_GREEDY_ROUNDS``).
    """
    _check_greedy_rounds(n_merges, "n_merges", max_rounds)
    vocab = (
        token_explode(docs)
        .groupBy("token")
        .agg(F.count("*").alias("wc"))
        .select("wc", F.split("token", "").alias("syms"))
        .persist()
    )
    # each round's vocab is built FROM the previous round's, so the
    # previous cache must stay live until the current round's collect
    # materializes — then it retires. Without retirement every round
    # leaked one cached table per call (review r9; the ADVICE leak
    # class, iterative flavor).
    rounds = [vocab]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            # filter BEFORE building the index sequence: sequence(1, 0)
            # would generate a DESCENDING range, not an empty one
            vocab.where(F.size("syms") >= 2)
            .select(
                "wc",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").cast("bigint").alias("n"))
        )
        best = pairs.orderBy(
            F.col("n").desc(), F.col("l"), F.col("r")
        ).limit(1).collect()
        # the collect materialized the CURRENT vocab's cache; every
        # earlier round's cache is now dead weight
        while len(rounds) > 1:
            rounds.pop(0).unpersist()
        if not best:
            break
        a, b, n = best[0].l, best[0].r, best[0].n
        merged = a + b
        merges.append((rank, a, b, merged, n))
        vocab = vocab.select(
            "wc",
            F.aggregate(
                "syms",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == a)
                    & (x == b),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(merged)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("syms"),
        ).persist()
        rounds.append(vocab)
    if len(rounds) > 1:
        # the LAST round's vocab was never materialized inside the loop
        # (each collect materializes the vocab the round STARTED with);
        # fill its cache in one step off the still-cached penultimate
        # round BEFORE retiring — retiring first would force the
        # caller's first action to recompute the whole merge chain
        # (review r9, second pass). Vocab-sized count: cheap.
        vocab.count()
        while len(rounds) > 1:
            rounds.pop(0).unpersist()
    # the FINAL vocab escapes into the caller's lazy plan
    # (bpe_segment_stats aggregates it), so its cache joins the
    # session-bounded pool: the next training run evicts it
    vocab = bounded_persist(vocab, "bpe-final-vocab")
    spark = docs.sparkSession
    merges_df = spark.createDataFrame(
        merges, "merge_rank int, l string, r string, merged string, n bigint"
    )
    return merges_df, vocab


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 3,
    max_rounds: int = MAX_GREEDY_ROUNDS,
) -> DataFrame:
    """The merge table from ``n_merges`` BPE training rounds — (rank,
    left, right, merged, count); see `_bpe_train` for semantics and
    the per-round driver-job cost (``max_rounds`` bounds it)."""
    merges_df, _ = _bpe_train(docs, n_merges, max_rounds=max_rounds)
    return merges_df


def bpe_segment_stats(
    docs: DataFrame,
    n_merges: int = 3,
    max_rounds: int = MAX_GREEDY_ROUNDS,
) -> DataFrame:
    """Corpus segmentation report after applying the trained merges:
    one row with total word occurrences, symbols before (= chars) and
    after merging, and the compression ratio — the number a tokenizer
    team watches while growing the merge list. Aggregates the
    frequency-weighted vocab table (vocab-sized input, exact BIGINT
    sums)."""
    _, vocab = _bpe_train(docs, n_merges, max_rounds=max_rounds)
    agg = vocab.agg(
        F.sum("wc").cast("bigint").alias("n_words"),
        F.sum(F.col("wc") * F.aggregate(
            F.transform("syms", lambda s: F.length(s)),
            F.lit(0),
            lambda acc, x: acc + x,
        )).cast("bigint").alias("syms_before"),
        F.sum(F.col("wc") * F.size("syms")).cast("bigint").alias("syms_after"),
    )
    return agg.select(
        "n_words",
        "syms_before",
        "syms_after",
        (F.col("syms_after").cast("double") / F.col("syms_before").cast("double")
         ).alias("ratio_raw"),
    )


def greedy_coverage_selection(
    docs: DataFrame,
    n_select: int = 3,
    shingle_k: int = 3,
    max_rounds: int = MAX_GREEDY_ROUNDS,
) -> DataFrame:
    """Submodular (coverage-maximizing) document selection — lazy-greedy
    facility location over shingle coverage: each round picks the doc
    adding the most NOT-yet-covered distinct shingles (ties → lowest
    doc_id), the classic 1-1/e-approximate selection modern corpus
    curation uses to buy diversity per token budget.

    Scale shape: the iteration state is the distinct (doc, shingle)
    index (one corpus shuffle, persisted) and the covered-shingle set
    (grows by ≤ one doc's shingles per round). Each round is one
    anti-join + count + 1-row TakeOrdered collect (the selection is the
    model output, the BPE/centroid convention) — sequential on the
    driver, so ``max_rounds`` bounds the loop (``MAX_GREEDY_ROUNDS``).
    Returns (sel_rank, doc_id, gain, covered_total).
    """
    _check_greedy_rounds(n_select, "n_select", max_rounds)
    from video_streamer_spark.operators.dedup import shingles_col

    from video_streamer_spark.catalog import scatter

    sh = (
        scatter(docs)
        .select(
            "doc_id",
            F.explode(shingles_col("text", shingle_k)).alias("g"),
        )
        .select("doc_id", F.md5("g").alias("gh"))
        .distinct()
        .persist()
    )
    spark = docs.sparkSession
    covered = None  # DataFrame of distinct gh
    chosen: list[int] = []
    out: list[tuple[int, int, int, int]] = []
    # every persisted frame here is consumed INSIDE this function (the
    # result is driver-local rows), so all caches drop before return;
    # each round's covered-set retires once the next one materializes
    # (review r9 — the iterative flavor of the ADVICE persist leak)
    covered_rounds: list[DataFrame] = []
    try:
        for rank in range(1, n_select + 1):
            cand = sh
            if chosen:
                cand = cand.where(~F.col("doc_id").isin(chosen))
            if covered is not None:
                cand = cand.join(covered, "gh", "left_anti")
            best = (
                cand.groupBy("doc_id")
                .agg(F.count("*").alias("gain"))
                .orderBy(F.col("gain").desc(), F.col("doc_id"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            doc_id, gain = int(best[0].doc_id), int(best[0].gain)
            chosen.append(doc_id)
            add = sh.where(F.col("doc_id") == doc_id).select("gh")
            covered = (
                add if covered is None else covered.union(add).distinct()
            ).persist()
            covered_rounds.append(covered)
            out.append((rank, doc_id, gain, covered.count()))
            while len(covered_rounds) > 1:
                covered_rounds.pop(0).unpersist()
    finally:
        sh.unpersist()
        while covered_rounds:
            covered_rounds.pop().unpersist()
    return spark.createDataFrame(
        out, "sel_rank int, doc_id bigint, gain bigint, covered_total bigint"
    )


def rake_keywords(docs: DataFrame, top_n: int = 15) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; each word scores degree/frequency
    (degree = Σ co-phrase lengths), a phrase scores the sum of its
    words' scores. Corpus-level: phrases aggregate across documents and
    the top-N by (score, phrase) is the extracted vocabulary.

    Scale shape: phrase splitting is a codegen fold over the token
    array (no Python); word stats are two vocab-sized aggregations;
    the final cut is a TakeOrdered. Scores are DECIMAL(18,6)-quantized
    rationals so ranking is engine-exact.
    """
    toks = tokens_col("text")
    # fold tokens into stopword-delimited phrase runs: accumulator is
    # an array of phrases (arrays of words); stopword -> open new run
    phrases = F.filter(
        F.aggregate(
            toks,
            F.array(F.array().cast("array<string>")),
            lambda acc, t: F.when(
                t.isin(*EN_STOPWORDS),
                F.when(
                    F.size(F.element_at(acc, -1)) > 0,
                    F.concat(acc, F.array(F.array().cast("array<string>"))),
                ).otherwise(acc),
            ).otherwise(
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(F.element_at(acc, -1), F.array(t))),
                )
            ),
        ),
        lambda p: F.size(p) > 0,
    )
    ph = docs.select(F.explode(phrases).alias("p")).transform(
        pooled("rake-phrases")
    )
    words = ph.select(
        F.explode("p").alias("w"), F.size("p").alias("plen")
    )
    stats = words.groupBy("w").agg(
        F.count("*").alias("freq"),
        F.sum("plen").alias("degree"),
    )
    # word score = degree/freq as DECIMAL(18,6) (exact cross-engine)
    wscore = stats.select(
        "w",
        (F.col("degree").cast("double") / F.col("freq").cast("double"))
        .cast("decimal(18,6)")
        .alias("ws"),
    )
    # score each DISTINCT phrase once (occurrences only set n_occ):
    # re-split its words from the phrase string and sum their decimal
    # scores — exact decimal addition, no division, engine-stable
    per_phrase = ph.groupBy(F.concat_ws(" ", "p").alias("phrase")).agg(
        F.count("*").cast("bigint").alias("n_occ")
    )
    pw = per_phrase.select(
        "phrase", "n_occ", F.explode(F.split("phrase", " ")).alias("w")
    )
    return (
        pw.join(wscore, "w")
        .groupBy("phrase", "n_occ")
        .agg(F.sum("ws").cast("decimal(18,6)").alias("score"))
        .orderBy(F.col("score").desc(), F.col("phrase"))
        .limit(top_n)
    )


def winnowing_fingerprints(
    docs: DataFrame, window: int = 4, shingle_k: int = 2
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS scheme): hash every k-token gram, slide a
    w-hash window, keep each window's minimum (leftmost on ties). Any
    shared run of ≥ w+k-1 tokens between two documents is GUARANTEED
    to share a selected fingerprint — the recall property ad-hoc
    sampling lacks — while storing only ~2/(w+1) of the hashes.

    Returns distinct (doc_id, pos, fp) selections. Argmin per window is
    computed the same way in both engines: pass 1 takes the window MIN
    over the w hashes starting at each position (a doc-local analytic
    window); pass 2 equi-joins grams back on (doc, hash = window min)
    within the window's position range and keeps MIN(pos). All work is
    doc-local: per-doc cost ∝ n_grams × w, and the fingerprint density
    bound caps downstream index size.
    """
    from video_streamer_spark.catalog import scatter
    from video_streamer_spark.operators.dedup import shingles_col

    grams = (
        scatter(docs)
        .select(
            "doc_id",
            F.posexplode(shingles_col("text", shingle_k)).alias("i", "g"),
        )
        .select(
            "doc_id",
            "i",
            F.conv(F.substring(F.md5("g"), 1, 14), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        .transform(pooled("winnowing-grams"))
    )
    w_fwd = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, window - 1)
    )
    starts = grams.select(
        "doc_id",
        F.col("i").alias("j"),
        F.min("h").over(w_fwd).alias("wmin"),
        F.count("*").over(w_fwd).alias("wlen"),
    ).where(F.col("wlen") == window)
    sel = (
        starts.alias("s")
        .join(
            grams.alias("g"),
            (F.col("s.doc_id") == F.col("g.doc_id"))
            & (F.col("g.h") == F.col("s.wmin"))
            & (F.col("g.i") >= F.col("s.j"))
            & (F.col("g.i") < F.col("s.j") + window),
        )
        .groupBy("s.doc_id", "s.j")
        .agg(F.min("g.i").alias("pos"), F.first("s.wmin").alias("fp"))
        .select(F.col("doc_id"), "pos", "fp")
        .distinct()
    )
    return sel


# -- PII detection / redaction ---------------------------------------------

# Patterns kept inside the RE2 ∩ Java-regex common subset (no
# lookaround, no backreferences) so the SAME literal string behaves
# identically in Spark's codegen'd regexp_* (java.util.regex) and in a
# DuckDB oracle (RE2) — the property the x220 hash-parity check pins.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\d{3}[-.]\d{3}[-.]\d{4}",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}

# redaction ORDER is part of the contract: emails first (an email can
# contain digit runs a later pattern might clip), then phones, then
# IPs — appliers and oracles must agree or redacted bytes diverge.
PII_ORDER = ("email", "phone", "ipv4")


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Per-row PII counts + redacted text, entirely in codegen'd JVM
    expressions (regexp_count / regexp_replace — no Python in the hot
    path; at 100 TB this runs at scan speed). Appends one
    ``n_<kind>`` count column per pattern and ``out_col`` with each
    match replaced by ``<KIND>`` in :data:`PII_ORDER`.

    Deliberately pattern-simple: production PII scrubbing layers
    validation (TLD lists, phone libs) on top, but the *pipeline
    shape* — count, redact, audit — is exactly this, and the counts
    feed the same curation funnels as the quality scores.

    Each ``n_<kind>`` is counted on the PROGRESSIVELY-REDACTED text
    (after the earlier patterns in :data:`PII_ORDER` have been
    replaced), so the counts are exactly the number of ``<KIND>``
    tokens that pattern emitted into ``out_col`` — a digit run inside
    an already-redacted email is neither counted nor re-redacted.
    Oracles must stage their counts the same way."""
    out = df
    red = F.col(text_col)
    for kind in PII_ORDER:
        pat = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}",
            F.regexp_count(red, F.lit(pat)).cast("int"),
        )
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return out.withColumn(out_col, red)
