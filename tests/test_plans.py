"""Plan-shape regression tests: the scale properties (pushdown, pruning,
broadcast, bounded shuffles, codegen) asserted on the physical plans.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE
from video_streamer_spark.plans import plan_report
from video_streamer_spark.queries import QUERIES


def test_q01_filter_and_projection_pushed_to_scan(spark):
    r = plan_report(QUERIES["q01_scan_filter"](spark, SF_ORACLE))
    assert any("l_quantity" in p for p in r.pushed_filters), r.text
    assert r.scans_only_columns("l_orderkey", "l_linenumber", "l_quantity"), (
        r.read_schemas
    )
    assert r.has_codegen


def test_q02_prunes_to_needed_columns(spark):
    r = plan_report(QUERIES["q02_agg_pricing_summary"](spark, SF_ORACLE))
    assert r.scans_only_columns(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    ), r.read_schemas
    assert any("l_shipdate" in p for p in r.pushed_filters), r.pushed_filters


def test_q03_dims_broadcast_no_fact_shuffle_before_agg(spark):
    r = plan_report(QUERIES["q03_multijoin_region_counts"](spark, SF_ORACLE))
    assert r.n_broadcast_joins == 2, r.text
    assert r.n_sortmerge_joins == 0
    # only the aggregation and the final ordering may shuffle
    assert r.n_exchanges <= 2, r.text


def test_q19_label_join_broadcasts(spark):
    r = plan_report(QUERIES["q19a_detections_per_label"](spark, SF_ORACLE))
    assert r.n_broadcast_joins >= 1
    assert r.n_sortmerge_joins == 0


def test_q04_aggregates_before_join(spark):
    """The per-customer aggregation must run below the join (shrinking
    the build side) — visible as the agg appearing under the join node."""
    r = plan_report(QUERIES["q04_topk_customers"](spark, SF_ORACLE))
    join_pos = r.text.find("Join")
    agg_pos = r.text.find("HashAggregate")
    assert join_pos != -1 and agg_pos != -1
    assert r.text.find("TakeOrderedAndProject") != -1, (
        "top-k should not global-sort"
    )


def test_q20_theta_join_is_equi_on_user(spark):
    """Round-12 plan: the interval self-join is a range-frame WINDOW —
    one scan, no join of any kind, and exactly two Exchanges (hash on
    user for the window, hash on event_type for the final aggregate).
    A regression back to the join formulation shows up as a join node
    or a third exchanged copy."""
    r = plan_report(QUERIES["q20_theta_self_join"](spark, SF_ORACLE))
    assert r.n_bnl_joins == 0, r.text
    assert r.n_sortmerge_joins == 0, r.text
    assert "Window" in r.text, r.text
    assert r.n_exchanges <= 2, r.text


def test_x28_asof_join_single_shuffle_per_side(spark):
    """The as-of union-merge must not explode: no nested-loop join, no
    sort-merge join — one Exchange for the union'd window, plus the final
    ordering. A theta-join formulation would show a BNL join here."""
    r = plan_report(QUERIES["x28_asof_purchase_click"](spark, SF_ORACLE))
    assert r.n_bnl_joins == 0, r.text
    assert r.n_sortmerge_joins == 0, r.text
    assert r.n_exchanges <= 3, r.text


def test_x25_aggregates_orders_before_left_join(spark):
    """Left join must probe the pre-aggregated orders (1 row per
    custkey), not raw orders — agg sits below the join."""
    r = plan_report(QUERIES["x25_left_outer_customer_orders"](spark, SF_ORACLE))
    join_pos = r.text.find("Join")
    agg_pos = r.text.find("HashAggregate")
    assert join_pos != -1 and agg_pos != -1
    assert any("o_custkey" in s or "o_totalprice" in s for s in r.read_schemas)


def test_x30_pivot_single_aggregation_pass(spark):
    """Explicit pivot values: one scan, aggregation, no extra job for
    distinct-value discovery (that pass happens at planning time only
    when values are omitted)."""
    r = plan_report(QUERIES["x30_pivot_status_by_year"](spark, SF_ORACLE))
    assert r.scans_only_columns("o_orderdate", "o_orderstatus"), r.read_schemas


def test_x02_minhash_no_extra_distinct_shuffle(spark):
    """Minhash signature stage: explode feeds the doc-keyed aggregation
    directly; shuffles = scatter fan-out + signature agg + band join +
    pair agg + order (≤ 6), not the +2 a (doc,shingle) distinct adds."""
    r = plan_report(QUERIES["x02_dedup_minhash_pairs"](spark, SF_ORACLE))
    assert r.n_exchanges <= 6, r.text


def test_lsh_pair_expansion_is_joinless(spark):
    """r14: the LSH pair families generate in-bucket pairs by grouped
    expansion (sorted collect_list + streamed Generates) in ONE linear
    job. A Join or BroadcastExchange reappearing means the old
    persisted-self-join shape is back: three extra jobs per run
    locally, and a band table no broadcast can hold at real scale."""
    for name in (
        "x02_dedup_minhash_pairs",
        "x03_dedup_simhash_pairs",
        "x200_verbatim_span_dedup",
    ):
        r = plan_report(QUERIES[name](spark, SF_ORACLE))
        assert "Join" not in r.text, f"{name}: join reappeared\n{r.text}"
        assert "BroadcastExchange" not in r.text, name


def test_join_strategy_hints_are_honored(spark):
    """The capability matrix promises joins 'broadcast vs sort-merge vs
    shuffled-hash via hints' — assert each hint actually flips the
    physical join operator on the same equi-join."""
    from video_streamer_spark.catalog import table
    from video_streamer_spark.plans import plan_report

    c = table(spark, SF_ORACLE, "customer")
    o = table(spark, SF_ORACLE, "orders")
    cond = c["c_custkey"] == o["o_custkey"]
    assert "SortMergeJoin" in plan_report(c.hint("merge").join(o, cond)).text
    assert "ShuffledHashJoin" in plan_report(
        c.hint("shuffle_hash").join(o, cond)
    ).text
    assert "BroadcastHashJoin" in plan_report(
        c.hint("broadcast").join(o, cond)
    ).text


def test_hash_sample_is_pure_predicate(spark):
    """x46's selection must compile to scan+filter with NO Exchange — a
    sampling operator that shuffles would be wrong at any scale."""
    from video_streamer_spark.catalog import table
    from video_streamer_spark.operators import sampling

    df = sampling.hash_sample(table(spark, SF_ORACLE, "documents"), 0.15)
    text = plan_report(df).text
    assert "Exchange" not in text, text


def test_stratified_cap_single_shuffle(spark):
    """x47's quota needs exactly one Exchange (the window partitioning
    on the group key) — no extra sort-merge or re-shuffle stages."""
    from video_streamer_spark.catalog import table
    from video_streamer_spark.operators import sampling

    import re

    df = sampling.stratified_cap(
        table(spark, SF_ORACLE, "documents"), ["lang"], 25
    )
    text = plan_report(df).text
    # formatted plans print each node in the tree AND the detail section:
    # count distinct operator ids, not raw substring occurrences
    exchanges = set(re.findall(r"\((\d+)\) Exchange", text))
    assert len(exchanges) == 1, text


def test_x58_funnel_windows_share_one_shuffle(spark):
    """All three stacked running-max windows AND the per-user aggregate
    must ride the same user_id partitioning: exactly one hash Exchange
    in the whole plan (plus at most the final single-partition agg).
    A formulation that re-shuffles per window stage dies at 100 TB."""
    import re

    r = plan_report(QUERIES["x58_event_funnel"](spark, SF_ORACLE))
    hash_ex = set(re.findall(r"\((\d+)\) Exchange hashpartitioning", r.text))
    assert len(hash_ex) <= 1, r.text
    assert r.n_bnl_joins == 0 and r.n_sortmerge_joins == 0


def test_x57_band_join_broadcasts_tiny_dim(spark):
    """The computed 4-row band dimension must be the broadcast side of a
    nested-loop join (range predicates can't hash) — never a shuffle of
    the fact side against it."""
    r = plan_report(QUERIES["x57_quantile_bucket_join"](spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" in r.text, r.text
    assert r.n_sortmerge_joins == 0, r.text


def test_x59_part_dim_broadcasts(spark):
    """part is the small side → broadcast hash join; the revenue agg and
    the per-brand window are the only hash shuffles."""
    import re

    r = plan_report(QUERIES["x59_topk_per_group"](spark, SF_ORACLE))
    assert r.n_broadcast_joins >= 1, r.text
    assert r.n_sortmerge_joins == 0, r.text
    hash_ex = set(re.findall(r"\((\d+)\) Exchange hashpartitioning", r.text))
    assert len(hash_ex) <= 2, r.text


def test_x60_weighted_sample_is_pure_predicate(spark):
    """Weighted sampling must stay a scan-side predicate: no Exchange."""
    from video_streamer_spark.catalog import table
    from video_streamer_spark.operators import sampling

    docs = table(spark, SF_ORACLE, "documents")
    df = sampling.weighted_hash_sample(
        docs, F.least(F.col("n_chars"), F.lit(2000)) / F.lit(2000.0)
    )
    assert "Exchange" not in plan_report(df).text


def test_x65_fuzzy_dedup_is_equi_join(spark):
    """The levenshtein blocking must ride an equi join on
    (lang, length-bucket) — a BNL here means the blocking fell out of
    the join condition and the compare went all-pairs."""
    r = plan_report(QUERIES["x65_fuzzy_dedup_levenshtein"](spark, SF_ORACLE))
    assert r.n_bnl_joins == 0, r.text


def test_dynamic_partition_pruning_on_partitioned_table(spark, tmp_path):
    """Scan-side DPP: joining a lang-partitioned fact against a filtered
    dim must inject a dynamic pruning subquery into the fact scan's
    partition filters — at 100 TB this is the difference between reading
    one partition and reading the table."""
    from video_streamer_spark.catalog import table

    fact_dir = str(tmp_path / "fact_by_lang")
    docs = table(spark, SF_ORACLE, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    # (a) literal dim predicate: Catalyst propagates the constraint
    # STATICALLY through the join into the fact's PartitionFilters
    dim = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .where(F.col("lang") == "en")
    )
    text = plan_report(fact.join(dim, "lang")).text
    assert "= en" in text.split("PartitionFilters", 1)[1].split("]", 1)[0], text
    # (b) non-propagatable dim predicate (on the aggregate): only DPP can
    # prune — the fact scan must carry a dynamicpruning subquery
    dim2 = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 40)
    )
    text2 = plan_report(fact.join(dim2, "lang")).text
    assert "dynamicpruning" in text2.lower(), text2


def test_x142_eval_grams_broadcast_probe(spark):
    """The decontamination probe must BROADCAST the eval n-gram hashes
    (eval sets are small by construction) — a sort-merge join here means
    the full train-side n-gram explosion gets shuffled, which at 100 TB
    is the whole corpus × shingle_k in flight."""
    r = plan_report(QUERIES["x142_ngram_decontamination"](spark, SF_ORACLE))
    assert r.n_sortmerge_joins == 0, r.text
    assert r.n_broadcast_joins >= 1, r.text


def test_x145_semantic_dedup_joins_on_cluster_key(spark):
    """SemDeDup's pair compare must ride the cluster equi-join (cost
    Σ|cell|²) — a BNL/cartesian means the blocking fell out and the
    compare went corpus-global |N|²."""
    r = plan_report(QUERIES["x145_semantic_dedup"](spark, SF_ORACLE))
    assert r.n_bnl_joins == 0, r.text
    assert "CartesianProduct" not in r.text, r.text


def test_x144_rate_table_broadcasts(spark):
    """The mixture-rebalance rate table is dimension-sized (one row per
    source); applying rates to the corpus must broadcast it, never
    shuffle the doc side for the join."""
    r = plan_report(QUERIES["x144_mixture_rebalance"](spark, SF_ORACLE))
    assert r.n_sortmerge_joins == 0, r.text


def test_headline_full_results_are_not_globally_sorted(spark):
    """No non-LIMIT HEADLINE query may end in a global Sort: the result
    contract is a SET (the driver gate and every differential test
    compare order-insensitively), and Spark's total sort adds a
    range-partitioner SAMPLING pass that re-executes the upstream plan —
    measured ~2x on scan-shaped queries (PLANS.md round-5 sort study).
    Sorts that feed a LIMIT (top-k -> TakeOrderedAndProject) are the
    semantic exception and are asserted separately below."""
    import bench

    ordered_topk = {  # ORDER BY + LIMIT: sort is semantic, keep
        "q04_topk_customers",
        "q17_top_tokens",
        "x28_asof_purchase_click",
    }
    for name in bench.HEADLINE:
        if name in ordered_topk:
            continue
        r = plan_report(QUERIES[name](spark, SF_ORACLE))
        global_sorts = [
            ln
            for ln in r.text.splitlines()
            # physical node prints as `Sort [keys...], true, 0` when global
            if "Sort [" in ln and "], true, " in ln
        ]
        assert not global_sorts, (name, global_sorts)
        assert "rangepartitioning" not in r.text.lower(), name


def test_topk_queries_plan_as_take_ordered(spark):
    """The three ordered top-k HEADLINE queries must plan their sort as
    TakeOrderedAndProject (bounded heap, no full sort materialization)."""
    for name in ("q04_topk_customers", "q17_top_tokens"):
        r = plan_report(QUERIES[name](spark, SF_ORACLE))
        assert "TakeOrderedAndProject" in r.text, name


def test_sort_elision_boundary_rules(spark):
    """The registration-boundary sort elision must strip exactly the
    presentation case and nothing else."""
    from video_streamer_spark.queries import (
        _elide_presentation_sort,
        _strip_final_order_by,
    )

    df = spark.range(100).withColumnRenamed("id", "v")
    # presentation sort -> elided
    out = _elide_presentation_sort(df.orderBy("v"))
    assert out._jdf.queryExecution().logical().getClass().getSimpleName() != "Sort"
    # sortWithinPartitions is not a global sort -> kept
    swp = _elide_presentation_sort(df.sortWithinPartitions("v"))
    assert swp._jdf.queryExecution().logical().getClass().getSimpleName() == "Sort"
    # orderBy + limit -> root is Limit, untouched (top-k contract)
    topk = _elide_presentation_sort(df.orderBy("v").limit(5))
    assert [r.v for r in topk.collect()] == [0, 1, 2, 3, 4]

    # oracle twin: strips only a final, paren-balanced, LIMIT-free clause
    assert _strip_final_order_by(
        "SELECT a FROM t ORDER BY a"
    ).rstrip().endswith("FROM t")
    kept_limit = "SELECT a FROM t ORDER BY a LIMIT 5"
    assert _strip_final_order_by(kept_limit) == kept_limit
    kept_window = "SELECT ROW_NUMBER() OVER (ORDER BY a) FROM t"
    assert _strip_final_order_by(kept_window) == kept_window
    kept_sub = "SELECT * FROM (SELECT a FROM t ORDER BY a)"
    assert _strip_final_order_by(kept_sub) == kept_sub
    # function parens inside the final clause are balanced -> stripped
    assert _strip_final_order_by(
        "SELECT a FROM t GROUP BY a ORDER BY SUM(b) DESC, a"
    ).rstrip().endswith("GROUP BY a")


def test_sort_elision_survives_broken_jvm_seam(spark, monkeypatch, capsys):
    """The elision rides private Spark internals; a Spark upgrade that
    moves them must degrade to keep-the-Sort (correct, slower) with a
    one-time warning — never an error that takes every registered
    query down (r13 VERDICT what's-wrong item 2)."""
    import video_streamer_spark.queries as qpkg

    df = spark.range(100).withColumnRenamed("id", "v").orderBy("v")

    # simulate the upgrade: the private accessor path raises (a class
    # property shadows the instance attribute for every DataFrame)
    def _boom(self):
        raise RuntimeError("private API moved")

    monkeypatch.setattr(type(df), "_jdf", property(_boom), raising=False)
    monkeypatch.setattr(qpkg, "_ELIDE_SEAM_WARNED", False)
    try:
        out = qpkg._elide_presentation_sort(df)
        out2 = qpkg._elide_presentation_sort(df)
    finally:
        monkeypatch.undo()
    # fallback returns the ORIGINAL (still-sorted, correct) frame
    assert out is df and out2 is df
    warned = capsys.readouterr().err
    assert warned.count("_elide_presentation_sort") == 1  # one-time
    assert [r.v for r in df.limit(3).collect()] == [0, 1, 2]


def test_x151_x152_pq_codebook_broadcasts(spark):
    """PQ's codebook/LUT sides are dimension-sized and must broadcast;
    the corpus must never shuffle for the join (only the vec_id
    re-aggregation may exchange), and the ADC top-k must plan as
    TakeOrderedAndProject, not a global sort."""
    r = plan_report(QUERIES["x151_pq_encode"](spark, SF_ORACLE))
    assert "BroadcastExchange" in r.text, r.text
    assert r.n_sortmerge_joins == 0, r.text
    r2 = plan_report(QUERIES["x152_pq_adc_topk"](spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in r2.text, r2.text
    assert r2.n_sortmerge_joins == 0, r2.text


def test_x155_index_probe_prunes_partitions(spark):
    """The materialized IVF index scan must show the probed cells as
    PartitionFilters (pruned cell= directories) — NOT a full scan with
    a row filter. This is the physical claim every IVF docstring makes:
    a probe reads n_probe/n_cells of the bytes."""
    r = plan_report(QUERIES["x155_ivf_index_search"](spark, SF_ORACLE))
    assert "PartitionFilters" in r.text, r.text
    seg = r.text.split("PartitionFilters")[1][:200]
    assert "cell" in seg, seg


def test_x159_ivfpq_scan_prunes_partitions_and_columns(spark):
    """The compressed index probe must prune BOTH ways: only the probed
    cell= partitions (PartitionFilters) and only the code columns
    (ReadSchema must not contain any vector column)."""
    r = plan_report(QUERIES["x159_ivfpq_index_search"](spark, SF_ORACLE))
    assert "PartitionFilters" in r.text, r.text
    seg = r.text.split("PartitionFilters")[1][:200]
    assert "cell" in seg, seg
    # the index holds no vectors at all, and the scan reads only codes
    idx_schemas = [s for s in r.read_schemas if "code_0" in s]
    assert idx_schemas and all("embedding" not in s for s in idx_schemas), (
        r.read_schemas
    )


def test_round5_blocked_joins_never_go_cartesian(spark):
    """The blocking contracts of the round-5 pair generators: source
    overlap (x148) rides the shingle-hash equi-join, record linkage
    (x157) the nation block, containment (x162) the rarest-shingle
    equi-join, stitching (x171) the boundary-gram equi-join. A dropped
    blocking key turns any of them into a cartesian/BNL — the
    all-pairs explosion this engine bans."""
    for name in (
        "x148_source_overlap",
        "x157_record_linkage",
        "x162_containment_dedup",
        "x171_doc_stitching",
    ):
        r = plan_report(QUERIES[name](spark, SF_ORACLE))
        assert "CartesianProduct" not in r.text, name
        assert r.n_bnl_joins == 0, (name, r.text)


def test_x195_entropy_is_two_hash_aggs_no_udf(spark):
    """x195's 100 TB shape: explode → (doc,char) hash agg → doc hash agg.
    Both aggregations must be codegen HashAggregates with map-side
    partials (exactly 2 Exchanges: one per grouping), no Python boundary
    anywhere — the entropy math is pure column expressions."""
    r = plan_report(QUERIES["x195_char_entropy_quality"](spark, SF_ORACLE))
    assert r.n_exchanges == 2, r.text
    assert "HashAggregate" in r.text
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in r.text, marker
    assert r.has_codegen
    # only doc_id and text leave the documents scan (column pruning)
    assert r.scans_only_columns("doc_id", "text"), r.read_schemas


def test_x196_journal_combine_is_partial_aggregable(spark, tmp_path):
    """The read-side combine of the partial journal must itself be one
    partial-aggregable hash agg over journal rows — a single Exchange on
    the rollup key, no join back to the fact table."""
    from video_streamer_spark.catalog import table
    from video_streamer_spark.streaming.incremental import (
        combine_rollup,
        write_partial_batch,
    )

    journal = str(tmp_path / "journal")
    e = table(spark, SF_SMOKE, "events").select("ts", "event_type", "value")
    write_partial_batch(e, 0, journal)
    r = plan_report(combine_rollup(spark, journal))
    assert r.n_exchanges == 1, r.text
    assert "HashAggregate" in r.text
