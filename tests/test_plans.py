"""Plan-shape regression tests: the scale properties (pushdown, pruning,
broadcast, bounded shuffles, codegen) asserted on the physical plans.
"""

from __future__ import annotations

from tests.conftest import SF_ORACLE
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
    """The range condition must ride on an equi join (user_id), not force
    a nested-loop cross product."""
    r = plan_report(QUERIES["q20_theta_self_join"](spark, SF_ORACLE))
    assert r.n_bnl_joins == 0, r.text
