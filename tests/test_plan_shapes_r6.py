"""Plan-topology locks for the round-6 adapted TPC-DS pack — the oracle
gate proves values; these prove the scale claims the module header makes:
dims broadcast, INTERSECT plans as semi joins over distinct keys, windows
run over aggregated frames (never raw fact rows), no cartesian products."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.operators import tpcds_shapes


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(tpcds_shapes.QUERIES))
def test_no_cartesian_anywhere(spark, sf_dir, name):
    plan = _plan(tpcds_shapes.QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, name


def test_q14_intersect_is_semi_join(spark, sf_dir):
    """INTERSECT must plan as LeftSemi joins over distinct keys — never a
    materialized pairwise set comparison."""
    plan = _plan(tpcds_shapes.q_tpcds_q14_cross_channel(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "Expand" in plan  # the ROLLUP expands once, post-join


def test_q67_single_expand_then_window(spark, sf_dir):
    """One Expand for the ROLLUP (no per-level re-scan); the rank window
    consumes the aggregated cells, partitioned by grouping id."""
    plan = _plan(tpcds_shapes.q_tpcds_q67_topk_rollup(spark, sf_dir))
    assert plan.count("Expand") == 1
    assert "Window" in plan


def test_q51_windows_over_agg_frame(spark, sf_dir):
    """The cumulative windows must sit ABOVE the (nation, month) aggregate
    — a window over raw lineitem rows would be the naive shape."""
    df = tpcds_shapes.q_tpcds_q51_cumulative(spark, sf_dir)
    plan = _plan(df)
    # WindowExec input flows from HashAggregate (partial+final), and the
    # dims broadcast: the fact side shuffles only for its own aggregation
    assert "Window" in plan and "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan


def test_q93_left_join_preserves_orders_side(spark, sf_dir):
    plan = _plan(tpcds_shapes.q_tpcds_q93_net_after_returns(spark, sf_dir))
    assert "LeftOuter" in plan


def test_q35_double_exists_decorrelates(spark, sf_dir):
    """Both EXISTS must decorrelate to semi joins (Catalyst
    RewritePredicateSubquery — the reference's FlinkSubQueryRemoveRule
    analog); a correlated re-execution per row would be quadratic."""
    plan = _plan(tpcds_shapes.q_tpcds_q35_grouped_exists(spark, sf_dir))
    assert plan.count("LeftSemi") >= 2
