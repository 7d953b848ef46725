"""Plan-topology locks for pipeline/retrieval.py — prove the 100 TB claims
the docstrings make: query terms broadcast (the corpus token stream is
filtered by a BroadcastHashJoin before any aggregation), document length
computed without exploding (no token shuffle feeds the dl aggregate), and
the only cross join in the hybrid plan is the broadcast probe-vector side.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_query_terms_broadcast(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.pipeline.retrieval import q_bm25_topk

    plan = _plan(q_bm25_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the literal term table joins the exploded token stream broadcast-side
    assert "BroadcastHashJoin" in plan
    # corpus stats reach the per-term weight via a broadcast nested loop of
    # a 1-row aggregate, never a shuffled cross join
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_hybrid_rrf_only_broadcast_cross_join(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.pipeline.retrieval import (
        q_hybrid_rrf_fusion,
    )

    plan = _plan(q_hybrid_rrf_fusion(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # dense side: corpus x broadcast(4 probe vectors); stats: broadcast 1-row
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "BroadcastHashJoin" in plan


def test_hll_is_two_bounded_aggregations(spark, sf_dir):
    """The HLL plan must be scan → hash-agg (group,bucket ≤ 64/group) →
    hash-agg (group) joined with the exact-count audit — no window, no
    join on the event stream itself."""
    from flink_release_1_14_5_comment_spark.pipeline.sketches import (
        q_approx_distinct_hll,
    )

    plan = _plan(q_approx_distinct_hll(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    # register build + merge + exact-distinct expand: all HashAggregates
    assert "HashAggregate" in plan
