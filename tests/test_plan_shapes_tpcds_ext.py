"""Plan-topology locks for the round-6 TPC-DS extension shapes: q88's
scalar subqueries must become 1-row broadcast sides (no shuffled cross
join), and q97's overlap census must keep its FULL OUTER join keyed on the
distinct pairs with no cartesian anywhere."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q88_scalar_subqueries_broadcast(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.operators.tpcds_shapes import (
        q_tpcds_q88_count_census,
    )

    plan = _plan(q_tpcds_q88_count_census(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # three cross joins of 1-row aggregates → broadcast nested loops
    assert plan.count("BroadcastNestedLoopJoin") == 3


def test_q97_full_outer_no_cartesian(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.operators.tpcds_shapes import (
        q_tpcds_q97_channel_overlap,
    )

    df = q_tpcds_q97_channel_overlap(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan
    # the overlap join keys on already-distinct pairs: a HashAggregate
    # (distinct) must sit below the full-outer join on both sides
    assert "HashAggregate" in plan


def test_q49_rank_over_agg_frame(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.operators.tpcds_shapes import (
        q_tpcds_q49_return_ratio_rank,
    )

    plan = _plan(q_tpcds_q49_return_ratio_rank(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # exactly one Window operator (the per-channel rank) over the
    # (channel, part) aggregate — and Spark's rank-limit pushdown must
    # fire: WindowGroupLimit prunes each partition to the top-10 BEFORE
    # the window shuffle (partial) and after (final), so the full ranked
    # frame never materializes
    assert plan.count("Window [") == 1
    assert plan.count("WindowGroupLimit") == 2


def test_q17_chain_is_co_partitioned_smj(spark, sf_dir):
    """The three fact instances must meet as equi-keyed joins on the
    customer key (SMJ/SHJ with the date inequality as the non-equi
    condition) — never a cartesian or a date-only merge join."""
    from flink_release_1_14_5_comment_spark.operators.tpcds_shapes import (
        q_tpcds_q17_sale_return_repurchase,
    )

    plan = _plan(q_tpcds_q17_sale_return_repurchase(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # equi-keyed join strategies only: hash/broadcast-hash/sort-merge on ck
    # (small SFs broadcast the order slices; at scale AQE keeps SMJ/SHJ) —
    # the failure mode this pins out is a date-only merge/nested-loop join
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) \
        or ("BroadcastHashJoin" in plan)


def test_q95_multi_hop_is_semi_join(spark, sf_dir):
    """The EXISTS hop must decorrelate to a semi join, not a full join +
    distinct."""
    from flink_release_1_14_5_comment_spark.operators.tpcds_shapes import (
        q_tpcds_q95_multi_hop_exists,
    )

    plan = _plan(q_tpcds_q95_multi_hop_exists(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
