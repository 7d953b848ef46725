"""Plan-property tests for the scale strategies (operators/scale.py): the
oracle gate proves the rewrites preserve semantics; these tests lock the
*topology* claims — shard counts, zero-Exchange co-located joins."""

from __future__ import annotations

import sys
import uuid

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.catalog import load_tables
from flink_release_1_14_5_comment_spark.operators.scale import (
    count_exchanges,
    salted_join,
    split_distinct_agg,
    write_bucketed,
)


def test_salted_join_matches_plain_and_shards(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    probe = t["lineitem"].select("l_orderkey", "l_linenumber", "l_quantity").withColumn(
        "__uid", F.concat_ws("#", "l_orderkey", "l_linenumber")
    )
    build = t["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    salted = salted_join(probe, build, "l_orderkey", salt=8, probe_uid="__uid").drop("__uid")
    plain = probe.drop("__uid").join(build, "l_orderkey")
    assert salted.count() == plain.count() > 0
    assert salted.exceptAll(plain).count() == 0
    # every probe row got exactly one shard; shards spread (not all in one)
    shards = (
        probe.withColumn("__salt", F.pmod(F.xxhash64("__uid"), F.lit(8)))
        .agg(F.count_distinct("__salt"))
        .first()[0]
    )
    assert shards == 8


def test_split_distinct_agg_matches_plain(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    got = split_distinct_agg(t["lineitem"], ["l_returnflag"], "l_partkey", buckets=8)
    want = t["lineitem"].groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_distinct")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Both sides bucketed by the join key at write time -> the sort-merge
    join reads co-located buckets with ZERO Exchange in the plan (the
    property that makes repeated fact-fact joins affordable at 100 TB)."""
    t = load_tables(spark, sf_dir)
    sfx = uuid.uuid4().hex[:8]
    t_orders, t_line = f"b_orders_{sfx}", f"b_lineitem_{sfx}"
    try:
        write_bucketed(t["orders"].select("o_orderkey", "o_totalprice"),
                       t_orders, "o_orderkey", num_buckets=8)
        write_bucketed(
            t["lineitem"].select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
            t_line, "o_orderkey", num_buckets=8,
        )
        a, b = spark.table(t_orders), spark.table(t_line)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = a.join(b, "o_orderkey")
            assert count_exchanges(j) == 0
            # and an unbucketed equivalent DOES shuffle, so the assert means something
            ub = (
                t["orders"].select("o_orderkey", "o_totalprice")
                .join(t["lineitem"].select(F.col("l_orderkey").alias("o_orderkey"),
                                           "l_quantity"), "o_orderkey")
            )
            assert count_exchanges(ub) > 0
            assert j.count() == ub.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_line}")


def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    """The tier range join must broadcast the tiny bounds table into a
    nested-loop join — no Exchange on the fact side for a non-equi
    predicate against a VALUES relation."""
    from flink_release_1_14_5_comment_spark.operators.scale import q_range_join_tiers

    df = q_range_join_tiers(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert df.count() == 3


def test_packing_plans_prune_and_avoid_cartesian(spark, sf_dir):
    """pack_sequences must scan only (doc_id, text) — column pruning reaches
    the parquet scan — and neither batch-assembly query may degenerate into
    a cartesian product."""
    from flink_release_1_14_5_comment_spark.pipeline import packing

    p1 = packing.q_pack_sequences(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in p1.splitlines() if "ReadSchema" in l][0]
    assert "doc_id:bigint,text:string" in scan.replace(" ", "")
    assert "Cartesian" not in p1
    p2 = packing.q_contamination_overlap(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in p2


def test_analytic_shapes_plans(spark, sf_dir):
    """Plan audit for the TPC-DS-shape family: dims broadcast (no shuffle on
    the fact side for dim joins), correlated EXISTS/INTERSECT decorrelate to
    semi joins (never cartesian), and the pivot stays one aggregate pass."""
    from flink_release_1_14_5_comment_spark.operators import analytic_shapes as a

    deep = a.q_deep_chain_regions(spark, sf_dir)
    p = deep._jdf.queryExecution().executedPlan().toString()
    assert p.count("BroadcastHashJoin") >= 4  # nation x2, region, part, supplier...
    assert "Cartesian" not in p

    ex = a.q_channel_intersect_customers(spark, sf_dir)
    p = ex._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in p
    assert "LeftSemi" in p  # INTERSECT branches become semi joins

    piv = a.q_pivot_monthly_revenue(spark, sf_dir)
    p = piv._jdf.queryExecution().executedPlan().toString()
    # one base aggregate pass over orders (partial+final pair), not 4 scans
    assert p.count("Scan parquet") <= 3  # orders + customer + nation
    assert "Cartesian" not in p

    bw = a.q_best_worst_rank_join(spark, sf_dir)
    p = bw._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in p


def test_round4_new_op_plan_shapes(spark, sf_dir):
    """Plan audit for the round-4 additions: k-means assignment broadcasts
    the centroid set (BroadcastNestedLoopJoin, corpus side never
    exchanges for the cross join); the wedge joins (Jaccard) and the
    duplicated-span detector run as equi-joins — no CartesianProduct
    anywhere."""
    from flink_release_1_14_5_comment_spark.pipeline import clustering, graph
    from flink_release_1_14_5_comment_spark.pipeline.text_analysis import (
        q_duplicate_spans,
    )

    km = clustering.q_embedding_kmeans(spark, sf_dir)
    p = km._jdf.queryExecution().executedPlan().toString()
    # assignment is a pure codegen map over literal centroids: no join of
    # any kind, no window sort, and no HASH-partitioned shuffle — the only
    # Exchanges allowed are the deliberate RoundRobin spread repartitions
    # (their count varies with what earlier tests left cached).
    assert "Join" not in p and "CartesianProduct" not in p
    assert "Window" not in p
    exchanges = [l for l in p.splitlines() if "Exchange" in l]
    assert all("RoundRobinPartitioning" in l for l in exchanges), exchanges

    jac = graph.q_graph_jaccard(spark, sf_dir)
    p = jac._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p  # wedge join is an equi-join

    ds = q_duplicate_spans(spark, sf_dir)
    p = ds._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    # column pruning: only (doc_id, text) leave the documents scan
    scan = [l for l in p.splitlines()
            if "ReadSchema" in l and "documents" in l][0]
    assert "doc_id:bigint,text:string" in scan.replace(" ", "")


def test_incremental_dedup_prefilter_broadcasts(spark, sf_dir):
    """The two-tier incremental dedup must broadcast the bounded prefix
    sketch (both the definite-new anti-join and the candidate semi-join),
    and contain no cartesian anywhere."""
    from flink_release_1_14_5_comment_spark.pipeline.dedup import (
        q_dedup_incremental,
    )

    df = q_dedup_incremental(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_tpch_partsupp_suite_plan_shapes(spark, sf_dir):
    """Plan audit for the derived-partsupp TPC-H queries: the surrogate CTE
    must not change the spec plan shapes — dim chains broadcast, Q16's
    NOT IN decorrelates to an anti join, Q20's nested IN to a semi join,
    and nothing degenerates into a cartesian product."""
    from flink_release_1_14_5_comment_spark.operators import tpch

    expect = {
        # name: (min BroadcastHashJoin, must-have join marker or None)
        "tpch_q2": (5, None),       # part/supplier/nation/region chain ×2 sides
        "tpch_q9": (4, None),       # part/supplier/orders/nation around lineitem
        "tpch_q11": (3, None),      # supplier/nation on both HAVING branches
        "tpch_q16": (1, "Anti"),    # NOT IN (negative-balance suppliers)
        "tpch_q20": (3, "Semi"),    # nested IN chains
    }
    for name, (min_bhj, marker) in expect.items():
        p = tpch.QUERIES[name](spark, sf_dir) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Cartesian" not in p, name
        assert p.count("BroadcastHashJoin") >= min_bhj, (name, p.count("BroadcastHashJoin"))
        if marker:
            assert marker in p, name


def test_lm_perplexity_plan_shape(spark, sf_dir):
    """The LM filter must train+score without a cartesian: count tables
    join by hash, and the only nested-loop is the broadcast of the 1-row
    vocabulary-size frame."""
    from flink_release_1_14_5_comment_spark.pipeline import quality

    p = quality.q_lm_perplexity(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoop") <= 1  # the scalar |V| frame only
