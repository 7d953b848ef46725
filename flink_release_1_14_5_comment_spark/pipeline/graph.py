"""Graph helpers (SURVEY §1.1 Gelly `Graph<K,VV,EV>`; §2.9 DataSet bulk/delta
iterations — IterativeDataSet.java:41).

Flink's Gelly is vertex/edge DataSets + iterative joins; the Spark-first
equivalent is DataFrames + a driver-side iteration loop (Flink's bulk
iteration = our loop; its delta iteration = our convergence check on the
changed-label count).

`connected_components` implements min-label propagation: each node adopts
the smallest label among itself and its neighbors until fixpoint. At 100 TB
scale the proper algorithm is large-star/small-star (alternating
conditional stars, O(log n) rounds, same join shape) — noted here because
plain propagation needs O(diameter) rounds; for dedup-cluster graphs
(diameter ≈ 2-4) propagation IS the right choice.

Primary consumer: near-dup pair graphs → duplicate clusters (the standard
last step of a MinHash dedup pipeline: keep min doc_id per cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views
from flink_release_1_14_5_comment_spark.pipeline.dedup import (
    ORACLE_CAND_CTE,
    ORACLE_DOCS_CTE,
    ORACLE_SH_CTE,
    ORACLE_SIG_CTE,
    q_dedup_minhash_lsh,
)


# Below this many edges, the pair graph is collected and solved with
# union-find on the driver — the standard hybrid: near-dup pairs after
# LSH + verification are a tiny fraction of the corpus (they are the
# *output* of the pruning pipeline), so a single small collect beats
# O(diameter) distributed rounds. Above it, the distributed loop runs.
# Memory bound, not a tuning knob: 5M edges × 2 longs ≈ 80 MB+ of driver
# heap as Python rows — well inside this rig's 48 GB driver, but on a
# shared cluster driver size it down (or set 0 to force the distributed
# path, which is the safe default when driver memory is unknown) — both via
# SPARK_GRAFT_CC_MAX_DRIVER_EDGES, so cluster deploys flip it without a
# code change.
DRIVER_UNION_FIND_MAX_EDGES = int(
    os.environ.get("SPARK_GRAFT_CC_MAX_DRIVER_EDGES", 5_000_000))


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iters: int = 30) -> DataFrame:
    """(node, component) for the undirected graph given by `edges`;
    component = min node id reachable. Small graphs: driver union-find.
    Large graphs: distributed min-label propagation with a delta-style
    convergence check (stop when no label changed)."""
    n_edges = edges.count()
    if n_edges <= DRIVER_UNION_FIND_MAX_EDGES:
        return _driver_union_find(edges, src, dst)
    return _distributed_cc(edges, src, dst, max_iters)


def _driver_union_find(edges: DataFrame, src: str, dst: str) -> DataFrame:
    pairs = edges.select(src, dst).collect()
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for row in pairs:
        a, b = row[src], row[dst]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the representative is the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    return edges.sparkSession.createDataFrame(rows, "node long, component long")


def _distributed_cc(edges: DataFrame, src: str, dst: str, max_iters: int) -> DataFrame:
    undirected = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        undirected.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    labels.count()
    for _ in range(max_iters):
        neighbor_min = (
            undirected.join(labels, undirected.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    undirected.unpersist()
    return labels


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash pair graph → connected components →
    (doc_id, cluster representative, cluster size). The canonical "which
    docs to drop" output of a dedup pipeline."""
    # Persist the pair graph: connected_components consumes it twice (the
    # edge count that picks the strategy, then the collect/iteration) — one
    # materialization of the full MinHash pipeline instead of two.
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").persist()
    cc = connected_components(pairs, "doc_a", "doc_b")
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(F.col("node").alias("doc_id"), F.col("component").alias("keep_id"), "cluster_size")
    )


# Recursive-CTE transitive closure; min reachable node = component. The doc
# pair graph is tiny relative to the corpus, so closure is cheap for the
# oracle even though the Spark side uses iteration.
ORACLE_Q_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
  -- inline near-dup pairs: same pipeline as the dedup_minhash_lsh oracle
  WITH docs AS ({ORACLE_DOCS_CTE}), sh AS ({ORACLE_SH_CTE}),
  sig AS ({ORACLE_SIG_CTE}), cand AS ({ORACLE_CAND_CTE})
  SELECT doc_a, doc_b FROM cand
  JOIN sh sa ON sa.doc_id = doc_a
  JOIN sh sb ON sb.doc_id = doc_b
  WHERE len(list_intersect(sa.sh, sb.sh))
        / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.4
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(a, b) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
), cc AS (
  SELECT a AS doc_id, MIN(b) AS keep_id FROM reach GROUP BY a
)
SELECT doc_id, keep_id,
       CAST(COUNT(*) OVER (PARTITION BY keep_id) AS BIGINT) AS cluster_size
FROM cc
"""


QUERIES = {
    "dedup_clusters": q_dedup_clusters,
}

ORACLE = {
    "dedup_clusters": ORACLE_Q_DEDUP_CLUSTERS,
}
