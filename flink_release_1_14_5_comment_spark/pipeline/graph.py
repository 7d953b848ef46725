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

from pyspark.sql import DataFrame, SparkSession, Window as W
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
# heap as Python rows — well inside a local[*] rig's driver, but on a
# shared cluster the driver's memory is unknown, so the default there is 0
# (always distributed — VERDICT r4 #7). SPARK_GRAFT_CC_MAX_DRIVER_EDGES
# overrides either way, so deploys flip it without a code change.
DRIVER_UNION_FIND_MAX_EDGES = 5_000_000


def _driver_edge_cap(spark) -> int:
    env = os.environ.get("SPARK_GRAFT_CC_MAX_DRIVER_EDGES")
    if env is not None:
        return int(env)
    master = spark.conf.get("spark.master", "")
    return DRIVER_UNION_FIND_MAX_EDGES if master.startswith("local") else 0


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iters: int = 30) -> DataFrame:
    """(node, component) for the undirected graph given by `edges`;
    component = min node id reachable. Small graphs: driver union-find.
    Large graphs: distributed min-label propagation with a delta-style
    convergence check (stop when no label changed)."""
    n_edges = edges.count()
    if n_edges <= _driver_edge_cap(edges.sparkSession):
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
            # lazy checkpoint, not persist: each round references `labels`
            # three times (neighbor_min, the merge join, the changed
            # count), so an un-truncated plan grows 3^iters — the HITS
            # OOM class (SCALE.md r10). The per-round `changed` count
            # materializes it exactly like the old persist+count.
            .localCheckpoint(eager=False)
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


def q_dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection policy: for every near-dup cluster,
    keep the LONGEST member (n_chars desc, doc_id tiebreak) instead of the
    min-id default — the RefinedWeb/C4-style "best document wins" dedup
    policy, composed from the same cluster frame q_dedup_clusters grades.
    Output is one row per cluster: representative id, size, and how many
    docs the policy drops. The argmax is a window over the cluster frame
    (one row per clustered doc — tiny vs the corpus), never the raw
    documents table."""
    cc = q_dedup_clusters(spark, sf_dir)
    docs = register_views(spark, sf_dir)["documents"].select("doc_id", "n_chars")
    w = W.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.col("doc_id"))
    return (
        cc.withColumnRenamed("keep_id", "cluster_id")
        .join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_id"),
            "cluster_size",
            F.col("n_chars").cast("long").alias("rep_n_chars"),
            (F.col("cluster_size") - 1).cast("long").alias("n_dropped"),
        )
    )


ORACLE_Q_DEDUP_CLUSTER_REPRESENTATIVES = f"""
WITH RECURSIVE pairs AS (
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
  SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
), sized AS (
  SELECT doc_id, cluster_id,
         CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
  FROM cc
), ranked AS (
  SELECT s.cluster_id, s.doc_id, s.cluster_size, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY s.cluster_id
                            ORDER BY d.n_chars DESC, s.doc_id) AS rn
  FROM sized s JOIN documents d ON d.doc_id = s.doc_id
)
SELECT cluster_id, doc_id AS rep_id, cluster_size,
       CAST(n_chars AS BIGINT) AS rep_n_chars,
       CAST(cluster_size - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rn = 1
"""


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 5, damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank (Gelly `PageRank.java` / its examples'
    power-iteration form): rank = (1-d)/n + d * Σ rank(in-nbr)/deg(in-nbr).

    Spark-first: the per-iteration step is one join + one groupBy-sum over
    the edge frame — Catalyst handles it as a plain shuffle pipeline; the
    driver loop is Flink's bulk iteration (IterativeDataSet.java:41).
    Dangling-node mass is NOT redistributed (same simplification as Gelly's
    basic PageRank); ranks are persisted per round so lineage stays flat.

    Scale: each round shuffles edges once on dst + ranks once on node —
    O(iters) shuffles total, the textbook distributed PageRank shape. For
    100 TB-class graphs, pre-partition edges by dst so the contribution
    groupBy reuses the layout across every round.
    """
    e = edges.select(src, dst).persist()
    nodes = e.select(F.col(src).alias("node")).union(
        e.select(F.col(dst).alias("node"))).distinct().persist()
    n = nodes.count()
    deg = e.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (
            e.join(deg, src)
            .join(ranks, F.col(src) == F.col("node"))
            .select(F.col(dst).alias("node"),
                    (F.col("pr") / F.col("__deg")).alias("__c"))
            .groupBy("node").agg(F.sum("__c").alias("__s"))
        )
        new_ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit((1.0 - damping) / n)
             + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))).alias("pr"),
        ).localCheckpoint(eager=False)  # O(1) lineage/round (SCALE.md r10)
        new_ranks.count()  # materialize, then drop the previous round
        ranks.unpersist()
        ranks = new_ranks
    e.unpersist()
    nodes.unpersist()
    return ranks


def single_source_shortest_paths(edges: DataFrame, source: str,
                                 src: str = "src", dst: str = "dst",
                                 max_hops: int = 6) -> DataFrame:
    """Unweighted SSSP / BFS hop distances (Gelly
    `SingleSourceShortestPaths.java`, unit weights): (node, dist) for every
    node within ``max_hops`` of ``source``. Frontier-expansion loop — each
    round relaxes distances through one edge join + min-aggregate, Flink's
    delta iteration (only the frontier joins, convergence when no node
    improves)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    dist = edges.sparkSession.createDataFrame(
        [(source, 0)], "node string, dist int").persist()
    frontier = dist
    retired = []  # superseded dist/frontier frames, unpersisted at exit
    for hop in range(1, max_hops + 1):
        reached = (
            frontier.join(e, frontier.node == e.a)
            .select(F.col("b").alias("node"), F.lit(hop).alias("dist"))
            .distinct()
        )
        new_frontier = reached.join(dist, "node", "left_anti") \
            .localCheckpoint(eager=False)  # O(1) lineage/round (SCALE.md r10)
        if new_frontier.isEmpty():  # delta iteration: converged
            new_frontier.unpersist()
            break
        new_dist = dist.union(new_frontier).localCheckpoint(eager=False)
        new_dist.count()  # materialize before retiring the frames it reads
        retired.extend((dist, frontier) if frontier is not dist else (dist,))
        dist, frontier = new_dist, new_frontier
    for df in retired:
        if df is not frontier:
            df.unpersist()
    e.unpersist()
    # `dist` stays persisted: it is the returned result (one small frame)
    return dist


# Trade graph for the graph-algorithm queries: supplier S_x — customer C_y
# whenever x shipped a line item on y's order; undirected (both directions).
_TRADE_EDGES_CTE = """
SELECT DISTINCT 'S_' || l_suppkey AS src, 'C_' || o_custkey AS dst
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_views(spark, sf_dir)
    direct = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("S_"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C_"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return direct.union(
        direct.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier-customer trade graph, 5 iterations."""
    ranks = pagerank(_trade_edges(spark, sf_dir), iters=5)
    return ranks.select("node", F.round("pr", 6).alias("pr"))


def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances from supplier S_1 over the trade graph (≤4 hops)."""
    return single_source_shortest_paths(
        _trade_edges(spark, sf_dir), "S_1", max_hops=4)


def _pagerank_oracle(iters: int = 5, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank (no recursive aggregates needed —
    one CTE per round, mechanically identical to the Spark loop)."""
    parts = [
        f"WITH dedges AS ({_TRADE_EDGES_CTE}),",
        "edges AS (SELECT src, dst FROM dedges UNION "
        "SELECT dst AS src, src AS dst FROM dedges),",
        "nodes AS (SELECT DISTINCT src AS node FROM edges),",
        "nn AS (SELECT COUNT(*) AS n FROM nodes),",
        "deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),",
        "pr0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS pr FROM nodes),",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"pr{k} AS (SELECT n.node, (1-{damping})/(SELECT n FROM nn) + "
            f"{damping} * COALESCE((SELECT SUM(p.pr / d.d) FROM edges e "
            f"JOIN pr{k-1} p ON p.node = e.src JOIN deg d ON d.node = e.src "
            f"WHERE e.dst = n.node), 0) AS pr FROM nodes n),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT node, ROUND(pr, 6) AS pr FROM pr{iters}")
    return "\n".join(parts)


ORACLE_Q_GRAPH_SSSP = f"""
WITH RECURSIVE dedges AS ({_TRADE_EDGES_CTE}),
edges AS (SELECT src, dst FROM dedges UNION
          SELECT dst AS src, src AS dst FROM dedges),
reach(node, dist) AS (
  SELECT 'S_1', 0
  UNION
  SELECT e.dst, r.dist + 1 FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.dist < 4
)
SELECT node, CAST(MIN(dist) AS INT) AS dist FROM reach GROUP BY node
"""


def weighted_sssp(edges: DataFrame, source: str, src: str = "src",
                  dst: str = "dst", weight: str = "weight",
                  max_iters: int = 20) -> DataFrame:
    """Weighted single-source shortest paths — Bellman-Ford relaxation
    rounds (Gelly `SingleSourceShortestPaths.java` is the weighted form;
    its scatter-gather iteration = this join-and-min loop). Directed edges
    with non-negative weights; converges when no node's distance improves
    (delta iteration), or stops after ``max_iters`` rounds (= the longest
    shortest path's hop count that can be represented).

    Scale: each round is one join keyed on the frontier node + one min
    aggregate keyed on dst — the same two-shuffle shape as PageRank; at
    100 TB pre-partition edges by src so every round reuses the layout.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"),
                     F.col(weight).cast("double").alias("w")).persist()
    dist = edges.sparkSession.createDataFrame(
        [(source, 0.0)], "node string, dist double").persist()
    for _ in range(max_iters):
        cand = (
            dist.join(e, dist.node == e.a)
            .groupBy(F.col("b").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        new_dist = (
            dist.join(cand, "node", "full_outer")
            .select("node",
                    F.least(F.coalesce(F.col("dist"), F.lit(float("inf"))),
                            F.coalesce(F.col("cand"), F.lit(float("inf"))))
                    .alias("dist"))
            # `dist` is referenced twice per round (cand + merge) — lazy
            # checkpoint keeps the Bellman-Ford plan O(1)/round
            .localCheckpoint(eager=False)
        )
        improved = (
            new_dist.alias("n").join(dist.alias("o"), "node", "left")
            .filter(F.col("o.dist").isNull()
                    | (F.col("n.dist") < F.col("o.dist")))
            .count()
        )
        dist.unpersist()
        dist = new_dist
        if improved == 0:
            break
    e.unpersist()
    return dist


def label_propagation(edges: DataFrame, src: str = "src", dst: str = "dst",
                      iters: int = 3) -> DataFrame:
    """Synchronous label propagation (Gelly `LabelPropagation.java`):
    every node starts labeled with its own id; each round every node adopts
    the most frequent label among its neighbors, ties broken by the
    SMALLEST label (deterministic — Gelly breaks ties by label order too).
    Fixed ``iters`` rounds (community detection runs a handful of rounds;
    convergence is not guaranteed on bipartite graphs, where synchronous
    LPA can oscillate — determinism, not convergence, is the contract).

    Spark-first: one round = edge⋈labels join, a (node,label) count, and a
    row_number() arg-max — two shuffles per round, both keyed on node, so a
    pre-partitioned edge frame reuses its layout every round at scale.
    """
    from pyspark.sql import Window

    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        e.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels.count()
    w = Window.partitionBy("nbr_of").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(iters):
        freq = (
            e.join(labels, e.a == labels.node)
            .groupBy(F.col("b").alias("nbr_of"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        new_labels = (
            freq.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("nbr_of").alias("node"), "label")
            .localCheckpoint(eager=False)  # O(1) lineage/round (SCALE.md r10)
        )
        new_labels.count()
        labels.unpersist()
        labels = new_labels
    e.unpersist()
    return labels


def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community labels after 3 synchronous LPA rounds on the trade graph."""
    return label_propagation(_trade_edges(spark, sf_dir), iters=3)


def _label_propagation_oracle(iters: int = 3) -> str:
    """Unrolled per-round CTEs, mechanically identical to the Spark loop."""
    parts = [
        f"WITH dedges AS ({_TRADE_EDGES_CTE}),",
        "edges AS (SELECT src, dst FROM dedges UNION "
        "SELECT dst AS src, src AS dst FROM dedges),",
        "lab0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"lab{k} AS (SELECT node, label FROM ("
            f"SELECT e.dst AS node, l.label AS label, COUNT(*) AS c "
            f"FROM edges e JOIN lab{k-1} l ON l.node = e.src "
            f"GROUP BY e.dst, l.label) "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY node "
            f"ORDER BY c DESC, label) = 1),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT node, label FROM lab{iters}")
    return "\n".join(parts)


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts (Gelly `TriangleEnumerator` /
    `TriangleListing`): canonicalize each undirected edge to (lo, hi), then
    enumerate each triangle once via the ordered 3-way self-join
    (a<b) ⋈ (b<c) ⋈ (a<c) and credit all three corners.

    Scale: the classic optimization applies unchanged — the ordered join
    means each wedge is generated once at its lowest-id corner; Catalyst
    runs it as two shuffle joins on the edge frame. For skewed degree
    distributions, pre-filter wedges at high-degree nodes or switch to the
    degree-ordered variant (orient edges low-degree → high-degree).
    """
    e = (
        edges.select(F.least(src, dst).alias("a"),
                     F.greatest(src, dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(e.alias("e3"), (F.col("e1.a") == F.col("e3.a"))
              & (F.col("e2.b") == F.col("e3.b")))
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"),
                F.col("e2.b").alias("z"))
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
    )
    # NOTE: no unpersist here — the result is LAZY; dropping the cache
    # before the caller's action would force the canonical edge set (and the
    # upstream edge join) to recompute, exactly what the persist prevents.
    # Caches are released at family boundaries (bench) / session end.
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))


# Supplier co-occurrence graph: s1—s2 when both shipped lines of one order.
_COSUPPLY_EDGES_CTE = """
SELECT DISTINCT 'S_' || x.l_suppkey AS src, 'S_' || y.l_suppkey AS dst
FROM lineitem x JOIN lineitem y
  ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
"""


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation per supplier in the co-supply graph."""
    return triangle_count(_cosupply_edges(spark, sf_dir))


ORACLE_Q_GRAPH_TRIANGLES = f"""
WITH e AS ({_COSUPPLY_EDGES_CTE}),
tri AS (
  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT x AS node FROM tri UNION ALL
  SELECT y FROM tri UNION ALL
  SELECT z FROM tri
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM corners GROUP BY node
"""


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iters: int = 3) -> DataFrame:
    """HITS hubs & authorities (Gelly `HITS.java`): per round,
    hub(v) = Σ_{v→w} auth(w) and auth(w) = Σ_{v→w} hub(v), each L1-normalized.
    Returns (node, hub, auth) after ``iters`` rounds.

    Determinism contract (same discipline as the k-means oracle): every
    per-node sum is rounded to 6 before use, the normalization total is the
    rounded sum of rounded scores, and normalized scores round to 6 — so
    the DuckDB unrolled-CTE oracle reproduces each round bit-for-bit
    regardless of float-sum association order.

    Scale: per round, two edge-frame shuffles (groupBy src, groupBy dst) —
    the same O(iters) shuffle budget as PageRank; the normalization total
    is a broadcast-joined 1-row aggregate, so the whole iteration chain
    stays LAZY (no driver round-trip per round — VERDICT r5 #6; the old
    collect()-per-round version serialized the pipeline on driver syncs).
    """
    e = edges.select(src, dst).distinct().persist()
    nodes = (e.select(F.col(src).alias("node"))
             .union(e.select(F.col(dst).alias("node")))
             .distinct().persist())

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        # rounded-total determinism contract preserved: the 1-row total is
        # the rounded sum of rounded scores, broadcast to every partition.
        # localCheckpoint(eager=False) BOUNDS THE LINEAGE: each round
        # references the previous round's frame twice (total agg + scores),
        # so the un-truncated logical plan grows ~4^iters — deep enough
        # that merely stringifying it for the SQL-execution event OOMs a
        # default-heap driver (observed at sf0.01 under a vanilla session;
        # persist() caches data but leaves the plan tree intact). Lazy
        # checkpoint keeps the no-driver-round-trip contract (VERDICT r5
        # #6) while resetting the plan to a LogicalRDD each round — the
        # same bounded-lineage discipline GraphX applies to Pregel.
        total = F.broadcast(raw.agg(F.round(F.sum(col), 6).alias("__total")))
        return (raw.crossJoin(total)
                .select("node",
                        F.round(F.col(col) / F.col("__total"), 6).alias(col))
                .localCheckpoint(eager=False))

    auth = nodes.withColumn("auth", F.lit(1.0))
    hub = None
    for _ in range(iters):
        hub_raw = (
            e.join(auth, F.col(dst) == F.col("node"))
            .groupBy(src).agg(F.round(F.sum("auth"), 6).alias("hub"))
            .withColumnRenamed(src, "node")
        )
        hub = _normalize(
            nodes.join(hub_raw, "node", "left")
            .select("node", F.coalesce("hub", F.lit(0.0)).alias("hub")),
            "hub")
        auth_raw = (
            e.join(hub, F.col(src) == F.col("node"))
            .groupBy(dst).agg(F.round(F.sum("hub"), 6).alias("auth"))
            .withColumnRenamed(dst, "node")
        )
        auth = _normalize(
            nodes.join(auth_raw, "node", "left")
            .select("node", F.coalesce("auth", F.lit(0.0)).alias("auth")),
            "auth")
    return hub.join(auth, "node").select("node", "hub", "auth")


def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubs & authorities on the DIRECTED supplier→customer trade graph
    (suppliers score as hubs, customers as authorities), 3 rounds."""
    t = register_views(spark, sf_dir)
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("S_"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C_"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return hits(edges)


def _hits_oracle(iters: int = 3) -> str:
    parts = [
        f"WITH edges AS ({_TRADE_EDGES_CTE}),",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "a0 AS (SELECT node, 1.0 AS auth FROM nodes),",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"h{i}raw AS (SELECT n.node, COALESCE((SELECT ROUND(SUM(a.auth), 6)"
            f" FROM edges e JOIN a{i-1} a ON a.node = e.dst"
            f" WHERE e.src = n.node), 0.0) AS hub FROM nodes n),"
        )
        parts.append(
            f"h{i} AS (SELECT node, ROUND(hub / (SELECT ROUND(SUM(hub), 6)"
            f" FROM h{i}raw), 6) AS hub FROM h{i}raw),"
        )
        parts.append(
            f"a{i}raw AS (SELECT n.node, COALESCE((SELECT ROUND(SUM(h.hub), 6)"
            f" FROM edges e JOIN h{i} h ON h.node = e.src"
            f" WHERE e.dst = n.node), 0.0) AS auth FROM nodes n),"
        )
        parts.append(
            f"a{i} AS (SELECT node, ROUND(auth / (SELECT ROUND(SUM(auth), 6)"
            f" FROM a{i}raw), 6) AS auth FROM a{i}raw),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT h.node, h.hub, a.auth FROM h{iters} h JOIN a{iters} a"
        f" ON a.node = h.node"
    )
    return "\n".join(parts)


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Local clustering coefficient per node (Gelly
    `LocalClusteringCoefficient`: score = triangles / potential, potential =
    d*(d-1)/2 for the undirected case): how close a node's neighborhood is
    to a clique. Composes `triangle_count` with an undirected degree count.

    Scale: degree is one groupBy over the symmetric edge list; triangles
    reuse the ordered 3-way join (see `triangle_count`). Nothing here is
    worse than the triangle enumeration itself.
    """
    # Persist the RAW edge frame: both the degree branch and triangle_count
    # canonicalize from it, and in the graded queries it is itself an
    # expensive join (the lineitem co-supply self-join) — without the
    # persist that join would run twice.
    edges = edges.persist()
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    deg = (e.select(F.col("a").alias("node"))
           .union(e.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    tri = triangle_count(edges)
    d = F.col("degree")
    return (
        deg.join(tri, "node", "left")
        .select(
            "node", "degree",
            F.round(
                F.when(d >= 2,
                       2.0 * F.coalesce(F.col("triangles"), F.lit(0))
                       / (d * (d - 1)))
                .otherwise(F.lit(0.0)), 6).alias("coeff"),
        )
    )


def _symmetric_neighbors(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (edges.select(F.col(src).alias("node"), F.col(dst).alias("nb"))
            .union(edges.select(F.col(dst).alias("node"),
                                F.col(src).alias("nb")))
            .filter(F.col("node") != F.col("nb")).distinct())


def jaccard_index(edges: DataFrame, src: str = "src", dst: str = "dst",
                  min_sim: float = 0.0,
                  max_wedge_degree: int | None = None) -> DataFrame:
    """Neighborhood Jaccard similarity for vertex pairs sharing ≥1 neighbor
    (Gelly `JaccardIndex`): J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)|.

    Plan: candidate pairs are generated per shared neighbor (the wedge
    join), counted, then |union| = d(u)+d(v)-common via two slim degree
    joins — same generate-group-annotate shape Gelly uses, no all-pairs
    step anywhere.

    Scale: wedge volume is Σ_z d(z)², quadratic in hub degree — the
    identical caveat Gelly documents. ``max_wedge_degree`` is the standard
    mitigation: wedge CENTERS with degree above the cap are dropped before
    the self-join, bounding per-center work at cap² (a hub shared by
    "everyone" carries no similarity signal anyway — it is the graph
    analog of a stopword). Similarities then under-count overlaps that run
    through dropped hubs (|union| still uses true degrees, so capped
    scores are a LOWER bound of the true Jaccard). The alternative exact
    path at scale is the MinHash estimate in pipeline/dedup.py, which
    bounds work per node at the signature width regardless of degree.
    """
    nbr = _symmetric_neighbors(edges, src, dst).persist()
    wedge_src = nbr
    if max_wedge_degree is not None:
        center_deg = nbr.groupBy("nb").agg(F.count(F.lit(1)).alias("cd"))
        wedge_src = (nbr.join(center_deg.filter(F.col("cd") <= max_wedge_degree)
                              .select("nb"), "nb"))
    common = (
        wedge_src.alias("l")
        .join(wedge_src.alias("r"), (F.col("l.nb") == F.col("r.nb"))
              & (F.col("l.node") < F.col("r.node")))
        .groupBy(F.col("l.node").alias("u"), F.col("r.node").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    deg = nbr.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    out = (
        common
        .join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
        .select("u", "v",
                F.round(F.col("common")
                        / (F.col("du") + F.col("dv") - F.col("common")),
                        6).alias("jaccard"))
        .filter(F.col("jaccard") >= min_sim)
    )
    return out  # nbr stays cached: result is lazy (see triangle_count note)


def adamic_adar(edges: DataFrame, src: str = "src", dst: str = "dst",
                min_score: float = 0.0,
                max_wedge_degree: int | None = None) -> DataFrame:
    """Adamic-Adar link-prediction score (Gelly `AdamicAdar`):
    AA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(d(z)) — common neighbors weighted by
    the rarity of the shared neighbor.

    Same wedge plan as `jaccard_index`, except each wedge carries the shared
    neighbor's 1/ln(degree) weight (one broadcastable degree join on the
    wedge center) and the pair aggregate SUMs weights instead of counting.
    Degree-1 centers can't be a shared neighbor (they have only one edge),
    so ln(d) ≥ ln 2 — no division-by-zero branch needed.
    """
    nbr = _symmetric_neighbors(edges, src, dst).persist()
    deg = nbr.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    # Degree-1 centers can never BE a shared neighbor (their one edge links
    # them to a single node), so their weight value is unreachable — but the
    # projection still evaluates 1/ln(1) for those rows under ANSI mode, so
    # it must be guarded (plan order decides whether the join filters first).
    wdeg = deg.select(F.col("node").alias("nb"),
                      F.when(F.col("d") > 1, 1.0 / F.log(F.col("d")))
                      .otherwise(F.lit(0.0)).alias("w"), F.col("d"))
    if max_wedge_degree is not None:
        # same hub mitigation as jaccard_index: centers above the cap are
        # dropped before wedging — scores become a lower bound that skips
        # near-zero-weight hub contributions (1/ln(d) vanishes anyway).
        wdeg = wdeg.filter(F.col("d") <= max_wedge_degree)
    weighted = nbr.join(wdeg.drop("d"), "nb")
    out = (
        weighted.alias("l")
        .join(weighted.alias("r"), (F.col("l.nb") == F.col("r.nb"))
              & (F.col("l.node") < F.col("r.node")))
        .groupBy(F.col("l.node").alias("u"), F.col("r.node").alias("v"))
        .agg(F.round(F.sum(F.col("l.w")), 6).alias("aa_score"))
        .filter(F.col("aa_score") >= min_score)
    )
    return out  # nbr stays cached: result is lazy (see triangle_count note)


def _cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_views(spark, sf_dir)
    li = t["lineitem"]
    x = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1"))
    y = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s2"))
    return (
        x.join(y, "ok")
        .filter(F.col("s1") < F.col("s2"))
        .select(F.concat(F.lit("S_"), F.col("s1").cast("string")).alias("src"),
                F.concat(F.lit("S_"), F.col("s2").cast("string")).alias("dst"))
        .distinct()
    )


def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per supplier in the co-supply graph."""
    return clustering_coefficient(_cosupply_edges(spark, sf_dir))


ORACLE_Q_GRAPH_CLUSTERING_COEFF = f"""
WITH e AS ({_COSUPPLY_EDGES_CTE}),
sym AS (SELECT src AS node, dst AS nb FROM e
        UNION SELECT dst, src FROM e),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY node),
tri AS (
  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT x AS node FROM tri UNION ALL
  SELECT y FROM tri UNION ALL
  SELECT z FROM tri
),
tcnt AS (SELECT node, COUNT(*) AS t FROM corners GROUP BY node)
SELECT d.node, d.degree,
       ROUND(CASE WHEN d.degree >= 2
             THEN 2.0 * COALESCE(tc.t, 0) / (d.degree * (d.degree - 1))
             ELSE 0.0 END, 6) AS coeff
FROM deg d LEFT JOIN tcnt tc ON tc.node = d.node
"""


def q_graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier pairs whose co-supply neighborhoods overlap ≥ 40% Jaccard."""
    return jaccard_index(_cosupply_edges(spark, sf_dir), min_sim=0.4)


ORACLE_Q_GRAPH_JACCARD = f"""
WITH e AS ({_COSUPPLY_EDGES_CTE}),
sym AS (SELECT src AS node, dst AS nb FROM e
        UNION SELECT dst, src FROM e),
deg AS (SELECT node, COUNT(*) AS d FROM sym GROUP BY node),
common AS (
  SELECT l.node AS u, r.node AS v, COUNT(*) AS c
  FROM sym l JOIN sym r ON l.nb = r.nb AND l.node < r.node
  GROUP BY l.node, r.node
)
SELECT c.u, c.v, ROUND(c.c * 1.0 / (du.d + dv.d - c.c), 6) AS jaccard
FROM common c
JOIN deg du ON du.node = c.u
JOIN deg dv ON dv.node = c.v
WHERE c.c * 1.0 / (du.d + dv.d - c.c) >= 0.4
"""


def q_graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over co-supply, score ≥ 2."""
    return adamic_adar(_cosupply_edges(spark, sf_dir), min_score=2.0)


ORACLE_Q_GRAPH_ADAMIC_ADAR = f"""
WITH e AS ({_COSUPPLY_EDGES_CTE}),
sym AS (SELECT src AS node, dst AS nb FROM e
        UNION SELECT dst, src FROM e),
deg AS (SELECT node, COUNT(*) AS d FROM sym GROUP BY node),
w AS (SELECT s.node, s.nb, 1.0 / LN(dg.d) AS w
      FROM sym s JOIN deg dg ON dg.node = s.nb)
SELECT l.node AS u, r.node AS v, ROUND(SUM(l.w), 6) AS aa_score
FROM w l JOIN w r ON l.nb = r.nb AND l.node < r.node
GROUP BY l.node, r.node
HAVING SUM(l.w) >= 2.0
"""


def q_graph_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph SUMMARIZATION (Gelly's Summarization algorithm,
    flink-gelly/.../library/Summarization.java): contract every supplier
    vertex to its nation label and merge parallel co-supply edges into one
    summary edge per label pair carrying the multiplicity — the standard
    coarsening step before running an expensive algorithm on a huge graph.
    The label pair is min/max-normalized so the undirected contraction is
    deterministic regardless of which supplier id ordered the base edge.
    Scale: one broadcast label join (suppliers are a dimension) + one
    bounded-key groupBy (≤ nations² pairs); the 100 TB co-supply edge list
    never materializes per-pair state beyond its combiner."""
    t = register_views(spark, sf_dir)
    labels = (t["supplier"].join(
        F.broadcast(t["nation"]),
        F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.concat(F.lit("S_"), F.col("s_suppkey").cast("string")).alias("node"),
                F.col("n_name").alias("label")))
    e = _cosupply_edges(spark, sf_dir)
    labeled = (e.join(labels.withColumnRenamed("node", "src")
                      .withColumnRenamed("label", "src_label"), "src")
               .join(labels.withColumnRenamed("node", "dst")
                     .withColumnRenamed("label", "dst_label"), "dst"))
    return (labeled.select(
        F.least("src_label", "dst_label").alias("label_a"),
        F.greatest("src_label", "dst_label").alias("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))


ORACLE_Q_GRAPH_SUMMARIZE = f"""
WITH e AS ({_COSUPPLY_EDGES_CTE}),
labels AS (
  SELECT 'S_' || s_suppkey AS node, n_name AS label
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
)
SELECT LEAST(ls.label, ld.label) AS label_a,
       GREATEST(ls.label, ld.label) AS label_b,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM e
JOIN labels ls ON ls.node = e.src
JOIN labels ld ON ld.node = e.dst
GROUP BY 1, 2
"""


QUERIES = {
    "dedup_clusters": q_dedup_clusters,
    "dedup_cluster_representatives": q_dedup_cluster_representatives,
    "graph_pagerank": q_graph_pagerank,
    "graph_sssp": q_graph_sssp,
    "graph_triangles": q_graph_triangles,
    "graph_label_propagation": q_graph_label_propagation,
    "graph_clustering_coeff": q_graph_clustering_coeff,
    "graph_jaccard": q_graph_jaccard,
    "graph_adamic_adar": q_graph_adamic_adar,
    "graph_hits": q_graph_hits,
    "graph_summarize": q_graph_summarize,
}

ORACLE = {
    "dedup_clusters": ORACLE_Q_DEDUP_CLUSTERS,
    "dedup_cluster_representatives": ORACLE_Q_DEDUP_CLUSTER_REPRESENTATIVES,
    "graph_pagerank": _pagerank_oracle(),
    "graph_sssp": ORACLE_Q_GRAPH_SSSP,
    "graph_triangles": ORACLE_Q_GRAPH_TRIANGLES,
    "graph_label_propagation": _label_propagation_oracle(),
    "graph_clustering_coeff": ORACLE_Q_GRAPH_CLUSTERING_COEFF,
    "graph_jaccard": ORACLE_Q_GRAPH_JACCARD,
    "graph_adamic_adar": ORACLE_Q_GRAPH_ADAMIC_ADAR,
    "graph_hits": _hits_oracle(),
    "graph_summarize": ORACLE_Q_GRAPH_SUMMARIZE,
}
