"""Unit tests for the Gelly-breadth graph algorithms (pipeline/graph.py) on
hand-checkable toy graphs; the query-level oracle parity runs in
tests/test_oracle_parity.py."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.pipeline.graph import (
    pagerank,
    single_source_shortest_paths,
)


def test_pagerank_star_center_dominates(spark):
    # a,b,c all link to hub; hub links back to a — hub must rank highest
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
        "src string, dst string")
    ranks = {r.node: r.pr for r in pagerank(edges, iters=10).collect()}
    # hub and a trade the mass (hub's only out-edge is a); b,c get only the
    # base term (1-d)/n = 0.0375 since nothing links to them
    assert min(ranks["hub"], ranks["a"]) > 5 * ranks["b"]
    assert ranks["b"] == ranks["c"] == pytest.approx(0.15 / 4)
    assert all(0 < v < 1 for v in ranks.values())


def test_pagerank_symmetric_cycle_uniform(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    ranks = [r.pr for r in pagerank(edges, iters=8).collect()]
    assert max(ranks) - min(ranks) < 1e-12  # symmetry → uniform 1/3
    assert sum(ranks) == pytest.approx(1.0)


def test_sssp_distances_and_early_exit(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string")
    dist = {r.node: r.dist for r in
            single_source_shortest_paths(edges, "a", max_hops=10).collect()}
    # converges (early exit) long before max_hops; unreachable absent
    assert dist == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_sssp_min_over_multiple_paths(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string")
    dist = {r.node: r.dist for r in
            single_source_shortest_paths(edges, "a", max_hops=5).collect()}
    assert dist["c"] == 1  # direct edge wins over the 2-hop path


def test_triangle_count_toy_graphs(spark):
    from flink_release_1_14_5_comment_spark.pipeline.graph import triangle_count

    # K4: every node sits in C(3,2)=3 triangles; edges given in mixed
    # orientations + a duplicate to exercise canonicalization
    k4 = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"),
         ("b", "c"), ("d", "b"), ("c", "d")],
        "src string, dst string")
    got = {r.node: r.triangles for r in triangle_count(k4).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    # path graph: no triangles → empty result
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    assert triangle_count(path).count() == 0


def test_weighted_sssp_toy(spark):
    """Bellman-Ford distances on a toy weighted digraph: the indirect
    A->B->C path (1+1=2) beats the direct A->C edge (5)."""
    from flink_release_1_14_5_comment_spark.pipeline.graph import weighted_sssp

    edges = spark.createDataFrame(
        [("A", "B", 1.0), ("B", "C", 1.0), ("A", "C", 5.0),
         ("C", "D", 2.0), ("X", "Y", 1.0)],
        "src string, dst string, weight double")
    dist = {r.node: r.dist for r in weighted_sssp(edges, "A").collect()}
    assert dist == {"A": 0.0, "B": 1.0, "C": 2.0, "D": 4.0}  # X,Y unreachable


def test_clustering_coefficient_toy(spark):
    from flink_release_1_14_5_comment_spark.pipeline.graph import (
        clustering_coefficient,
    )

    # triangle a-b-c plus pendant d attached to a:
    # b,c: deg 2, 1 triangle → cc = 1.0
    # a: deg 3, 1 triangle → cc = 2*1/(3*2) = 1/3
    # d: deg 1 → cc = 0
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")],
        "src string, dst string")
    got = {r.node: (r.degree, r.coeff)
           for r in clustering_coefficient(edges).collect()}
    assert got == {"a": (3, 0.333333), "b": (2, 1.0), "c": (2, 1.0),
                   "d": (1, 0.0)}


def test_jaccard_index_toy(spark):
    from flink_release_1_14_5_comment_spark.pipeline.graph import jaccard_index

    # N(a)={x,y}, N(b)={x,y,z} → common 2, union 3 → 2/3
    # N(a)∩N(z)... z's neighbor set is {b}; a,z share no neighbor → no row
    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("b", "z")],
        "src string, dst string")
    got = {(r.u, r.v): r.jaccard for r in jaccard_index(edges).collect()}
    assert got[("a", "b")] == 0.666667
    # x and y share neighbors {a,b}: J = 2/2 = 1.0
    assert got[("x", "y")] == 1.0
    assert ("a", "z") not in got


def test_adamic_adar_toy(spark):
    import math

    from flink_release_1_14_5_comment_spark.pipeline.graph import adamic_adar

    # u and v share neighbors m (deg 2) and h (deg 4):
    # AA = 1/ln(2) + 1/ln(4)
    edges = spark.createDataFrame(
        [("u", "m"), ("v", "m"), ("u", "h"), ("v", "h"),
         ("h", "p"), ("h", "q")],
        "src string, dst string")
    got = {(r.u, r.v): r.aa_score for r in adamic_adar(edges).collect()}
    expected = round(1 / math.log(2) + 1 / math.log(4), 6)
    assert got[("u", "v")] == pytest.approx(expected, abs=2e-6)


def test_kmeans_separates_obvious_clusters(spark):
    from flink_release_1_14_5_comment_spark.pipeline.clustering import (
        kmeans_fit,
    )

    # two orthogonal direction bundles (cosine k-means separates them
    # regardless of magnitude); seeds = vec_id 0 (bundle A) and 1 (bundle B)
    rows = [(0, [1.0, 0.0, 0.1]), (1, [0.0, 1.0, 0.1]),
            (2, [2.0, 0.1, 0.0]), (3, [0.1, 2.0, 0.0]),
            (4, [3.0, 0.0, 0.2]), (5, [0.0, 3.0, 0.2])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.cluster for r in kmeans_fit(vecs, k=2, iters=3).collect()}
    assert got[0] == got[2] == got[4]
    assert got[1] == got[3] == got[5]
    assert got[0] != got[1]


def test_jaccard_wedge_degree_cap(spark):
    from flink_release_1_14_5_comment_spark.pipeline.graph import jaccard_index

    # hub h neighbors everyone; m is a degree-2 center shared by u,v only
    edges = spark.createDataFrame(
        [("u", "h"), ("v", "h"), ("w", "h"), ("x", "h"),
         ("u", "m"), ("v", "m")],
        "src string, dst string")
    full = {(r.u, r.v): r.jaccard
            for r in jaccard_index(edges).collect()}
    capped = {(r.u, r.v): r.jaccard
              for r in jaccard_index(edges, max_wedge_degree=3).collect()}
    # hub (degree 4) is dropped as a wedge center under the cap: pairs that
    # ONLY share the hub (w,x / u,w / ...) disappear
    assert ("w", "x") in full and ("w", "x") not in capped
    # u,v still pair through m; |union| keeps true degrees (u:2, v:2,
    # common drops to 1 of 2) → capped score is a lower bound
    assert capped[("u", "v")] <= full[("u", "v")]
    # (h, m) survives: its wedges run through the LOW-degree centers u and v
    # — the cap drops hub-centered wedges, not the hub as a pair member
    assert set(capped) == {("u", "v"), ("h", "m")}


def test_hits_star_hub(spark):
    from flink_release_1_14_5_comment_spark.pipeline.graph import hits

    # h points at a1..a3; a solitary edge x->a1 gives x a small hub score.
    edges = spark.createDataFrame(
        [("h", "a1"), ("h", "a2"), ("h", "a3"), ("x", "a1")],
        "src string, dst string")
    got = {r.node: (r.hub, r.auth) for r in hits(edges, iters=3).collect()}
    # h is the dominant hub; pure authorities have hub 0
    assert got["h"][0] > got["x"][0] > 0
    assert got["a2"][0] == 0.0
    # a1 (pointed at by both hubs) is the top authority
    assert got["a1"][1] > got["a2"][1] > 0
    assert got["a2"][1] == got["a3"][1]
    # hubs with no in-edges have auth 0
    assert got["h"][1] == 0.0 and got["x"][1] == 0.0
    # L1-normalized (rounding tolerance)
    import pytest as _pt
    assert sum(v[0] for v in got.values()) == _pt.approx(1.0, abs=1e-4)
    assert sum(v[1] for v in got.values()) == _pt.approx(1.0, abs=1e-4)


def test_kmeans_farthest_seeding_separates_clumped_ids(spark):
    """Adversarial id layout: the two lowest vec_ids sit in the SAME bundle,
    so lowest-id seeding starts both seeds there; farthest-point seeding
    jumps to the orthogonal bundle and separates in one pass."""
    from flink_release_1_14_5_comment_spark.pipeline.clustering import (
        farthest_point_seeds,
        kmeans_fit,
    )
    from flink_release_1_14_5_comment_spark.pipeline.similarity import _norm

    rows = [(0, [1.0, 0.0]), (1, [0.99, 0.02]),  # bundle A holds ids 0,1
            (2, [0.0, 1.0]), (3, [0.02, 0.99])]  # bundle B
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    e = vecs.withColumn("nrm", _norm("embedding"))
    seeds = farthest_point_seeds(e, k=2)
    # seed 0 = vec 0 (bundle A); seed 1 must be from bundle B (max-min)
    assert seeds[0][1] == [1.0, 0.0]
    assert seeds[1][1] in ([0.0, 1.0], [0.02, 0.99])
    got = {r.vec_id: r.cluster
           for r in kmeans_fit(vecs, k=2, iters=2, seeding="farthest").collect()}
    assert got[0] == got[1] and got[2] == got[3] and got[0] != got[2]


def test_adamic_adar_wedge_degree_cap(spark):
    from flink_release_1_14_5_comment_spark.pipeline.graph import adamic_adar

    # hub h (deg 4) and m (deg 2) both shared by u,v
    edges = spark.createDataFrame(
        [("u", "m"), ("v", "m"), ("u", "h"), ("v", "h"),
         ("h", "p"), ("h", "q")],
        "src string, dst string")
    full = {(r.u, r.v): r.aa_score for r in adamic_adar(edges).collect()}
    capped = {(r.u, r.v): r.aa_score
              for r in adamic_adar(edges, max_wedge_degree=3).collect()}
    # hub-centered wedges dropped: (u,v) keeps only m's 1/ln(2) contribution
    import math
    assert capped[("u", "v")] == pytest.approx(round(1 / math.log(2), 6),
                                               abs=2e-6)
    assert capped[("u", "v")] < full[("u", "v")]


def test_cc_strategy_selection_by_master(spark, monkeypatch):
    """VERDICT r4 #7: driver union-find only on local masters by default;
    on a cluster master the cap is 0 (distributed) unless the env knob
    overrides — the only driver-memory dependency in the operator set."""
    from flink_release_1_14_5_comment_spark.pipeline import graph as g

    monkeypatch.delenv("SPARK_GRAFT_CC_MAX_DRIVER_EDGES", raising=False)

    class FakeConf:
        def __init__(self, master):
            self._m = master

        def get(self, key, default=""):
            return self._m if key == "spark.master" else default

    class FakeSession:
        def __init__(self, master):
            self.conf = FakeConf(master)

    assert g._driver_edge_cap(FakeSession("local[32]")) == 5_000_000
    assert g._driver_edge_cap(FakeSession("local")) == 5_000_000
    assert g._driver_edge_cap(FakeSession("spark://host:7077")) == 0
    assert g._driver_edge_cap(FakeSession("yarn")) == 0
    assert g._driver_edge_cap(FakeSession("k8s://https://x")) == 0
    monkeypatch.setenv("SPARK_GRAFT_CC_MAX_DRIVER_EDGES", "123")
    assert g._driver_edge_cap(FakeSession("yarn")) == 123
    # the distributed path must produce identical components on a real frame
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long")
    monkeypatch.setenv("SPARK_GRAFT_CC_MAX_DRIVER_EDGES", "0")
    dist = {(r["node"], r["component"])
            for r in g.connected_components(edges).collect()}
    monkeypatch.setenv("SPARK_GRAFT_CC_MAX_DRIVER_EDGES", "1000")
    drv = {(r["node"], r["component"])
           for r in g.connected_components(edges).collect()}
    assert dist == drv
