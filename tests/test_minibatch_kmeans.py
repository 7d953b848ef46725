"""Mini-batch k-means (pipeline/clustering.py): batch-mean update rule,
empty-cluster carry, and degenerate-mod equivalences. The DuckDB oracle
parity for the graded query is covered by tests/test_oracle_parity.py;
these are the semantics unit tests."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.pipeline.clustering import (
    _batch_member,
    _update_centroids,
    kmeans_assign,
    kmeans_centroids,
    minibatch_kmeans_centroids,
    minibatch_kmeans_fit,
)
from flink_release_1_14_5_comment_spark.pipeline.similarity import _norm


@pytest.fixture(scope="module")
def vectors(spark):
    # two tight clumps around (1,0) and (0,1) plus ids spread enough that
    # md5-mod batches hit both clumps at mod=2
    rows = [(i, [1.0 + 0.01 * i, 0.02 * i]) for i in range(6)]
    rows += [(i, [0.02 * (i - 6), 1.0 + 0.01 * i]) for i in range(6, 12)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mod_one_equals_full_lloyds_round(spark, vectors):
    """mod=1 makes every mini-batch the full corpus: after the same number
    of update rounds the centroids must equal full Lloyd's."""
    _, full = kmeans_centroids(vectors, k=2, iters=3)  # 2 update rounds
    _, mb = minibatch_kmeans_centroids(vectors, k=2, iters=2, mod=1)
    assert dict(mb) == dict(full)


def test_huge_mod_carries_seed_centroids(spark, vectors):
    """A mod larger than any md5 bucket makes every batch empty: update
    rounds are no-ops and the centroids stay the lowest-id seeds."""
    e = vectors.withColumn("nrm", _norm("embedding"))
    seeds = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.orderBy("vec_id").limit(2)
        .select("vec_id", "embedding").collect()
    ]
    _, cents = minibatch_kmeans_centroids(vectors, k=2, iters=3,
                                          mod=10_000_000)
    assert cents == seeds


def test_batches_differ_per_round_and_are_portable(spark, vectors):
    """Per-round salts give different (deterministic) batches; membership
    matches a driver-side md5 recomputation."""
    import hashlib

    got = {
        i: sorted(
            r.vec_id for r in vectors.filter(_batch_member(i, 3))
            .select("vec_id").collect())
        for i in (1, 2)
    }
    for i in (1, 2):
        expect = sorted(
            v for v in range(12)
            if int(hashlib.md5(f"{v}:{i}".encode()).hexdigest()[:6], 16) % 3 == 0
        )
        assert got[i] == expect
    assert got[1] != got[2]


def test_batch_mean_update_with_carry(spark, vectors):
    """One round with mod=2: updated centroid = mean of that round's batch
    members per cluster (computed independently here), clusters with no
    batch member keep the seed."""
    e = vectors.withColumn("nrm", _norm("embedding")).persist()
    seeds = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.orderBy("vec_id").limit(2)
        .select("vec_id", "embedding").collect()
    ]
    batch = e.filter(_batch_member(1, 2))
    expected = dict(seeds)
    expected.update(dict(_update_centroids(kmeans_assign(batch, seeds),
                                           dims=len(seeds[0][1]))))
    _, cents = minibatch_kmeans_centroids(vectors, k=2, iters=1, mod=2)
    assert dict(cents) == expected


def test_fit_recovers_two_clumps(spark, vectors):
    """End-to-end sanity: final full-assignment pass separates the clumps."""
    out = {r.vec_id: r.cluster
           for r in minibatch_kmeans_fit(vectors, k=2, iters=3, mod=2).collect()}
    low = {out[i] for i in range(6)}
    high = {out[i] for i in range(6, 12)}
    assert len(low) == 1 and len(high) == 1 and low != high


def test_assignment_plan_stays_shuffle_free(spark, vectors):
    """The final assignment is a pure map over literal centroids — no
    Exchange from join/window in its plan (same contract as full k-means)."""
    _, cents = minibatch_kmeans_centroids(vectors, k=2, iters=1, mod=2)
    e = vectors.withColumn("nrm", _norm("embedding"))
    plan = kmeans_assign(e, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan


def test_recall_eval_shingle_df_cap(spark):
    """Hot-shingle cap in the recall-audit truth join (wedge-blowup guard):
    with the cap, a pair whose overlap is ONLY the ultra-common shingle
    drops out of the truth set; uncapped it stays."""
    from flink_release_1_14_5_comment_spark.pipeline.dedup import _recall_eval

    # docs 1/2 share only shingle 100 (in every doc → df=4);
    # docs 3/4 share their entire 3-shingle set (true near-dups)
    rows = [
        (1, [100, 1, 2]), (2, [100, 3, 4]),
        (3, [100, 7, 8]), (4, [100, 7, 8]),
    ]
    sh = spark.createDataFrame(rows, "doc_id long, sh array<bigint>")
    uncapped = _recall_eval(sh).collect()[0]
    capped = _recall_eval(sh, max_shingle_df=3).collect()[0]
    # uncapped truth: (3,4) at J=1.0; (1,2)=1/5 and others below 0.4
    assert uncapped.n_true == 1
    # cap drops shingle 100 from pair generation: (3,4) still found via
    # shingles 7/8; pairs overlapping ONLY on 100 never generate
    assert capped.n_true == 1
    # sanity on the truth-side candidate volume shrink: with the cap,
    # docs 1/2 produce no intersection row at all
    assert capped.n_hit <= capped.n_true
