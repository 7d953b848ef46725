"""Invariant tests for pipeline/retrieval.py (BM25 + RRF fusion) and the
HLL sketch — semantic properties the oracle-parity hash can't express."""

from __future__ import annotations

import math

import pytest

from flink_release_1_14_5_comment_spark.pipeline import retrieval, sketches

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bm25(spark):
    rows = retrieval.q_bm25_topk(spark, SF).collect()
    assert rows
    return rows


def test_bm25_topk_shape(bm25):
    by_q: dict[int, list] = {}
    for r in bm25:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == {qid for qid, _ in retrieval._BM25_QUERIES}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        # scores non-increasing in rank; positive (every hit matched a term)
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


def test_bm25_score_is_bounded_by_idf_sum(spark):
    """Per-term weight is < idf*(k1+1); with 3-term queries the score has a
    closed upper bound — catches a broken normalizer (e.g. dl/avgdl
    inversion) that parity at one SF might mask."""
    import duckdb

    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    # loosest idf: df=1
    max_idf = math.log((n_docs - 1 + 0.5) / 1.5 + 1.0)
    bound = 3 * max_idf * (retrieval._K1 + 1.0)
    for r in retrieval.q_bm25_topk(spark, SF).collect():
        assert r.score < bound


def test_rrf_probe_is_own_dense_rank1(spark):
    """Each probe's own row must surface at dense rank 1 (cosine(self) = 1);
    its fused rn is therefore 1 unless another doc ties lexically too."""
    rows = retrieval.q_hybrid_rrf_fusion(spark, SF).collect()
    for probe in retrieval._PROBES:
        mine = [r for r in rows if r.qid == probe and r.doc_id == probe]
        assert mine, f"probe {probe} missing from its own top-k"
        assert mine[0].dense_rank == 1


def test_rrf_score_algebra(spark):
    """rrf column must equal 1/(60+dense)+1/(60+sparse) for surfaced rows."""
    for r in retrieval.q_hybrid_rrf_fusion(spark, SF).collect():
        expect = 0.0
        if r.dense_rank is not None:
            expect += 1.0 / (retrieval._RRF_K + r.dense_rank)
        if r.sparse_rank is not None:
            expect += 1.0 / (retrieval._RRF_K + r.sparse_rank)
        assert abs(r.rrf - expect) < 1e-6


def test_hll_relative_error_within_bound(spark):
    """HLL with m=64 has theoretical σ ≈ 1.04/√64 = 13%; the md5-fixed
    registers make the realized error deterministic — assert it lands
    within 3σ so a broken rho/bucket computation (which yields wild
    estimates) fails loudly."""
    rows = sketches.q_approx_distinct_hll(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.occupied <= sketches._HLL_M
        assert r.rel_err < 3 * 1.04 / math.sqrt(sketches._HLL_M), (
            r.event_type,
            r.rel_err,
        )
