"""Invariant and plan-shape tests for the sketch/sampling operators
(pipeline/sketches.py). Value parity vs DuckDB is covered by the
test_oracle_parity sweep; here we check the probabilistic-structure
invariants the oracle's hash compare can't express as such, plus the
plan shapes that matter at 100 TB.
"""

from __future__ import annotations

from flink_release_1_14_5_comment_spark.pipeline import sketches


def test_cms_one_sided_error(spark, sf_dir):
    rows = sketches.q_cms_heavy_hitters(spark, sf_dir).collect()
    assert rows, "empty CMS result"
    for r in rows:
        # Count-min never underestimates.
        assert r.est_count >= r.true_count, (r.token, r.est_count, r.true_count)
        assert r.overcount == r.est_count - r.true_count


def test_bloom_no_false_negatives(spark, sf_dir):
    rows = sketches.q_bloom_contamination(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # A Bloom filter can only over-flag, never miss a true hit.
        assert r.n_flagged >= r.n_true, (r.lang, r.n_flagged, r.n_true)
        assert r.n_false_pos == r.n_flagged - r.n_true
        assert r.n_grams >= r.n_flagged


def test_bloom_probe_is_broadcast(spark, sf_dir):
    """The bloom-position table (≤8192 rows) must broadcast: at 100 TB the
    probe side is the whole corpus and must not shuffle for this join."""
    df = sketches.q_bloom_contamination(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]


def test_vocab_join_is_broadcast(spark, sf_dir):
    """The LIMIT-V vocabulary must broadcast against the token stream — at
    100 TB the token side cannot shuffle for this join."""
    from flink_release_1_14_5_comment_spark.pipeline import text_analysis

    df = text_analysis.q_vocab_oov_rate(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]


def test_percentile_cut_tail_sizes(spark, sf_dir):
    rows = sketches.q_quality_percentile_cut(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p10 <= r.p50 <= r.p90, r
        # Strict tails of a continuous-interpolated percentile are ≤ ~10%
        # each side (ties can shrink them, never grow past the bound + 1).
        assert r.n_low_tail <= r.n_docs * 0.1 + 1, r
        assert r.n_high_tail <= r.n_docs * 0.1 + 1, r


def test_weighted_sample_deterministic(spark, sf_dir):
    a = sorted(map(tuple, sketches.q_weighted_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, sketches.q_weighted_sample(spark, sf_dir).collect()))
    assert a == b
    # top-k per language, ranks contiguous from 1
    by_lang = {}
    for lang, doc_id, ntok, key, rn in a:
        by_lang.setdefault(lang, []).append(rn)
    for lang, rns in by_lang.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), (lang, rns)
        assert len(rns) <= 3


def test_linear_counting_estimate(spark, sf_dir):
    rows = sketches.q_approx_distinct_linear(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.occupied <= 1024
        # occupied slots can never exceed true distinct count
        assert r.occupied <= r.exact_distinct
        # linear counting at low load factor is tight: within 25% here
        assert abs(r.est_distinct - r.exact_distinct) <= max(3, 0.25 * r.exact_distinct), r


def test_ntile_buckets_partition_corpus(spark, sf_dir):
    rows = sketches.q_quality_ntile_buckets(spark, sf_dir).collect()
    deciles = sorted(r.decile for r in rows)
    assert deciles == list(range(1, 11))
    counts = [r.n_docs for r in sorted(rows, key=lambda r: r.decile)]
    # NTILE balances to within one row.
    assert max(counts) - min(counts) <= 1, counts
    # Monotone quality by construction of the sort.
    scores = [r.avg_score for r in sorted(rows, key=lambda r: r.decile)]
    assert scores == sorted(scores), scores
