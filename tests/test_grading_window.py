"""Guards on the driver grading contract (__spark_entry__): the first 50
queries() entries are the officially graded set — rotation mistakes here
silently drop operator families from official evidence."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def test_priority_window_shape():
    p = entry._PRIORITY
    assert len(p) == 50
    assert len(set(p)) == 50  # no duplicates


def test_priority_all_resolvable_with_oracles():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = [n for n in entry._PRIORITY if n not in qs]
    assert not missing, missing
    no_oracle = [n for n in entry._PRIORITY if n not in osql]
    assert not no_oracle, no_oracle
    # ordering: priority entries occupy exactly the first 50 slots
    assert list(qs)[:50] == entry._PRIORITY


# r8 window: rotation window 3 of 3 over the official-evidence backlog
# (VERDICT r7 #1) — the full 46-entry residual + 4 multi-round anchors.
# Families graded green in r1-r7 keep that multi-round official record
# plus the per-commit pytest sweep; the anchors below assert the r8
# window's own family spread so a rotation edit can't silently drop one
# of the NEW evidence families.
FAMILY_ANCHORS = {
    "graph-summarize": "graph_summarize",
    "kmeans-minibatch": "embedding_kmeans_minibatch",
    "embedding-clusters": "embedding_cluster_sizes",
    "ann-recall": "ann_recall_eval",
    "ann-lsh-buckets": "ann_lsh_buckets",
    "embedding-quantize": "embedding_quantize",
    "embedding-stats": "embedding_stats",
    "vocab-oov": "vocab_oov_rate",
    "corpus-sample": "corpus_sample",
    "doc-fingerprint": "doc_fingerprint",
    "source-quality": "source_quality_filter",
    "cohort-retention": "cohort_retention",
    "funnel": "funnel_conversion_rates",
    "exists-shape": "exists_returned_customers",
    "scalar-subquery": "above_nation_avg_balance",
    "union-rollup": "channel_union_rollup",
    "intersect": "channel_intersect_customers",
    "rank-join": "best_worst_rank_join",
    # literal TPC-DS representatives (all 28 are in the window; anchor a
    # plan-diverse spread so a partial edit still trips the guard)
    "tpcds-lit-star": "tpcds_lit_q3",
    "tpcds-lit-union3": "tpcds_lit_q33",
    "tpcds-lit-rollup-grouping": "tpcds_lit_q36",
    "tpcds-lit-lag-lead": "tpcds_lit_q47",
    "tpcds-lit-triple-exists": "tpcds_lit_q69",
    "tpcds-lit-window-over-agg": "tpcds_lit_q89",
    "tpcds-lit-ratio": "tpcds_lit_q98",
    # multi-round anchors
    "anchor-agg": "agg_pricing_summary",
    "anchor-join": "join_multiway",
    "anchor-dedup": "dedup_minhash_lsh",
    "anchor-stream": "stream_window_tumble",
}


def test_every_family_anchor_in_window():
    missing = {f: a for f, a in FAMILY_ANCHORS.items()
               if a not in entry._PRIORITY}
    assert not missing, missing
