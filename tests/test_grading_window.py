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


FAMILY_ANCHORS = {
    "dedup": "dedup_exact",
    "minhash": "dedup_minhash_lsh",
    "clusters": "dedup_clusters",
    "ann": "ann_lsh_topk",
    "text": "text_stats",
    "multimodal": "multimodal_features",
    "packing": "pack_sequences",
    "agg": "agg_pricing_summary",
    "join": "join_multiway",
    "subquery": "subquery_correlated",
    "over": "over_windows",
    "topn": "topn",
    "grouping": "grouping_sets",
    "setops": "set_union_intersect",
    "window": "window_tumble",
    "session": "window_session",
    "cumulate": "window_cumulate",
    "interval": "interval_join",
    "asof": "asof_join",
    "cep": "funnel_match",
    "streaming": "stream_window_tumble",
    "rollup": "sales_rollup_nation_year",
    "skew": "skew_salted_join",
    "tokens": "token_counts",
}


def test_every_family_anchor_in_window():
    missing = {f: a for f, a in FAMILY_ANCHORS.items()
               if a not in entry._PRIORITY}
    assert not missing, missing
