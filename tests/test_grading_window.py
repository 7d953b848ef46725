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


# r5 window: full rotation onto the never-officially-graded set (VERDICT r4
# #1). Families graded green in r2-r4 (core aggs/joins/windows/dedup/...)
# keep that multi-round official record plus the per-commit pytest sweep;
# the anchors below assert the r5 window's own family spread so a rotation
# edit can't silently drop one of the NEW evidence families.
FAMILY_ANCHORS = {
    "tpch-join-agg": "tpch_q9",
    "tpch-subquery": "tpch_q21",
    "tpch-exists": "tpch_q4",
    "stream-semi": "stream_semi_join",
    "stream-anti": "stream_anti_join",
    "stream-session": "stream_window_session",
    "stream-cep": "stream_cep_funnel",
    "count-window": "stream_count_window",
    "evictor": "stream_window_evictor",
    "session-evictor": "stream_session_evictor",
    "stream-join": "stream_window_join",
    "lookup": "stream_lookup_join",
    "temporal-table-fn": "temporal_table_fn",
    "ann-pq": "ann_pq_topk",
    "ann-ivfpq": "ann_ivfpq_topk",
    "quality-lm": "lm_perplexity",
    "dedup-recall": "dedup_recall_eval",
    "text": "tfidf_top_terms",
    "cep-batch": "cep_nfa_batch",
    "scalar": "scalar_string",
    "graph": "graph_triangles",
}


def test_every_family_anchor_in_window():
    missing = {f: a for f, a in FAMILY_ANCHORS.items()
               if a not in entry._PRIORITY}
    assert not missing, missing
