"""Guards on the driver grading contract (__spark_entry__): the first 50
queries() entries are the officially graded set — rotation mistakes here
silently drop operator families from official evidence."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry

# rows-only entries (non-SQL-expressible, weaker driver check) are the
# only oracle-less names allowed in a grading window
_ROWS_ONLY = {"streaming_file_sink"}


def test_priority_window_shape():
    p = entry._PRIORITY
    assert len(p) == 50
    assert len(set(p)) == 50  # no duplicates


def test_r11_swap_executed():
    """r11 rotation contract (VERDICT r10 #3): the active window IS the
    staged `_R11_PRIORITY`, verbatim — no partial swap, no re-edit."""
    assert entry._PRIORITY is entry._R11_PRIORITY


def test_priority_all_resolvable_with_oracles():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = [n for n in entry._PRIORITY if n not in qs]
    assert not missing, missing
    no_oracle = [n for n in entry._PRIORITY
                 if n not in osql and n not in _ROWS_ONLY]
    assert not no_oracle, no_oracle
    # ordering: priority entries occupy exactly the first 50 slots
    assert list(qs)[:50] == entry._PRIORITY


def test_rotated_out_r10_window_still_resolves():
    """Every rotated-out r10 entry must keep its queries() entry AND its
    oracle — rotation changes grading order, never the surface."""
    qs, osql = entry.queries(), entry.oracle_sql()
    gone = [n for n in entry._R10_PRIORITY if n not in qs or n not in osql]
    assert not gone, gone


# r11 window: the 3 deferred wave-7 count censuses (the last texts with no
# official pass record — grading them closes cumulative evidence at
# 370/370) + officially-green anchors covering every operator family. The
# anchors below assert the family spread so a rotation edit can't silently
# drop a family from the official evidence window.
FAMILY_ANCHORS = {
    # the 3 previously ungraded wave-7 count censuses
    "tpcds-lit-store-hour-census": "tpcds_lit_q88",
    "tpcds-lit-hour-ratio": "tpcds_lit_q90",
    "tpcds-lit-channel-census": "tpcds_lit_q96",
    # relational / TPC anchors
    "flagship-pricing-summary": "agg_pricing_summary",
    "relational-join": "join_multiway",
    "relational-window": "over_windows",
    "tpch-adapted-profit": "tpch_q9",
    "tpch-literal-pricing": "tpch_lit_q1",
    "tpcds-literal-rollup": "tpcds_lit_q89",
    "scale-rewrite-salting": "skew_salted_join",
    # streaming / CDC / temporal anchors
    "stream-window": "stream_window_tumble",
    "stream-upsert": "stream_upsert_pipeline",
    "cdc": "cdc_debezium_agg",
    "batch-window": "window_tumble",
    "temporal-asof": "asof_join",
    "pattern-funnel": "funnel_match",
    "match-recognize": "match_recognize_sql",
    # IO / API / UDF anchors
    "io-roundtrip": "io_roundtrip_csv",
    "udf-gauntlet": "python_udf_gauntlet",
    "async-io": "async_io_enrich",
    "table-api": "table_api_fluent",
    # pipeline / similarity / retrieval / text anchors
    "dedup-lsh": "dedup_minhash_lsh",
    "graph": "graph_pagerank",
    "clustering": "embedding_kmeans",
    "ann": "ann_lsh_topk",
    "retrieval": "bm25_topk",
    "sketches": "cms_heavy_hitters",
    "text": "token_counts",
    "packing": "pack_sequences",
    "multimodal": "multimodal_features",
    "end-to-end": "pipeline_end_to_end",
}


def test_every_family_anchor_in_window():
    missing = {f: a for f, a in FAMILY_ANCHORS.items()
               if a not in entry._PRIORITY}
    assert not missing, missing
