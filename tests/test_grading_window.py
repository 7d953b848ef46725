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


# r6 window: window 1 of 2 over the 88-entry official-evidence backlog
# (VERDICT r5 #1). Families graded green in r2-r5 (TPC-H, core streaming,
# ANN, scalar gauntlets, graph...) keep that multi-round official record
# plus the per-commit pytest sweep; the anchors below assert the r6
# window's own family spread so a rotation edit can't silently drop one
# of the NEW evidence families.
FAMILY_ANCHORS = {
    "sql-front-door-tvf": "window_tvf_sql",
    "sql-front-door-mr": "match_recognize_sql",
    "sql-front-door-cast": "legacy_cast_sql",
    "sql-front-door-ddl": "ddl_filesystem_sql",
    "unnest": "unnest_tokens",
    "lateral": "lateral_topk",
    "python-udf": "python_udf_gauntlet",
    "changelog-dub": "changelog_drop_update_before",
    "changelog-upsert-mat": "stream_upsert_materialize",
    "changelog-notnull": "sink_not_null_enforcer",
    "stream-over-rows": "stream_over_rows",
    "stream-over-range": "stream_over_range",
    "setop-all": "set_except_all",
    "grouping-sets": "cube",
    "io-roundtrip": "io_roundtrip_avro",
    "streaming-file-sink": "streaming_file_sink",
    "api-facade": "table_api_fluent",
    "table-agg": "table_flat_aggregate",
    "stream-join-left": "stream_regular_join_full",
    "stream-dedup": "stream_dedup_keeplast",
    "cdc": "cdc_debezium_agg",
    "relational-ext": "exists_and_not_exists",
    "semantic-dedup": "dedup_semantic",
}


def test_every_family_anchor_in_window():
    missing = {f: a for f, a in FAMILY_ANCHORS.items()
               if a not in entry._PRIORITY}
    assert not missing, missing
