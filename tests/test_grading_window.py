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


def test_staged_r11_window_resolvable():
    """The staged r11 rotation (entry._R11_PRIORITY) must stay swap-ready:
    50 unique names, all resolving to queries() entries, all carrying
    oracles except the rows-only streaming-sink checks. A typo here would
    surface at r11 rotation time — after the window is graded."""
    p = entry._R11_PRIORITY
    assert len(p) == 50
    assert len(set(p)) == 50
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = [n for n in p if n not in qs]
    assert not missing, missing
    no_oracle = [n for n in p if n not in osql]
    # rows-only entries (non-SQL-expressible, weaker driver check) are the
    # only oracle-less names allowed in a window
    assert set(no_oracle) <= {"streaming_file_sink"}, no_oracle


# r10 window: window 2 of 2 over the staged-literal flip (ROADMAP,
# amended per VERDICT r9 #3). The anchors below assert the window's
# family spread so a rotation edit can't silently drop one of the NEW
# evidence families: all 5 dtype-fix regrades, one representative per
# remaining staged wave (incl. q64, the committed cross-sales anchor,
# and q57, the wave-5 window-avg rep), the wave-7 NULL-key rep (q44),
# and the TPC-H breadth reps the ROADMAP named (q2 the min-subquery
# roundup, q15 the view-CTE revenue rank, q12 the dtype-fixed text).
FAMILY_ANCHORS = {
    # the 5 r9 hash-only reds, regraded after the CAST(sum AS BIGINT) fix
    "dtype-regrade-lag-lead": "tpcds_lit_q47",
    "dtype-regrade-cross-channel": "tpcds_lit_q14a",
    "dtype-regrade-inventory": "tpcds_lit_q21",
    "dtype-regrade-three-facts": "tpcds_lit_q29",
    "dtype-regrade-day-bands": "tpcds_lit_q50",
    # staged wave representatives
    "tpcds-lit-window-avg-w5": "tpcds_lit_q57",          # wave 5
    "tpcds-lit-day-bands-ship": "tpcds_lit_q99",         # wave 5 (dtype fix)
    "tpcds-lit-cumulative-crossover": "tpcds_lit_q51",   # wave 6
    "tpcds-lit-yoy-decline": "tpcds_lit_q75",            # wave 6 (dtype fix)
    "tpcds-lit-null-key-rank": "tpcds_lit_q44",          # wave 7
    "tpcds-lit-inventory-shortfall": "tpcds_lit_q72",    # wave 7 (dtype fix)
    "tpcds-lit-cross-sales": "tpcds_lit_q64",            # wave 8
    # the literal TPC-H completion (18 remaining texts)
    "tpch-lit-min-subquery": "tpch_lit_q2",
    "tpch-lit-view-cte": "tpch_lit_q15",
    "tpch-lit-shipmode-counts": "tpch_lit_q12",          # dtype fix
    "tpch-lit-semi-anti": "tpch_lit_q21",
}


def test_every_family_anchor_in_window():
    missing = {f: a for f, a in FAMILY_ANCHORS.items()
               if a not in entry._PRIORITY}
    assert not missing, missing
