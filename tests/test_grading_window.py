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


# r9 window: window 1 of 2 over the staged-literal flip (ROADMAP). The
# anchors below assert the window's family spread so a rotation edit
# can't silently drop one of the NEW evidence families: the q47 regrade,
# the batch-4 returns-side star, every multi-part a/b pair family, one
# representative per staged wave, and the literal TPC-H gate. (q64 — the
# cross-sales monster — is a committed r10-window anchor; it flips with
# waves 5-8.)
FAMILY_ANCHORS = {
    # the r8 red row, regraded after the exact-integer rewrite
    "tpcds-lit-lag-lead-exact": "tpcds_lit_q47",
    # batch 4 (returns-side star + correlated decorrelation)
    "tpcds-lit-returns-star": "tpcds_lit_q85",
    "tpcds-lit-scalar-count": "tpcds_lit_q41",
    # multi-part a/b pair families
    "tpcds-lit-cross-channel": "tpcds_lit_q14a",
    "tpcds-lit-frequent-best": "tpcds_lit_q23a",
    "tpcds-lit-zip-netpaid": "tpcds_lit_q24a",
    "tpcds-lit-inventory-cov": "tpcds_lit_q39a",
    # staged wave representatives
    "tpcds-lit-correlated-returns": "tpcds_lit_q1",      # wave 2
    "tpcds-lit-stddev-moments": "tpcds_lit_q17",         # wave 2
    "tpcds-lit-rollup-qoh": "tpcds_lit_q22",             # wave 2
    "tpcds-lit-no-equi-join": "tpcds_lit_q28",           # wave 3
    "tpcds-lit-window-avg-manager": "tpcds_lit_q63",     # wave 3
    "tpcds-lit-topk-rollup": "tpcds_lit_q67",            # wave 3
    "tpcds-lit-year-over-year": "tpcds_lit_q11",         # wave 4
    "tpcds-lit-grouped-exists": "tpcds_lit_q35",         # wave 4
    # the literal TPC-H gate (the reference's second e2e suite)
    "tpch-lit-pricing": "tpch_lit_q1",
    "tpch-lit-profit": "tpch_lit_q9",
    "tpch-lit-avg-threshold": "tpch_lit_q17",
    "tpch-lit-antijoin-avg": "tpch_lit_q22",
}


def test_every_family_anchor_in_window():
    missing = {f: a for f, a in FAMILY_ANCHORS.items()
               if a not in entry._PRIORITY}
    assert not missing, missing
