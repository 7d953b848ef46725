"""Literal TPC-H (the reference's other e2e gate — TpchDataGenerator
copies the 22 official airlift texts): all 22 official query texts over
the spec-completed schema, STAGED like the literal TPC-DS batch 5 —
oracle-verified here, out of queries()/oracle_sql() until the r9 flip."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.operators import tpch_literal as t
from tests.oracle_util import compare, duckdb_conn

NAMES = sorted(t.STAGED_QUERIES.keys())


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def test_all_22_present():
    assert len(NAMES) == 22


@pytest.mark.parametrize("name", NAMES)
def test_tpch_literal_oracle_parity(name, spark, sf_dir, con):
    sdf = t.STAGED_QUERIES[name](spark, sf_dir)
    odf = con.execute(t.STAGED_ORACLE[name]).fetchdf()
    compare(sdf, odf, name)


def test_all_graded_after_r9_flip():
    """All 22 literal TPC-H texts are part of the graded
    queries()/oracle_sql() surface, and every one holds an official pass
    record: q1/q9/q17/q22 in the r9 window (CORRECTNESS_r09), the
    remaining 18 in the r10 window (CORRECTNESS_r10, 50/50 green). After
    the r11 rotation the active window carries the q1/q9 anchors; the
    rest stay on the surface with oracles (rotation never drops them)."""
    import __spark_entry__ as entrymod

    graded = set(entrymod.oracle_sql())
    missing = set(NAMES) - graded
    assert not missing, missing
    r9_graded = {"tpch_lit_q1", "tpch_lit_q9", "tpch_lit_q17",
                 "tpch_lit_q22"}
    assert set(NAMES) - r9_graded <= set(entrymod._R10_PRIORITY)
    assert {"tpch_lit_q1", "tpch_lit_q9"} <= set(entrymod._PRIORITY)


def test_nondegenerate_at_oracle_sf():
    """Non-empty at the driver's grading SF. q22 needs the synthetic
    order-less customer block; q2/q7/q11 need the sf0.01 volume (their
    slices are empty at sf0.001, the q8 precedent)."""
    con = duckdb_conn("/root/testdata/sf0.01")
    try:
        for name in NAMES:
            df = con.execute(t.STAGED_ORACLE[name]).fetchdf()
            n = len(df)
            if n == 1 and df.iloc[0].isna().all():
                n = 0
            assert n >= 1, f"{name} is vacuous at sf0.01"
    finally:
        con.close()


@pytest.mark.parametrize("name", ["tpch_lit_q3", "tpch_lit_q5",
                                  "tpch_lit_q9", "tpch_lit_q21"])
def test_plans_broadcast_no_cartesian(spark, sf_dir, name):
    """The dim-chain joins broadcast; nothing in the spec-completion layer
    introduces a cartesian product."""
    plan = (t.STAGED_QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan[:2000]
