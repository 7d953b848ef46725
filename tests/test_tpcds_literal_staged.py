"""Batch-5 literal TPC-DS (the reference's multi-part a/b pairs q14 q23
q24 q39 — TpcdsTestProgram.java:76-87 counts 103 queries vs 99 because
these ship as pairs). Oracle-verified here at every SF
like all graded entries; since the r9 flip the whole set is also part of
the graded queries()/oracle_sql() surface."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.operators import tpcds_literal as t
from tests.oracle_util import compare, duckdb_conn

STAGED = sorted(t.STAGED_QUERIES.keys())


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", STAGED)
def test_staged_oracle_parity(name, spark, sf_dir, con):
    sdf = t.STAGED_QUERIES[name](spark, sf_dir)
    odf = con.execute(t.STAGED_ORACLE[name]).fetchdf()
    compare(sdf, odf, name)


def test_staged_all_graded_after_r9_flip():
    """The r9 flip: every formerly-staged literal text is part of the
    graded queries()/oracle_sql() surface (a/b pairs + waves 2-4 in the
    r9 _PRIORITY window, waves 5-8 scheduled for r10 — ROADMAP)."""
    import __spark_entry__ as entrymod

    graded = set(entrymod.oracle_sql())
    missing = set(STAGED) - graded
    assert not missing, missing


def test_staged_nondegenerate_at_oracle_sf():
    """Every staged query returns rows at the driver's grading SF (sf0.01)
    — DuckDB-side so the check is cheap. Guards against a star-derivation
    edit silently vacuating a filter (the mod-9 inventory lattice made
    q39's Jan⋈Feb self-join empty before the 97-modulus hash)."""
    con = duckdb_conn("/root/testdata/sf0.01")
    try:
        for name in STAGED:
            df = con.execute(t.STAGED_ORACLE[name]).fetchdf()
            n = len(df)
            if n == 1 and df.iloc[0].isna().all():
                # a single-scalar query (q23a/q32/q92 class) returning one
                # all-NULL row is vacuous too (ADVICE r8 #3 — the guard
                # test_tpch_literal.py already applies)
                n = 0
            assert n >= 1, f"{name} is vacuous at sf0.01"
    finally:
        con.close()


@pytest.mark.parametrize("name", STAGED)
def test_staged_plans_broadcast_no_cartesian(spark, sf_dir, name):
    """Same plan profile the graded literal suite locks: dims broadcast
    against the cached star, no cartesian product, no parquet re-scan.
    (inventory's dense derivation cross-join runs once inside
    _ensure_star_ext, never inside a query plan.)"""
    plan = (t.STAGED_QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    if name != "tpcds_lit_q77":
        # q77's reference text itself cross-joins the cs/cr CTEs (both
        # call-center-grained, ≤6 rows each) — the one sanctioned
        # cartesian in the suite.
        assert "CartesianProduct" not in plan
    if name not in ("tpcds_lit_q9", "tpcds_lit_q28", "tpcds_lit_q64",
                    "tpcds_lit_q24a", "tpcds_lit_q24b", "tpcds_lit_q57"):
        # q9/q28 have no equi-join at all: scalar-subquery / single-row
        # bucket scans over store_sales (q28's six 1-row buckets combine
        # via broadcast nested-loop, never a cartesian). q64/q24a/q24b/q57
        # moved to _runner_shared in r10: the returned plan is only the
        # main body over the checkpointed CTE (q24a/b: a join-free
        # aggregate over ssales; q57/q64: the CTE self-join) — the star
        # BHJs live in the per-run CTE materialization jobs (locked below
        # by test_shared_cte_materialization_plans).
        assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "FileScan" not in plan, plan[:2000]


def test_split_with_ctes_is_verbatim():
    """_split_with_ctes extracts each CTE body and the main statement
    VERBATIM (substring identity) — the shared-text discipline's guard:
    the Spark runner may re-compose the pieces but never edits them."""
    for name, shared in t._SHARED_CTES.items():
        text = t._ALL_TEXTS[name]
        ctes, main = t._split_with_ctes(text)
        names = [n for n, _ in ctes]
        assert set(shared) <= set(names), (name, names)
        for cte_name, body in ctes:
            assert body in text, (name, cte_name)
        assert main in text, name
        assert main.lstrip().lower().startswith("select"), name


def test_shared_cte_materialization_plans(spark, sf_dir):
    """The plan profile moved by _runner_shared: the per-run CTE
    materialization jobs keep the star broadcast profile (no cartesian,
    dims broadcast), and the returned main plan no longer re-plans the
    shared scaffold (q14a: one aggregate subtree per channel, not one
    per channel per CTE reference)."""
    import re

    for qname, shared in t._SHARED_CTES.items():
        text = t._ALL_TEXTS[qname]
        sql_only = re.sub(r"--[^\n]*", "", text)
        needed = tuple(n for n in t._STAR_TABLES_EXT
                       if re.search(rf"\b{n}\b", sql_only))
        t._ensure_star_ext(spark, sf_dir, needed)
        ctes, _main = t._split_with_ctes(text)
        alias = [f"{n} AS (SELECT * FROM tpcds_star_{n})"
                 for n in t._STAR_TABLES + needed]
        for cte_name, body in ctes:
            if cte_name not in shared:
                alias.append(f"{cte_name} AS ({body})")
                continue
            plan = (spark.sql("WITH " + ",\n".join(alias) + f" {body}")
                    ._jdf.queryExecution().executedPlan().toString())
            assert "CartesianProduct" not in plan, (qname, cte_name)
            if cte_name == "cs_ui":
                # fact ⋈ fact (catalog_sales ⋈ catalog_returns): a shuffle
                # join is the right strategy, broadcast would be wrong
                assert ("SortMergeJoin" in plan
                        or "ShuffledHashJoin" in plan), (qname, cte_name)
            else:
                # dim-joined scaffolds (cross_items/avg_sales/cross_sales)
                # keep the star broadcast profile
                assert "BroadcastHashJoin" in plan, (
                    qname, cte_name, plan[:2000])
            # keep later CTEs analyzable (cross_sales references cs_ui);
            # inline the body — this test checks each CTE's own profile
            alias.append(f"{cte_name} AS ({body})")


def test_graded_star_stays_lazy(spark, sf_dir):
    """Graded literal queries must not pay for the batch-5 ext tables:
    _ensure_star materializes only _STAR_TABLES, and a graded plan never
    references inventory/store_returns."""
    assert "store_returns" in t._STAR_TABLES_EXT
    assert "inventory" in t._STAR_TABLES_EXT
    assert not set(t._STAR_TABLES_EXT) & set(t._STAR_TABLES)
    plan = (t.QUERIES["tpcds_lit_q3"](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "inventory" not in plan and "store_returns" not in plan
