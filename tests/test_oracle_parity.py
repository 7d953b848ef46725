"""Every queries() entry with an oracle must match DuckDB on the test SF —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tests.oracle_util import compare, duckdb_conn

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_oracle_parity(name, spark, sf_dir, con):
    sdf = QUERIES[name](spark, sf_dir)
    odf = con.execute(ORACLE[name]).fetchdf()
    compare(sdf, odf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_all_queries_have_callables():
    for name in ORACLE:
        assert name in QUERIES, f"oracle without query: {name}"
