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


def test_bare_session_conf_recovery(spark, sf_dir):
    """Round-1 regression: the driver provides its OWN SparkSession without
    spark.sql.legacy.parquet.nanosAsLong — load_tables must set it at runtime
    or every query dies on events.parquet (TIMESTAMP NANOS)."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = QUERIES["agg_pricing_summary"](spark, sf_dir)
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_driver_style_subprocess():
    """Full-fidelity driver emulation: fresh process, vanilla SparkSession
    (none of session.get_spark's confs), run a query that reads events."""
    import subprocess

    script = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql import SparkSession\n"
        "spark = SparkSession.builder.master('local[4]')"
        ".config('spark.ui.enabled','false').getOrCreate()\n"
        "import __spark_entry__ as e\n"
        "qs = e.queries()\n"
        "n = qs['agg_pricing_summary'](spark, '/root/testdata/sf0.001').count()\n"
        "assert n > 0, n\n"
        "print('BARE_SESSION_OK', n)\n"
    )
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "BARE_SESSION_OK" in r.stdout


def test_catalog_isolates_bad_table(spark, tmp_path):
    """One unreadable table must not sink the catalog (round-1 lesson —
    events.parquet's nanos type killed all 50 graded queries)."""
    import shutil
    import warnings

    from flink_release_1_14_5_comment_spark.catalog import load_tables

    d = str(tmp_path)
    for n in ("nation", "region"):
        shutil.copy(f"/root/testdata/sf0.001/{n}.parquet", f"{d}/{n}.parquet")
    with open(f"{d}/customer.parquet", "w") as fh:
        fh.write("not parquet")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t = load_tables(spark, d)
    assert sorted(t) == ["nation", "region"]
    assert any("customer" in str(x.message) for x in w)
