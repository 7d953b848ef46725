"""sf0.1 oracle parity for the ULP-sensitive queries — the round-5 lesson:
two queries were green at sf0.001/sf0.01 but diverged at sf0.1 because
engine-internal rounding (Spark's shortest-string HALF_UP vs DuckDB's
exact-binary round) differs in the last bit, and larger data finally
sampled a value ON the diverging boundary. The fixes compute cross-engine
arithmetic from exact IEEE ops only (FLOOR/multiply/divide, order-statistic
interpolation); this test pins them at the SF that caught the bug. Default
test SF stays sf0.001 elsewhere — these five run the bigger data because
boundary density is the point."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tests.oracle_util import compare, duckdb_conn

SF01 = "/root/testdata/sf0.1"

RISKY = [
    "tpch_q2",                  # surfaces ps_supplycost values directly
    "tpch_q9",                  # supplycost ulp × quantity amplification
    "quality_percentile_cut",   # interpolated cuts vs raw-score comparisons
    "histogram_quantile",       # interpolation arithmetic + exact percentiles
    "pricing_percentiles",      # percentile aggregates at volume
]


@pytest.fixture(scope="module")
def con01():
    c = duckdb_conn(SF01)
    yield c
    c.close()


@pytest.mark.parametrize("name", RISKY)
def test_sf01_precision(name, spark, con01):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    compare(q(spark, SF01), con01.execute(sql).fetchdf(), f"{name}@sf0.1")
