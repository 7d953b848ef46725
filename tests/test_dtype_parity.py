"""The dtype-parity gate (VERDICT r9 "What's missing" #2).

The driver's CORRECTNESS hash is DTYPE-SENSITIVE while its rows/schema
checks — and, before r10, this repo's entire local mirror — are
value-based: an uncast SUM(integer) types as DuckDB HUGEINT, rendered
float64 by ``fetchdf()``, vs Spark bigint, so identical values hash apart
(all 5 r9 red rows: q47/q14a/q21/q29/q50; 7 latent in the r10 window).

The gate itself lives in ``tests/oracle_util.compare`` (``_check_dtype_
parity``), so the FULL 370-entry coverage runs with every oracle-parity
sweep (test_oracle_parity.py at sf0.001, the per-round sf0.01/sf0.1
sweeps, and driver_emulation_sweep.py). This file proves the gate BITES
(a synthetic int-vs-float frame must fail), proves the allowed cases stay
allowed (grading history: int-width gaps green in r8 via q36/q86,
both-sides-float green in r9 via q67), and pins the 12 r10 cast fixes
end-to-end: Spark AND DuckDB must now emit integer dtypes on every
previously-HUGEINT sum column. Ad-hoc full-surface enumeration:
``python tests/dtype_parity_sweep.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.oracle_util import _check_dtype_parity, compare, duckdb_conn

# the r9 official reds + the 7 latent r10-window entries, with the output
# columns whose shared texts gained CAST(... AS BIGINT) in r10
FIXED = {
    "tpcds_lit_q47": ["sum_sales", "psum", "nsum"],
    "tpcds_lit_q14a": ["number_sales"],
    "tpcds_lit_q21": ["inv_before", "inv_after"],
    "tpcds_lit_q29": ["store_sales_quantity", "store_returns_quantity",
                      "catalog_sales_quantity"],
    "tpcds_lit_q50": ["d30_days", "d31_60_days", "d61_90_days",
                      "d91_120_days", "dgt120_days"],
    "tpcds_lit_q99": ["d30_days", "d31_60_days", "d61_90_days",
                      "d91_120_days", "dgt120_days"],
    "tpcds_lit_q75": ["prev_yr_cnt", "curr_yr_cnt", "sales_cnt_diff"],
    "tpcds_lit_q83": ["sr_item_qty", "cr_item_qty", "wr_item_qty"],
    "tpcds_lit_q97": ["store_only", "catalog_only", "store_and_catalog"],
    "tpcds_lit_q72": ["no_promo", "promo"],
    "tpcds_lit_q78": ["store_qty", "other_chan_qty"],
    "tpch_lit_q12": ["high_line_count", "low_line_count"],
}


def test_gate_catches_int_vs_float():
    s = pd.DataFrame({"k": ["a", "b"], "v": np.array([450, 7], "int64")})
    o = pd.DataFrame({"k": ["a", "b"], "v": np.array([450.0, 7.0])})
    with pytest.raises(AssertionError, match="dtype-family"):
        _check_dtype_parity(s, o, "synthetic")
    # and in the other direction (Spark NULL-able int -> float64 while the
    # oracle stays int64)
    with pytest.raises(AssertionError, match="dtype-family"):
        _check_dtype_parity(o, s, "synthetic")


def test_gate_allows_proven_safe_gaps():
    # int-width gaps: q36/q86 officially green in r8 with Spark int32
    # rank() vs DuckDB int64
    s = pd.DataFrame({"r": np.array([1, 2], "int32")})
    o = pd.DataFrame({"r": np.array([1, 2], "int64")})
    _check_dtype_parity(s, o, "width")
    # both-sides-float: q67 green in r9 (NULL-able ROLLUP keys)
    s2 = pd.DataFrame({"x": np.array([1.0, np.nan])})
    o2 = pd.DataFrame({"x": np.array([1.0, np.nan])})
    _check_dtype_parity(s2, o2, "bothfloat")
    # datetime unit gaps: same Timestamp repr under the driver's hash
    s3 = pd.DataFrame({"t": pd.to_datetime(["2000-01-01"]).astype("datetime64[ns]")})
    o3 = pd.DataFrame({"t": pd.to_datetime(["2000-01-01"]).astype("datetime64[us]")})
    _check_dtype_parity(s3, o3, "dtunit")
    # vacuous (all-null object) columns never block
    s4 = pd.DataFrame({"v": pd.Series([None, None], dtype="object")})
    o4 = pd.DataFrame({"v": np.array([np.nan, np.nan])})
    _check_dtype_parity(s4, o4, "vacuous")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(FIXED))
def test_r10_cast_fix_lands_int64_both_sides(name, spark, sf_dir, con):
    """End-to-end pin of the r10 fix: the cast columns are integer-dtyped
    in BOTH engines' pandas frames, and values still match (compare now
    includes the dtype gate, so this is the full driver-shaped check)."""
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    spdf = qs[name](spark, sf_dir)
    odf = con.execute(osql[name]).fetchdf()
    sp = spdf.toPandas()
    for col in FIXED[name]:
        assert pd.api.types.is_integer_dtype(sp[col]), \
            f"{name}.{col}: Spark {sp[col].dtype}"
        assert pd.api.types.is_integer_dtype(odf[col]), \
            f"{name}.{col}: DuckDB fetchdf {odf[col].dtype} — cast missing?"
    compare(spdf, odf, name)
