"""Local mirror of the driver's DuckDB-oracle comparison: row count, schema
(normalized dtypes), and order-insensitive value comparison."""

from __future__ import annotations

import glob
import os

import duckdb
import numpy as np
import pandas as pd


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(path).replace(".parquet", "")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s) or (
            pd.api.types.is_object_dtype(s) and s.dropna().map(lambda v: isinstance(v, int)).all() and len(s.dropna())
        ):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
    key = df.apply(lambda row: tuple(repr(v) for v in row), axis=1)
    df = df.iloc[np.argsort(key, kind="stable")].reset_index(drop=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    s = _normalize(spark_df.toPandas())
    o = _normalize(oracle_df)
    assert list(s.columns) == list(o.columns), f"{name}: columns {list(s.columns)} != {list(o.columns)}"
    assert len(s) == len(o), f"{name}: row count {len(s)} != {len(o)}"
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv):
            a, b = sv.to_numpy(), ov.to_numpy(dtype="float64")
            both_nan = np.isnan(a) & np.isnan(b)
            exact = (a == b) | both_nan
            if not exact.all():
                bad = ~exact
                raise AssertionError(
                    f"{name}.{c}: {bad.sum()} float mismatches, max abs diff "
                    f"{np.nanmax(np.abs(a[bad] - b[bad]))}; first: {a[bad][:3]} vs {b[bad][:3]}"
                )
        else:
            if not sv.equals(ov):
                bad = sv != ov
                # NaN-safe: treat both-null as equal
                bad &= ~(sv.isna() & ov.isna())
                if bad.any():
                    idx = bad[bad].index[:3]
                    raise AssertionError(
                        f"{name}.{c}: {int(bad.sum())} mismatches; first rows {idx.tolist()}: "
                        f"{sv.loc[idx].tolist()} vs {ov.loc[idx].tolist()}"
                    )
