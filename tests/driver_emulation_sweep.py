"""Full-fidelity driver emulation for the graded window: fresh process,
VANILLA SparkSession (none of session.get_spark's confs), run every
_PRIORITY query at sf0.01 and hash-compare against its DuckDB oracle —
exactly what CORRECTNESS_r{N} does. Run ad hoc before a round closes:

    python tests/driver_emulation_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "16")
             .getOrCreate())
    import __spark_entry__ as e
    from tests.oracle_util import compare, duckdb_conn

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb_conn(sf)
    bad = []
    for name in e._PRIORITY:
        t0 = time.time()
        try:
            compare(qs[name](spark, sf), con.execute(osql[name]).fetchdf(), name)
            print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001 — report-all sweep
            bad.append(name)
            print(f"FAIL {name}: {str(ex)[:300]}", flush=True)
    print(f"window: {len(e._PRIORITY) - len(bad)}/{len(e._PRIORITY)} green")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
