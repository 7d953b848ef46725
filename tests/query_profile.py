"""Ad-hoc per-query profiler for optimization rounds.

Times the named queries in ONE tuned session (cold + N warm runs, warm
median), consuming results with the noop sink (guide §1.4: computes every
column of every row, no driver materialization), and writes
`.explain("formatted")` for each to --plans-dir. Cache is cleared between
queries so each one pays its own persists (the bench's family-sharing is
deliberately NOT reproduced here: this tool isolates single-query cost).

    python tests/query_profile.py q1 q2 ... [--sf DIR] [--runs N]
        [--plans-dir DIR] [--suffix before|after] [--no-clear]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default=None)
    ap.add_argument("--no-clear", action="store_true",
                    help="keep caches across queries (bench family topology)")
    ap.add_argument("--plans-only", action="store_true",
                    help="skip timing; just write the formatted plans")
    args = ap.parse_args()

    import __spark_entry__ as e
    from flink_release_1_14_5_comment_spark.session import get_spark

    spark = get_spark("query_profile")
    qs = e.queries()
    # same warm-up as bench.py so cold numbers mean the query, not the JVM
    from flink_release_1_14_5_comment_spark.catalog import load_tables
    for df in load_tables(spark, args.sf).values():
        df.limit(1).count()
    spark.range(64).mapInPandas(lambda it: (p for p in it), "id long").count()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        if not args.plans_only:
            cold = run_once(fn)
            warm = sorted(run_once(fn) for _ in range(args.runs))
            med = warm[len(warm) // 2]
            print(f"{name}: cold={cold:.3f}s warm_med={med:.3f}s "
                  f"warm={[round(w, 3) for w in warm]}", flush=True)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            sfx = f"_{args.suffix}" if args.suffix else ""
            with open(os.path.join(args.plans_dir, f"{name}{sfx}.txt"), "w") as f:
                f.write(fn(spark, args.sf)._jdf.queryExecution()
                        .explainString(spark._jvm.org.apache.spark.sql.execution
                                       .ExplainMode.fromString("formatted")))
        if not args.no_clear:
            spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
