"""Paired config A/B: time a set of shuffle-join-heavy queries with a
runtime-settable SQLConf toggled between values, alternating per round in
one session (same noise rationale as ab_compare_r10.py).

    python tests/conf_ab_r10.py spark.sql.join.preferSortMergeJoin false true \
        [--queries a,b,c] [--rounds N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


DEFAULT_QUERIES = [
    "dedup_minhash_lsh", "dedup_clusters", "duplicate_spans", "tpch_q21",
    "tpch_q18", "fuzzy_entity_match", "tpcds_lit_q14a", "dedup_exact",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("conf")
    ap.add_argument("val_a")
    ap.add_argument("val_b")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = args.queries.split(",")

    import __spark_entry__ as e
    from flink_release_1_14_5_comment_spark.catalog import load_tables
    from flink_release_1_14_5_comment_spark.session import get_spark

    spark = get_spark("conf_ab_r10")
    qs = e.queries()
    for df in load_tables(spark, args.sf).values():
        df.limit(1).count()

    res: dict[str, list[float]] = {args.val_a: [], args.val_b: []}
    for r in range(args.rounds):
        for val in (args.val_a, args.val_b):
            spark.conf.set(args.conf, val)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{args.conf}={val}:r{r}")
            t0 = time.perf_counter()
            for name in names:
                qs[name](spark, args.sf).write.format("noop").mode(
                    "overwrite").save()
            res[val].append(time.perf_counter() - t0)
            print(f"r{r} {args.conf}={val}: {res[val][-1]:.3f}s", flush=True)
    for val, ts in res.items():
        ts = sorted(ts)
        print(f"{args.conf}={val}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} "
              f"all={[round(t, 2) for t in ts]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
