"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Per-query timing = plan + execute + consume. Results are consumed with a
cheap count-style action (collect only tiny results) so timing measures the
engine, not driver-side pandas materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family that matters at scale.
HEADLINE = [
    "agg_pricing_summary",
    "agg_distinct",
    "join_multiway",
    "join_large",
    "join_semi",
    "subquery_correlated",
    "over_windows",
    "topn",
    "dedup_keeplast",
    "grouping_sets",
    "window_tumble",
    "window_hop",
    "window_session",
    "window_cumulate",
    "interval_join",
    "asof_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "corpus_clean",
    "knn_cosine",
    "ann_lsh_topk",
    "text_stats",
    "funnel_match",
    "sessionize_paths",
    "multimodal_features",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from flink_release_1_14_5_comment_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # Warm the JVM, codegen, parquet footers, AND the Python worker pool
    # (first Pandas-UDF call pays worker fork + Arrow setup) with real
    # actions (not counted) so no timed query absorbs session startup.
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    tables = load_tables(spark, SF_DIR)
    for df in tables.values():
        df.limit(1).count()
    spark.range(64).mapInPandas(lambda it: (pdf for pdf in it), "id long").count()
    # compile a representative agg pipeline so codegen is warm too
    tables["lineitem"].limit(1000).groupBy("l_returnflag").count().count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
