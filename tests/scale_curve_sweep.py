"""Empirical scaling curve: wall-clock for representative heavy plans at
1x / 8x / 64x in-flight replication of sf0.1 (64x lineitem = 38.4M rows,
an sf6-equivalent fact table on this box). Complements
tests/test_scale_replicated.py (which asserts correctness invariants at
10x): this records HOW COST GROWS, the "would it still work, and work
fast, at 100x" question answered with measurements instead of prose.

Within-run ratios are the signal (same host window, so hypervisor noise
largely cancels); absolute seconds are rig-dependent. A plan whose wall
time grows ~linearly in k has no hidden quadratic/driver-side bottleneck;
the expected curves per plan class are noted inline. Results are pasted
into SCALE.md's "Empirical scaling curve" section when re-run.

Run ad hoc (idle host):  python tests/scale_curve_sweep.py [max_k]
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    max_k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from pyspark.sql import functions as F

    from flink_release_1_14_5_comment_spark.session import get_spark
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    spark = get_spark("scale-curve")
    t = load_tables(spark, "/root/testdata/sf0.1")
    li, orders = t["lineitem"], t["orders"]

    def rep(df, k):
        # k-x data as a UNION of k scans, NOT a crossJoin against a k-row
        # range: real data growth multiplies scan SPLITS along with rows,
        # and plans with pre-shuffle per-split work (partial sort under
        # WindowGroupLimit, partial agg) are parallelism-bound by split
        # count — the crossJoin device pins that at the base split count
        # (3 for sf0.1 lineitem) and misreads ~linear plans as
        # superlinear. __rep folds into join/partition keys so a k-x
        # corpus behaves like k-x MORE entities, not k-x duplicates.
        return functools.reduce(
            lambda a, b: a.unionAll(b),
            [df.withColumn("__rep", F.lit(i)) for i in range(k)])

    # Plan classes and their expected curves:
    #   scan_agg     — full-scan partial+final agg: ~linear in k
    #   fact_join    — lineitem x orders shuffle join + agg: ~linear
    #                  (shuffle volume linear; the join key carries __rep
    #                  so match multiplicity stays constant as k grows)
    #   over_window  — per-order window rank: ~linear (one shuffle+sort;
    #                  partition COUNT grows with k, partition SIZE does
    #                  not — the skew-safe property)
    #   distinct     — global distinct over a k-x key space: ~linear
    #                  shuffle of map-side-deduped keys
    plans = {
        "scan_agg": lambda k: rep(li, k).groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"),
                 F.count(F.lit(1))),
        "fact_join": lambda k: rep(li, k).withColumn(
                "jk", F.expr("l_orderkey * 256 + __rep"))
            .join(rep(orders, k).withColumn(
                "jk", F.expr("o_orderkey * 256 + __rep")), "jk")
            .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")),
        "over_window": lambda k: rep(li, k).withColumn(
                "pk", F.expr("l_orderkey * 256 + __rep"))
            .withColumn("rk", F.expr(
                "rank() over (partition by pk order by l_extendedprice desc)"))
            .where("rk <= 2").groupBy("l_returnflag").count(),
        "distinct": lambda k: rep(li, k).select(
                F.expr("l_partkey * 256 + __rep").alias("k"))
            .distinct().agg(F.count(F.lit(1))),
    }

    ks = [k for k in (1, 8, 64) if k <= max_k]
    n_li, n_ord = li.count(), orders.count()
    print(f"# base rows: lineitem {n_li:,}, orders {n_ord:,}; "
          f"max k={ks[-1]} -> lineitem {n_li * ks[-1]:,}")
    results: dict[str, dict[int, float]] = {}
    for name, build in plans.items():
        build(1).count()  # warm codegen/footers for this shape, untimed
        results[name] = {}
        for k in ks:
            t0 = time.perf_counter()
            n = build(k).count()
            dt = time.perf_counter() - t0
            results[name][k] = dt
            print(f"{name:12s} k={k:<3d} {dt:7.2f}s  ({n:,} rows)", flush=True)
    print("\n# ratios vs k=1 (linear plan => ratio <= k):")
    for name, r in results.items():
        base = r[ks[0]]
        print(f"{name:12s} " + "  ".join(
            f"k={k}: {r[k] / base:6.2f}x" for k in ks))

    # --- LLM-pipeline curve: MinHash+LSH near-dup dedup ------------------
    # A k-x corpus built by suffixing every token with _x<rep>: replica
    # vocabularies are DISJOINT, so replicas are not near-dups of each
    # other and the within-replica near-dup structure repeats ~k times.
    # Invariants as k grows:
    #   - HARD: zero cross-replica verified pairs (Jaccard >= threshold
    #     over disjoint shingle sets is impossible) — a violation is a
    #     correctness bug surfacing under growth;
    #   - SOFT: pair count ~= k x pairs(1) within ~1% — NOT exact,
    #     because each replica hashes into an independent 32-bit shingle
    #     space, and banded LSH recall at borderline Jaccard (~0.4,
    #     b=4/r=2 => ~50% collision odds) flips a few candidate pairs
    #     in/out per replica. Verified empirically: 4,091 vs 4,096 at
    #     k=16 with zero cross-replica pairs.
    from flink_release_1_14_5_comment_spark.pipeline.dedup import (
        near_dup_pairs, shingle_frame)

    docs = t["documents"].select("doc_id", "text")

    def rep_docs(k):
        parts = [
            docs.withColumn("doc_id", F.expr(f"doc_id * 64 + {i}"))
                .withColumn("text", F.expr(
                    "array_join(transform(split(text, ' '), "
                    f"x -> concat(x, '_x{i}')), ' ')"))
            for i in range(k)
        ]
        return functools.reduce(lambda a, b: a.unionAll(b), parts)

    dks = [k for k in (1, 4, 16) if k <= max_k]
    # warm the shingle/minhash codegen untimed so k=1 isn't JIT-dominated
    near_dup_pairs(shingle_frame(rep_docs(1)).persist()).count()
    spark.catalog.clearCache()
    base_pairs = None
    print(f"\n# minhash_lsh dedup: documents {docs.count():,} x k")
    for k in dks:
        sh = shingle_frame(rep_docs(k)).persist()
        t0 = time.perf_counter()
        pairs = near_dup_pairs(sh)
        n = pairs.count()
        dt = time.perf_counter() - t0
        n_cross = pairs.where("doc_a % 64 != doc_b % 64").count()
        spark.catalog.clearCache()
        if k == dks[0]:
            base_pairs, base_dt = n, dt
        drift = (abs(n - k * base_pairs) / (k * base_pairs) * 100
                 if base_pairs else float(n > 0) * 100)
        flags = ("" if n_cross == 0 else f"  !! {n_cross} CROSS-REPLICA pairs") \
            + ("" if drift <= 1.0 else f"  !! {drift:.1f}% off k x base")
        rate = f"{dt / base_dt:5.2f}x" if base_dt else "  n/a"
        print(f"minhash_lsh  k={k:<3d} {dt:7.2f}s  ({n:,} pairs, "
              f"{rate}){flags}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
