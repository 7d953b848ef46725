"""Round-8 plan locks (amended r11).

1. VERDICT r7 residual (c), narrowed by VERDICT r10 #4: the fingerprint
   group-size queries whose fingerprint map is CHEAP (doc_fingerprint:
   one md5/doc; dedup_simhash: slim persisted frame) must not use a
   count() OVER (PARTITION BY <fingerprint>) window — a mass-duplicate
   corpus would pile one fingerprint into a single window task's buffer,
   and the groupBy+join shape reduces map-side and lets AQE split a
   skewed join partition. doc_winnow moved OUT of this lock in r11:
   VERDICT r10 #4 ordered its window rewrite (its rolling-hash map is the
   plan's dominant CPU, so the join-back shape paid a guaranteed 2× map
   pass to buy splittability for a tail case — the same call the judge
   approved for duplicate_spans in r10); its window shape is locked in
   tests/test_r11_optimizations.py.
2. VERDICT r7 #4: the literal TPC-DS queries read the session-cached star
   (InMemoryTableScan), not a re-derived lineitem⋈orders CTE per query.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fingerprint_group_sizes_have_no_window(spark):
    from flink_release_1_14_5_comment_spark.pipeline import dedup, text_analysis

    for fn in (text_analysis.q_doc_fingerprint,
               dedup.q_dedup_simhash):
        plan = _plan(fn(spark, SF))
        assert "Window" not in plan, f"{fn.__name__}: window survived\n{plan}"
        # the replacement shape: a partial-aggregated count joined back
        assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_literal_tpcds_reads_cached_star(spark):
    from flink_release_1_14_5_comment_spark.operators import tpcds_literal

    plan = _plan(tpcds_literal.QUERIES["tpcds_lit_q3"](spark, SF))
    assert "ExistingRDD" in plan, plan
    # the fact derivation join (lineitem ⋈ orders) happens at star build,
    # not inside the per-query plan: no parquet scans remain
    assert "lineitem" not in plan and "orders" not in plan, plan
    assert "FileScan" not in plan, plan
