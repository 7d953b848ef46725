"""Skew & co-location strategies for 100 TB plans (SURVEY §3 "Partitioning,
shuffle, skew"; reference: the distinct-agg skew split the Flink planner
performs under ``table.optimizer.distinct-agg.split.enabled``
(SplitAggregateRule.java) and the two-phase local/global aggregation
(TwoStageOptimizedAggregateRule.java) — both re-expressed here as explicit
DataFrame rewrites, plus the salting pattern Flink users hand-roll for hot
join keys and Spark bucket-pruned co-located joins).

Everything here is a *semantics-preserving rewrite*: the salted join and the
split distinct agg are registered as oracle-gated queries whose oracle is the
PLAIN (unrewritten) SQL — the gate proves the rewrite changes the shuffle
topology, not the answer.

Scale notes (100 TB):
* ``salted_join``: a hot build key (one customer with 10^9 orders) sinks a
  hash join — every row of the key lands on one task. Salting splits the
  probe side into ``salt`` shards (deterministic hash of the probe row's
  unique id, NOT rand(): retries re-route identically) and replicates the
  build side ``salt``× — state per task drops by 1/salt at the cost of a
  salt× duplication of the (small) build side. AQE's skew-join split
  (``spark.sql.adaptive.skewJoin``) handles moderate skew automatically;
  explicit salting is for the single-key pathologies AQE can't split
  further. Used when the build side is too big to broadcast outright.
* ``split_distinct_agg``: COUNT(DISTINCT x) over a skewed group key
  shuffles every (key, x) pair to one reducer per key. The split inserts a
  bucket = hash(x) % n stage: partial distinct per (key, bucket) — n-way
  parallel per hot key — then a final SUM per key. Identical to the
  reference's SplitAggregateRule output shape.
* ``write_bucketed`` / co-located join: both fact tables bucketed by the
  join key at write time join WITHOUT any Exchange — the per-round bench
  can't show this (parquet inputs are unbucketed) but the plan test locks
  the property: zero shuffles in the joined plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int,
    probe_uid: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted ``salt`` ways and the build side
    replicated once per shard. ``probe_uid`` is any column unique per probe
    row — the shard assignment hashes it so retries route identically."""
    p = probe.withColumn("__salt", F.pmod(F.xxhash64(F.col(probe_uid)), F.lit(salt)))
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    return p.join(b, [key, "__salt"], how).drop("__salt")


def split_distinct_agg(
    df: DataFrame, group_cols: list[str], distinct_col: str, buckets: int = 16
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) per group via the two-level skew split
    (SplitAggregateRule.java): partial distinct per (group, hash bucket),
    final SUM per group. Output column: ``n_distinct``."""
    bucket = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets)).alias("__bkt")
    partial = df.groupBy(*group_cols, bucket).agg(
        F.count_distinct(F.col(distinct_col)).alias("__pd")
    )
    return partial.groupBy(*group_cols).agg(F.sum("__pd").alias("n_distinct"))


def topk_per_key(
    df: DataFrame,
    keys: list[str] | str,
    order: list,
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Two-phase distributed top-k per key — the local/global sort-limit
    split (reference: batch ``SortLimitOperator.java`` local/global pair and
    the same split ``SplitAggregateRule.scala:121`` applies to skewed aggs —
    SURVEY §2.6).

    A single ``row_number() OVER (PARTITION BY key)`` window funnels the
    ENTIRE input through one task per key — with a handful of probe keys
    that is a maximal-skew shuffle at 100 TB. This helper instead:

    1. ranks within ``(key, spark_partition_id())`` — a uniform shuffle with
       ``keys × n_partitions``-way parallelism — and keeps each task's local
       top-k (any global top-k row is necessarily in its partition's local
       top-k, so the prune is exact);
    2. ranks the ≤ ``k × n_partitions`` survivors per key globally.

    ``order`` must be a deterministic total order (tiebreak to a unique
    column) — all callers order by (rounded score, unique id). The output is
    partitioning-invariant: step 1 only changes WHICH non-surviving rows are
    dropped, never the survivors or their global ranks.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    from pyspark.sql import Window as W

    lw = W.partitionBy(*keys, "__tk_pid").orderBy(*order)
    gw = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__tk_pid", F.spark_partition_id())
        .withColumn("__tk_lrn", F.row_number().over(lw))
        .filter(F.col("__tk_lrn") <= k)
        .drop("__tk_pid", "__tk_lrn")
        .withColumn(rank_col, F.row_number().over(gw))
        .filter(F.col(rank_col) <= k)
    )


def write_bucketed(
    df: DataFrame, table: str, key: str, num_buckets: int = 8
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` (saveAsTable — parquet files
    whose bucket spec the catalog remembers). Two tables bucketed the same
    way join with zero Exchange."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line)


# --- oracle-gated rewrite queries -----------------------------------------

_SALTED_JOIN_PLAIN_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total,
       l_linenumber, round(l_extendedprice, 2) AS price
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND l_quantity > 45
"""

_SPLIT_DISTINCT_PLAIN_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted orders⋈lineitem (8 shards) — oracle is the PLAIN join: the gate
    proves salting preserves semantics exactly."""
    t = register_views(spark, sf_dir)
    probe = t["lineitem"].filter(F.col("l_quantity") > 45).select(
        F.col("l_orderkey"), "l_linenumber", F.round("l_extendedprice", 2).alias("price")
    ).withColumn("__uid", F.concat_ws("#", "l_orderkey", "l_linenumber"))
    build = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderkey", "o_custkey",
        F.round("o_totalprice", 2).alias("total"),
    )
    return (
        salted_join(probe, build, "l_orderkey", salt=8, probe_uid="__uid")
        .select("o_orderkey", "o_custkey", "total", "l_linenumber", "price")
    )


def q_split_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct split over lineitem — oracle is plain
    COUNT(DISTINCT): the bucketed partial/final pair must sum to it."""
    t = register_views(spark, sf_dir)
    return split_distinct_agg(
        t["lineitem"], ["l_returnflag", "l_linestatus"], "l_partkey", buckets=16
    )


# Numeric range join: lineitem rows land in the quantity tier whose
# [lo, hi) interval contains them. The tier table is tiny and the predicate
# non-equi, so the right plan is a broadcast nested-loop join — Catalyst
# picks exactly that (the reference's NestedLoopJoin with a broadcast build,
# BatchExecNestedLoopJoin.java). At scale with a LARGE range table the
# rewrite is binning: precompute bucket = which tier(lo grid) each row hits
# and equi-join on the bucket — that rewrite is what interval_join does for
# time ranges (operators/temporal_joins.py).
_RANGE_JOIN_BODY = """
SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n_items,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(SUM(l_quantity), 2) AS total_qty
FROM lineitem
JOIN {tiers}
  ON l_quantity >= t.lo AND l_quantity < t.hi
GROUP BY t.tier
"""
_TIER_ROWS = "('small', 0, 10), ('mid', 10, 25), ('large', 25, 60)"


def q_range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi interval) join of a fact table against tier bounds."""
    register_views(spark, sf_dir)
    return spark.sql(_RANGE_JOIN_BODY.format(
        tiers=f"(SELECT * FROM VALUES {_TIER_ROWS} AS v(tier, lo, hi)) AS t"
    ))


# 32-bit Morton (Z-order) code: interleave 16 bits of partkey with 16 bits
# of suppkey. `>> & <<` parse identically in Spark SQL and DuckDB, so ONE
# SQL text serves both engines.
_ZORDER_SQL = """
WITH coded AS (
  SELECT l_partkey, l_suppkey,
         (((l_partkey >> 0) & 1) << 1) + (((l_suppkey >> 0) & 1) << 0) + (((l_partkey >> 1) & 1) << 3) + (((l_suppkey >> 1) & 1) << 2) + (((l_partkey >> 2) & 1) << 5) + (((l_suppkey >> 2) & 1) << 4) + (((l_partkey >> 3) & 1) << 7) + (((l_suppkey >> 3) & 1) << 6) + (((l_partkey >> 4) & 1) << 9) + (((l_suppkey >> 4) & 1) << 8) + (((l_partkey >> 5) & 1) << 11) + (((l_suppkey >> 5) & 1) << 10) + (((l_partkey >> 6) & 1) << 13) + (((l_suppkey >> 6) & 1) << 12) + (((l_partkey >> 7) & 1) << 15) + (((l_suppkey >> 7) & 1) << 14) + (((l_partkey >> 8) & 1) << 17) + (((l_suppkey >> 8) & 1) << 16) + (((l_partkey >> 9) & 1) << 19) + (((l_suppkey >> 9) & 1) << 18) + (((l_partkey >> 10) & 1) << 21) + (((l_suppkey >> 10) & 1) << 20) + (((l_partkey >> 11) & 1) << 23) + (((l_suppkey >> 11) & 1) << 22) + (((l_partkey >> 12) & 1) << 25) + (((l_suppkey >> 12) & 1) << 24) + (((l_partkey >> 13) & 1) << 27) + (((l_suppkey >> 13) & 1) << 26) + (((l_partkey >> 14) & 1) << 29) + (((l_suppkey >> 14) & 1) << 28) + (((l_partkey >> 15) & 1) << 31) + (((l_suppkey >> 15) & 1) << 30) AS z
  FROM lineitem
), bucketed AS (
  SELECT z >> 24 AS z_bucket, l_partkey, l_suppkey FROM coded
)
SELECT CAST(z_bucket AS BIGINT) AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(l_partkey) AS BIGINT) AS min_part,
       CAST(MAX(l_partkey) AS BIGINT) AS max_part,
       CAST(MAX(l_partkey) - MIN(l_partkey) AS BIGINT) AS part_span,
       CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
       CAST(MAX(l_suppkey) AS BIGINT) AS max_supp,
       CAST(MAX(l_suppkey) - MIN(l_suppkey) AS BIGINT) AS supp_span
FROM bucketed
GROUP BY z_bucket
"""


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton-curve) clustering audit — the multi-dimensional
    data-skipping layout (Delta OPTIMIZE ZORDER, Iceberg sort orders): each
    lineitem row gets a 32-bit interleaved (partkey, suppkey) code, rows
    bucket by the code's top byte, and the output is the ZONE MAP a scan
    planner would consult — per-bucket min/max spans on BOTH dimensions.
    Narrow spans on both axes at once are the whole point (a single-column
    sort narrows one axis and leaves the other full-range): a predicate on
    EITHER key prunes most buckets. The code is a pure codegen map; the
    audit is one bounded-key agg (<=256 buckets). At 100 TB you'd
    repartitionByRange(z) and write — the zone map here is exactly what
    parquet row-group min/max stats would then contain."""
    register_views(spark, sf_dir)
    return spark.sql(_ZORDER_SQL)


QUERIES = {
    "skew_salted_join": q_skew_salted_join,
    "split_distinct_agg": q_split_distinct_agg,
    "range_join_tiers": q_range_join_tiers,
    "zorder_layout": q_zorder_layout,
}

ORACLE = {
    "zorder_layout": _ZORDER_SQL,
    "skew_salted_join": _SALTED_JOIN_PLAIN_SQL,
    "split_distinct_agg": _SPLIT_DISTINCT_PLAIN_SQL,
    "range_join_tiers": _RANGE_JOIN_BODY.format(
        tiers=f"(VALUES {_TIER_ROWS}) AS t(tier, lo, hi)"
    ),
}
