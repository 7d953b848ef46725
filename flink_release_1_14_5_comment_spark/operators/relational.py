"""Batch relational operators (SURVEY.md §2.2-§2.8) as (spark, sf_dir) -> DataFrame.

Each query re-expresses one operator family of the reference engine
(Apache Flink 1.14.5) Spark-first: declare the plan with DataFrame/SQL and let
Catalyst pick the physical strategy the Flink planner would have hand-placed.

Scale notes are inline per query: which side broadcasts, where the shuffle is,
and why the plan survives 1000 executors / 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------

def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — hash aggregation with partial/final phases.

    Reference: BatchExecHashAggregate.java:50 (spillable codegen hash agg);
    here Catalyst HashAggregateExec with map-side partial aggregation: the
    shuffle moves only (flag,status) x partial-accumulator rows, never data —
    at 100 TB the shuffle is a few KB regardless of input size.
    """
    t = register_views(spark, sf_dir)
    li = t["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            # Averages use round(sum)/count: the raw sums differ between
            # engines in the last ulp while the data's ~2-decimal values make
            # averages land exactly on rounding boundaries — rounding the sum
            # first (where the tolerance is huge) makes the division exact-
            # identical on both sides.
            (F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1))).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1))).alias("avg_price"),
            (F.round(F.sum("l_discount"), 4) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q_AGG_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(SUM(l_quantity), 2) / COUNT(*) AS avg_qty,
       ROUND(SUM(l_extendedprice), 2) / COUNT(*) AS avg_price,
       ROUND(SUM(l_discount), 4) / COUNT(*) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT)/SUM(DISTINCT) — the reference rewrites distinct aggs
    via Expand (FlinkAggregateExpandDistinctAggregatesRule.java); Catalyst has
    the identical expand-based rewrite built in.
    """
    t = register_views(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum_distinct(F.round(F.col("o_totalprice"), 0)), 2).alias("sum_distinct_price"),
        )
    )


ORACLE_Q_AGG_DISTINCT = """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(DISTINCT ROUND(o_totalprice, 0)), 2) AS sum_distinct_price
FROM orders
GROUP BY o_orderpriority
"""


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates — STDDEV_POP/SAMP, VAR_POP/SAMP
    (reference declarative agg fns, BuiltInFunctionDefinitions.java:316-412).
    """
    t = register_views(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_pop("l_quantity"), 4).alias("std_pop_qty"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("std_samp_qty"),
            F.round(F.var_pop("l_discount"), 6).alias("var_pop_disc"),
            F.round(F.var_samp("l_discount"), 6).alias("var_samp_disc"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


ORACLE_Q_AGG_STATS = """
SELECT l_returnflag,
       ROUND(STDDEV_POP(l_quantity), 4) AS std_pop_qty,
       ROUND(STDDEV_SAMP(l_quantity), 4) AS std_samp_qty,
       ROUND(VAR_POP(l_discount), 6) AS var_pop_disc,
       ROUND(VAR_SAMP(l_discount), 6) AS var_samp_disc,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE-style "row of the extreme" aggregation —
    Flink aggfunctions FirstValue/LastValue; Spark max_by/min_by, DuckDB arg_max.
    """
    t = register_views(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("best_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("worst_order"),
            F.round(F.max("o_totalprice"), 2).alias("best_price"),
        )
    )


ORACLE_Q_AGG_MINMAX_BY = """
SELECT o_custkey,
       arg_max(o_orderkey, o_totalprice) AS best_order,
       arg_min(o_orderkey, o_totalprice) AS worst_order,
       ROUND(MAX(o_totalprice), 2) AS best_price
FROM orders
GROUP BY o_custkey
"""


def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / COLLECT (ListAggFunction.java) — deterministic via sorted
    collect_list; DuckDB string_agg(ORDER BY).
    """
    t = register_views(spark, sf_dir)
    return (
        t["nation"]
        .groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


ORACLE_Q_AGG_LISTAGG = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM nation
GROUP BY n_regionkey
"""


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------

def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style star join — revenue per nation in ASIA.

    Reference: HashJoinOperator.java:58 + broadcast-threshold planner
    (OptimizerConfigOptions.java:51). Spark plan: lineitem⋈orders shuffles on
    orderkey; customer/nation/region are broadcast-hash joins (all under the
    10 MB threshold at any SF) — the fact table is scanned once and never
    re-shuffled for the dims.
    """
    t = register_views(spark, sf_dir)
    li, o, c, n, r = t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"]
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q_JOIN_MULTIWAY = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_join_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact equi-join (lineitem ⋈ orders) — SortMergeJoinOperator.java:62.

    At 100 TB both sides exceed the broadcast threshold; Catalyst picks
    sort-merge (or AQE switches to shuffled-hash); both sides shuffle once on
    the join key and the downstream agg reuses nothing else.
    """
    return _sql(spark, sf_dir, """
        SELECT o_orderstatus,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate
        GROUP BY o_orderstatus, YEAR(o_orderdate)
    """)


ORACLE_Q_JOIN_LARGE = """
SELECT o_orderstatus,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate
GROUP BY o_orderstatus, EXTRACT(year FROM o_orderdate)
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (reference subquery rewrite → semi-join flag in
    HashJoinOperator; FlinkSubQueryRemoveRule.scala). Semi joins ship only the
    distinct keys of the filter side — cheap at scale.
    """
    t = register_views(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_Q_JOIN_SEMI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (StreamingSemiAntiJoinOperator.java:34 for
    the streaming variant; batch anti flag in hash join)."""
    t = register_views(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        t["customer"]
        .join(urgent, t["customer"].c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


ORACLE_Q_JOIN_ANTI = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join → BroadcastNestedLoopJoin
    (BatchExecNestedLoopJoin.java:44). Only valid with one broadcast-able side;
    part×supplier are both bounded dims.
    """
    t = register_views(spark, sf_dir)
    p, s = t["part"], t["supplier"]
    return (
        p.join(F.broadcast(s), p.p_retailprice * 10 > s.s_acctbal)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.countDistinct("s_suppkey").alias("n_supp"))
    )


ORACLE_Q_JOIN_THETA = """
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_supp
FROM part JOIN supplier ON p_retailprice * 10 > s_acctbal
GROUP BY p_brand
"""


def q_join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides (SortMergeFullOuterJoinIterator.java).
    Aggregate-before-join keeps the outer join input minimal — the Flink
    planner's FlinkAggregateJoinTransposeRule does the same reordering.
    """
    t = register_views(spark, sf_dir)
    oc = (
        t["orders"].groupBy(F.col("o_custkey").alias("k"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
    )
    ev = (
        t["events"].groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        oc.join(ev, "k", "full_outer")
        .select(
            F.coalesce(oc.k, ev.k).alias("k"),
            "total_spent",
            "n_events",
        )
    )


ORACLE_Q_JOIN_OUTER_FULL = """
WITH oc AS (SELECT o_custkey AS k, ROUND(SUM(o_totalprice), 2) AS total_spent
            FROM orders GROUP BY o_custkey),
     ev AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id)
SELECT COALESCE(oc.k, ev.k) AS k, total_spent, n_events
FROM oc FULL OUTER JOIN ev ON oc.k = ev.k
"""


def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — decorrelated into an agg+join by the
    optimizer (reference: SubQueryDecorrelator.java; Catalyst: RewriteCorrelatedScalarSubquery).
    """
    return _sql(spark, sf_dir, """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders o
        WHERE o_totalprice > (SELECT 1.5 * CAST(SUM(CAST(ROUND(o2.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                                    / (COUNT(o2.o_totalprice) * 100)
                              FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """)


ORACLE_Q_SUBQUERY_CORRELATED = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE o_totalprice > (SELECT 1.5 * CAST(SUM(CAST(ROUND(o2.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                            / (COUNT(o2.o_totalprice) * 100)
                      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


# ---------------------------------------------------------------------------
# §2.5 Over windows  /  §2.6 Top-N, dedup, sort-limit
# ---------------------------------------------------------------------------

def q_over_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVER aggregates: ROWS / RANGE frames, ranking, LEAD/LAG — the
    reference's frame zoo (operators/over/frame/*: SlidingOverFrame,
    RangeSlidingOverFrame, OffsetOverFrame…) all map to Catalyst WindowExec.

    Scale: single shuffle on o_custkey; all frames evaluated in one pass over
    each sorted partition.
    """
    t = register_views(spark, sf_dir)
    byq = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    byprice = W.partitionBy("o_custkey").orderBy("o_totalprice")
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(byq).cast("long").alias("rn"),
        F.rank().over(byprice.orderBy(F.col("o_orderpriority"))).cast("long").alias("prio_rank"),
        F.dense_rank().over(byprice.orderBy(F.col("o_orderpriority"))).cast("long").alias("prio_dense"),
        F.lead("o_orderkey", 1).over(byq).alias("next_order"),
        F.lag("o_orderkey", 1).over(byq).alias("prev_order"),
        F.round(F.sum("o_totalprice").over(byq.rowsBetween(W.unboundedPreceding, 0)), 2).alias("running_total"),
        F.round(
            F.sum("o_totalprice").over(byprice.rangeBetween(-100000, 0)), 2
        ).alias("nearby_total"),
    )


ORACLE_Q_OVER_WINDOWS = """
SELECT o_orderkey, o_custkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(RANK() OVER wp AS BIGINT) AS prio_rank,
       CAST(DENSE_RANK() OVER wp AS BIGINT) AS prio_dense,
       LEAD(o_orderkey, 1) OVER w AS next_order,
       LAG(o_orderkey, 1) OVER w AS prev_order,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW), 2) AS nearby_total
FROM orders
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wp AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
"""


def q_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE over explicit full-partition frames
    (reference UnboundedOverWindowFrame.java)."""
    return _sql(spark, sf_dir, """
        SELECT DISTINCT o_custkey,
               FIRST_VALUE(o_orderpriority) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_prio,
               LAST_VALUE(o_orderpriority) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_prio
        FROM orders
    """)


ORACLE_Q_FIRST_LAST_VALUE = """
SELECT DISTINCT o_custkey,
       FIRST_VALUE(o_orderpriority) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_prio,
       LAST_VALUE(o_orderpriority) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_prio
FROM orders
"""


def q_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group — row_number ≤ N (reference AppendOnlyTopNFunction.java:248
    streaming strategy; batch RankOperator.java). Catalyst pushes the rank
    filter into the window sort (same as FlinkLogicalRankRule).
    """
    t = register_views(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn")
    )


ORACLE_Q_TOPN = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
"""


def q_dedup_keeplast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplication keep-last per key (reference
    ProcTimeDeduplicateKeepLastRowFunction.java / RowTimeDeduplicateFunction.java:31;
    batch = row_number over ts DESC = 1)."""
    t = register_views(spark, sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", F.round("value", 4).alias("value"))
    )


ORACLE_Q_DEDUP_KEEPLAST = """
SELECT user_id, event_type, event_id, ts, ROUND(value, 4) AS value
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → Catalyst TakeOrderedAndProject (reference
    SortLimitOperator.java: per-partition top-n then a single merge — the
    identical strategy, so no global sort even at 100 TB)."""
    t = register_views(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


ORACLE_Q_SORT_LIMIT = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# §2.4 Grouping sets / rollup / cube  +  §2.2 Expand
# ---------------------------------------------------------------------------

def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS → Expand + agg (reference StreamExecExpand.java:38,
    DecomposeGroupingSetsRule.scala:205; Catalyst Expand is the same design)."""
    return _sql(spark, sf_dir, """
        SELECT r_name, n_name,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS sum_bal,
               CAST(GROUPING_ID(r_name, n_name) AS BIGINT) AS gid
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """)


ORACLE_Q_GROUPING_SETS = """
SELECT r_name, n_name,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       ROUND(SUM(c_acctbal), 2) AS sum_bal,
       CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    t = register_views(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping_id().alias("gid"),
        )
    )


ORACLE_Q_CUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region → nation hierarchy."""
    return _sql(spark, sf_dir, """
        SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_supp_nations,
               ROUND(SUM(s_acctbal), 2) AS bal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """)


ORACLE_Q_ROLLUP = """
SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_supp_nations,
       ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# §2.7 Set operations
# ---------------------------------------------------------------------------

def q_set_union_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) + INTERSECT — the reference rewrites INTERSECT to a
    semi-join (ReplaceIntersectWithSemiJoinRule.scala); Catalyst has the
    same-named rule."""
    t = register_views(spark, sf_dir)
    building = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = t["customer"].filter(F.col("c_acctbal") > 5000).select("c_custkey")
    with_orders = t["orders"].select(F.col("o_custkey").alias("c_custkey"))
    return building.union(rich).distinct().intersect(with_orders)


ORACLE_Q_SET_UNION_INTERSECT = """
(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
 UNION
 SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
INTERSECT
SELECT o_custkey FROM orders
"""


def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference) — RewriteMinusAllRule.scala; Catalyst
    exceptAll uses the identical count-and-replicate rewrite."""
    t = register_views(spark, sf_dir)
    open_prio = t["orders"].filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    big_prio = t["orders"].filter(F.col("o_totalprice") > 300000).select("o_orderpriority")
    return open_prio.exceptAll(big_prio)


ORACLE_Q_SET_EXCEPT_ALL = """
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_totalprice > 300000
"""


def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — RewriteIntersectAllRule.scala analog."""
    t = register_views(spark, sf_dir)
    a = t["lineitem"].filter(F.col("l_returnflag") == "A").select("l_orderkey")
    b = t["lineitem"].filter(F.col("l_linestatus") == "F").select("l_orderkey")
    return a.intersectAll(b)


ORACLE_Q_SET_INTERSECT_ALL = """
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
INTERSECT ALL
SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
"""


# ---------------------------------------------------------------------------
# §2.2 Correlate / UNNEST
# ---------------------------------------------------------------------------

def q_unnest_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST/Correlate → explode (reference LogicalUnnestRule.scala:41,
    StreamExecCorrelate.java:45). Token frequency over documents."""
    t = register_views(spark, sf_dir)
    return (
        t["documents"]
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
    )


ORACLE_Q_UNNEST_TOKENS = r"""
SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok FROM documents)
WHERE tok <> ''
GROUP BY tok
HAVING COUNT(*) >= 10
"""


# ---------------------------------------------------------------------------
# §2.8 Scalar function families
# ---------------------------------------------------------------------------

def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function gauntlet (reference StringCallGen.scala /
    BuiltInFunctionDefinitions.java:423-712): UPPER LOWER LENGTH SUBSTRING
    CONCAT_WS LPAD RPAD REPLACE REVERSE TRIM LEFT RIGHT INSTR ASCII REPEAT MD5
    SPLIT_INDEX TRANSLATE."""
    t = register_views(spark, sf_dir)
    p = t["part"]
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("long").alias("len"),
        F.substring("p_name", 1, 5).alias("sub"),
        F.concat_ws("|", "p_brand", "p_type").alias("cw"),
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_type", 10, ".").alias("rp"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("rep"),
        F.reverse("p_name").alias("rev"),
        F.expr("left(p_name, 3)").alias("l3"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.instr("p_name", "e").cast("long").alias("pos_e"),
        F.ascii("p_brand").alias("asc"),
        F.repeat("p_brand", 2).alias("rep2"),
        F.md5("p_name").alias("h"),
        F.element_at(F.split("p_name", " "), 2).alias("word2"),
        F.translate("p_name", "aeiou", "AEIOU").alias("tr"),
    )


ORACLE_Q_SCALAR_STRING = """
SELECT p_partkey,
       upper(p_name) AS up,
       lower(p_brand) AS lo,
       CAST(length(p_name) AS BIGINT) AS len,
       substring(p_name, 1, 5) AS sub,
       concat_ws('|', p_brand, p_type) AS cw,
       lpad(p_brand, 12, '*') AS lp,
       rpad(p_type, 10, '.') AS rp,
       replace(p_name, ' ', '_') AS rep,
       reverse(p_name) AS rev,
       left(p_name, 3) AS l3,
       right(p_name, 3) AS r3,
       CAST(instr(p_name, 'e') AS BIGINT) AS pos_e,
       ascii(p_brand) AS asc,
       repeat(p_brand, 2) AS rep2,
       md5(p_name) AS h,
       string_split(p_name, ' ')[2] AS word2,
       translate(p_name, 'aeiou', 'AEIOU') AS tr
FROM part
"""


def q_scalar_shims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink scalar functions that needed shims (functions/scalar.py):
    SPLIT_INDEX, IS_DECIMAL/IS_DIGIT/IS_ALPHA, TRUNCATE-numeric, plus
    base64/hex/chr/locate from the built-in surface."""
    from flink_release_1_14_5_comment_spark.functions import scalar as fs

    t = register_views(spark, sf_dir)
    c = t["customer"]
    digits = F.regexp_extract("c_name", r"(\d+)$", 1)
    return c.select(
        "c_custkey",
        fs.split_index("c_name", "#", 1).alias("name_num"),
        fs.is_digit(digits).alias("num_is_digit"),
        fs.is_alpha(F.expr("left(c_name, 8)")).alias("prefix_is_alpha"),
        fs.is_decimal(F.col("c_acctbal").cast("string")).alias("bal_is_decimal"),
        fs.truncate_numeric(F.col("c_acctbal"), 1).alias("bal_trunc1"),
        F.base64(F.encode("c_mktsegment", "utf-8")).alias("seg_b64"),
        F.hex(F.col("c_custkey")).alias("key_hex"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26)).alias("letter"),
        F.locate("e", "c_mktsegment").cast("long").alias("pos_e"),
    )


ORACLE_Q_SCALAR_SHIMS = r"""
SELECT c_custkey,
       string_split(c_name, '#')[2] AS name_num,
       regexp_full_match(regexp_extract(c_name, '(\d+)$', 1), '\d+') AS num_is_digit,
       regexp_full_match(left(c_name, 8), '[A-Za-z]+') AS prefix_is_alpha,
       regexp_full_match(CAST(c_acctbal AS VARCHAR), '[+-]?(\d+(\.\d*)?|\.\d+)') AS bal_is_decimal,
       CASE WHEN c_acctbal >= 0 THEN floor(c_acctbal * 10) ELSE ceil(c_acctbal * 10) END / 10 AS bal_trunc1,
       to_base64(encode(c_mktsegment)) AS seg_b64,
       CASE WHEN c_custkey = 0 THEN '0' ELSE upper(ltrim(hex(c_custkey), '0')) END AS key_hex,
       chr(CAST(65 + (c_custkey % 26) AS INT)) AS letter,
       CAST(instr(c_mktsegment, 'e') AS BIGINT) AS pos_e
FROM customer
"""


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function gauntlet (BuiltInFunctionDefinitions.java:715-1161):
    ABS CEIL FLOOR ROUND POWER MOD SQRT LN LOG10 SIGN SIN COS ATAN2 DEGREES
    RADIANS GREATEST LEAST TRUNCATE(numeric, via floor-scale)."""
    t = register_views(spark, sf_dir)
    li = t["lineitem"].filter((F.col("l_linenumber") == 1) & (F.col("l_returnflag") == "A"))
    x = F.col("l_extendedprice")
    d = F.col("l_discount")
    return li.select(
        "l_orderkey",
        F.round(F.abs(x - 1000), 2).alias("abs_v"),
        F.ceil(x).alias("ceil_v"),
        F.floor(x).alias("floor_v"),
        F.round(x, 1).alias("round_v"),
        F.round(F.pow(d + 1, 3), 6).alias("pow_v"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("mod_v"),
        F.round(F.sqrt(x), 6).alias("sqrt_v"),
        F.round(F.log(x), 6).alias("ln_v"),
        F.round(F.log10(x), 6).alias("log10_v"),
        F.signum(d - 0.05).cast("double").alias("sign_v"),
        F.round(F.sin(d), 6).alias("sin_v"),
        F.round(F.cos(d), 6).alias("cos_v"),
        F.round(F.atan2(d, F.lit(1.0)), 6).alias("atan2_v"),
        F.round(F.degrees(d), 6).alias("deg_v"),
        F.round(F.radians(x / 1000), 6).alias("rad_v"),
        F.greatest(x, F.lit(50000.0)).alias("great_v"),
        F.least(x, F.lit(50000.0)).alias("least_v"),
        (F.floor(x * 100) / 100).alias("trunc2_v"),
    )


ORACLE_Q_SCALAR_MATH = """
SELECT l_orderkey,
       ROUND(abs(l_extendedprice - 1000), 2) AS abs_v,
       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_v,
       CAST(floor(l_extendedprice) AS BIGINT) AS floor_v,
       ROUND(l_extendedprice, 1) AS round_v,
       ROUND(power(l_discount + 1, 3), 6) AS pow_v,
       CAST(mod(l_orderkey, 7) AS BIGINT) AS mod_v,
       ROUND(sqrt(l_extendedprice), 6) AS sqrt_v,
       ROUND(ln(l_extendedprice), 6) AS ln_v,
       ROUND(log10(l_extendedprice), 6) AS log10_v,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_v,
       ROUND(sin(l_discount), 6) AS sin_v,
       ROUND(cos(l_discount), 6) AS cos_v,
       ROUND(atan2(l_discount, 1.0), 6) AS atan2_v,
       ROUND(degrees(l_discount), 6) AS deg_v,
       ROUND(radians(l_extendedprice / 1000), 6) AS rad_v,
       greatest(l_extendedprice, 50000.0) AS great_v,
       least(l_extendedprice, 50000.0) AS least_v,
       floor(l_extendedprice * 100) / 100 AS trunc2_v
FROM lineitem
WHERE l_linenumber = 1 AND l_returnflag = 'A'
"""


def q_scalar_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal functions (BuiltInFunctionDefinitions.java:1165-1245): EXTRACT
    family, DATE_TRUNC, interval arithmetic, UNIX_TIMESTAMP/epoch, DATEDIFF."""
    t = register_views(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") % 10 == 0)
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(ts).alias("y"),
        F.quarter(ts).alias("q"),
        F.month(ts).alias("m"),
        F.dayofmonth(ts).alias("dom"),
        F.dayofyear(ts).alias("doy"),
        (F.dayofweek(ts) - 1).alias("dow"),
        F.hour(ts).alias("hr"),
        F.date_trunc("month", ts).alias("month_start"),
        (ts + F.expr("INTERVAL 10 DAYS")).alias("plus10d"),
        F.unix_timestamp(ts).alias("epoch_s"),
        F.datediff(F.lit("2002-01-01").cast("date"), ts.cast("date")).cast("long").alias("days_to_2002"),
    )


ORACLE_Q_SCALAR_TEMPORAL = """
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
       CAST(EXTRACT(doy FROM o_orderdate) AS BIGINT) AS doy,
       CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) AS dow,
       CAST(EXTRACT(hour FROM o_orderdate) AS BIGINT) AS hr,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 10 DAY AS plus10d,
       CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS epoch_s,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002
FROM orders
WHERE o_orderkey % 10 = 0
"""


def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions (FlinkSqlOperatorTable.java:1169-1181 JSON_VALUE) —
    get_json_object / json_extract over the events.props payload."""
    t = register_views(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.round(F.max(k), 2).alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_Q_SCALAR_JSON = """
SELECT event_type,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
       ROUND(MAX(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2) AS max_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
"""


_COLLECTIONS_SPARK = """
WITH base AS (
  SELECT l_linestatus,
         array(CAST(l_quantity AS BIGINT),
               CAST(ROUND(l_discount * 100, 0) AS BIGINT),
               CAST(ROUND(l_tax * 100, 0) AS BIGINT)) AS arr,
         map('qty', CAST(l_quantity AS BIGINT),
             'disc', CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS m
  FROM lineitem WHERE l_orderkey % 5 = 0
)
SELECT l_linestatus,
       CAST(SUM(size(arr)) AS BIGINT) AS total_card,
       CAST(SUM(element_at(arr, 1)) AS BIGINT) AS sum_first,
       CAST(SUM(CASE WHEN array_contains(arr, CAST(10 AS BIGINT))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_has_ten,
       CAST(SUM(element_at(sort_array(arr), 1)) AS BIGINT) AS sum_min_elem,
       CAST(SUM(size(array_distinct(arr))) AS BIGINT) AS total_distinct_card,
       CAST(SUM(aggregate(arr, CAST(0 AS BIGINT), (a, x) -> a + x)) AS BIGINT)
         AS sum_fold,
       CAST(SUM(element_at(m, 'qty') + element_at(m, 'disc')) AS BIGINT)
         AS sum_map_vals,
       CAST(SUM(size(map_keys(m))) AS BIGINT) AS total_map_card
FROM base GROUP BY l_linestatus
"""

ORACLE_Q_SCALAR_COLLECTIONS = """
WITH base AS (
  SELECT l_linestatus,
         [CAST(l_quantity AS BIGINT),
          CAST(ROUND(l_discount * 100, 0) AS BIGINT),
          CAST(ROUND(l_tax * 100, 0) AS BIGINT)] AS arr,
         MAP { 'qty': CAST(l_quantity AS BIGINT),
               'disc': CAST(ROUND(l_discount * 100, 0) AS BIGINT) } AS m
  FROM lineitem WHERE l_orderkey % 5 = 0
)
SELECT l_linestatus,
       CAST(SUM(len(arr)) AS BIGINT) AS total_card,
       CAST(SUM(arr[1]) AS BIGINT) AS sum_first,
       CAST(SUM(CASE WHEN list_contains(arr, 10) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_has_ten,
       CAST(SUM(list_min(arr)) AS BIGINT) AS sum_min_elem,
       CAST(SUM(len(list_distinct(arr))) AS BIGINT) AS total_distinct_card,
       CAST(SUM(list_sum(arr)) AS BIGINT) AS sum_fold,
       CAST(SUM((m['qty'])[1] + (m['disc'])[1]) AS BIGINT) AS sum_map_vals,
       CAST(SUM(cardinality(m)) AS BIGINT) AS total_map_card
FROM base GROUP BY l_linestatus
"""


def q_scalar_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection constructors + functions (SURVEY §2.8; reference
    FlinkSqlOperatorTable ARRAY/MAP value constructors, CARDINALITY,
    ELEMENT/item access, and the array function family): ARRAY and MAP
    built per row from lineitem columns, then CARDINALITY, subscripting,
    membership, sort-min, distinct-cardinality, a higher-order fold, and
    map key/value access — every value integer-exact so the gauntlet is
    hash-checked with no rounding slack."""
    t = register_views(spark, sf_dir)
    t["lineitem"].createOrReplaceTempView("lineitem")
    return spark.sql(_COLLECTIONS_SPARK)


def q_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional functions: CASE WHEN, NULLIF, COALESCE, IS DISTINCT FROM
    (BuiltInFunctionDefinitions.java:130-302)."""
    return _sql(spark, sf_dir, """
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(nullif(o_orderstatus, 'O')) AS BIGINT) AS n_not_open,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_hot
        FROM (
          SELECT o_orderstatus, o_orderpriority,
                 CASE WHEN o_totalprice < 100000 THEN 'small'
                      WHEN o_totalprice < 300000 THEN 'medium'
                      ELSE 'large' END AS bucket
          FROM orders)
        GROUP BY bucket
    """)


ORACLE_Q_CASE_COALESCE = """
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(nullif(o_orderstatus, 'O')) AS BIGINT) AS n_not_open,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_hot
FROM (
  SELECT o_orderstatus, o_orderpriority,
         CASE WHEN o_totalprice < 100000 THEN 'small'
              WHEN o_totalprice < 300000 THEN 'medium'
              ELSE 'large' END AS bucket
  FROM orders)
GROUP BY bucket
"""


QUERIES = {
    "agg_pricing_summary": q_agg_pricing_summary,
    "agg_distinct": q_agg_distinct,
    "agg_stats": q_agg_stats,
    "agg_minmax_by": q_agg_minmax_by,
    "agg_listagg": q_agg_listagg,
    "join_multiway": q_join_multiway,
    "join_large": q_join_large,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_theta": q_join_theta,
    "join_outer_full": q_join_outer_full,
    "subquery_correlated": q_subquery_correlated,
    "over_windows": q_over_windows,
    "first_last_value": q_first_last_value,
    "topn": q_topn,
    "dedup_keeplast": q_dedup_keeplast,
    "sort_limit": q_sort_limit,
    "grouping_sets": q_grouping_sets,
    "cube": q_cube,
    "rollup": q_rollup,
    "set_union_intersect": q_set_union_intersect,
    "set_except_all": q_set_except_all,
    "set_intersect_all": q_set_intersect_all,
    "unnest_tokens": q_unnest_tokens,
    "scalar_string": q_scalar_string,
    "scalar_shims": q_scalar_shims,
    "scalar_math": q_scalar_math,
    "scalar_temporal": q_scalar_temporal,
    "scalar_json": q_scalar_json,
    "scalar_collections": q_scalar_collections,
    "case_coalesce": q_case_coalesce,
}

ORACLE = {
    "agg_pricing_summary": ORACLE_Q_AGG_PRICING_SUMMARY,
    "agg_distinct": ORACLE_Q_AGG_DISTINCT,
    "agg_stats": ORACLE_Q_AGG_STATS,
    "agg_minmax_by": ORACLE_Q_AGG_MINMAX_BY,
    "agg_listagg": ORACLE_Q_AGG_LISTAGG,
    "join_multiway": ORACLE_Q_JOIN_MULTIWAY,
    "join_large": ORACLE_Q_JOIN_LARGE,
    "join_semi": ORACLE_Q_JOIN_SEMI,
    "join_anti": ORACLE_Q_JOIN_ANTI,
    "join_theta": ORACLE_Q_JOIN_THETA,
    "join_outer_full": ORACLE_Q_JOIN_OUTER_FULL,
    "subquery_correlated": ORACLE_Q_SUBQUERY_CORRELATED,
    "over_windows": ORACLE_Q_OVER_WINDOWS,
    "first_last_value": ORACLE_Q_FIRST_LAST_VALUE,
    "topn": ORACLE_Q_TOPN,
    "dedup_keeplast": ORACLE_Q_DEDUP_KEEPLAST,
    "sort_limit": ORACLE_Q_SORT_LIMIT,
    "grouping_sets": ORACLE_Q_GROUPING_SETS,
    "cube": ORACLE_Q_CUBE,
    "rollup": ORACLE_Q_ROLLUP,
    "set_union_intersect": ORACLE_Q_SET_UNION_INTERSECT,
    "set_except_all": ORACLE_Q_SET_EXCEPT_ALL,
    "set_intersect_all": ORACLE_Q_SET_INTERSECT_ALL,
    "unnest_tokens": ORACLE_Q_UNNEST_TOKENS,
    "scalar_string": ORACLE_Q_SCALAR_STRING,
    "scalar_shims": ORACLE_Q_SCALAR_SHIMS,
    "scalar_math": ORACLE_Q_SCALAR_MATH,
    "scalar_temporal": ORACLE_Q_SCALAR_TEMPORAL,
    "scalar_json": ORACLE_Q_SCALAR_JSON,
    "scalar_collections": ORACLE_Q_SCALAR_COLLECTIONS,
    "case_coalesce": ORACLE_Q_CASE_COALESCE,
}
