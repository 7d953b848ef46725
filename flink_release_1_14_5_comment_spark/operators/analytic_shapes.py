"""TPC-DS-breadth analytic query shapes (SURVEY §2; the reference's flagship
batch gate runs 103 TPC-DS queries — TpcdsTestProgram.java:76-87 — whose
defining shapes are deep multi-join pipelines, correlated subqueries, and
multi-level grouping. These queries compose those shapes over the TPC-H-ish
testdata so the planner surface they exercise is graded by the oracle gate.)

Scale notes (100 TB):
* Every query joins facts (lineitem/orders) on their natural keys — one
  hash-shuffle per fact side, dims broadcast (catalog.py threshold).
* Correlated EXISTS/NOT EXISTS decorrelate to semi/anti hash joins in
  Catalyst (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery) —
  the same rewrite the reference's planner does (FlinkSubQueryRemoveRule).
* The grouping-sets query expands once (Expand) then aggregates partial →
  final; no per-set re-scan.
* The market-share query computes the window over the AGGREGATED frame
  (one row per (region, nation)) — the window never sees fact-table rows.

Determinism: sums rounded to 2dp; averages expressed as round(sum)/count
(never round(avg)); counts cast to BIGINT; rankings carry a unique
tiebreaker; share ratios left unrounded (division of bit-identical doubles
is bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_14_5_comment_spark.catalog import register_views

# {gid} differs: Spark grouping_id(...) vs DuckDB GROUPING(...).
_ROLLUP_SQL = """
WITH base AS (
  SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey  = o_orderkey
  JOIN customer ON o_custkey   = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
)
SELECT n_name, yr, CAST({gid} AS BIGINT) AS gid,
       round(SUM(rev), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM base
GROUP BY GROUPING SETS ((n_name, yr), (n_name), ())
"""

_EXISTS_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey = c.c_custkey
          AND l.l_returnflag = 'R'
          AND l.l_extendedprice > 40000)
  AND NOT EXISTS (
        SELECT 1 FROM orders o2
        WHERE o2.o_custkey = c.c_custkey
          AND o2.o_orderstatus = 'P')
"""

_CORRELATED_SCALAR_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal
FROM customer c
WHERE c_acctbal > (
        SELECT round(SUM(c2.c_acctbal), 2) / COUNT(*)
        FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey)
"""

_FACT_FACT_SQL = """
SELECT o_orderpriority, l_linestatus,
       round(SUM(l_quantity), 2) AS total_qty,
       round(SUM(l_extendedprice), 2) AS total_price,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority, l_linestatus
HAVING COUNT(*) > 10
"""

_MARKET_SHARE_SQL = """
WITH rev AS (
  SELECT r_name, n_name,
         round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem
  JOIN supplier ON l_suppkey   = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name, revenue,
       -- denominator summed as DECIMAL: exact and order-independent, so the
       -- double division is bit-identical across engines (a double window
       -- SUM differs in the last ulp because partition order differs)
       revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,2)))
                      OVER (PARTITION BY r_name) AS DOUBLE) AS share,
       CAST(ROW_NUMBER() OVER (PARTITION BY r_name
                               ORDER BY revenue DESC, n_name) AS BIGINT) AS rk
FROM rev
"""


_DEEP_CHAIN_SQL = """
SELECT r.r_name AS cust_region, ns.n_name AS supp_nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
JOIN orders    ON l_orderkey   = o_orderkey
JOIN customer  ON o_custkey    = c_custkey
JOIN nation nc ON c_nationkey  = nc.n_nationkey
JOIN region r  ON nc.n_regionkey = r.r_regionkey
JOIN supplier  ON l_suppkey    = s_suppkey
JOIN nation ns ON s_nationkey  = ns.n_nationkey
JOIN part      ON l_partkey    = p_partkey
WHERE p_size > 20 AND o_orderstatus <> 'P'
GROUP BY r.r_name, ns.n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
"""

# Correlated aggregate in HAVING (TPC-DS q23/q24 shape): keep the
# (nation, year) cells whose revenue beats 1.1x that NATION's own average
# yearly revenue — the subquery re-aggregates the same derived table
# correlated on the outer group key.
_HAVING_CORR_SQL = """
WITH nat_year AS (
  SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         SUM(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey  = o_orderkey
  JOIN customer ON o_custkey   = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
)
SELECT a.n_name, a.yr, round(a.rev, 2) AS revenue
FROM nat_year a
WHERE a.rev > (SELECT 1.1 * SUM(b.rev) / COUNT(*) FROM nat_year b
               WHERE b.n_name = a.n_name)
"""


# Exact interpolated percentiles: Spark `percentile` and DuckDB
# `quantile_cont` implement the same linear-interpolation definition over
# the same sorted multiset, so rounded results match bit-for-bit.
# {pctl} = percentile (Spark) / quantile_cont (DuckDB).
_PERCENTILE_SQL = """
SELECT l_returnflag, l_linestatus,
       round({pctl}(l_extendedprice, 0.25), 4) AS p25_price,
       round({pctl}(l_extendedprice, 0.50), 4) AS median_price,
       round({pctl}(l_extendedprice, 0.90), 4) AS p90_price,
       round({pctl}(l_quantity, 0.50), 4) AS median_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

# TPC-DS q47 shape: aggregate to (nation, year), then LAG within nation to
# compute year-over-year growth — the window runs over the aggregated frame
# (one row per nation-year), never over fact rows.
_YOY_GROWTH_SQL = """
WITH nat_year AS (
  SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         round(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey  = o_orderkey
  JOIN customer ON o_custkey   = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
)
SELECT n_name, yr, rev,
       LAG(rev) OVER (PARTITION BY n_name ORDER BY yr) AS prev_rev,
       CASE WHEN LAG(rev) OVER (PARTITION BY n_name ORDER BY yr) > 0
            THEN round(rev / LAG(rev) OVER (PARTITION BY n_name ORDER BY yr), 4)
       END AS growth
FROM nat_year
"""

# TPC-DS channel-union shape (store/web/catalog → UNION ALL → ROLLUP):
# three quantity-band "channels" of lineitem unioned with a channel tag,
# then a two-level rollup. Catalyst collapses the union into one scan pass
# per branch and expands once for the rollup.
_CHANNEL_ROLLUP_SQL = """
WITH sales AS (
  SELECT 'small' AS channel, l_returnflag AS rf,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem WHERE l_quantity < 10
  UNION ALL
  SELECT 'mid', l_returnflag, l_extendedprice * (1 - l_discount)
  FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 25
  UNION ALL
  SELECT 'large', l_returnflag, l_extendedprice * (1 - l_discount)
  FROM lineitem WHERE l_quantity >= 25
)
SELECT channel, rf, CAST({gid} AS BIGINT) AS gid,
       round(SUM(rev), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM sales
GROUP BY ROLLUP (channel, rf)
"""


# TPC-DS q38/q87 shape: customers present in ALL three behavior slices —
# INTERSECT of fact-derived key sets (distinct-set semantics), then a
# dimension join on the survivors. Catalyst plans INTERSECT as a semi join
# per branch over pre-aggregated (distinct) keys.
_CHANNEL_INTERSECT_SQL = """
WITH buyers AS (
  SELECT o_custkey AS ck FROM orders
  JOIN lineitem ON l_orderkey = o_orderkey WHERE l_returnflag = 'R'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_totalprice > 150000
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(SUM(c_acctbal), 2) AS total_balance
FROM customer JOIN buyers ON c_custkey = ck
GROUP BY c_mktsegment
"""

# TPC-DS q66 shape: conditional-aggregation pivot — one scan, one shuffle,
# the per-month columns folded as SUM(CASE ...) (never 12 self-joins).
_PIVOT_MONTHLY_SQL = """
SELECT n_name,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       round(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) <= 3
                      THEN o_totalprice ELSE 0 END), 2) AS q1_rev,
       round(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) BETWEEN 4 AND 6
                      THEN o_totalprice ELSE 0 END), 2) AS q2_rev,
       round(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) BETWEEN 7 AND 9
                      THEN o_totalprice ELSE 0 END), 2) AS q3_rev,
       round(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) >= 10
                      THEN o_totalprice ELSE 0 END), 2) AS q4_rev,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
"""

# TPC-DS q44 shape: rank the same aggregated frame twice (best and worst
# performers) and join the two rankings position-to-position. Both windows
# run over the one-row-per-part agg output; the join is tiny (k rows).
_BEST_WORST_SQL = """
WITH perf AS (
  SELECT p_brand, round(SUM(l_quantity), 2) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
), ranked AS (
  SELECT p_brand, qty,
         CAST(ROW_NUMBER() OVER (ORDER BY qty DESC, p_brand) AS BIGINT) AS best_rk,
         CAST(ROW_NUMBER() OVER (ORDER BY qty ASC,  p_brand) AS BIGINT) AS worst_rk
  FROM perf
)
SELECT b.best_rk AS position, b.p_brand AS best_brand, b.qty AS best_qty,
       w.p_brand AS worst_brand, w.qty AS worst_qty
FROM ranked b JOIN ranked w ON b.best_rk = w.worst_rk
WHERE b.best_rk <= 10
"""


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


def q_sales_rollup_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table join + GROUPING SETS at three levels with grouping id."""
    return _sql(spark, sf_dir, _ROLLUP_SQL.format(gid="grouping_id(n_name, yr)"))


def q_exists_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (join inside) + correlated NOT EXISTS — Catalyst
    decorrelates to a semi join plus an anti join on c_custkey."""
    return _sql(spark, sf_dir, _EXISTS_SQL)


def q_above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's mean
    balance (mean as round(sum)/count for cross-engine bit-equality)."""
    return _sql(spark, sf_dir, _CORRELATED_SCALAR_SQL)


def q_fact_fact_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join with composite group-by, COUNT(DISTINCT), HAVING."""
    return _sql(spark, sf_dir, _FACT_FACT_SQL)


def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate then window: each nation's revenue share + rank within its
    region (TPC-H Q8's market-share shape, window over the agg output)."""
    return _sql(spark, sf_dir, _MARKET_SHARE_SQL)


def q_deep_chain_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-table join chain (both fact keys + two dim snowflakes): lineitem ⋈
    orders ⋈ customer ⋈ nation ⋈ region on the customer path, supplier ⋈
    nation and part on the supply path — the deep-pipeline shape that
    dominates TPC-DS plans. Facts shuffle once per fact key; every dim side
    broadcasts."""
    return _sql(spark, sf_dir, _DEEP_CHAIN_SQL)


def q_having_corr_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate-in-HAVING: (nation, year) cells beating 1.1x the
    nation's own mean yearly revenue (mean as sum/count for cross-engine
    bit-equality; the 1.1 factor multiplies before division)."""
    return _sql(spark, sf_dir, _HAVING_CORR_SQL)


def q_pricing_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile aggregates (p25/median/p90) per
    (returnflag, linestatus) — the reference's PERCENTILE/quantile agg
    family over a sort-based aggregation."""
    return _sql(spark, sf_dir, _PERCENTILE_SQL.format(pctl="percentile"))


def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: LAG over the aggregated
    (nation, year) frame (TPC-DS q47's moving-comparison shape)."""
    return _sql(spark, sf_dir, _YOY_GROWTH_SQL)


def q_channel_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of three tagged fact slices followed by ROLLUP — the
    TPC-DS multi-channel reporting shape."""
    return _sql(spark, sf_dir,
                _CHANNEL_ROLLUP_SQL.format(gid="grouping_id(channel, rf)"))


def q_channel_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way INTERSECT of fact-derived customer sets, then a dim join +
    agg over the survivors (TPC-DS q38/q87 cross-channel shape)."""
    return _sql(spark, sf_dir, _CHANNEL_INTERSECT_SQL)


def q_pivot_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation pivot: quarterly revenue columns via
    SUM(CASE ...) in a single pass (TPC-DS q66 shape)."""
    return _sql(spark, sf_dir, _PIVOT_MONTHLY_SQL)


def q_best_worst_rank_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double ranking of one aggregated frame joined position-to-position
    (TPC-DS q44 best/worst shape)."""
    return _sql(spark, sf_dir, _BEST_WORST_SQL)


# Both engines share date_trunc('week', ...) (ISO Monday) and pure-integer
# week indexing from the epoch, so the cohort matrix is arithmetic-exact.
_COHORT_SPARK = """
WITH activity AS (
  SELECT user_id,
         CAST(FLOOR(DATEDIFF(CAST(ts AS DATE), DATE '1970-01-01') / 7) AS BIGINT) AS week_idx
  FROM events GROUP BY 1, 2
), cohorts AS (
  SELECT user_id, MIN(week_idx) AS cohort_week FROM activity GROUP BY user_id
), sizes AS (
  SELECT cohort_week, COUNT(*) AS n_cohort FROM cohorts GROUP BY cohort_week
), cells AS (
  SELECT c.cohort_week, a.week_idx - c.cohort_week AS week_offset,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN cohorts c ON c.user_id = a.user_id
  GROUP BY 1, 2
)
SELECT ce.cohort_week, ce.week_offset,
       CAST(ce.n_active AS BIGINT) AS n_active,
       CAST(sz.n_cohort AS BIGINT) AS n_cohort,
       ROUND(CAST(ce.n_active AS DOUBLE) / sz.n_cohort, 4) AS retention
FROM cells ce JOIN sizes sz ON sz.cohort_week = ce.cohort_week
"""

_COHORT_DUCK = """
WITH activity AS (
  SELECT user_id,
         CAST(FLOOR(DATE_DIFF('day', DATE '1970-01-01', ts::DATE) / 7) AS BIGINT) AS week_idx
  FROM events GROUP BY 1, 2
), cohorts AS (
  SELECT user_id, MIN(week_idx) AS cohort_week FROM activity GROUP BY user_id
), sizes AS (
  SELECT cohort_week, COUNT(*) AS n_cohort FROM cohorts GROUP BY cohort_week
), cells AS (
  SELECT c.cohort_week, a.week_idx - c.cohort_week AS week_offset,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN cohorts c ON c.user_id = a.user_id
  GROUP BY 1, 2
)
SELECT ce.cohort_week, ce.week_offset,
       CAST(ce.n_active AS BIGINT) AS n_active,
       CAST(sz.n_cohort AS BIGINT) AS n_cohort,
       ROUND(CAST(ce.n_active AS DOUBLE) / sz.n_cohort, 4) AS retention
FROM cells ce JOIN sizes sz ON sz.cohort_week = ce.cohort_week
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix over the events stream — THE
    product-analytics workload (cohort = a user's first active epoch-week;
    cell = share of the cohort active again N weeks later). Three bounded
    aggregations: per-(user, week) dedup, per-user min, per-(cohort, offset)
    distinct count — at 100 TB the user-week dedup is the only large
    shuffle and it is map-side combinable; the matrix itself is tiny."""
    return _sql(spark, sf_dir, _COHORT_SPARK)


_FUNNEL_RATES = """
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS saw,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
  FROM events GROUP BY 1, 2
)
SELECT day,
       CAST(SUM(saw) AS BIGINT) AS n_view,
       CAST(SUM(saw * clicked) AS BIGINT) AS n_view_click,
       CAST(SUM(saw * clicked * bought) AS BIGINT) AS n_full_funnel,
       ROUND(CAST(SUM(saw * clicked) AS DOUBLE)
             / NULLIF(SUM(saw), 0), 4) AS click_rate,
       ROUND(CAST(SUM(saw * clicked * bought) AS DOUBLE)
             / NULLIF(SUM(saw * clicked), 0), 4) AS purchase_rate
FROM daily GROUP BY day
"""


def q_funnel_conversion_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily set-based funnel conversion table (view → click → purchase per
    user-day; the ORDERED within-24h funnel is funnel_match/cep_nfa_batch —
    this is the dashboard rollup a growth team reads). One user-day dedup
    aggregate + one daily rollup; identical SQL text in both engines."""
    return _sql(spark, sf_dir, _FUNNEL_RATES)


QUERIES = {
    "sales_rollup_nation_year": q_sales_rollup_nation_year,
    "cohort_retention": q_cohort_retention,
    "funnel_conversion_rates": q_funnel_conversion_rates,
    "deep_chain_regions": q_deep_chain_regions,
    "having_corr_revenue": q_having_corr_revenue,
    "exists_returned_customers": q_exists_returned_customers,
    "above_nation_avg_balance": q_above_nation_avg_balance,
    "fact_fact_priority_status": q_fact_fact_priority_status,
    "nation_market_share": q_nation_market_share,
    "pricing_percentiles": q_pricing_percentiles,
    "yoy_growth": q_yoy_growth,
    "channel_union_rollup": q_channel_union_rollup,
    "channel_intersect_customers": q_channel_intersect_customers,
    "pivot_monthly_revenue": q_pivot_monthly_revenue,
    "best_worst_rank_join": q_best_worst_rank_join,
}

ORACLE = {
    "sales_rollup_nation_year": _ROLLUP_SQL.format(gid="GROUPING(n_name, yr)"),
    "cohort_retention": _COHORT_DUCK,
    "funnel_conversion_rates": _FUNNEL_RATES,
    "deep_chain_regions": _DEEP_CHAIN_SQL,
    "having_corr_revenue": _HAVING_CORR_SQL,
    "exists_returned_customers": _EXISTS_SQL,
    "above_nation_avg_balance": _CORRELATED_SCALAR_SQL,
    "fact_fact_priority_status": _FACT_FACT_SQL,
    "nation_market_share": _MARKET_SHARE_SQL,
    "pricing_percentiles": _PERCENTILE_SQL.format(pctl="quantile_cont"),
    "yoy_growth": _YOY_GROWTH_SQL,
    "channel_union_rollup": _CHANNEL_ROLLUP_SQL.format(gid="GROUPING(channel, rf)"),
    "channel_intersect_customers": _CHANNEL_INTERSECT_SQL,
    "pivot_monthly_revenue": _PIVOT_MONTHLY_SQL,
    "best_worst_rank_join": _BEST_WORST_SQL,
}
