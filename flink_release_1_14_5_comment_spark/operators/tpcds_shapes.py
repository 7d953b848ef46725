"""Adapted TPC-DS query pack (VERDICT r5 #4): the reference's flagship
batch gate is 103 literal TPC-DS queries (flink-end-to-end-tests/
flink-tpcds-test/TpcdsTestProgram.java:76-87). The testdata ships a TPC-H
star schema, so the literal corpus can't run — this module adapts the
TPC-DS query SHAPES that the TPC-H suite + analytic_shapes.py still
under-covered onto the existing tables, one graded query per shape:

* q51  — two-channel CUMULATIVE sums full-outer-compared (crossover scan)
* q63  — monthly revenue vs rolling in-year average per brand
* q14  — INTERSECT of item sets across channels, then channel UNION + ROLLUP
* q1/q30 — correlated scalar subquery over a RETURNS aggregate (1.2x avg)
* q34  — per-ticket item-count band → repeat-buyer listing
* q59  — month-over-year self-join of a weekly/monthly revenue frame
* q93  — fact LEFT JOIN returns-fact with COALESCE-patched net revenue
* q11/q4 — two-year spending-ratio comparison across two channels
* q67  — rank-within-ROLLUP cells, top-k per grouping level
* q35  — double-EXISTS-filtered demographic group aggregate
* q23  — frequent-item set × best-customer decile, semi-joined into the fact
* q54  — per-customer spend bucketed into fixed-width revenue bands
* q88  — independent scalar-aggregate subqueries cross-joined (count census)
* q49  — per-channel worst return-ratio items, rank-limited
* q75  — consecutive-year self-join, year-over-year decline scan
* q78  — cross-channel participation ratio bands with null-patched sides
* q97  — FULL OUTER JOIN overlap census of channel (customer, part) sets
* q31  — consecutive-quarter cross-channel growth comparison (exact cross-multiply)
* q17  — three fact instances chained per customer with increasing dates
* q39  — variance-over-aggregate volatility scan from exact integer moments
* q95  — multi-hop EXISTS (same customer+part, different order) + distinct count

Scale notes (100 TB): every shape aggregates facts FIRST (one shuffle per
fact key, dims broadcast) and runs windows / self-joins over the small
aggregated frames — cumulative windows partition by nation (bounded), the
q59/q11 self-joins key on (entity, period) agg outputs, and the q14
INTERSECT plans as semi joins over distinct part keys. No window or join
ever touches raw fact rows except the keyed fact-fact joins themselves.

Determinism (module convention, see analytic_shapes.py): ALL money flows
as integer cents (per-row ROUND(x*100) is bit-identical across engines on
identical doubles; BIGINT sums are order-independent exact), divided back
to 2dp/4dp only at output; counts CAST BIGINT; averages/ratios as
multiply-before-divide on the exact cents; rankings carry unique
tiebreakers with explicit NULLS placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_14_5_comment_spark.catalog import register_views

# TPC-DS q51: per-entity cumulative revenue of two channels (even/odd
# lineitem parity — the testdata has no shipmode column) compared row by
# row; emit periods where one channel's running total leads. Cumulative
# SUMs run over exact integer cents, so the crossover predicate is pure
# integer comparison — it cannot flip on a last-ulp difference.
_Q51_SQL = """
WITH m AS (
  SELECT n_name,
         CAST(EXTRACT(YEAR FROM o_orderdate) * 100
              + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
         SUM(CASE WHEN l_linenumber % 2 = 0
                  THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
                  ELSE 0 END) AS even_cents,
         SUM(CASE WHEN l_linenumber % 2 = 1
                  THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
                  ELSE 0 END) AS odd_cents
  FROM lineitem
  JOIN orders   ON l_orderkey  = o_orderkey
  JOIN customer ON o_custkey   = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) * 100
                        + EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
), cum AS (
  SELECT n_name, ym,
         SUM(even_cents) OVER (PARTITION BY n_name ORDER BY ym
                               ROWS UNBOUNDED PRECEDING) AS cum_even,
         SUM(odd_cents)  OVER (PARTITION BY n_name ORDER BY ym
                               ROWS UNBOUNDED PRECEDING) AS cum_odd
  FROM m
)
SELECT n_name, ym,
       round(cum_even / 100, 2) AS cum_even_rev,
       round(cum_odd  / 100, 2) AS cum_odd_rev
FROM cum
WHERE cum_even > cum_odd
"""

# TPC-DS q63: monthly brand revenue vs the brand's own in-year monthly
# average; keep months deviating by more than 10%. The window runs over the
# one-row-per-(brand, month) agg frame; the average is an exact cents
# window sum over a window count (multiply-before-divide on the 1.1/0.9
# deviation bounds, so the filter compares exact integers scaled once).
_Q63_SQL = """
WITH bm AS (
  SELECT p_brand,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS rev_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey  = p_partkey
  GROUP BY p_brand, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
), w AS (
  SELECT p_brand, yr, mon, rev_cents,
         SUM(rev_cents) OVER (PARTITION BY p_brand, yr) AS yr_cents,
         CAST(COUNT(*) OVER (PARTITION BY p_brand, yr) AS BIGINT) AS yr_months
  FROM bm
)
SELECT p_brand, yr, mon,
       round(rev_cents / 100, 2) AS rev,
       -- never round(avg): identical integer division → bit-identical
       -- doubles in both engines (a 4dp ROUND can tie-break differently)
       yr_cents / (100 * yr_months) AS avg_monthly
FROM w
WHERE rev_cents * yr_months > 1.1 * yr_cents
   OR rev_cents * yr_months < 0.9 * yr_cents
"""

# TPC-DS q14: parts sold in ALL THREE quantity-band "channels" (INTERSECT
# over distinct part keys → semi-join plan), then per-channel sales of
# those cross-channel parts with a two-level ROLLUP. {gid} differs per
# engine: Spark grouping_id(...) / DuckDB GROUPING(...).
_Q14_SQL = """
WITH cross_items AS (
  SELECT l_partkey AS pk FROM lineitem WHERE l_quantity < 10
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 25
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_quantity >= 25
), sales AS (
  SELECT CASE WHEN l_quantity < 10 THEN 'small'
              WHEN l_quantity < 25 THEN 'mid'
              ELSE 'large' END AS channel,
         p_brand,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS cents
  FROM lineitem
  JOIN cross_items ON l_partkey = pk
  JOIN part        ON l_partkey = p_partkey
)
SELECT channel, p_brand, CAST({gid} AS BIGINT) AS gid,
       round(SUM(cents) / 100, 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM sales
GROUP BY ROLLUP (channel, p_brand)
"""

# TPC-DS q1/q30: customers whose total returned revenue exceeds 1.2x the
# average return total of their nation — correlated scalar subquery over a
# returns AGGREGATE (not the raw fact), decorrelated by both engines into
# an agg + join. Mean as 1.2*SUM/COUNT, multiply before divide.
_Q1_SQL = """
WITH ret AS (
  SELECT o_custkey AS ck, c_nationkey AS nk,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS ret_cents
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey, c_nationkey
)
, nat AS (
  SELECT nk, SUM(ret_cents) AS total_cents, COUNT(*) AS cnt
  FROM ret GROUP BY nk
)
SELECT c_custkey, c_mktsegment,
       round(r.ret_cents / 100, 2) AS ret_amt
FROM ret r
JOIN nat n ON n.nk = r.nk
JOIN customer ON c_custkey = r.ck
-- ret_cents > 1.2 * AVG(ret_cents) cross-multiplied into exact BIGINT
-- arithmetic (10·cents·cnt > 12·total): Spark folds the 1.2 literal into
-- DECIMAL division while DuckDB's `/` yields DOUBLE, so the fractional
-- threshold could classify a within-1-ulp row differently across engines
-- (ADVICE r6 #1; same integer-predicate pattern as q31/q63).
WHERE 10 * r.ret_cents * n.cnt > 12 * n.total_cents
"""

# TPC-DS q34: tickets (orders) whose item count falls in a band, then the
# repeat buyers behind them — agg → HAVING band → fact join → agg → HAVING.
_Q34_SQL = """
WITH big AS (
  SELECT l_orderkey AS ok, CAST(COUNT(*) AS BIGINT) AS n_items
  FROM lineitem
  GROUP BY l_orderkey
  HAVING COUNT(*) BETWEEN 5 AND 7
)
SELECT c_custkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_band_orders,
       CAST(SUM(n_items) AS BIGINT) AS total_items
FROM big
JOIN orders   ON o_orderkey = ok
JOIN customer ON c_custkey  = o_custkey
GROUP BY c_custkey, c_mktsegment
HAVING COUNT(*) >= 2
"""

# TPC-DS q59: the same per-(nation, month) revenue frame self-joined one
# year apart — period-over-period comparison as a JOIN (q47's LAG sibling).
_Q59_SQL = """
WITH nm AS (
  SELECT n_name,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_cents
  FROM orders
  JOIN customer ON o_custkey   = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
)
SELECT a.n_name, a.yr AS yr1, a.mon,
       round(a.rev_cents / 100, 2) AS rev1,
       round(b.rev_cents / 100, 2) AS rev2,
       CASE WHEN a.rev_cents > 0
            THEN round(CAST(b.rev_cents AS DOUBLE) / a.rev_cents, 4) END AS ratio
FROM nm a
JOIN nm b ON a.n_name = b.n_name AND a.mon = b.mon AND b.yr = a.yr + 1
"""

# TPC-DS q93: net revenue after returns — fact LEFT JOIN a returns-fact
# aggregate keyed on the same order, COALESCE patching the no-returns side.
_Q93_SQL = """
WITH ret AS (
  SELECT l_orderkey AS ok,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS ret_cents
  FROM lineitem
  WHERE l_returnflag = 'R'
  GROUP BY l_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(ret_cents) AS BIGINT) AS n_with_returns,
       round(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100, 2) AS gross,
       round(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                 - COALESCE(ret_cents, 0)) / 100, 2) AS net
FROM orders
LEFT JOIN ret ON o_orderkey = ok
GROUP BY o_orderpriority
"""

# TPC-DS q11/q4: customers whose year-over-year spending ratio in the
# high-priority channel beats their ratio in the low-priority channel —
# per-(customer, year) two-channel agg self-joined a year apart, ratio
# comparison on bit-identical rounded doubles.
_Q11_SQL = """
WITH cy AS (
  SELECT o_custkey AS ck,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                  ELSE 0 END) AS hi_cents,
         SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                  ELSE 0 END) AS lo_cents
  FROM orders
  GROUP BY o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
)
SELECT a.ck AS c_custkey, a.yr AS yr1,
       round(CAST(b.hi_cents AS DOUBLE) / a.hi_cents, 4) AS hi_ratio,
       round(CAST(b.lo_cents AS DOUBLE) / a.lo_cents, 4) AS lo_ratio
FROM cy a
JOIN cy b ON a.ck = b.ck AND b.yr = a.yr + 1
WHERE a.hi_cents > 0 AND a.lo_cents > 0
  AND CAST(b.hi_cents AS DOUBLE) / a.hi_cents
      > CAST(b.lo_cents AS DOUBLE) / a.lo_cents
"""

# TPC-DS q67: rank inside each ROLLUP level (the window partitions by
# grouping id, so detail rows, per-nation subtotals, and the grand total
# each rank in their own small partition), top-5 per level. Explicit NULLS
# FIRST on the tiebreakers — engine defaults differ.
_Q67_SQL = """
WITH base AS (
  SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey   = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
), cell AS (
  SELECT n_name, yr, CAST({gid} AS BIGINT) AS gid,
         round(SUM(cents) / 100, 2) AS rev
  FROM base
  GROUP BY ROLLUP (n_name, yr)
)
SELECT n_name, yr, gid, rev, rk
FROM (
  SELECT n_name, yr, gid, rev,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY gid
           ORDER BY rev DESC, n_name ASC NULLS FIRST, yr ASC NULLS FIRST
         ) AS BIGINT) AS rk
  FROM cell
) t
WHERE rk <= 5
"""

# TPC-DS q35: demographic aggregate over customers passing TWO correlated
# EXISTS filters (both decorrelate to semi joins), grouped by two dim
# attributes with count/sum/min/max.
_Q35_SQL = """
SELECT c_mktsegment, n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100, 2) AS total_bal,
       round(MIN(c_acctbal), 2) AS min_bal,
       round(MAX(c_acctbal), 2) AS max_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem
              JOIN orders o2 ON l_orderkey = o2.o_orderkey
              WHERE o2.o_custkey = c_custkey AND l_quantity > 30)
GROUP BY c_mktsegment, n_name
"""


# TPC-DS q23: "frequent items bought by best customers" — two independent
# derived sets (parts in ≥4 distinct orders; top-spending decile of
# customers by exact cents) intersected against the fact via semi joins,
# then a final per-year aggregate. The NTILE runs over the per-customer
# agg frame (one row per customer), never fact rows.
_Q23_SQL = """
WITH freq_parts AS (
  SELECT l_partkey AS fp
  FROM lineitem
  GROUP BY l_partkey
  HAVING COUNT(DISTINCT l_orderkey) >= 4
), spend AS (
  SELECT o_custkey AS ck,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders
  GROUP BY o_custkey
), best AS (
  SELECT ck FROM (
    SELECT ck, NTILE(10) OVER (ORDER BY cents DESC, ck) AS decile
    FROM spend
  ) t WHERE decile = 1
)
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       round(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) / 100, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_partkey IN (SELECT fp FROM freq_parts)
  AND o_custkey IN (SELECT ck FROM best)
GROUP BY CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
"""

# TPC-DS q54: revenue-band census — per-customer spend (exact cents)
# bucketed into fixed-width bands, output = (band, n_customers) histogram.
# The banding is pure integer arithmetic on the agg frame.
_Q54_SQL = """
WITH spend AS (
  SELECT o_custkey AS ck,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders
  GROUP BY o_custkey
)
SELECT CAST(FLOOR(cents / 5000000) AS BIGINT) AS band_50k,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(MIN(cents) / 100, 2) AS min_spend,
       round(MAX(cents) / 100, 2) AS max_spend
FROM spend
GROUP BY CAST(FLOOR(cents / 5000000) AS BIGINT)
"""


# TPC-DS q88: the hour-band count census — EIGHT independent scalar
# subqueries cross-joined into one row in the literal query; adapted as
# four quantity×discount band counts, each its own scan subquery so the
# plan keeps q88's repeated-scalar-aggregate cross-join shape (Catalyst
# turns each into a 1-row broadcast; AQE reuses the exchange).
_Q88_SQL = """
SELECT t1.b1, t2.b2, t3.b3, t4.b4
FROM (SELECT CAST(COUNT(*) AS BIGINT) AS b1 FROM lineitem
      WHERE l_quantity BETWEEN 1 AND 10 AND l_discount < 0.03) t1,
     (SELECT CAST(COUNT(*) AS BIGINT) AS b2 FROM lineitem
      WHERE l_quantity BETWEEN 11 AND 20 AND l_discount >= 0.03 AND l_discount < 0.06) t2,
     (SELECT CAST(COUNT(*) AS BIGINT) AS b3 FROM lineitem
      WHERE l_quantity BETWEEN 21 AND 35 AND l_discount >= 0.06) t3,
     (SELECT CAST(COUNT(*) AS BIGINT) AS b4 FROM lineitem
      WHERE l_quantity > 35) t4
"""

# TPC-DS q49: worst return-ratio items per channel, rank-limited. Ratio =
# returned qty / sold qty — both exact BIGINTs, so the ranking key is ONE
# IEEE division of identical operands in either engine (bit-identical),
# with the part key as tiebreak.
_Q49_SQL = """
WITH sold AS (
  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'web' ELSE 'store' END AS channel,
         l_partkey,
         SUM(CAST(l_quantity AS BIGINT)) AS qty,
         SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS ret_qty
  FROM lineitem
  GROUP BY 1, 2
), ranked AS (
  SELECT channel, l_partkey, ret_qty, qty,
         ROW_NUMBER() OVER (PARTITION BY channel
                            ORDER BY CAST(ret_qty AS DOUBLE) / qty DESC, l_partkey) AS rnk
  FROM sold WHERE ret_qty > 0
)
SELECT channel, l_partkey AS partkey,
       CAST(ret_qty AS BIGINT) AS ret_qty, CAST(qty AS BIGINT) AS qty,
       round(CAST(ret_qty AS DOUBLE) / qty, 4) AS return_ratio,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 10
"""

# TPC-DS q75: year-over-year decline — per-(brand, year) quantity/revenue
# frame self-joined on consecutive years, declining brands kept. The self
# join runs on the agg output (one row per brand-year), never fact rows.
_Q75_SQL = """
WITH s AS (
  SELECT p_brand,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         SUM(CAST(l_quantity AS BIGINT)) AS qty,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey  = p_partkey
  GROUP BY p_brand, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
)
SELECT c.p_brand, c.yr, p.yr AS prev_yr,
       CAST(c.qty - p.qty AS BIGINT) AS qty_diff,
       round((c.cents - p.cents) / 100, 2) AS amt_diff
FROM s c JOIN s p ON c.p_brand = p.p_brand AND c.yr = p.yr + 1
WHERE c.qty < p.qty
"""

# TPC-DS q78: cross-channel participation ratio per customer-year, banded.
# The two channel aggregates FULL-OUTER-join per (customer, year) with
# COALESCE null-patching; the band edge is FLOOR over one exact-integer
# division (both operands < 2^52 → the quotient is the same double in any
# engine; LEAST clamps the ratio-1 band).
_Q78_SQL = """
WITH base AS (
  SELECT o_custkey AS ck,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         SUM(CASE WHEN l_orderkey % 2 = 0 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS web_qty,
         SUM(CASE WHEN l_orderkey % 2 = 1 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS store_qty
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
)
SELECT yr,
       CAST(LEAST(FLOOR(CAST(10 * web_qty AS DOUBLE) / (web_qty + store_qty)), 9) AS BIGINT) AS web_share_band,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(web_qty) AS BIGINT) AS web_qty,
       CAST(SUM(store_qty) AS BIGINT) AS store_qty
FROM base
GROUP BY yr, CAST(LEAST(FLOOR(CAST(10 * web_qty AS DOUBLE) / (web_qty + store_qty)), 9) AS BIGINT)
"""

# TPC-DS q97: channel-overlap census — DISTINCT (customer, part) sets of
# two channels FULL OUTER JOINed, conditional counts of web-only /
# store-only / both. The join keys are the distinct pairs (already
# aggregated), the output is one row.
_Q97_SQL = """
WITH web AS (
  SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_orderkey % 2 = 0
), store AS (
  SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_orderkey % 2 = 1
)
SELECT CAST(SUM(CASE WHEN w.ck IS NOT NULL AND s.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS web_only,
       CAST(SUM(CASE WHEN w.ck IS NULL AND s.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
       CAST(SUM(CASE WHEN w.ck IS NOT NULL AND s.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_channels
FROM web w FULL OUTER JOIN store s ON w.ck = s.ck AND w.pk = s.pk
"""


# TPC-DS q31: market-share GROWTH comparison across consecutive periods and
# channels — per (nation, quarter) revenue for two channels, self-joined on
# consecutive quarters, keep nations where the web channel grew faster than
# the store channel. The growth comparison cross-multiplies exact cents
# (w1*s0 > s1*w0) so no float ratio ever enters the predicate.
_Q31_SQL = """
WITH nq AS (
  SELECT n_name,
         CAST(EXTRACT(YEAR FROM o_orderdate) * 10 + EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS yq,
         SUM(CASE WHEN l_orderkey % 2 = 0
                  THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
                  ELSE 0 END) AS web_cents,
         SUM(CASE WHEN l_orderkey % 2 = 1
                  THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
                  ELSE 0 END) AS store_cents
  FROM lineitem
  JOIN orders   ON l_orderkey  = o_orderkey
  JOIN customer ON o_custkey   = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) * 10 + EXTRACT(QUARTER FROM o_orderdate) AS BIGINT)
)
SELECT c.n_name, c.yq, p.yq AS prev_yq,
       round(c.web_cents / 100, 2) AS web_rev,
       round(c.store_cents / 100, 2) AS store_rev
FROM nq c JOIN nq p
  ON c.n_name = p.n_name
 AND c.yq = CASE WHEN p.yq % 10 = 4 THEN p.yq + 7 ELSE p.yq + 1 END
WHERE p.web_cents > 0 AND p.store_cents > 0
  AND c.web_cents * p.store_cents > c.store_cents * p.web_cents
"""

# TPC-DS q17: the sale → return → re-purchase chain — THREE fact instances
# joined on the customer key with strictly increasing order dates. The
# synthetic data never repeats a (customer, part) purchase, so the chain is
# keyed at the order grain: a completed ('F') order, a later still-open
# ('O') order, and a later urgent re-order — same progression shape as
# q17's store_sales → store_returns → catalog_sales. All three sides
# shuffle once on the same customer key, so the chain is two
# co-partitioned non-equi joins over bounded per-key order counts (~10),
# never a cardinality explosion.
_Q17_SQL = """
WITH f AS (
  SELECT o_custkey AS ck, o_orderdate AS d FROM orders WHERE o_orderstatus = 'F'
), o AS (
  SELECT o_custkey AS ck, o_orderdate AS d FROM orders WHERE o_orderstatus = 'O'
), u AS (
  SELECT o_custkey AS ck, o_orderdate AS d,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_orderpriority = '1-URGENT'
), chains AS (
  SELECT f.ck, u.cents
  FROM f
  JOIN o ON o.ck = f.ck AND o.d > f.d
  JOIN u ON u.ck = f.ck AND u.d > o.d
), seg AS (
  SELECT c_custkey AS ck, c_mktsegment FROM customer
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_chains,
       CAST(COUNT(DISTINCT ch.ck) AS BIGINT) AS n_customers,
       round(SUM(ch.cents) / 100, 2) AS chained_urgent_value
FROM chains ch JOIN seg ON seg.ck = ch.ck
GROUP BY c_mktsegment
"""


# DuckDB plans the mixed equi+inequality chain join as a PIECEWISE_MERGE
# join on the DATE alone (the customer key becomes a post-filter), which
# cross-products all order dates — minutes at sf0.1. The oracle therefore
# computes the identical chain counts by factorizing the triple join into
# two strict-before cumulative windows (exact integer sums, tie-safe via
# the secondary sort tag): cf(o) = #F-orders strictly before o, then
# g(u) = sum of cf over O-orders strictly before u; n_chains = sum g,
# value = sum cents*g. Same values, O(n log n).
_Q17_ORACLE = """
WITH f AS (
  SELECT o_custkey AS ck, o_orderdate AS d FROM orders WHERE o_orderstatus = 'F'
), o AS (
  SELECT o_custkey AS ck, o_orderdate AS d FROM orders WHERE o_orderstatus = 'O'
), u AS (
  SELECT o_custkey AS ck, o_orderdate AS d,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_orderpriority = '1-URGENT'
), ev1 AS (
  SELECT ck, d, 1 AS w, 1 AS tag FROM f        -- f sorts AFTER o at same date
  UNION ALL
  SELECT ck, d, 0 AS w, 0 AS tag FROM o
), oc AS (                                      -- cf per o-row
  SELECT ck, d, cum AS cf FROM (
    SELECT ck, d, tag,
           SUM(w) OVER (PARTITION BY ck ORDER BY d, tag
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM ev1
  ) t WHERE tag = 0
), ev2 AS (
  SELECT ck, d, cf AS w, 1 AS tag, CAST(NULL AS BIGINT) AS cents FROM oc  -- o sorts AFTER u at same date
  UNION ALL
  SELECT ck, d, 0 AS w, 0 AS tag, cents FROM u
), uc AS (                                      -- g per u-row
  SELECT ck, cents, cum AS g FROM (
    SELECT ck, d, tag, cents,
           SUM(w) OVER (PARTITION BY ck ORDER BY d, tag
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM ev2
  ) t WHERE tag = 0
), per_ck AS (
  SELECT ck, SUM(g) AS tc, SUM(cents * g) AS cents_total
  FROM uc GROUP BY ck
  HAVING SUM(g) > 0
)
SELECT c_mktsegment,
       CAST(SUM(tc) AS BIGINT) AS n_chains,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(SUM(cents_total) / 100, 2) AS chained_urgent_value
FROM per_ck JOIN customer ON c_custkey = ck
GROUP BY c_mktsegment
"""

# TPC-DS q39: inventory-variance scan — per (part-bucket, month) quantity
# totals, then mean/variance over the months per bucket; keep the volatile
# buckets. Variance comes from exact integer sums (n·Σx² − (Σx)²) so the
# coefficient-of-variation filter is deterministic: one sqrt + one division
# on exact integers, and the predicate compares SCALED integers
# (n·Σx² − (Σx)² compared against cv²·(Σx)²·(n−1)/n scaled out) — here kept
# as the standard cv > 1.0 form, which on exact operands is the identical
# double in both engines.
_Q39_SQL = """
WITH pm AS (
  SELECT l_partkey % 100 AS pbucket,
         CAST(EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
         SUM(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_partkey % 100,
           CAST(EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
), stats AS (
  SELECT pbucket,
         CAST(COUNT(*) AS BIGINT) AS n_months,
         CAST(SUM(qty) AS BIGINT) AS sum_q,
         CAST(SUM(qty * qty) AS BIGINT) AS sum_q2
  FROM pm GROUP BY pbucket
)
SELECT CAST(pbucket AS BIGINT) AS pbucket, n_months,
       CAST(ROUND(CAST(sum_q AS DOUBLE) / n_months, 0) AS BIGINT) AS mean_qty,
       ROUND(SQRT(CAST(n_months * sum_q2 - sum_q * sum_q AS DOUBLE)
                  / (CAST(n_months AS DOUBLE) * (n_months - 1)))
             / (CAST(sum_q AS DOUBLE) / n_months), 4) AS cv
FROM stats
WHERE n_months > 1
  AND SQRT(CAST(n_months * sum_q2 - sum_q * sum_q AS DOUBLE)
           / (CAST(n_months AS DOUBLE) * (n_months - 1)))
      / (CAST(sum_q AS DOUBLE) / n_months) > 0.2
"""

# TPC-DS q95: multi-hop EXISTS with distinct counting — orders that contain
# a part the SAME customer also bought in a DIFFERENT order (the q95
# "shipped from another warehouse" hop adapted to the part dimension).
# Both hops decorrelate to semi joins; the final distinct count runs over
# order keys only.
_Q95_SQL = """
WITH op AS (
  SELECT o_orderkey AS ok, o_custkey AS ck, l_partkey AS pk,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT CAST(COUNT(DISTINCT a.ok) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT a.ck) AS BIGINT) AS n_customers,
       round(SUM(a.cents) / 100, 2) AS revenue
FROM op a
WHERE EXISTS (SELECT 1 FROM op b
              WHERE b.ck = a.ck AND b.pk = a.pk AND b.ok <> a.ok)
"""


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


def q_tpcds_q51_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q51 shape: two-channel cumulative revenue crossover per nation —
    DECIMAL running sums over the (nation, month) agg frame."""
    return _sql(spark, sf_dir, _Q51_SQL)


def q_tpcds_q63_rolling_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q63 shape: monthly brand revenue vs the brand's in-year monthly
    average, >10% deviations kept — window over the agg output."""
    return _sql(spark, sf_dir, _Q63_SQL)


def q_tpcds_q14_cross_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 shape: 3-way INTERSECT of channel item sets, then channel sales
    of the cross-channel parts under a two-level ROLLUP."""
    return _sql(spark, sf_dir, _Q14_SQL.format(gid="grouping_id(channel, p_brand)"))


def q_tpcds_q1_returns_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1/q30 shape: correlated scalar subquery over a returns aggregate —
    customers beating 1.2x their nation's average return total."""
    return _sql(spark, sf_dir, _Q1_SQL)


def q_tpcds_q34_order_size_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q34 shape: ticket-size band (HAVING between) → repeat buyers."""
    return _sql(spark, sf_dir, _Q34_SQL)


def q_tpcds_q59_month_over_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q59 shape: per-(nation, month) revenue self-joined one year apart."""
    return _sql(spark, sf_dir, _Q59_SQL)


def q_tpcds_q93_net_after_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q93 shape: orders LEFT JOIN per-order returns aggregate, COALESCE-
    patched net revenue per priority."""
    return _sql(spark, sf_dir, _Q93_SQL)


def q_tpcds_q11_loyalty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11/q4 shape: year-over-year spending ratios compared across two
    channels per customer."""
    return _sql(spark, sf_dir, _Q11_SQL)


def q_tpcds_q67_topk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q67 shape: top-5 by revenue inside every ROLLUP level (window
    partitioned by grouping id over the EXPAND output)."""
    return _sql(spark, sf_dir, _Q67_SQL.format(gid="grouping_id(n_name, yr)"))


def q_tpcds_q35_grouped_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q35 shape: double-EXISTS-filtered demographic aggregate."""
    return _sql(spark, sf_dir, _Q35_SQL)


def q_tpcds_q23_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q23 shape: frequent-item set x best-customer decile, both semi-joined
    against the fact, per-year revenue of the intersection."""
    return _sql(spark, sf_dir, _Q23_SQL)


def q_tpcds_q54_revenue_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q54 shape: per-customer spend bucketed into fixed-width revenue
    bands (FLOOR on exact cents — CAST(double AS BIGINT) truncates in Spark
    but ROUNDS in DuckDB, so the band edge must be an explicit FLOOR)."""
    return _sql(spark, sf_dir, _Q54_SQL)


def q_tpcds_q88_count_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q88 shape: independent scalar-aggregate subqueries cross-joined into
    one census row (each a 1-row broadcast side)."""
    return _sql(spark, sf_dir, _Q88_SQL)


def q_tpcds_q49_return_ratio_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q49 shape: per-channel worst-return-ratio items, rank-limited."""
    return _sql(spark, sf_dir, _Q49_SQL)


def q_tpcds_q75_yoy_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q75 shape: consecutive-year self-join of the brand-year frame,
    declining brands kept."""
    return _sql(spark, sf_dir, _Q75_SQL)


def q_tpcds_q78_channel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q78 shape: per-customer-year channel participation bands."""
    return _sql(spark, sf_dir, _Q78_SQL)


def q_tpcds_q97_channel_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q97 shape: FULL OUTER JOIN overlap census of two channels' distinct
    (customer, part) sets."""
    return _sql(spark, sf_dir, _Q97_SQL)


def q_tpcds_q31_growth_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q31 shape: consecutive-quarter cross-channel growth comparison with
    an exact-integer cross-multiplied predicate."""
    return _sql(spark, sf_dir, _Q31_SQL)


def q_tpcds_q17_sale_return_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 shape: three fact instances chained on (customer, part) with
    strictly increasing dates — sale, return, re-purchase."""
    return _sql(spark, sf_dir, _Q17_SQL)


def q_tpcds_q39_quantity_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q39 shape: variance-over-aggregate volatility scan, exact-integer
    moments."""
    return _sql(spark, sf_dir, _Q39_SQL)


def q_tpcds_q95_multi_hop_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q95 shape: multi-hop EXISTS (same customer, same part, different
    order) with distinct counting over the surviving keys."""
    return _sql(spark, sf_dir, _Q95_SQL)


QUERIES = {
    "tpcds_q51_cumulative": q_tpcds_q51_cumulative,
    "tpcds_q63_rolling_brand": q_tpcds_q63_rolling_brand,
    "tpcds_q14_cross_channel": q_tpcds_q14_cross_channel,
    "tpcds_q1_returns_above_avg": q_tpcds_q1_returns_above_avg,
    "tpcds_q34_order_size_band": q_tpcds_q34_order_size_band,
    "tpcds_q59_month_over_year": q_tpcds_q59_month_over_year,
    "tpcds_q93_net_after_returns": q_tpcds_q93_net_after_returns,
    "tpcds_q11_loyalty_ratio": q_tpcds_q11_loyalty_ratio,
    "tpcds_q67_topk_rollup": q_tpcds_q67_topk_rollup,
    "tpcds_q35_grouped_exists": q_tpcds_q35_grouped_exists,
    "tpcds_q23_frequent_items": q_tpcds_q23_frequent_items,
    "tpcds_q54_revenue_bands": q_tpcds_q54_revenue_bands,
    "tpcds_q88_count_census": q_tpcds_q88_count_census,
    "tpcds_q49_return_ratio_rank": q_tpcds_q49_return_ratio_rank,
    "tpcds_q75_yoy_decline": q_tpcds_q75_yoy_decline,
    "tpcds_q78_channel_ratio": q_tpcds_q78_channel_ratio,
    "tpcds_q97_channel_overlap": q_tpcds_q97_channel_overlap,
    "tpcds_q31_growth_compare": q_tpcds_q31_growth_compare,
    "tpcds_q17_sale_return_repurchase": q_tpcds_q17_sale_return_repurchase,
    "tpcds_q39_quantity_variance": q_tpcds_q39_quantity_variance,
    "tpcds_q95_multi_hop_exists": q_tpcds_q95_multi_hop_exists,
}

ORACLE = {
    "tpcds_q51_cumulative": _Q51_SQL,
    "tpcds_q63_rolling_brand": _Q63_SQL,
    "tpcds_q14_cross_channel": _Q14_SQL.format(gid="GROUPING(channel, p_brand)"),
    "tpcds_q1_returns_above_avg": _Q1_SQL,
    "tpcds_q34_order_size_band": _Q34_SQL,
    "tpcds_q59_month_over_year": _Q59_SQL,
    "tpcds_q93_net_after_returns": _Q93_SQL,
    "tpcds_q11_loyalty_ratio": _Q11_SQL,
    "tpcds_q67_topk_rollup": _Q67_SQL.format(gid="GROUPING(n_name, yr)"),
    "tpcds_q35_grouped_exists": _Q35_SQL,
    "tpcds_q23_frequent_items": _Q23_SQL,
    "tpcds_q54_revenue_bands": _Q54_SQL,
    "tpcds_q88_count_census": _Q88_SQL,
    "tpcds_q49_return_ratio_rank": _Q49_SQL,
    "tpcds_q75_yoy_decline": _Q75_SQL,
    "tpcds_q78_channel_ratio": _Q78_SQL,
    "tpcds_q97_channel_overlap": _Q97_SQL,
    "tpcds_q31_growth_compare": _Q31_SQL,
    "tpcds_q17_sale_return_repurchase": _Q17_ORACLE,
    "tpcds_q39_quantity_variance": _Q39_SQL,
    "tpcds_q95_multi_hop_exists": _Q95_SQL,
}
