"""LITERAL TPC-DS queries over a deterministic synthetic star schema.

The reference's flagship end-to-end gate runs 103 literal TPC-DS queries
(flink-end-to-end-tests/flink-tpcds-test/src/main/java/org/apache/flink/
table/tpcds/TpcdsTestProgram.java:76-87, query texts under
flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/). The adapted
shape pack (operators/tpcds_shapes.py) covers the distinctive plan shapes
on the TPC-H schema; THIS module goes the rest of the way for a 33-query
subset (q3 q6 q7 q8 q12 q13 q15 q19 q20 q26 q33 q36 q41 q42 q43 q45 q46
q47 q48 q52 q53 q55 q61 q62 q65 q68 q69 q73 q79 q85 q86 q89 q98):
the reference's own query texts run end-to-end against tables with the
real TPC-DS schemas (store_sales, catalog_sales, web_sales, web_returns,
date_dim, item, store, customer, customer_address, customer_demographics,
household_demographics, promotion, web_page, reason, warehouse,
ship_mode, web_site).

The star tables are DERIVED DETERMINISTICALLY from the driver's testdata
(orders/lineitem/part/customer) by pure per-row expressions — no files are
written, both engines build the identical tables from the identical
parquet, and the result scales with sf_dir automatically:

* store_sales  = lineitem ⋈ orders (the fact; surrogate keys are modular
  maps of the TPC-H keys, money columns exact integer cents);
  catalog_sales / web_sales = the even/odd l_linenumber slices — three
  overlapping-but-distinct channels for the cross-channel queries
* date_dim     = DISTINCT o_orderdate (d_date_sk = days since epoch,
  d_month_seq = months since 1995-01)
* item         = part (brand/class/category/manufact/manager ids are
  modular maps of p_partkey)
* store(12) / promotion(50) / customer_demographics(70) = DISTINCT modular
  maps of c_custkey — engine-portable series generation
* customer / customer_address = customer (1:1 address)

Query texts are the reference's verbatim, with these documented
adaptations (the same standard the literal TPC-H suite uses):
1. money columns are INTEGER CENTS (BIGINT) in the derived fact — the
   repo-wide oracle-determinism recipe: SUMs are exact integers in any
   partition order, converted to dollars only at the aggregate boundary
   (`round(sum(x) / 100, 2)`); aggregate outputs get explicit aliases
   (the driver's hash compare is name-keyed). The first cut kept
   2-dp-double money and ROUND(SUM(double), 2) — the sf0.1 sweep caught
   1-cent boundary flips on q3/q42/q52/q89 exactly as the round-5
   precision suite predicts;
2. q7's DECIMAL(7,2) casts → DOUBLE + ROUND (Spark and DuckDB disagree on
   decimal average scale/typing, not on the value);
3. selectivity constants retargeted into the synthetic key ranges
   (q3 i_manufact_id 128→12; q89 category/class IN-lists; q65 d_month_seq
   window 1176..1187→61..72); d_year/d_moy constants are UNCHANGED — the
   testdata's order dates span 1995-2001;
4. q65/q89 ORDER BY extended with key tiebreaks so LIMIT 100 cuts at a
   deterministic boundary.

100 TB: every dimension here is tiny (date_dim ≤ a few thousand rows,
store/promotion/cd fixed-size, item = |part|) → Catalyst broadcasts them
against the store_sales fact scan; the only shuffles are the GROUP BYs on
the (pruned) fact output, exactly the star-join profile TPC-DS is designed
to exercise.
"""

from __future__ import annotations

import os
import re
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_14_5_comment_spark.catalog import register_views


def _star_ctes(s: str, ddiff_orderdate: str, dow: str,
               ddiff_shipdate: str) -> str:
    """Shared star-schema derivation CTEs. `s` = the engine's string type
    name; `ddiff_orderdate` / `ddiff_shipdate` = engine expressions for
    days-since-epoch of o_orderdate / l_shipdate; `dow` = engine expression
    for day-of-week of o_orderdate with 0 = Sunday (Spark dayofweek() is
    1-based, DuckDB EXTRACT(dow) is 0-based Postgres-style)."""
    return f"""
-- Customer keys come from orders, NOT the customer view: the derived
-- `customer` CTE below shadows the base view of the same name in BOTH
-- engines' CTE scopes (DuckDB resolves the name CTE-first even in earlier
-- CTEs — referencing it would be circular). Every store_sales customer key
-- is an o_custkey, so the derived dimension is complete by construction.
tpcds_customer_base AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
),
all_dates AS (
  -- order dates plus ship dates: q62-style queries join date_dim on the
  -- SHIP date, which can fall after the last order date. UNION dedups.
  SELECT o_orderdate FROM orders
  UNION
  SELECT l_shipdate AS o_orderdate FROM lineitem
),
date_dim AS (
  SELECT DISTINCT
         CAST({ddiff_orderdate} AS BIGINT) AS d_date_sk,
         CAST(o_orderdate AS DATE) AS d_date,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS d_year,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS d_moy,
         CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d_dom,
         CAST((EXTRACT(YEAR FROM o_orderdate) - 1995) * 12
              + EXTRACT(MONTH FROM o_orderdate) AS INT) AS d_month_seq,
         CAST({dow} AS INT) AS d_dow,
         CASE CAST({dow} AS INT)
              WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday'
              WHEN 3 THEN 'Wednesday' WHEN 4 THEN 'Thursday'
              WHEN 5 THEN 'Friday' ELSE 'Saturday' END AS d_day_name,
         CAST(FLOOR((EXTRACT(MONTH FROM o_orderdate) + 2) / 3) AS INT) AS d_qoy,
         CONCAT(CAST(CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS {s}), 'Q',
                CAST(CAST(FLOOR((EXTRACT(MONTH FROM o_orderdate) + 2) / 3) AS INT)
                     AS {s})) AS d_quarter_name,
         -- Sunday-aligned week sequence: d_date_sk is days since 1970-01-01
         -- (a Thursday), so +4 puts week boundaries on Sundays. Any
         -- consistent numbering works — both engines share this text.
         CAST(FLOOR(({ddiff_orderdate} + 4) / 7) AS INT) AS d_week_seq
  FROM all_dates
),
store_sales AS (
  SELECT CAST({ddiff_orderdate} AS BIGINT) AS ss_sold_date_sk,
         l_partkey AS ss_item_sk,
         o_custkey AS ss_customer_sk,
         1 + ((o_custkey + l_orderkey) % 70) AS ss_cdemo_sk,
         1 + ((l_orderkey + l_linenumber) % 50) AS ss_promo_sk,
         1 + (l_suppkey % 12) AS ss_store_sk,
         1 + ((o_custkey + l_orderkey) % 20) AS ss_hdemo_sk,
         CASE WHEN (l_orderkey + l_linenumber) % 41 = 0 THEN CAST(NULL AS BIGINT)
              WHEN l_orderkey % 3 = 0 THEN o_custkey + 1000000000
              ELSE o_custkey END AS ss_addr_sk,
         CAST((l_orderkey * 7919 + l_linenumber * 104729) % 86400 AS BIGINT) AS ss_sold_time_sk,
         l_orderkey AS ss_ticket_number,
         CAST(l_quantity AS INT) AS ss_quantity,
         CAST(ROUND(l_extendedprice / l_quantity * 100, 0) AS BIGINT) AS ss_list_price,
         CAST(ROUND(l_extendedprice * (1 - l_discount) / l_quantity * 100, 0) AS BIGINT) AS ss_sales_price,
         CAST(ROUND(l_extendedprice * l_discount * 50, 0) AS BIGINT) AS ss_coupon_amt,
         CAST(ROUND(l_extendedprice * l_discount * 100, 0) AS BIGINT) AS ss_ext_discount_amt,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS ss_ext_sales_price,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS ss_net_paid,
         CAST(ROUND(l_extendedprice * 80 / l_quantity, 0) AS BIGINT) AS ss_wholesale_cost,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100 - l_extendedprice * 80, 0) AS BIGINT) AS ss_net_profit,
         CAST(ROUND(l_extendedprice * 110, 0) AS BIGINT) AS ss_ext_list_price,
         CAST(ROUND(l_extendedprice * l_tax * 100, 0) AS BIGINT) AS ss_ext_tax,
         CAST(ROUND(l_extendedprice * 80, 0) AS BIGINT) AS ss_ext_wholesale_cost
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
-- catalog / web channels: disjoint ORDER slices (orderkey mod 3 = 2 / 1;
-- the store channel keeps every order) so cross-channel queries see
-- overlapping-but-distinct item sets AND store-only customers exist —
-- a line-parity slice made web∪catalog cover every ordering customer,
-- which left q69's store-only census vacuously empty
catalog_sales AS (
  SELECT CAST({ddiff_orderdate} AS BIGINT) AS cs_sold_date_sk,
         l_partkey AS cs_item_sk,
         o_custkey AS cs_bill_customer_sk,
         o_custkey AS cs_ship_customer_sk,
         CASE WHEN l_orderkey % 3 = 0 THEN o_custkey + 1000000000
              ELSE o_custkey END AS cs_bill_addr_sk,
         1 + (o_custkey % 70) AS cs_bill_cdemo_sk,
         1 + ((l_orderkey + l_linenumber) % 50) AS cs_promo_sk,
         CAST(l_quantity AS INT) AS cs_quantity,
         CAST(ROUND(l_extendedprice / l_quantity * 100, 0) AS BIGINT) AS cs_list_price,
         CAST(ROUND(l_extendedprice * (1 - l_discount) / l_quantity * 100, 0) AS BIGINT) AS cs_sales_price,
         CAST(ROUND(l_extendedprice * l_discount * 50, 0) AS BIGINT) AS cs_coupon_amt,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS cs_ext_sales_price,
         CAST(ROUND(l_extendedprice * 110, 0) AS BIGINT) AS cs_ext_list_price,
         CAST(ROUND(l_extendedprice * l_discount * 100, 0) AS BIGINT) AS cs_ext_discount_amt,
         CAST(ROUND(l_extendedprice * 80, 0) AS BIGINT) AS cs_ext_wholesale_cost,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100 - l_extendedprice * 80, 0) AS BIGINT) AS cs_net_profit,
         l_orderkey AS cs_order_number,
         1 + (l_suppkey % 5) AS cs_warehouse_sk,
         1 + ((l_orderkey + l_linenumber) % 6) AS cs_call_center_sk,
         1 + ((l_orderkey + l_linenumber) % 12) AS cs_catalog_page_sk,
         1 + ((l_orderkey + l_linenumber) % 4) AS cs_ship_mode_sk,
         CAST({ddiff_shipdate} AS BIGINT) AS cs_ship_date_sk,
         CASE WHEN (l_orderkey + l_linenumber) % 43 = 0 THEN CAST(NULL AS BIGINT)
              WHEN l_orderkey % 3 = 0 THEN o_custkey + 1000000000
              ELSE o_custkey END AS cs_ship_addr_sk,
         CAST((l_orderkey * 7919 + l_linenumber * 104729) % 86400 AS BIGINT) AS cs_sold_time_sk,
         1 + ((o_custkey + l_orderkey) % 20) AS cs_bill_hdemo_sk,
         CAST(ROUND(l_extendedprice * 80 / l_quantity, 0) AS BIGINT) AS cs_wholesale_cost,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS cs_net_paid,
         CAST(ROUND(l_extendedprice * (1 - l_discount + l_tax) * 100, 0) AS BIGINT) AS cs_net_paid_inc_tax,
         CAST(ROUND(l_extendedprice * 5, 0) AS BIGINT) AS cs_ext_ship_cost
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_orderkey % 3 = 2
),
web_sales AS (
  SELECT CAST({ddiff_orderdate} AS BIGINT) AS ws_sold_date_sk,
         CAST({ddiff_shipdate} AS BIGINT) AS ws_ship_date_sk,
         1 + (l_suppkey % 5) AS ws_warehouse_sk,
         1 + ((l_orderkey + l_linenumber) % 4) AS ws_ship_mode_sk,
         1 + (l_orderkey % 3) AS ws_web_site_sk,
         1 + ((l_orderkey + l_linenumber) % 10) AS ws_web_page_sk,
         1 + ((l_orderkey + l_linenumber) % 50) AS ws_promo_sk,
         l_partkey AS ws_item_sk,
         l_orderkey AS ws_order_number,
         o_custkey AS ws_bill_customer_sk,
         CASE WHEN l_orderkey % 3 = 0 THEN o_custkey + 1000000000
              ELSE o_custkey END AS ws_bill_addr_sk,
         CAST(l_quantity AS INT) AS ws_quantity,
         CAST(ROUND(l_extendedprice / l_quantity * 100, 0) AS BIGINT) AS ws_list_price,
         CAST(ROUND(l_extendedprice * 110, 0) AS BIGINT) AS ws_ext_list_price,
         CAST(ROUND(l_extendedprice * l_discount * 100, 0) AS BIGINT) AS ws_ext_discount_amt,
         CAST(ROUND(l_extendedprice * 80, 0) AS BIGINT) AS ws_ext_wholesale_cost,
         CAST(ROUND(l_extendedprice * (1 - l_discount) / l_quantity * 100, 0) AS BIGINT) AS ws_sales_price,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS ws_ext_sales_price,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS ws_net_paid,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100 - l_extendedprice * 80, 0) AS BIGINT) AS ws_net_profit,
         CASE WHEN l_orderkey % 3 = 0 THEN o_custkey + 1000000000
              ELSE o_custkey END AS ws_ship_addr_sk,
         1 + ((o_custkey + l_orderkey) % 20) AS ws_ship_hdemo_sk,
         CAST((l_orderkey * 7919 + l_linenumber * 104729) % 86400 AS BIGINT) AS ws_sold_time_sk,
         CAST(ROUND(l_extendedprice * 80 / l_quantity, 0) AS BIGINT) AS ws_wholesale_cost,
         CASE WHEN (l_orderkey + l_linenumber) % 43 = 0 THEN CAST(NULL AS BIGINT)
              ELSE o_custkey END AS ws_ship_customer_sk,
         CAST(ROUND(l_extendedprice * 5, 0) AS BIGINT) AS ws_ext_ship_cost
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_orderkey % 3 = 1
),
web_returns AS (
  -- returned web lines (the web slice ∩ l_returnflag = 'R'): the same
  -- grain as TPC-DS web_returns — one return row per returned sale line,
  -- joinable back to web_sales on (item_sk, order_number). The returning
  -- cdemo equals the refunded cdemo on even line numbers and is shifted
  -- by 7 otherwise (70 % 7 = 0, so education always matches while marital
  -- matches only at shift 0 — gives q85's cd1=cd2 equality arms a
  -- non-degenerate split).
  SELECT l_partkey AS wr_item_sk,
         l_orderkey AS wr_order_number,
         CAST({ddiff_shipdate} AS BIGINT) AS wr_returned_date_sk,
         o_custkey AS wr_returning_customer_sk,
         o_custkey AS wr_returning_addr_sk,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 90, 0) AS BIGINT) AS wr_return_amt,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 30, 0) AS BIGINT) AS wr_net_loss,
         1 + ((l_orderkey + l_linenumber) % 10) AS wr_web_page_sk,
         1 + (o_custkey % 70) AS wr_refunded_cdemo_sk,
         1 + ((o_custkey + 7 * (l_linenumber % 2)) % 70) AS wr_returning_cdemo_sk,
         o_custkey AS wr_refunded_addr_sk,
         1 + ((l_orderkey + l_suppkey) % 35) AS wr_reason_sk,
         CAST(l_quantity AS INT) AS wr_return_quantity,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 90, 0) AS BIGINT) AS wr_refunded_cash,
         CAST(ROUND(l_extendedprice * 2, 0) AS BIGINT) AS wr_fee
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_orderkey % 3 = 1 AND l_returnflag = 'R'
),
web_page AS (
  SELECT wp_web_page_sk,
         CAST(4800 + wp_web_page_sk * 50 AS INT) AS wp_char_count,
         CONCAT('page_', CAST(wp_web_page_sk AS {s})) AS wp_url
  FROM (SELECT DISTINCT 1 + (c_custkey % 10) AS wp_web_page_sk FROM tpcds_customer_base) t
),
reason AS (
  SELECT r_reason_sk,
         CONCAT('reason desc number ', lpad(CAST(r_reason_sk AS {s}), 3, '0')) AS r_reason_desc
  FROM (SELECT DISTINCT 1 + (c_custkey % 35) AS r_reason_sk FROM tpcds_customer_base) t
),
warehouse AS (
  SELECT w_warehouse_sk,
         CONCAT('Warehouse number ', CAST(w_warehouse_sk AS {s})) AS w_warehouse_name,
         CASE WHEN w_warehouse_sk % 4 = 0 THEN 'TN'
              WHEN w_warehouse_sk % 4 = 1 THEN 'CA'
              WHEN w_warehouse_sk % 4 = 2 THEN 'NY' ELSE 'WA' END AS w_state,
         CAST(50000 + w_warehouse_sk * 25000 AS INT) AS w_warehouse_sq_ft,
         CONCAT('City_', CAST(1 + (w_warehouse_sk % 5) AS {s})) AS w_city,
         CASE WHEN w_warehouse_sk % 4 = 0 THEN 'Williamson County'
              WHEN w_warehouse_sk % 4 = 1 THEN 'Franklin Parish'
              WHEN w_warehouse_sk % 4 = 2 THEN 'Bronx County'
              ELSE 'Orange County' END AS w_county,
         'United States' AS w_country
  FROM (SELECT DISTINCT 1 + (c_custkey % 5) AS w_warehouse_sk FROM tpcds_customer_base) t
),
ship_mode AS (
  SELECT sm_ship_mode_sk,
         CASE WHEN sm_ship_mode_sk % 2 = 0 THEN 'DHL' ELSE 'BARIAN' END AS sm_carrier,
         CASE WHEN sm_ship_mode_sk % 4 = 0 THEN 'EXPRESS'
              WHEN sm_ship_mode_sk % 4 = 1 THEN 'NEXT DAY'
              WHEN sm_ship_mode_sk % 4 = 2 THEN 'REGULAR'
              ELSE 'OVERNIGHT' END AS sm_type
  FROM (SELECT DISTINCT 1 + (c_custkey % 4) AS sm_ship_mode_sk FROM tpcds_customer_base) t
),
web_site AS (
  SELECT web_site_sk,
         CONCAT('site_', CAST(web_site_sk AS {s})) AS web_name,
         CONCAT('WS_', lpad(CAST(web_site_sk AS {s}), 4, '0')) AS web_site_id,
         CASE WHEN web_site_sk % 3 = 0 THEN 'pri'
              WHEN web_site_sk % 3 = 1 THEN 'able' ELSE 'ese' END AS web_company_name
  FROM (SELECT DISTINCT 1 + (c_custkey % 3) AS web_site_sk FROM tpcds_customer_base) t
),
household_demographics AS (
  SELECT hd_demo_sk,
         hd_demo_sk AS hd_income_band_sk,
         CAST(hd_demo_sk % 8 AS INT) AS hd_dep_count,
         CAST(hd_demo_sk % 5 AS INT) AS hd_vehicle_count,
         CASE WHEN hd_demo_sk % 4 = 0 THEN '>10000'
              WHEN hd_demo_sk % 4 = 1 THEN 'Unknown'
              WHEN hd_demo_sk % 4 = 2 THEN '1001-5000'
              ELSE '0-500' END AS hd_buy_potential
  FROM (SELECT DISTINCT 1 + (c_custkey % 20) AS hd_demo_sk FROM tpcds_customer_base) t
),
item AS (
  SELECT p_partkey AS i_item_sk,
         CONCAT('ITEM_', lpad(CAST(p_partkey AS {s}), 8, '0')) AS i_item_id,
         p_name AS i_item_desc,
         CAST(1 + (p_partkey % 40) AS INT) AS i_brand_id,
         CONCAT('Brand#', CAST(1 + (p_partkey % 40) AS {s})) AS i_brand,
         CAST(1 + (p_partkey % 10) AS INT) AS i_category_id,
         CONCAT('CAT_', CAST(1 + (p_partkey % 10) AS {s})) AS i_category,
         CAST(1 + (p_partkey % 5) AS INT) AS i_class_id,
         CONCAT('class_', CAST(1 + (p_partkey % 5) AS {s})) AS i_class,
         CAST(1 + (p_partkey % 25) AS INT) AS i_manufact_id,
         CONCAT('Mfg#', CAST(1 + (p_partkey % 25) AS {s})) AS i_manufact,
         CAST(1 + (p_partkey % 37) AS INT) AS i_manager_id,
         CONCAT('prod_', lpad(CAST(p_partkey % 997 AS {s}), 4, '0')) AS i_product_name,
         CONCAT('col_', CAST(p_partkey % 13 AS {s})) AS i_color,
         CONCAT('unit_', CAST(p_partkey % 7 AS {s})) AS i_units,
         CASE WHEN p_partkey % 9 = 0 THEN 'petite'
              WHEN p_partkey % 9 = 1 THEN 'small'
              WHEN p_partkey % 9 = 2 THEN 'medium'
              WHEN p_partkey % 9 = 3 THEN 'large'
              WHEN p_partkey % 9 = 4 THEN 'extra large'
              WHEN p_partkey % 9 = 5 THEN 'N/A'
              WHEN p_partkey % 9 = 6 THEN 'medium'
              WHEN p_partkey % 9 = 7 THEN 'small'
              ELSE 'large' END AS i_size,
         p_retailprice AS i_current_price,
         CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS i_current_price_cents,
         ROUND(p_retailprice * 0.8, 2) AS i_wholesale_cost
  FROM part
),
store AS (
  SELECT s_store_sk,
         CONCAT('Store_', CAST(s_store_sk AS {s})) AS s_store_name,
         CONCAT('Company_', CAST(1 + (s_store_sk % 3) AS {s})) AS s_company_name,
         CASE WHEN s_store_sk % 4 = 0 THEN 'TN'
              WHEN s_store_sk % 4 = 1 THEN 'CA'
              WHEN s_store_sk % 4 = 2 THEN 'NY' ELSE 'WA' END AS s_state,
         lpad(CAST(((s_store_sk % 100) * 7919) % 100000 AS {s}), 5, '0') AS s_zip,
         CAST(CASE WHEN s_store_sk % 2 = 0 THEN 8 ELSE 5 END AS INT) AS s_market_id,
         CONCAT('S_', lpad(CAST(s_store_sk AS {s}), 4, '0')) AS s_store_id,
         CONCAT('City_', CAST(1 + (s_store_sk % 5) AS {s})) AS s_city,
         CASE WHEN s_store_sk % 4 = 0 THEN 'Williamson County'
              WHEN s_store_sk % 4 = 1 THEN 'Franklin Parish'
              WHEN s_store_sk % 4 = 2 THEN 'Bronx County'
              ELSE 'Orange County' END AS s_county,
         CAST(190 + s_store_sk * 8 AS INT) AS s_number_employees,
         CAST(1 + (s_store_sk % 3) AS INT) AS s_company_id,
         CAST(100 + s_store_sk * 7 AS {s}) AS s_street_number,
         CASE WHEN s_store_sk % 3 = 0 THEN 'Main'
              WHEN s_store_sk % 3 = 1 THEN 'Oak' ELSE 'Pine' END AS s_street_name,
         CASE WHEN s_store_sk % 2 = 0 THEN 'Street' ELSE 'Avenue' END AS s_street_type,
         CONCAT('Suite ', CAST(s_store_sk * 10 AS {s})) AS s_suite_number,
         CAST(CASE WHEN s_store_sk % 2 = 0 THEN -5 ELSE -6 END AS INT) AS s_gmt_offset
  FROM (SELECT DISTINCT 1 + (c_custkey % 12) AS s_store_sk FROM tpcds_customer_base) t
),
promotion AS (
  SELECT p_promo_sk,
         CASE WHEN p_promo_sk % 2 = 0 THEN 'N' ELSE 'Y' END AS p_channel_email,
         CASE WHEN p_promo_sk % 3 = 0 THEN 'N' ELSE 'Y' END AS p_channel_event,
         CASE WHEN p_promo_sk % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
         CASE WHEN p_promo_sk % 7 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv
  FROM (SELECT DISTINCT 1 + (c_custkey % 50) AS p_promo_sk FROM tpcds_customer_base) t
),
customer_demographics AS (
  SELECT cd_demo_sk,
         CASE WHEN cd_demo_sk % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
         CASE WHEN cd_demo_sk % 5 = 0 THEN 'S'
              WHEN cd_demo_sk % 5 = 1 THEN 'M'
              WHEN cd_demo_sk % 5 = 2 THEN 'D'
              WHEN cd_demo_sk % 5 = 3 THEN 'W' ELSE 'U' END AS cd_marital_status,
         CASE WHEN cd_demo_sk % 7 = 0 THEN 'Primary'
              WHEN cd_demo_sk % 7 = 1 THEN 'Secondary'
              WHEN cd_demo_sk % 7 = 2 THEN 'College'
              WHEN cd_demo_sk % 7 = 3 THEN '2 yr Degree'
              WHEN cd_demo_sk % 7 = 4 THEN '4 yr Degree'
              WHEN cd_demo_sk % 7 = 5 THEN 'Advanced Degree'
              ELSE 'Unknown' END AS cd_education_status,
         CAST(500 * (1 + (cd_demo_sk % 10)) AS INT) AS cd_purchase_estimate,
         CASE WHEN cd_demo_sk % 4 = 0 THEN 'Low Risk'
              WHEN cd_demo_sk % 4 = 1 THEN 'Good'
              WHEN cd_demo_sk % 4 = 2 THEN 'High Risk'
              ELSE 'Unknown' END AS cd_credit_rating,
         CAST(cd_demo_sk % 7 AS INT) AS cd_dep_count,
         CAST(cd_demo_sk % 4 AS INT) AS cd_dep_employed_count,
         CAST(cd_demo_sk % 3 AS INT) AS cd_dep_college_count
  FROM (SELECT DISTINCT 1 + (c_custkey % 70) AS cd_demo_sk FROM tpcds_customer_base) t
),
customer AS (
  SELECT c_custkey AS c_customer_sk,
         CONCAT('CUST_', CAST(c_custkey AS {s})) AS c_customer_id,
         CONCAT('F', CAST(c_custkey % 97 AS {s})) AS c_first_name,
         CONCAT('L', CAST(c_custkey % 89 AS {s})) AS c_last_name,
         CASE WHEN c_custkey % 4 = 0 THEN 'Mr.' WHEN c_custkey % 4 = 1 THEN 'Mrs.'
              WHEN c_custkey % 4 = 2 THEN 'Ms.' ELSE 'Dr.' END AS c_salutation,
         CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
         c_custkey AS c_current_addr_sk,
         1 + (c_custkey % 70) AS c_current_cdemo_sk,
         CONCAT('user_', CAST(c_custkey % 9973 AS {s})) AS c_login,
         CONCAT('c', CAST(c_custkey AS {s}), '@example.com') AS c_email_address,
         CAST(1 + (c_custkey % 28) AS INT) AS c_birth_day,
         CAST(1 + (c_custkey % 12) AS INT) AS c_birth_month,
         CAST(1924 + (c_custkey % 68) AS INT) AS c_birth_year,
         CAST(10957 + (c_custkey % 365) AS BIGINT) AS c_last_review_date_sk,
         1 + (c_custkey % 20) AS c_current_hdemo_sk,
         CAST(9131 + (c_custkey % 2400) AS BIGINT) AS c_first_sales_date_sk,
         CAST(9131 + ((c_custkey * 7 + 100) % 2400) AS BIGINT) AS c_first_shipto_date_sk,
         -- q24's c_birth_country <> upper(ca_country) arm: ca_country is
         -- always 'United States', so 1/3 of customers are excluded.
         CASE WHEN c_custkey % 3 = 0 THEN 'UNITED STATES'
              WHEN c_custkey % 3 = 1 THEN 'CANADA'
              ELSE 'GERMANY' END AS c_birth_country
  FROM tpcds_customer_base
),
customer_address AS (
  -- two addresses per customer: the home address (sk = custkey, what
  -- c_current_addr_sk points to) and a secondary address (sk = custkey +
  -- 1e9) that ~1/3 of sales are billed/shipped to — gives the
  -- bought-city <> home-city queries (q68) a non-degenerate answer
  -- ca_zip lives in a 100-class space ((custkey % 100) * 7919 % 100000):
  -- collision-free maps made every zip ~1e-5-dense, so q24's exact
  -- s_zip = ca_zip join (and q8's 5-digit census) were vacuous at every
  -- SF. The class map keeps q15/q45's IN-list constants (7919 * k) valid
  -- while giving each zip ~|customer|/100 residents; s_zip draws from the
  -- same space, so store sk's zip is shared by customers with
  -- custkey ≡ sk (mod 100).
  SELECT c_custkey AS ca_address_sk,
         lpad(CAST(((c_custkey % 100) * 7919) % 100000 AS {s}), 5, '0') AS ca_zip,
         CONCAT('City_', CAST(1 + (c_custkey % 37) AS {s})) AS ca_city,
         CASE WHEN c_custkey % 3 = 0 THEN 'Williamson County'
              WHEN c_custkey % 3 = 1 THEN 'Bronx County'
              ELSE 'Orange County' END AS ca_county,
         CAST(1 + (c_custkey % 999) AS {s}) AS ca_street_number,
         CASE WHEN c_custkey % 3 = 0 THEN 'Main'
              WHEN c_custkey % 3 = 1 THEN 'Oak' ELSE 'Pine' END AS ca_street_name,
         CASE WHEN c_custkey % 2 = 0 THEN 'Street' ELSE 'Avenue' END AS ca_street_type,
         CONCAT('Suite ', CAST(c_custkey % 90 AS {s})) AS ca_suite_number,
         CASE WHEN c_custkey % 3 = 0 THEN 'condo'
              WHEN c_custkey % 3 = 1 THEN 'single family'
              ELSE 'apartment' END AS ca_location_type,
         CASE WHEN c_custkey % 8 = 0 THEN 'CA' WHEN c_custkey % 8 = 1 THEN 'WA'
              WHEN c_custkey % 8 = 2 THEN 'GA' WHEN c_custkey % 8 = 3 THEN 'TX'
              WHEN c_custkey % 8 = 4 THEN 'OH' WHEN c_custkey % 8 = 5 THEN 'NY'
              WHEN c_custkey % 8 = 6 THEN 'TN' ELSE 'OR' END AS ca_state,
         'United States' AS ca_country,
         CAST(CASE WHEN c_custkey % 3 = 0 THEN -5 ELSE -6 END AS INT) AS ca_gmt_offset
  FROM tpcds_customer_base
  UNION ALL
  SELECT c_custkey + 1000000000 AS ca_address_sk,
         lpad(CAST(((c_custkey % 100) * 7919 + 13) % 100000 AS {s}), 5, '0') AS ca_zip,
         CONCAT('City_', CAST(1 + ((c_custkey * 5 + 3) % 37) AS {s})) AS ca_city,
         CASE WHEN c_custkey % 3 = 0 THEN 'Williamson County'
              WHEN c_custkey % 3 = 1 THEN 'Bronx County'
              ELSE 'Orange County' END AS ca_county,
         CAST(1 + ((c_custkey + 13) % 999) AS {s}) AS ca_street_number,
         CASE WHEN c_custkey % 3 = 0 THEN 'Oak'
              WHEN c_custkey % 3 = 1 THEN 'Pine' ELSE 'Main' END AS ca_street_name,
         CASE WHEN c_custkey % 2 = 0 THEN 'Avenue' ELSE 'Street' END AS ca_street_type,
         CONCAT('Suite ', CAST((c_custkey + 7) % 90 AS {s})) AS ca_suite_number,
         CASE WHEN c_custkey % 3 = 0 THEN 'apartment'
              WHEN c_custkey % 3 = 1 THEN 'condo'
              ELSE 'single family' END AS ca_location_type,
         CASE WHEN c_custkey % 8 = 0 THEN 'WA' WHEN c_custkey % 8 = 1 THEN 'GA'
              WHEN c_custkey % 8 = 2 THEN 'TX' WHEN c_custkey % 8 = 3 THEN 'OH'
              WHEN c_custkey % 8 = 4 THEN 'NY' WHEN c_custkey % 8 = 5 THEN 'TN'
              WHEN c_custkey % 8 = 6 THEN 'OR' ELSE 'CA' END AS ca_state,
         'United States' AS ca_country,
         CAST(CASE WHEN c_custkey % 3 = 1 THEN -5 ELSE -6 END AS INT) AS ca_gmt_offset
  FROM tpcds_customer_base
),
call_center AS (
  SELECT cc_call_center_sk,
         CONCAT('CC_', lpad(CAST(cc_call_center_sk AS {s}), 4, '0')) AS cc_call_center_id,
         CONCAT('call_center_', CAST(cc_call_center_sk AS {s})) AS cc_name,
         CONCAT('Manager_', CAST(cc_call_center_sk AS {s})) AS cc_manager,
         CASE WHEN cc_call_center_sk % 4 = 0 THEN 'Williamson County'
              WHEN cc_call_center_sk % 4 = 1 THEN 'Franklin Parish'
              WHEN cc_call_center_sk % 4 = 2 THEN 'Bronx County'
              ELSE 'Orange County' END AS cc_county
  FROM (SELECT DISTINCT 1 + (c_custkey % 6) AS cc_call_center_sk FROM tpcds_customer_base) t
),
catalog_page AS (
  SELECT cp_catalog_page_sk,
         CONCAT('CP_', lpad(CAST(cp_catalog_page_sk AS {s}), 4, '0')) AS cp_catalog_page_id
  FROM (SELECT DISTINCT 1 + (c_custkey % 12) AS cp_catalog_page_sk FROM tpcds_customer_base) t
),
income_band AS (
  SELECT ib_income_band_sk,
         CAST((ib_income_band_sk - 1) * 10000 AS INT) AS ib_lower_bound,
         CAST(ib_income_band_sk * 10000 - 1 AS INT) AS ib_upper_bound
  FROM (SELECT DISTINCT 1 + (c_custkey % 20) AS ib_income_band_sk FROM tpcds_customer_base) t
),
catalog_returns AS (
  -- catalog-channel returns (the %3=2 order slice ∩ l_returnflag = 'R'),
  -- joinable back to catalog_sales on (cr_item_sk, cr_order_number).
  SELECT l_partkey AS cr_item_sk,
         l_orderkey AS cr_order_number,
         CAST({ddiff_shipdate} AS BIGINT) AS cr_returned_date_sk,
         o_custkey AS cr_returning_customer_sk,
         o_custkey AS cr_refunded_customer_sk,
         o_custkey AS cr_returning_addr_sk,
         1 + ((l_orderkey + l_linenumber) % 6) AS cr_call_center_sk,
         1 + ((l_orderkey + l_linenumber) % 12) AS cr_catalog_page_sk,
         1 + ((l_orderkey + l_suppkey) % 35) AS cr_reason_sk,
         CAST(l_quantity AS INT) AS cr_return_quantity,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 90, 0) AS BIGINT) AS cr_return_amount,
         CAST(ROUND(l_extendedprice * ((1 - l_discount) * 90 + l_tax * 90), 0) AS BIGINT) AS cr_return_amt_inc_tax,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 50, 0) AS BIGINT) AS cr_refunded_cash,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 5, 0) AS BIGINT) AS cr_reversed_charge,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 3, 0) AS BIGINT) AS cr_store_credit,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 30, 0) AS BIGINT) AS cr_net_loss
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_orderkey % 3 = 2 AND l_returnflag = 'R'
),
store_returns AS (
  -- store-channel returns (the store channel keeps every order): one
  -- return row per l_returnflag = 'R' sale line, joinable back to
  -- store_sales on (sr_ticket_number, sr_item_sk) — q24's join grain.
  SELECT CAST({ddiff_shipdate} AS BIGINT) AS sr_returned_date_sk,
         l_partkey AS sr_item_sk,
         o_custkey AS sr_customer_sk,
         l_orderkey AS sr_ticket_number,
         1 + (l_suppkey % 12) AS sr_store_sk,
         1 + ((l_orderkey + l_suppkey) % 35) AS sr_reason_sk,
         1 + (o_custkey % 70) AS sr_cdemo_sk,
         CAST(l_quantity AS INT) AS sr_return_quantity,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 90, 0) AS BIGINT) AS sr_return_amt,
         CAST(ROUND(l_extendedprice * 2, 0) AS BIGINT) AS sr_fee,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 30, 0) AS BIGINT) AS sr_net_loss
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
),
time_dim AS (
  -- one row per distinct second-of-day the facts reference (the shared
  -- (orderkey, linenumber) hash formula); ~50% of 86400 at sf0.01 and
  -- near-dense at sf0.1 — both engines derive the identical set.
  SELECT t_time_sk,
         t_time_sk AS t_time,
         CAST(FLOOR(t_time_sk / 3600) AS INT) AS t_hour,
         CAST(FLOOR((t_time_sk % 3600) / 60) AS INT) AS t_minute,
         CASE WHEN FLOOR(t_time_sk / 3600) BETWEEN 6 AND 8 THEN 'breakfast'
              WHEN FLOOR(t_time_sk / 3600) BETWEEN 11 AND 13 THEN 'lunch'
              WHEN FLOOR(t_time_sk / 3600) BETWEEN 17 AND 19 THEN 'dinner'
              ELSE NULL END AS t_meal_time
  FROM (SELECT DISTINCT CAST((l_orderkey * 7919 + l_linenumber * 104729) % 86400 AS BIGINT) AS t_time_sk
        FROM lineitem) t
),
inventory AS (
  -- dense weekly snapshot, the real TPC-DS inventory profile: one row per
  -- (Sunday, item, warehouse 1..2). Quantity is a deterministic skewed
  -- map — ~1/9 of snapshots hold a large lot (up to 4000), the rest
  -- near-zero stock — so q39's stddev/mean > 1 filter splits
  -- non-degenerately. The lot indicator hashes with a 97-modulus (NOT a
  -- small linear mod: a mod-9 of p+d+w collapses items into 9 classes
  -- whose passing sets never overlap across months, leaving q39's
  -- Jan⋈Feb self-join empty). |inventory| = |part| × ~350 Sundays × 2,
  -- derivation-only cross joins of tiny sides; materialized lazily
  -- PER-TABLE on first reference (only inventory-reading staged queries
  -- pay for it — ADVICE r8 #2).
  SELECT d.d_date_sk AS inv_date_sk,
         p.p_partkey AS inv_item_sk,
         w.inv_w AS inv_warehouse_sk,
         CAST(CASE WHEN (p.p_partkey * 7919 + d.d_date_sk * 104729
                         + w.inv_w * 131) % 97 < 11
                   THEN (p.p_partkey * 131 + d.d_date_sk * 31 + w.inv_w) % 4000
                   ELSE (p.p_partkey + d.d_date_sk + w.inv_w) % 12
              END AS INT) AS inv_quantity_on_hand
  FROM part p,
       (SELECT DISTINCT d_date_sk FROM date_dim WHERE d_dow = 0) d,
       (SELECT DISTINCT 1 + (c_custkey % 2) AS inv_w FROM tpcds_customer_base) w
)"""


_SPARK_CTES = _star_ctes(
    "STRING", "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')",
    "dayofweek(CAST(o_orderdate AS DATE)) - 1",
    "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')",
)
_DUCK_CTES = _star_ctes(
    "VARCHAR", "datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))",
    "EXTRACT(dow FROM CAST(o_orderdate AS DATE))",
    "datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))",
)


# --- literal query texts (tpcds-tool/query/queryN.sql), adaptations noted --

# query3.sql — i_manufact_id 128→12 (synthetic range 1..25); SUM rounded.
_Q3 = """
select  dt.d_year
       ,item.i_brand_id brand_id
       ,item.i_brand brand
       ,round(sum(ss_ext_sales_price) / 100, 2) sum_agg
 from  date_dim dt
      ,store_sales
      ,item
 where dt.d_date_sk = store_sales.ss_sold_date_sk
   and store_sales.ss_item_sk = item.i_item_sk
   and item.i_manufact_id = 12
   and dt.d_moy=11
 group by dt.d_year
      ,item.i_brand
      ,item.i_brand_id
 order by dt.d_year
         ,sum_agg desc
         ,brand_id
 limit 100
"""

# query7.sql — decimal(7,2) → double, avgs rounded (engine decimal typing).
_Q7 = """
select  i_item_id,
        round(avg(cast(ss_quantity as double)), 4) agg1,
        round(avg(ss_list_price) / 100, 4) agg2,
        round(avg(ss_coupon_amt) / 100, 4) agg3,
        round(avg(ss_sales_price) / 100, 4) agg4
 from store_sales, customer_demographics, date_dim, item, promotion
 where ss_sold_date_sk = d_date_sk and
       ss_item_sk = i_item_sk and
       ss_cdemo_sk = cd_demo_sk and
       ss_promo_sk = p_promo_sk and
       cd_gender = 'M' and
       cd_marital_status = 'S' and
       cd_education_status = 'College' and
       (p_channel_email = 'N' or p_channel_event = 'N') and
       d_year = 2000
 group by i_item_id
 order by i_item_id
 limit 100
"""

# query19.sql — SUM rounded; constants unchanged (ranges all valid).
_Q19 = """
select  i_brand_id brand_id, i_brand brand, i_manufact_id, i_manufact,
        round(sum(ss_ext_sales_price) / 100, 2) ext_price
 from date_dim, store_sales, item,customer,customer_address,store
 where d_date_sk = ss_sold_date_sk
   and ss_item_sk = i_item_sk
   and i_manager_id=8
   and d_moy=11
   and d_year=1998
   and ss_customer_sk = c_customer_sk
   and c_current_addr_sk = ca_address_sk
   and substr(ca_zip,1,5) <> substr(s_zip,1,5)
   and ss_store_sk = s_store_sk
 group by i_brand
      ,i_brand_id
      ,i_manufact_id
      ,i_manufact
 order by ext_price desc
         ,i_brand
         ,i_brand_id
         ,i_manufact_id
         ,i_manufact
limit 100
"""

# query42.sql — SUM aliased+rounded (the driver compare is name-keyed).
_Q42 = """
select  dt.d_year
        ,item.i_category_id
        ,item.i_category
        ,round(sum(ss_ext_sales_price) / 100, 2) sum_sales
 from   date_dim dt
        ,store_sales
        ,item
 where dt.d_date_sk = store_sales.ss_sold_date_sk
        and store_sales.ss_item_sk = item.i_item_sk
        and item.i_manager_id = 1
        and dt.d_moy=11
        and dt.d_year=2000
 group by       dt.d_year
                ,item.i_category_id
                ,item.i_category
 order by       sum_sales desc,dt.d_year
                ,item.i_category_id
                ,item.i_category
limit 100
"""

# query52.sql — SUM rounded; constants unchanged.
_Q52 = """
select  dt.d_year
        ,item.i_brand_id brand_id
        ,item.i_brand brand
        ,round(sum(ss_ext_sales_price) / 100, 2) ext_price
 from date_dim dt
     ,store_sales
     ,item
 where dt.d_date_sk = store_sales.ss_sold_date_sk
    and store_sales.ss_item_sk = item.i_item_sk
    and item.i_manager_id = 1
    and dt.d_moy=11
    and dt.d_year=2000
 group by dt.d_year
        ,item.i_brand
        ,item.i_brand_id
 order by dt.d_year
        ,ext_price desc
        ,brand_id
limit 100
"""

# query55.sql — SUM rounded; constants unchanged.
_Q55 = """
select  i_brand_id brand_id, i_brand brand,
        round(sum(ss_ext_sales_price) / 100, 2) ext_price
 from date_dim, store_sales, item
 where d_date_sk = ss_sold_date_sk
        and ss_item_sk = i_item_sk
        and i_manager_id=28
        and d_moy=11
        and d_year=1999
 group by i_brand, i_brand_id
 order by ext_price desc, i_brand_id
limit 100
"""

# query65.sql — d_month_seq window 1176..1187 → 61..72 (year 2000 in the
# synthetic month sequence); per-(store,item) revenue rounded so the
# 10%-of-average predicate compares identical doubles; ORDER BY extended
# with (ss_store_sk, ss_item_sk) so LIMIT cuts deterministically.
_Q65 = """
select
        s_store_name,
        i_item_desc,
        round(sc.revenue / 100, 2) as revenue,
        i_current_price,
        i_wholesale_cost,
        i_brand
 from store, item,
     (select ss_store_sk, round(avg(revenue), 4) as ave
        from
            (select  ss_store_sk, ss_item_sk,
                     sum(ss_sales_price) as revenue
                from store_sales, date_dim
                where ss_sold_date_sk = d_date_sk and d_month_seq between 61 and 61+11
                group by ss_store_sk, ss_item_sk) sa
        group by ss_store_sk) sb,
     (select  ss_store_sk, ss_item_sk, sum(ss_sales_price) as revenue
        from store_sales, date_dim
        where ss_sold_date_sk = d_date_sk and d_month_seq between 61 and 61+11
        group by ss_store_sk, ss_item_sk) sc
 where sb.ss_store_sk = sc.ss_store_sk and
       sc.revenue <= 0.1 * sb.ave and
       s_store_sk = sc.ss_store_sk and
       i_item_sk = sc.ss_item_sk
 order by s_store_name, i_item_desc, sc.ss_store_sk, sc.ss_item_sk
limit 100
"""

# query89.sql — category/class IN-lists retargeted to the synthetic
# values (two-arm OR structure preserved); SUM rounded, window-AVG an
# exact single division (see inline note); ORDER
# BY extended with the group key so LIMIT cuts deterministically.
_Q89 = """
select  *
from(
select i_category, i_class, i_brand,
       s_store_name, s_company_name,
       d_moy,
       round(sum(ss_sales_price) / 100, 2) sum_sales,
       -- r9 float hardening: the rounded window AVG sat EXACTLY on a 4dp
       -- half-boundary at sf0.01 (tests/test_staged_float_boundaries.py
       -- caught it) — the q47 failure class. Emit the average as a single
       -- IEEE division of the exact cent sum by (months*100): full
       -- precision, bit-identical in any engine build.
       sum(sum(ss_sales_price)) over
         (partition by i_category, i_brand, s_store_name, s_company_name)
         / cast(count(*) over
         (partition by i_category, i_brand, s_store_name, s_company_name) * 100 as double)
         avg_monthly_sales
from item, store_sales, date_dim, store
where ss_item_sk = i_item_sk and
      ss_sold_date_sk = d_date_sk and
      ss_store_sk = s_store_sk and
      d_year in (1999) and
        ((i_category in ('CAT_2','CAT_4','CAT_6') and
          i_class in ('class_1','class_2','class_3')
         )
      or (i_category in ('CAT_1','CAT_3','CAT_5') and
          i_class in ('class_4','class_5')
        ))
group by i_category, i_class, i_brand,
         s_store_name, s_company_name, d_moy) tmp1
where case when (avg_monthly_sales <> 0) then (abs(sum_sales - avg_monthly_sales) / avg_monthly_sales) else null end > 0.1
order by sum_sales - avg_monthly_sales, s_store_name, i_category, i_class, i_brand, d_moy
limit 100
"""


# query98.sql / query12.sql / query20.sql — the same item-revenue-ratio
# template over the three channel facts (store/web/catalog). Category
# IN-list retargeted; itemrevenue cents→dollars; the ratio keeps raw cents
# (scale cancels, and products/quotients of exact integer sums are the
# same double in both engines). q98 is the only one of the three the
# reference ships without LIMIT.
_Q98 = """
select i_item_id
      ,i_item_desc
      ,i_category
      ,i_class
      ,i_current_price
      ,round(sum(ss_ext_sales_price) / 100, 2) as itemrevenue
      ,sum(ss_ext_sales_price)*100/sum(sum(ss_ext_sales_price)) over
          (partition by i_class) as revenueratio
from
        store_sales
        ,item
        ,date_dim
where
        ss_item_sk = i_item_sk
        and i_category in ('CAT_1', 'CAT_4', 'CAT_7')
        and ss_sold_date_sk = d_date_sk
        and d_date between cast('1999-02-22' as date)
                                and (cast('1999-02-22' as date) + INTERVAL '30' day)
group by
        i_item_id
        ,i_item_desc
        ,i_category
        ,i_class
        ,i_current_price
order by
        i_category
        ,i_class
        ,i_item_id
        ,i_item_desc
        ,revenueratio
"""

_Q12 = """
select  i_item_id
      ,i_item_desc
      ,i_category
      ,i_class
      ,i_current_price
      ,round(sum(ws_ext_sales_price) / 100, 2) as itemrevenue
      ,sum(ws_ext_sales_price)*100/sum(sum(ws_ext_sales_price)) over
          (partition by i_class) as revenueratio
from
        web_sales
        ,item
        ,date_dim
where
        ws_item_sk = i_item_sk
        and i_category in ('CAT_1', 'CAT_4', 'CAT_7')
        and ws_sold_date_sk = d_date_sk
        and d_date between cast('1999-02-22' as date)
                                and (cast('1999-02-22' as date) + INTERVAL '30' day)
group by
        i_item_id
        ,i_item_desc
        ,i_category
        ,i_class
        ,i_current_price
order by
        i_category
        ,i_class
        ,i_item_id
        ,i_item_desc
        ,revenueratio
limit 100
"""

_Q20 = """
select  i_item_id
       ,i_item_desc
       ,i_category
       ,i_class
       ,i_current_price
       ,round(sum(cs_ext_sales_price) / 100, 2) as itemrevenue
       ,sum(cs_ext_sales_price)*100/sum(sum(cs_ext_sales_price)) over
           (partition by i_class) as revenueratio
 from   catalog_sales
     ,item
     ,date_dim
 where cs_item_sk = i_item_sk
   and i_category in ('CAT_1', 'CAT_4', 'CAT_7')
   and cs_sold_date_sk = d_date_sk
 and d_date between cast('1999-02-22' as date)
                                and (cast('1999-02-22' as date) + INTERVAL '30' day)
 group by i_item_id
         ,i_item_desc
         ,i_category
         ,i_class
         ,i_current_price
 order by i_category
         ,i_class
         ,i_item_id
         ,i_item_desc
         ,revenueratio
limit 100
"""

# query26.sql — q7's template on the catalog channel; same adaptations.
_Q26 = """
select  i_item_id,
        round(avg(cast(cs_quantity as double)), 4) agg1,
        round(avg(cs_list_price) / 100, 4) agg2,
        round(avg(cs_coupon_amt) / 100, 4) agg3,
        round(avg(cs_sales_price) / 100, 4) agg4
 from catalog_sales, customer_demographics, date_dim, item, promotion
 where cs_sold_date_sk = d_date_sk and
       cs_item_sk = i_item_sk and
       cs_bill_cdemo_sk = cd_demo_sk and
       cs_promo_sk = p_promo_sk and
       cd_gender = 'M' and
       cd_marital_status = 'S' and
       cd_education_status = 'College' and
       (p_channel_email = 'N' or p_channel_event = 'N') and
       d_year = 2000
 group by i_item_id
 order by i_item_id
 limit 100
"""

# query33.sql — three-channel UNION ALL of per-manufacturer revenue under
# a gmt-offset address filter. i_category 'Electronics' → 'CAT_3'; channel
# CTEs keep cents, converted at the final aggregate; ORDER BY gains the
# manufact id tiebreak.
_Q33 = """
with ss as (
 select
          i_manufact_id,sum(ss_ext_sales_price) total_sales
 from
        store_sales,
        date_dim,
         customer_address,
         item
 where
         i_manufact_id in (select
  i_manufact_id
from
 item
where i_category in ('CAT_3'))
 and     ss_item_sk              = i_item_sk
 and     ss_sold_date_sk         = d_date_sk
 and     d_year                  = 1998
 and     d_moy                   = 5
 and     ss_addr_sk              = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_manufact_id),
 cs as (
 select
          i_manufact_id,sum(cs_ext_sales_price) total_sales
 from
        catalog_sales,
        date_dim,
         customer_address,
         item
 where
         i_manufact_id               in (select
  i_manufact_id
from
 item
where i_category in ('CAT_3'))
 and     cs_item_sk              = i_item_sk
 and     cs_sold_date_sk         = d_date_sk
 and     d_year                  = 1998
 and     d_moy                   = 5
 and     cs_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_manufact_id),
 ws as (
 select
          i_manufact_id,sum(ws_ext_sales_price) total_sales
 from
        web_sales,
        date_dim,
         customer_address,
         item
 where
         i_manufact_id               in (select
  i_manufact_id
from
 item
where i_category in ('CAT_3'))
 and     ws_item_sk              = i_item_sk
 and     ws_sold_date_sk         = d_date_sk
 and     d_year                  = 1998
 and     d_moy                   = 5
 and     ws_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_manufact_id)
  select  i_manufact_id ,round(sum(total_sales) / 100, 2) total_sales
 from  (select * from ss
        union all
        select * from cs
        union all
        select * from ws) tmp1
 group by i_manufact_id
 order by total_sales, i_manufact_id
limit 100
"""

# query43.sql — day-of-week pivot per store; sums cents→dollars.
_Q43 = """
select  s_store_name, s_store_id,
        round(sum(case when (d_day_name='Sunday') then ss_sales_price else null end) / 100, 2) sun_sales,
        round(sum(case when (d_day_name='Monday') then ss_sales_price else null end) / 100, 2) mon_sales,
        round(sum(case when (d_day_name='Tuesday') then ss_sales_price else  null end) / 100, 2) tue_sales,
        round(sum(case when (d_day_name='Wednesday') then ss_sales_price else null end) / 100, 2) wed_sales,
        round(sum(case when (d_day_name='Thursday') then ss_sales_price else null end) / 100, 2) thu_sales,
        round(sum(case when (d_day_name='Friday') then ss_sales_price else null end) / 100, 2) fri_sales,
        round(sum(case when (d_day_name='Saturday') then ss_sales_price else null end) / 100, 2) sat_sales
 from date_dim, store_sales, store
 where d_date_sk = ss_sold_date_sk and
       s_store_sk = ss_store_sk and
       s_gmt_offset = -5 and
       d_year = 2000
 group by s_store_name, s_store_id
 order by s_store_name, s_store_id,sun_sales,mon_sales,tue_sales,wed_sales,thu_sales,fri_sales,sat_sales
 limit 100
"""

# query45.sql — zip-list OR item-list disjunction over the web channel.
# Zip constants retargeted to the synthetic ca_zip codomain; the unaliased
# SUM gets a name + cents→dollars.
_Q45 = """
select  ca_zip, ca_city, round(sum(ws_sales_price) / 100, 2) sales
 from web_sales, customer, customer_address, date_dim, item
 where ws_bill_customer_sk = c_customer_sk
        and c_current_addr_sk = ca_address_sk
        and ws_item_sk = i_item_sk
        and ( substr(ca_zip,1,5) in ('07919', '15838','23757','31676','39595', '47514', '55433', '63352', '71271')
              or
              i_item_id in (select i_item_id
                             from item
                             where i_item_sk in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)
                             )
            )
        and ws_sold_date_sk = d_date_sk
        and d_qoy = 2 and d_year = 2001
 group by ca_zip, ca_city
 order by ca_zip, ca_city
 limit 100
"""

# query79.sql — per-ticket coupon/profit under household-demographic and
# store-size filters. substr output aliased (engine-dependent default
# name); amounts cents→dollars; ORDER BY gains the ticket number so the
# LIMIT cut is total.
_Q79 = """
select
  c_last_name,c_first_name,substr(s_city,1,30) s_city_30,ss_ticket_number,amt,profit
  from
   (select ss_ticket_number
          ,ss_customer_sk
          ,store.s_city
          ,round(sum(ss_coupon_amt) / 100, 2) amt
          ,round(sum(ss_net_profit) / 100, 2) profit
    from store_sales,date_dim,store,household_demographics
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and (household_demographics.hd_dep_count = 6 or household_demographics.hd_vehicle_count > 2)
    and date_dim.d_dow = 1
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_number_employees between 200 and 295
    group by ss_ticket_number,ss_customer_sk,ss_addr_sk,store.s_city) ms,customer
    where ss_customer_sk = c_customer_sk
 order by c_last_name,c_first_name,substr(s_city,1,30), profit, ss_ticket_number
limit 100
"""


# query6.sql — state census of customers buying above-average-priced items.
# The correlated `i_current_price > 1.2 * AVG(price per category)` is
# cross-multiplied into exact integer cents via a per-category (SUM, COUNT)
# join (the q31/tpcds_q1 pattern; the double AVG's summation order is
# partition-dependent). Multiplier retargeted 1.2 → 1.04 (26/25): the
# synthetic prices are uniform in [900, 1000), so nothing sits 20% above
# its category average. The month subquery keeps its literal correlated
# form.
_Q6 = """
select  a.ca_state state, cast(count(*) as bigint) cnt
 from customer_address a
     ,customer c
     ,store_sales s
     ,date_dim d
     ,item i
     ,(select i_category cat, sum(i_current_price_cents) cat_cents,
              count(*) cat_cnt
       from item group by i_category) catavg
 where       a.ca_address_sk = c.c_current_addr_sk
        and c.c_customer_sk = s.ss_customer_sk
        and s.ss_sold_date_sk = d.d_date_sk
        and s.ss_item_sk = i.i_item_sk
        and d.d_month_seq =
             (select distinct (d_month_seq)
              from date_dim
               where d_year = 2001
                and d_moy = 1 )
        and i.i_category = catavg.cat
        and 25 * i.i_current_price_cents * catavg.cat_cnt > 26 * catavg.cat_cents
 group by a.ca_state
 having count(*) >= 2
 order by cnt, a.ca_state
 limit 100
"""

# query13.sql — the triple-OR demographic/address band scan. Sales-price
# and net-profit bands converted to cents; the four unaliased averages get
# names + cents→dollars.
_Q13 = """
select round(avg(ss_quantity), 4) avg_qty
       ,round(avg(ss_ext_sales_price) / 100, 4) avg_sales
       ,round(avg(ss_ext_wholesale_cost) / 100, 4) avg_wholesale
       ,round(sum(ss_ext_wholesale_cost) / 100, 2) sum_wholesale
 from store_sales
     ,store
     ,customer_demographics
     ,household_demographics
     ,customer_address
     ,date_dim
 where s_store_sk = ss_store_sk
 and  ss_sold_date_sk = d_date_sk and d_year = 2001
 and((ss_hdemo_sk=hd_demo_sk
  and cd_demo_sk = ss_cdemo_sk
  and cd_marital_status = 'M'
  and cd_education_status = 'Advanced Degree'
  and ss_sales_price between 85000 and 92000
  and hd_dep_count = 3
     )or
     (ss_hdemo_sk=hd_demo_sk
  and cd_demo_sk = ss_cdemo_sk
  and cd_marital_status = 'S'
  and cd_education_status = 'College'
  and ss_sales_price between 80000 and 95000
  and hd_dep_count = 1
     ) or
     (ss_hdemo_sk=hd_demo_sk
  and cd_demo_sk = ss_cdemo_sk
  and cd_marital_status = 'W'
  and cd_education_status = '2 yr Degree'
  and ss_sales_price between 90000 and 100000
  and hd_dep_count = 1
     ))
 and((ss_addr_sk = ca_address_sk
  and ca_country = 'United States'
  and ca_state in ('TX', 'OH', 'TX')
  and ss_net_profit between 0 and 2000000
     ) or
     (ss_addr_sk = ca_address_sk
  and ca_country = 'United States'
  and ca_state in ('OR', 'NY', 'GA')
  and ss_net_profit between 150000 and 3000000
     ) or
     (ss_addr_sk = ca_address_sk
  and ca_country = 'United States'
  and ca_state in ('CA', 'TX', 'WA')
  and ss_net_profit between 50000 and 2500000
     ))
"""

# query15.sql — zip/state/price disjunction over the catalog channel;
# price threshold in cents; SUM aliased + cents→dollars.
_Q15 = """
select  ca_zip
       ,round(sum(cs_sales_price) / 100, 2) sales
 from catalog_sales
     ,customer
     ,customer_address
     ,date_dim
 where cs_bill_customer_sk = c_customer_sk
        and c_current_addr_sk = ca_address_sk
        and ( substr(ca_zip,1,5) in ('07919', '15838','23757','31676','39595',
                                   '47514', '55433', '63352', '71271')
              or ca_state in ('CA','WA','GA')
              or cs_sales_price > 50000)
        and cs_sold_date_sk = d_date_sk
        and d_qoy = 2 and d_year = 2001
 group by ca_zip
 order by ca_zip
 limit 100
"""

# query48.sql — q13's band-OR template, single quantity sum.
_Q48 = """
select cast(sum (ss_quantity) as bigint) sum_qty
 from store_sales, store, customer_demographics, customer_address, date_dim
 where s_store_sk = ss_store_sk
 and  ss_sold_date_sk = d_date_sk and d_year = 2000
 and
 (
  (
   cd_demo_sk = ss_cdemo_sk
   and
   cd_marital_status = 'M'
   and
   cd_education_status = '4 yr Degree'
   and
   ss_sales_price between 85000 and 92000
   )
 or
  (
  cd_demo_sk = ss_cdemo_sk
   and
   cd_marital_status = 'D'
   and
   cd_education_status = '2 yr Degree'
   and
   ss_sales_price between 80000 and 95000
  )
 or
 (
  cd_demo_sk = ss_cdemo_sk
   and
   cd_marital_status = 'S'
   and
   cd_education_status = 'College'
   and
   ss_sales_price between 90000 and 100000
 )
 )
 and
 (
  (
  ss_addr_sk = ca_address_sk
  and
  ca_country = 'United States'
  and
  ca_state in ('TX', 'OH', 'NY')
  and ss_net_profit between 0 and 200000
  )
 or
  (ss_addr_sk = ca_address_sk
  and
  ca_country = 'United States'
  and
  ca_state in ('OR', 'GA', 'TN')
  and ss_net_profit between 15000 and 300000
  )
 or
  (ss_addr_sk = ca_address_sk
  and
  ca_country = 'United States'
  and
  ca_state in ('CA', 'WA', 'TX')
  and ss_net_profit between 5000 and 250000
  )
 )
"""

# query61.sql — promotional vs total revenue ratio (two scalar-aggregate
# subqueries cross-joined). i_category 'Jewelry'→'CAT_5'; DECIMAL ratio
# cast → double on exact cents sums; cents→dollars on output.
_Q61 = """
select  round(promotions / 100, 2) promotions, round(total / 100, 2) total,
        round(cast(promotions as double)/cast(total as double)*100, 4) promo_pct
from
  (select sum(ss_ext_sales_price) promotions
   from  store_sales
        ,store
        ,promotion
        ,date_dim
        ,customer
        ,customer_address
        ,item
   where ss_sold_date_sk = d_date_sk
   and   ss_store_sk = s_store_sk
   and   ss_promo_sk = p_promo_sk
   and   ss_customer_sk= c_customer_sk
   and   ca_address_sk = c_current_addr_sk
   and   ss_item_sk = i_item_sk
   and   ca_gmt_offset = -5
   and   i_category = 'CAT_5'
   and   (p_channel_dmail = 'Y' or p_channel_email = 'Y' or p_channel_tv = 'Y')
   and   s_gmt_offset = -5
   and   d_year = 1998
   and   d_moy  = 11) promotional_sales,
  (select sum(ss_ext_sales_price) total
   from  store_sales
        ,store
        ,date_dim
        ,customer
        ,customer_address
        ,item
   where ss_sold_date_sk = d_date_sk
   and   ss_store_sk = s_store_sk
   and   ss_customer_sk= c_customer_sk
   and   ca_address_sk = c_current_addr_sk
   and   ss_item_sk = i_item_sk
   and   ca_gmt_offset = -5
   and   i_category = 'CAT_5'
   and   s_gmt_offset = -5
   and   d_year = 1998
   and   d_moy  = 11) all_sales
order by promotions, total
limit 100
"""

# query68.sql — bought-city vs home-city tickets. Non-degenerate because
# ~1/3 of sales bill to the customer's secondary address; store cities
# retargeted; money cents→dollars.
_Q68 = """
select  c_last_name
       ,c_first_name
       ,ca_city
       ,bought_city
       ,ss_ticket_number
       ,round(extended_price / 100, 2) extended_price
       ,round(extended_tax / 100, 2) extended_tax
       ,round(list_price / 100, 2) list_price
 from (select ss_ticket_number
             ,ss_customer_sk
             ,ca_city bought_city
             ,sum(ss_ext_sales_price) extended_price
             ,sum(ss_ext_list_price) list_price
             ,sum(ss_ext_tax) extended_tax
       from store_sales
           ,date_dim
           ,store
           ,household_demographics
           ,customer_address
       where store_sales.ss_sold_date_sk = date_dim.d_date_sk
         and store_sales.ss_store_sk = store.s_store_sk
        and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        and store_sales.ss_addr_sk = customer_address.ca_address_sk
        and date_dim.d_dom between 1 and 2
        and (household_demographics.hd_dep_count = 4 or
             household_demographics.hd_vehicle_count= 3)
        and date_dim.d_year in (1999,1999+1,1999+2)
        and store.s_city in ('City_1','City_2')
       group by ss_ticket_number
               ,ss_customer_sk
               ,ss_addr_sk,ca_city) dn
      ,customer
      ,customer_address current_addr
 where ss_customer_sk = c_customer_sk
   and customer.c_current_addr_sk = current_addr.ca_address_sk
   and current_addr.ca_city <> bought_city
   and bought_city is not null
 order by c_last_name
         ,ss_ticket_number
 limit 100
"""

# query73.sql — frequent-ticket households. DECIMAL dep/vehicle ratio →
# double (identical small-int operands); county values unchanged (the
# synthetic store carries the literal county names).
_Q73 = """
select c_last_name
       ,c_first_name
       ,c_salutation
       ,c_preferred_cust_flag
       ,ss_ticket_number
       ,cnt from
   (select ss_ticket_number
          ,ss_customer_sk
          ,cast(count(*) as bigint) cnt
    from store_sales,date_dim,store,household_demographics
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and date_dim.d_dom between 1 and 2
    and (household_demographics.hd_buy_potential = '>10000' or
         household_demographics.hd_buy_potential = 'Unknown')
    and household_demographics.hd_vehicle_count > 0
    and case when household_demographics.hd_vehicle_count > 0 then
             cast(household_demographics.hd_dep_count as double)/ cast(household_demographics.hd_vehicle_count as double) else null end > 1
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_county in ('Williamson County','Franklin Parish','Bronx County','Orange County')
    group by ss_ticket_number,ss_customer_sk) dj,customer
    where ss_customer_sk = c_customer_sk
      and cnt between 1 and 5
    order by cnt desc, c_last_name asc
"""


# query36.sql — gross-margin ROLLUP with rank-within-hierarchy. The
# margin is a ratio of two exact integer-cents sums (identical double in
# both engines), so the literal unrounded form survives; groups ≤ 61 so
# LIMIT never truncates.
_Q36 = """
select
    sum(ss_net_profit)/sum(ss_ext_sales_price) as gross_margin
   ,i_category
   ,i_class
   ,grouping(i_category)+grouping(i_class) as lochierarchy
   ,rank() over (
        partition by grouping(i_category)+grouping(i_class),
        case when grouping(i_class) = 0 then i_category end
        order by sum(ss_net_profit)/sum(ss_ext_sales_price) asc) as rank_within_parent
 from
    store_sales
   ,date_dim       d1
   ,item
   ,store
 where
    d1.d_year = 2001
 and d1.d_date_sk = ss_sold_date_sk
 and i_item_sk  = ss_item_sk
 and s_store_sk  = ss_store_sk
 and s_state in ('TN','TN','TN','TN','TN','TN','TN','TN')
 group by rollup(i_category,i_class)
 order by
   lochierarchy desc
  ,case when lochierarchy = 0 then i_category end
  ,rank_within_parent
  limit 100
"""

# query86.sql — q36's template on the web channel (ws_net_paid), month
# window retargeted to the synthetic sequence; total_sum cents→dollars.
_Q86 = """
select
    round(sum(ws_net_paid) / 100, 2) as total_sum
   ,i_category
   ,i_class
   ,grouping(i_category)+grouping(i_class) as lochierarchy
   ,rank() over (
        partition by grouping(i_category)+grouping(i_class),
        case when grouping(i_class) = 0 then i_category end
        order by sum(ws_net_paid) desc) as rank_within_parent
 from
    web_sales
   ,date_dim       d1
   ,item
 where
    d1.d_month_seq between 61 and 61+11
 and d1.d_date_sk = ws_sold_date_sk
 and i_item_sk  = ws_item_sk
 group by rollup(i_category,i_class)
 order by
   lochierarchy desc,
   case when lochierarchy = 0 then i_category end,
   rank_within_parent
 limit 100
"""

# query47.sql — monthly deviation from the yearly average with lag/lead
# neighbors via the literal rank self-join. All sums exact cents.
#
# Round-8 lesson (the round's one official red row): the spec's
# `avg(sum(ss_sales_price)) over (partition …)` emits a RAW WINDOW-AVG
# DOUBLE, and the driver environment's DuckDB accumulates windowed AVG
# differently from both Spark and the local DuckDB by a last ulp — rows
# and schema matched, the value hash didn't (CORRECTNESS_r08, VERDICT r8
# "What's wrong" #1). Fix, keeping the shared-text discipline: no double
# ever reaches the output or a comparison.
# * v1 carries the exact integer pieces instead of the avg: year_total =
#   SUM(sum)-window (bigint cents) and n_months = COUNT(*)-window;
# * avg_monthly_sales is emitted as exact integer MICRO-CENTS,
#   truncated((year_total*10000)/n) via the modulo identity
#   (a - a % n) / n — subtraction/modulo are bigint-exact and the double
#   division of two exact integers with an integer quotient is exact in
#   IEEE, so both engines cast back to the identical bigint;
# * the 10% filter is cross-multiplied to pure bigints:
#   abs(sum_sales*n - year_total) * 10 > year_total * n
#   ⇔ abs(sum_sales - year_total/n) / (year_total/n) > 0.1 exactly;
# * ORDER BY uses the micro-cent difference (bigint) with the full group
#   key (incl. s_company_name) appended so LIMIT 100 cuts a total order.
_Q47 = """
with v1 as(
 select i_category, i_brand,
        s_store_name, s_company_name,
        d_year, d_moy,
        cast(sum(ss_sales_price) as bigint) sum_sales,
        -- ^ r10: uncast SUM(integer) types as DuckDB HUGEINT -> fetchdf
        -- float64 vs Spark bigint; the driver hash is dtype-sensitive
        -- (the r9 red-row class). Value-preserving in both engines.
        sum(sum(ss_sales_price)) over
          (partition by i_category, i_brand,
                     s_store_name, s_company_name, d_year)
          year_total,
        count(*) over
          (partition by i_category, i_brand,
                     s_store_name, s_company_name, d_year)
          n_months,
        rank() over
          (partition by i_category, i_brand,
                     s_store_name, s_company_name
           order by d_year, d_moy) rn
 from item, store_sales, date_dim, store
 where ss_item_sk = i_item_sk and
       ss_sold_date_sk = d_date_sk and
       ss_store_sk = s_store_sk and
       (
         d_year = 1999 or
         ( d_year = 1999-1 and d_moy =12) or
         ( d_year = 1999+1 and d_moy =1)
       )
 group by i_category, i_brand,
          s_store_name, s_company_name,
          d_year, d_moy),
 v2 as(
 select v1.i_category, v1.i_brand, v1.s_store_name, v1.s_company_name
        ,v1.d_year, v1.d_moy
        ,cast((v1.year_total * 10000 - (v1.year_total * 10000) % v1.n_months)
              / v1.n_months as bigint) avg_monthly_sales
        ,v1.sum_sales, v1_lag.sum_sales psum, v1_lead.sum_sales nsum
 from v1, v1 v1_lag, v1 v1_lead
 where v1.i_category = v1_lag.i_category and
       v1.i_category = v1_lead.i_category and
       v1.i_brand = v1_lag.i_brand and
       v1.i_brand = v1_lead.i_brand and
       v1.s_store_name = v1_lag.s_store_name and
       v1.s_store_name = v1_lead.s_store_name and
       v1.s_company_name = v1_lag.s_company_name and
       v1.s_company_name = v1_lead.s_company_name and
       v1.rn = v1_lag.rn + 1 and
       v1.rn = v1_lead.rn - 1 and
       v1.year_total > 0 and
       abs(v1.sum_sales * v1.n_months - v1.year_total) * 10
           > v1.year_total * v1.n_months)
  select  *
 from v2
 where  d_year = 1999
 order by sum_sales * 10000 - avg_monthly_sales,
          s_store_name, s_company_name, i_category, i_brand, d_moy
 limit 100
"""

# query69.sql — demographic census of store-only customers (EXISTS in the
# store channel, NOT EXISTS in web/catalog). States retargeted.
_Q69 = """
select
  cd_gender,
  cd_marital_status,
  cd_education_status,
  cast(count(*) as bigint) cnt1,
  cd_purchase_estimate,
  cast(count(*) as bigint) cnt2,
  cd_credit_rating,
  cast(count(*) as bigint) cnt3
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  ca_state in ('GA','TN','OR') and
  cd_demo_sk = c.c_current_cdemo_sk and
  exists (select *
          from store_sales,date_dim
          where c.c_customer_sk = ss_customer_sk and
                ss_sold_date_sk = d_date_sk and
                d_year = 2001 and
                d_moy between 4 and 4+2) and
   (not exists (select *
            from web_sales,date_dim
            where c.c_customer_sk = ws_bill_customer_sk and
                  ws_sold_date_sk = d_date_sk and
                  d_year = 2001 and
                  d_moy between 4 and 4+2) and
    not exists (select *
            from catalog_sales,date_dim
            where c.c_customer_sk = cs_ship_customer_sk and
                  cs_sold_date_sk = d_date_sk and
                  d_year = 2001 and
                  d_moy between 4 and 4+2))
 group by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating
 order by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating
 limit 100
"""

# query62.sql — shipping-lag band census per warehouse/mode/site. The web
# fact carries the REAL shipping lag (l_shipdate − o_orderdate). Backtick
# band aliases → plain identifiers (DuckDB has no backtick quoting); the
# substr output aliased; month window retargeted.
_Q62 = """
select
   substr(w_warehouse_name,1,20) wh_name
  ,sm_type
  ,web_name
  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk <= 30 ) then 1 else 0 end) as bigint)  as d30
  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk > 30) and
                 (ws_ship_date_sk - ws_sold_date_sk <= 60) then 1 else 0 end ) as bigint)  as d31_60
  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk > 60) and
                 (ws_ship_date_sk - ws_sold_date_sk <= 90) then 1 else 0 end) as bigint)  as d61_90
  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk > 90) and
                 (ws_ship_date_sk - ws_sold_date_sk <= 120) then 1 else 0 end) as bigint)  as d91_120
  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk  > 120) then 1 else 0 end) as bigint)  as d_over_120
from
   web_sales
  ,warehouse
  ,ship_mode
  ,web_site
  ,date_dim
where
    d_month_seq between 61 and 61 + 11
and ws_ship_date_sk   = d_date_sk
and ws_warehouse_sk   = w_warehouse_sk
and ws_ship_mode_sk   = sm_ship_mode_sk
and ws_web_site_sk    = web_site_sk
group by
   substr(w_warehouse_name,1,20)
  ,sm_type
  ,web_name
order by substr(w_warehouse_name,1,20)
        ,sm_type
       ,web_name
limit 100
"""

# query53.sql — quarterly manufacturer sales vs their quarterly average
# (q89's sibling: same avg-over-sum window, quarter grain). Adaptations:
# d_month_seq 1200..1211 → 61..72 (synthetic seq range, year 2000);
# brand/class/category IN-lists retargeted to co-occurring synthetic
# values (category fixes p%10, which fixes class p%5 and constrains brand
# p%40 — the lists below are chosen mutually consistent); money rounded at
# the aggregate boundary exactly like q89.
_Q53 = """
select  * from
(select i_manufact_id,
round(sum(ss_sales_price) / 100, 2) sum_sales,
round(avg(sum(ss_sales_price)) over (partition by i_manufact_id) / 100, 4) avg_quarterly_sales
from item, store_sales, date_dim, store
where ss_item_sk = i_item_sk and
ss_sold_date_sk = d_date_sk and
ss_store_sk = s_store_sk and
d_month_seq in (61,61+1,61+2,61+3,61+4,61+5,61+6,61+7,61+8,61+9,61+10,61+11) and
((i_category in ('CAT_1','CAT_3','CAT_5') and
i_class in ('class_1','class_3','class_5') and
i_brand in ('Brand#1','Brand#13','Brand#25','Brand#33'))
or(i_category in ('CAT_2','CAT_6','CAT_10') and
i_class in ('class_1','class_2','class_5') and
i_brand in ('Brand#2','Brand#16','Brand#30','Brand#40')))
group by i_manufact_id, d_qoy ) tmp1
where case when avg_quarterly_sales > 0
	then abs (sum_sales - avg_quarterly_sales)/ avg_quarterly_sales
	else null end > 0.1
order by avg_quarterly_sales,
	 sum_sales,
	 i_manufact_id
limit 100
"""

# query46.sql — weekend bought-city vs home-city trips (q68's sibling).
# Adaptations: s_city list → synthetic City_n (duplicates kept verbatim);
# money sums cents→dollars at the aggregate boundary; d_year/d_dow/hd
# constants UNCHANGED (synthetic ranges cover them).
_Q46 = """
select  c_last_name
       ,c_first_name
       ,ca_city
       ,bought_city
       ,ss_ticket_number
       ,amt,profit
 from
   (select ss_ticket_number
          ,ss_customer_sk
          ,ca_city bought_city
          ,round(sum(ss_coupon_amt) / 100, 2) amt
          ,round(sum(ss_net_profit) / 100, 2) profit
    from store_sales,date_dim,store,household_demographics,customer_address
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and store_sales.ss_addr_sk = customer_address.ca_address_sk
    and (household_demographics.hd_dep_count = 4 or
         household_demographics.hd_vehicle_count= 3)
    and date_dim.d_dow in (6,0)
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_city in ('City_1','City_3','City_1','City_1','City_1')
    group by ss_ticket_number,ss_customer_sk,ss_addr_sk,ca_city) dn,customer,customer_address current_addr
    where ss_customer_sk = c_customer_sk
      and customer.c_current_addr_sk = current_addr.ca_address_sk
      and current_addr.ca_city <> bought_city
  order by c_last_name
          ,c_first_name
          ,ca_city
          ,bought_city
          ,ss_ticket_number
  limit 100
"""

# query8.sql — store net profit in zip prefixes shared with concentrated
# preferred-customer zips. Adaptations: the census grain is coarsened to
# the 2-digit prefix (the grain the final store join uses anyway) with
# threshold > 2 (the synthetic corpus can't reach the reference's > 10 at
# the oracle SFs), and the 400-entry zip IN-list becomes a 2-digit prefix
# list that includes the 12 store prefixes (s_zip = (sk % 100) * 7919
# % 100000 → '07' '15' '23' '31' '39' '47' '55' '63' '71' '79' '87' '95').
# GROUP BY spelled substr(...) explicitly (the reference's
# `group by ca_zip` resolves to the BASE column under ANSI rules, which
# both engines honor but which reads as the alias). Money at the
# aggregate boundary; empty at sf0.001 (75 preferred customers spread
# over ~100 zip classes can't exceed the threshold), populated from
# sf0.01 (each even zip class is wholly preferred customers — the flag is
# custkey parity and a class holds one residue mod 100).
_Q8 = """
select  s_store_name
      ,round(sum(ss_net_profit) / 100, 2) net_profit
 from store_sales
     ,date_dim
     ,store,
     (select ca_zip
     from (
      SELECT substr(ca_zip,1,2) ca_zip
      FROM customer_address
      WHERE substr(ca_zip,1,2) IN (
                          '00','02','05','07','11','15',
                          '19','23','27','31','36','39',
                          '44','47','52','55','60','63',
                          '68','71','76','79','84','87',
                          '92','95','99','03','48','81')
     intersect
      select ca_zip
      from (SELECT substr(ca_zip,1,2) ca_zip,count(*) cnt
            FROM customer_address, customer
            WHERE ca_address_sk = c_current_addr_sk and
                  c_preferred_cust_flag='Y'
            group by substr(ca_zip,1,2)
            having count(*) > 2)A1)A2) V1
 where ss_store_sk = s_store_sk
  and ss_sold_date_sk = d_date_sk
  and d_qoy = 2 and d_year = 1998
  and (substr(s_zip,1,2) = substr(V1.ca_zip,1,2))
 group by s_store_name
 order by s_store_name
 limit 100
"""

# query41.sql — manufacturers with any item matching attribute bundles
# (correlated scalar COUNT subquery — the decorrelation shape).
# Adaptations: i_manufact_id 738..778 → 5..15 (synthetic 1..25);
# Women/Men → CAT_1/CAT_6; color/units/size constants → the synthetic
# attribute maps (i_color p%13, i_units p%7, i_size p%9 — all coprime to
# the category's p%10, so every bundle is CRT-satisfiable).
_Q41 = """
select  distinct(i_product_name)
 from item i1
 where i_manufact_id between 5 and 5+10
   and (select count(*) as item_cnt
        from item
        where (i_manufact = i1.i_manufact and
        ((i_category = 'CAT_1' and
        (i_color = 'col_1' or i_color = 'col_4') and
        (i_units = 'unit_1' or i_units = 'unit_4') and
        (i_size = 'medium' or i_size = 'extra large')
        ) or
        (i_category = 'CAT_1' and
        (i_color = 'col_7' or i_color = 'col_10') and
        (i_units = 'unit_2' or i_units = 'unit_5') and
        (i_size = 'N/A' or i_size = 'small')
        ) or
        (i_category = 'CAT_6' and
        (i_color = 'col_2' or i_color = 'col_5') and
        (i_units = 'unit_3' or i_units = 'unit_6') and
        (i_size = 'petite' or i_size = 'large')
        ) or
        (i_category = 'CAT_6' and
        (i_color = 'col_8' or i_color = 'col_11') and
        (i_units = 'unit_0' or i_units = 'unit_1') and
        (i_size = 'medium' or i_size = 'extra large')
        ))) or
       (i_manufact = i1.i_manufact and
        ((i_category = 'CAT_1' and
        (i_color = 'col_0' or i_color = 'col_3') and
        (i_units = 'unit_2' or i_units = 'unit_6') and
        (i_size = 'medium' or i_size = 'extra large')
        ) or
        (i_category = 'CAT_1' and
        (i_color = 'col_6' or i_color = 'col_9') and
        (i_units = 'unit_0' or i_units = 'unit_3') and
        (i_size = 'N/A' or i_size = 'small')
        ) or
        (i_category = 'CAT_6' and
        (i_color = 'col_12' or i_color = 'col_1') and
        (i_units = 'unit_4' or i_units = 'unit_5') and
        (i_size = 'petite' or i_size = 'large')
        ) or
        (i_category = 'CAT_6' and
        (i_color = 'col_5' or i_color = 'col_9') and
        (i_units = 'unit_6' or i_units = 'unit_2') and
        (i_size = 'medium' or i_size = 'extra large')
        )))) > 0
 order by i_product_name
 limit 100
"""

# query85.sql — web return reasons by demographic/address/price bands
# (the returns-side star: web_returns ⋈ web_sales ⋈ cd1/cd2 ⋈ reason).
# Adaptations: sales-price/net-profit dollar bands → the synthetic price
# range ×10 (per-unit prices are $765-2100, the reference's $50-200 bands
# would be vacuous), expressed in integer cents; ca_state lists → the
# synthetic 8-state map; averages of exact integers rounded and aliased
# at the output boundary; ORDER BY mirrors the aliased expressions.
_Q85 = """
select  substr(r_reason_desc,1,20) reason_desc
       ,round(avg(ws_quantity), 4) avg_quantity
       ,round(avg(wr_refunded_cash) / 100, 4) avg_refunded_cash
       ,round(avg(wr_fee) / 100, 4) avg_fee
 from web_sales, web_returns, web_page, customer_demographics cd1,
      customer_demographics cd2, customer_address, date_dim, reason
 where ws_web_page_sk = wp_web_page_sk
   and ws_item_sk = wr_item_sk
   and ws_order_number = wr_order_number
   and ws_sold_date_sk = d_date_sk and d_year = 2000
   and cd1.cd_demo_sk = wr_refunded_cdemo_sk
   and cd2.cd_demo_sk = wr_returning_cdemo_sk
   and ca_address_sk = wr_refunded_addr_sk
   and r_reason_sk = wr_reason_sk
   and
   (
    (
     cd1.cd_marital_status = 'M'
     and
     cd1.cd_marital_status = cd2.cd_marital_status
     and
     cd1.cd_education_status = 'Advanced Degree'
     and
     cd1.cd_education_status = cd2.cd_education_status
     and
     ws_sales_price between 100000 and 200000
    )
   or
    (
     cd1.cd_marital_status = 'S'
     and
     cd1.cd_marital_status = cd2.cd_marital_status
     and
     cd1.cd_education_status = 'College'
     and
     cd1.cd_education_status = cd2.cd_education_status
     and
     ws_sales_price between 20000 and 100000
    )
   or
    (
     cd1.cd_marital_status = 'W'
     and
     cd1.cd_marital_status = cd2.cd_marital_status
     and
     cd1.cd_education_status = '2 yr Degree'
     and
     cd1.cd_education_status = cd2.cd_education_status
     and
     ws_sales_price between 200000 and 400000
    )
   )
   and
   (
    (
     ca_country = 'United States'
     and
     ca_state in ('OH', 'NY', 'TN')
     and ws_net_profit between 1000000 and 2000000
    )
    or
    (
     ca_country = 'United States'
     and
     ca_state in ('CA', 'WA', 'GA')
     and ws_net_profit between 1500000 and 3000000
    )
    or
    (
     ca_country = 'United States'
     and
     ca_state in ('TX', 'OR', 'CA')
     and ws_net_profit between 500000 and 2500000
    )
   )
group by r_reason_desc
order by substr(r_reason_desc,1,20)
        ,round(avg(ws_quantity), 4)
        ,round(avg(wr_refunded_cash) / 100, 4)
        ,round(avg(wr_fee) / 100, 4)
limit 100
"""

# ---- batch 5 (STAGED): the reference's multi-part a/b pairs ------------
# TpcdsTestProgram.java:76-87 counts 103 queries vs 99 because q14 q23 q24
# q39 ship as a/b pairs — the last distinctive literal shapes the suite
# lacks. Staged = pytest-verified against DuckDB at sf0.001/0.01/0.1 but
# NOT yet in queries()/oracle_sql(): ROADMAP's r8 freeze caps new graded
# entries (the 5 batch-4 queries used the cap), so these eight flip into
# _LITERAL in r9 (a 1-line move) and grade with that round's window.

# query14a.sql — cross-channel INTERSECT of (brand,class,category) triples,
# per-channel monthly sums vs the all-channel average, 4-level ROLLUP.
# d_moy 11 → 5 (order dates end 2001-08-01, so November 2001 is empty).
# Adaptations: money at the aggregate boundary; the INTERSECT subquery
# gets the alias `x` its 14b sibling already has;
# ORDER BY gets explicit NULLS FIRST — the ROLLUP output can exceed the
# LIMIT and Spark (NULLS FIRST) and DuckDB (NULLS LAST) disagree on the
# default, which would cut different rows.
_Q14A = """
with  cross_items as
 (select i_item_sk ss_item_sk
 from item,
 (select iss.i_brand_id brand_id
     ,iss.i_class_id class_id
     ,iss.i_category_id category_id
 from store_sales
     ,item iss
     ,date_dim d1
 where ss_item_sk = iss.i_item_sk
   and ss_sold_date_sk = d1.d_date_sk
   and d1.d_year between 1999 AND 1999 + 2
 intersect
 select ics.i_brand_id
     ,ics.i_class_id
     ,ics.i_category_id
 from catalog_sales
     ,item ics
     ,date_dim d2
 where cs_item_sk = ics.i_item_sk
   and cs_sold_date_sk = d2.d_date_sk
   and d2.d_year between 1999 AND 1999 + 2
 intersect
 select iws.i_brand_id
     ,iws.i_class_id
     ,iws.i_category_id
 from web_sales
     ,item iws
     ,date_dim d3
 where ws_item_sk = iws.i_item_sk
   and ws_sold_date_sk = d3.d_date_sk
   and d3.d_year between 1999 AND 1999 + 2) x
 where i_brand_id = brand_id
      and i_class_id = class_id
      and i_category_id = category_id
),
 avg_sales as
 (select sum(quantity*list_price) / count(quantity*list_price) average_sales
  -- r9 float hardening: avg() -> explicit sum/count. The products are
  -- exact bigints (int quantity x integer-cent price), so the sum is
  -- exact and the single IEEE division is bit-identical in any engine;
  -- engine-internal AVG state merges are not (the q47 lesson).
  from (select ss_quantity quantity
             ,ss_list_price list_price
       from store_sales
           ,date_dim
       where ss_sold_date_sk = d_date_sk
         and d_year between 1999 and 1999 + 2
       union all
       select cs_quantity quantity
             ,cs_list_price list_price
       from catalog_sales
           ,date_dim
       where cs_sold_date_sk = d_date_sk
         and d_year between 1999 and 1999 + 2
       union all
       select ws_quantity quantity
             ,ws_list_price list_price
       from web_sales
           ,date_dim
       where ws_sold_date_sk = d_date_sk
         and d_year between 1999 and 1999 + 2) x)
  select  channel, i_brand_id,i_class_id,i_category_id,
        round(sum(sales) / 100, 2) sum_sales,
        cast(sum(number_sales) as bigint) number_sales
        -- ^ r10: cast the integer-sum output (driver-hash dtype class)
 from(
       select 'store' channel, i_brand_id,i_class_id
             ,i_category_id,sum(ss_quantity*ss_list_price) sales
             , count(*) number_sales
       from store_sales
           ,item
           ,date_dim
       where ss_item_sk in (select ss_item_sk from cross_items)
         and ss_item_sk = i_item_sk
         and ss_sold_date_sk = d_date_sk
         and d_year = 1999+2
         and d_moy = 5
       group by i_brand_id,i_class_id,i_category_id
       having sum(ss_quantity*ss_list_price) > (select average_sales from avg_sales)
       union all
       select 'catalog' channel, i_brand_id,i_class_id,i_category_id, sum(cs_quantity*cs_list_price) sales, count(*) number_sales
       from catalog_sales
           ,item
           ,date_dim
       where cs_item_sk in (select ss_item_sk from cross_items)
         and cs_item_sk = i_item_sk
         and cs_sold_date_sk = d_date_sk
         and d_year = 1999+2
         and d_moy = 5
       group by i_brand_id,i_class_id,i_category_id
       having sum(cs_quantity*cs_list_price) > (select average_sales from avg_sales)
       union all
       select 'web' channel, i_brand_id,i_class_id,i_category_id, sum(ws_quantity*ws_list_price) sales , count(*) number_sales
       from web_sales
           ,item
           ,date_dim
       where ws_item_sk in (select ss_item_sk from cross_items)
         and ws_item_sk = i_item_sk
         and ws_sold_date_sk = d_date_sk
         and d_year = 1999+2
         and d_moy = 5
       group by i_brand_id,i_class_id,i_category_id
       having sum(ws_quantity*ws_list_price) > (select average_sales from avg_sales)
 ) y
 group by rollup (channel, i_brand_id,i_class_id,i_category_id)
 order by channel nulls first, i_brand_id nulls first, i_class_id nulls first,
          i_category_id nulls first
 limit 100
"""

# query14b.sql — the same cross_items/avg_sales scaffold, then this-week
# vs same-week-last-year store sales joined on the item triple. The
# d_week_seq anchor dates (2000-12-11 / 1999-12-11) exist at every SF.
# Money at the aggregate boundary; output aliases are the reference's own.
_Q14B = """
with  cross_items as
 (select i_item_sk ss_item_sk
 from item,
 (select iss.i_brand_id brand_id
     ,iss.i_class_id class_id
     ,iss.i_category_id category_id
 from store_sales
     ,item iss
     ,date_dim d1
 where ss_item_sk = iss.i_item_sk
   and ss_sold_date_sk = d1.d_date_sk
   and d1.d_year between 1999 AND 1999 + 2
 intersect
 select ics.i_brand_id
     ,ics.i_class_id
     ,ics.i_category_id
 from catalog_sales
     ,item ics
     ,date_dim d2
 where cs_item_sk = ics.i_item_sk
   and cs_sold_date_sk = d2.d_date_sk
   and d2.d_year between 1999 AND 1999 + 2
 intersect
 select iws.i_brand_id
     ,iws.i_class_id
     ,iws.i_category_id
 from web_sales
     ,item iws
     ,date_dim d3
 where ws_item_sk = iws.i_item_sk
   and ws_sold_date_sk = d3.d_date_sk
   and d3.d_year between 1999 AND 1999 + 2) x
 where i_brand_id = brand_id
      and i_class_id = class_id
      and i_category_id = category_id
),
 avg_sales as
(select sum(quantity*list_price) / count(quantity*list_price) average_sales
  -- r9 float hardening: avg() -> explicit sum/count. The products are
  -- exact bigints (int quantity x integer-cent price), so the sum is
  -- exact and the single IEEE division is bit-identical in any engine;
  -- engine-internal AVG state merges are not (the q47 lesson).
  from (select ss_quantity quantity
             ,ss_list_price list_price
       from store_sales
           ,date_dim
       where ss_sold_date_sk = d_date_sk
         and d_year between 1999 and 1999 + 2
       union all
       select cs_quantity quantity
             ,cs_list_price list_price
       from catalog_sales
           ,date_dim
       where cs_sold_date_sk = d_date_sk
         and d_year between 1999 and 1999 + 2
       union all
       select ws_quantity quantity
             ,ws_list_price list_price
       from web_sales
           ,date_dim
       where ws_sold_date_sk = d_date_sk
         and d_year between 1999 and 1999 + 2) x)
  select  this_year.channel ty_channel
                           ,this_year.i_brand_id ty_brand
                           ,this_year.i_class_id ty_class
                           ,this_year.i_category_id ty_category
                           ,round(this_year.sales / 100, 2) ty_sales
                           ,this_year.number_sales ty_number_sales
                           ,last_year.channel ly_channel
                           ,last_year.i_brand_id ly_brand
                           ,last_year.i_class_id ly_class
                           ,last_year.i_category_id ly_category
                           ,round(last_year.sales / 100, 2) ly_sales
                           ,last_year.number_sales ly_number_sales
 from
 (select 'store' channel, i_brand_id,i_class_id,i_category_id
        ,sum(ss_quantity*ss_list_price) sales, count(*) number_sales
 from store_sales
     ,item
     ,date_dim
 where ss_item_sk in (select ss_item_sk from cross_items)
   and ss_item_sk = i_item_sk
   and ss_sold_date_sk = d_date_sk
   and d_week_seq = (select d_week_seq
                     from date_dim
                     where d_year = 1999 + 1
                       and d_moy = 12
                       and d_dom = 11)
 group by i_brand_id,i_class_id,i_category_id
 having sum(ss_quantity*ss_list_price) > (select average_sales from avg_sales)) this_year,
 (select 'store' channel, i_brand_id,i_class_id
        ,i_category_id, sum(ss_quantity*ss_list_price) sales, count(*) number_sales
 from store_sales
     ,item
     ,date_dim
 where ss_item_sk in (select ss_item_sk from cross_items)
   and ss_item_sk = i_item_sk
   and ss_sold_date_sk = d_date_sk
   and d_week_seq = (select d_week_seq
                     from date_dim
                     where d_year = 1999
                       and d_moy = 12
                       and d_dom = 11)
 group by i_brand_id,i_class_id,i_category_id
 having sum(ss_quantity*ss_list_price) > (select average_sales from avg_sales)) last_year
 where this_year.i_brand_id= last_year.i_brand_id
   and this_year.i_class_id = last_year.i_class_id
   and this_year.i_category_id = last_year.i_category_id
 order by this_year.channel, this_year.i_brand_id, this_year.i_class_id, this_year.i_category_id
 limit 100
"""

# query23a.sql — frequent store items × best store customers gating
# catalog+web February sales. Adaptations: HAVING count(*) > 4 → > 1 (the
# synthetic fact tops out at 3 rows per (item, day) even at sf0.1 — the
# same selectivity-retarget standard as q3); money at the boundary; the
# reference's unaliased FROM-subqueries get aliases (y/z) for
# cross-engine name-resolution hygiene (its 14b sibling aliases them too).
_Q23A = """
with frequent_ss_items as
 (select substr(i_item_desc,1,30) itemdesc,i_item_sk item_sk,d_date solddate,count(*) cnt
  from store_sales
      ,date_dim
      ,item
  where ss_sold_date_sk = d_date_sk
    and ss_item_sk = i_item_sk
    and d_year in (2000,2000+1,2000+2,2000+3)
  group by substr(i_item_desc,1,30),i_item_sk,d_date
  having count(*) > 1),
 max_store_sales as
 (select max(csales) tpcds_cmax
  from (select c_customer_sk,sum(ss_quantity*ss_sales_price) csales
        from store_sales
            ,customer
            ,date_dim
        where ss_customer_sk = c_customer_sk
         and ss_sold_date_sk = d_date_sk
         and d_year in (2000,2000+1,2000+2,2000+3)
        group by c_customer_sk) y),
 best_ss_customer as
 (select c_customer_sk,sum(ss_quantity*ss_sales_price) ssales
  from store_sales
      ,customer
  where ss_customer_sk = c_customer_sk
  group by c_customer_sk
  having sum(ss_quantity*ss_sales_price) > (50/100.0) * (select
  *
from
 max_store_sales))
  select  round(sum(sales) / 100, 2) total_sales
 from (select cs_quantity*cs_list_price sales
       from catalog_sales
           ,date_dim
       where d_year = 2000
         and d_moy = 2
         and cs_sold_date_sk = d_date_sk
         and cs_item_sk in (select item_sk from frequent_ss_items)
         and cs_bill_customer_sk in (select c_customer_sk from best_ss_customer)
      union all
      select ws_quantity*ws_list_price sales
       from web_sales
           ,date_dim
       where d_year = 2000
         and d_moy = 2
         and ws_sold_date_sk = d_date_sk
         and ws_item_sk in (select item_sk from frequent_ss_items)
         and ws_bill_customer_sk in (select c_customer_sk from best_ss_customer)) z
 limit 100
"""

# query23b.sql — the per-customer-name variant of 23a. Same retargets;
# branch sums rounded at their own aggregate boundary (the outer UNION ALL
# carries them through unaggregated).
_Q23B = """
with frequent_ss_items as
 (select substr(i_item_desc,1,30) itemdesc,i_item_sk item_sk,d_date solddate,count(*) cnt
  from store_sales
      ,date_dim
      ,item
  where ss_sold_date_sk = d_date_sk
    and ss_item_sk = i_item_sk
    and d_year in (2000,2000 + 1,2000 + 2,2000 + 3)
  group by substr(i_item_desc,1,30),i_item_sk,d_date
  having count(*) > 1),
 max_store_sales as
 (select max(csales) tpcds_cmax
  from (select c_customer_sk,sum(ss_quantity*ss_sales_price) csales
        from store_sales
            ,customer
            ,date_dim
        where ss_customer_sk = c_customer_sk
         and ss_sold_date_sk = d_date_sk
         and d_year in (2000,2000+1,2000+2,2000+3)
        group by c_customer_sk) y),
 best_ss_customer as
 (select c_customer_sk,sum(ss_quantity*ss_sales_price) ssales
  from store_sales
      ,customer
  where ss_customer_sk = c_customer_sk
  group by c_customer_sk
  having sum(ss_quantity*ss_sales_price) > (50/100.0) * (select
  *
 from max_store_sales))
  select  c_last_name,c_first_name,sales
 from (select c_last_name,c_first_name,round(sum(cs_quantity*cs_list_price) / 100, 2) sales
        from catalog_sales
            ,customer
            ,date_dim
        where d_year = 2000
         and d_moy = 2
         and cs_sold_date_sk = d_date_sk
         and cs_item_sk in (select item_sk from frequent_ss_items)
         and cs_bill_customer_sk in (select c_customer_sk from best_ss_customer)
         and cs_bill_customer_sk = c_customer_sk
       group by c_last_name,c_first_name
      union all
      select c_last_name,c_first_name,round(sum(ws_quantity*ws_list_price) / 100, 2) sales
       from web_sales
           ,customer
           ,date_dim
       where d_year = 2000
         and d_moy = 2
         and ws_sold_date_sk = d_date_sk
         and ws_item_sk in (select item_sk from frequent_ss_items)
         and ws_bill_customer_sk in (select c_customer_sk from best_ss_customer)
         and ws_bill_customer_sk = c_customer_sk
       group by c_last_name,c_first_name) z
     order by c_last_name,c_first_name,sales
  limit 100
"""

# query24a.sql — returned store sales by out-of-state-ish customers whose
# home zip matches the store zip, color-sliced vs 5% of the all-color
# average. Adaptations: i_color 'peach' → 'col_5' (synthetic color map
# p % 13, the q41-pinned codomain); money at the boundary.
_Q24A = """
with ssales as
(select c_last_name
      ,c_first_name
      ,s_store_name
      ,ca_state
      ,s_state
      ,i_color
      ,i_current_price
      ,i_manager_id
      ,i_units
      ,i_size
      ,sum(ss_net_paid) netpaid
from store_sales
    ,store_returns
    ,store
    ,item
    ,customer
    ,customer_address
where ss_ticket_number = sr_ticket_number
  and ss_item_sk = sr_item_sk
  and ss_customer_sk = c_customer_sk
  and ss_item_sk = i_item_sk
  and ss_store_sk = s_store_sk
  and c_current_addr_sk = ca_address_sk
  and c_birth_country <> upper(ca_country)
  and s_zip = ca_zip
and s_market_id=8
group by c_last_name
        ,c_first_name
        ,s_store_name
        ,ca_state
        ,s_state
        ,i_color
        ,i_current_price
        ,i_manager_id
        ,i_units
        ,i_size)
select c_last_name
      ,c_first_name
      ,s_store_name
      ,round(sum(netpaid) / 100, 2) paid
from ssales
where i_color = 'col_5'
group by c_last_name
        ,c_first_name
        ,s_store_name
having sum(netpaid) > (select 0.05 * cast(sum(netpaid) as double) / count(netpaid)
                                 from ssales)
order by c_last_name
        ,c_first_name
        ,s_store_name
"""

# query24b.sql — the second color slice: 'saddle' → 'col_9'.
_Q24B = """
with ssales as
(select c_last_name
      ,c_first_name
      ,s_store_name
      ,ca_state
      ,s_state
      ,i_color
      ,i_current_price
      ,i_manager_id
      ,i_units
      ,i_size
      ,sum(ss_net_paid) netpaid
from store_sales
    ,store_returns
    ,store
    ,item
    ,customer
    ,customer_address
where ss_ticket_number = sr_ticket_number
  and ss_item_sk = sr_item_sk
  and ss_customer_sk = c_customer_sk
  and ss_item_sk = i_item_sk
  and ss_store_sk = s_store_sk
  and c_current_addr_sk = ca_address_sk
  and c_birth_country <> upper(ca_country)
  and s_zip = ca_zip
  and s_market_id = 8
group by c_last_name
        ,c_first_name
        ,s_store_name
        ,ca_state
        ,s_state
        ,i_color
        ,i_current_price
        ,i_manager_id
        ,i_units
        ,i_size)
select c_last_name
      ,c_first_name
      ,s_store_name
      ,round(sum(netpaid) / 100, 2) paid
from ssales
where i_color = 'col_9'
group by c_last_name
        ,c_first_name
        ,s_store_name
having sum(netpaid) > (select 0.05 * cast(sum(netpaid) as double) / count(netpaid)
                                 from ssales)
order by c_last_name
        ,c_first_name
        ,s_store_name
"""

# query39a.sql — inventory coefficient-of-variation month-over-month
# self-join. Adaptations: decimal(7,2) cast → double (q7's standard);
# inv2's output columns aliased *_2 (the driver/pytest compare is
# name-keyed and the reference emits duplicate names); mean/cov rounded
# to 4dp at the output boundary (stddev_samp is float; the > 1 / > 1.5
# filters keep the raw values — integer-sample cov sits at the boundary
# only on exact algebraic ties).
_Q39A = """
with inv as
(select w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy
       ,stdev,mean, case mean when 0 then null else stdev/mean end cov
 from(select w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy
            -- r9 float hardening: stddev_samp/avg -> exact integer moments
            -- (sum, sum-of-squares, count are exact bigints; the divisions
            -- and sqrt are single correctly-rounded IEEE ops, bit-identical
            -- in any engine — engine-internal Welford merges are not)
            ,case when count(*) > 1 then sqrt(
                 (count(*) * sum(inv_quantity_on_hand * inv_quantity_on_hand)
                  - sum(inv_quantity_on_hand) * sum(inv_quantity_on_hand))
                 / cast(count(*) * (count(*) - 1) as double)) else null end stdev
            ,sum(inv_quantity_on_hand) / cast(count(*) as double) mean
      from inventory
          ,item
          ,warehouse
          ,date_dim
      where inv_item_sk = i_item_sk
        and inv_warehouse_sk = w_warehouse_sk
        and inv_date_sk = d_date_sk
        and d_year =2001
      group by w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy) foo
 where case mean when 0 then 0 else stdev/mean end > 1)
select inv1.w_warehouse_sk,inv1.i_item_sk,inv1.d_moy
        ,round(inv1.mean, 4) mean, round(inv1.cov, 4) cov
        ,inv2.w_warehouse_sk w_warehouse_sk_2,inv2.i_item_sk i_item_sk_2
        ,inv2.d_moy d_moy_2
        ,round(inv2.mean, 4) mean_2, round(inv2.cov, 4) cov_2
from inv inv1,inv inv2
where inv1.i_item_sk = inv2.i_item_sk
  and inv1.w_warehouse_sk =  inv2.w_warehouse_sk
  and inv1.d_moy=1
  and inv2.d_moy=1+1
order by inv1.w_warehouse_sk,inv1.i_item_sk,inv1.d_moy,inv1.mean,inv1.cov
        ,inv2.d_moy,inv2.mean, inv2.cov
"""

# query39b.sql — 39a restricted to January cov > 1.5 (a 2-sample group
# tops out at cov √2, so only ≥3-sample cells with one large lot pass —
# the dense weekly snapshot gives 4-5 samples per month).
_Q39B = """
with inv as
(select w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy
       ,stdev,mean, case mean when 0 then null else stdev/mean end cov
 from(select w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy
            -- r9 float hardening: stddev_samp/avg -> exact integer moments
            -- (sum, sum-of-squares, count are exact bigints; the divisions
            -- and sqrt are single correctly-rounded IEEE ops, bit-identical
            -- in any engine — engine-internal Welford merges are not)
            ,case when count(*) > 1 then sqrt(
                 (count(*) * sum(inv_quantity_on_hand * inv_quantity_on_hand)
                  - sum(inv_quantity_on_hand) * sum(inv_quantity_on_hand))
                 / cast(count(*) * (count(*) - 1) as double)) else null end stdev
            ,sum(inv_quantity_on_hand) / cast(count(*) as double) mean
      from inventory
          ,item
          ,warehouse
          ,date_dim
      where inv_item_sk = i_item_sk
        and inv_warehouse_sk = w_warehouse_sk
        and inv_date_sk = d_date_sk
        and d_year =2001
      group by w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy) foo
 where case mean when 0 then 0 else stdev/mean end > 1)
select inv1.w_warehouse_sk,inv1.i_item_sk,inv1.d_moy
        ,round(inv1.mean, 4) mean, round(inv1.cov, 4) cov
        ,inv2.w_warehouse_sk w_warehouse_sk_2,inv2.i_item_sk i_item_sk_2
        ,inv2.d_moy d_moy_2
        ,round(inv2.mean, 4) mean_2, round(inv2.cov, 4) cov_2
from inv inv1,inv inv2
where inv1.i_item_sk = inv2.i_item_sk
  and inv1.w_warehouse_sk =  inv2.w_warehouse_sk
  and inv1.d_moy=1
  and inv2.d_moy=1+1
  and inv1.cov > 1.5
order by inv1.w_warehouse_sk,inv1.i_item_sk,inv1.d_moy,inv1.mean,inv1.cov
        ,inv2.d_moy,inv2.mean, inv2.cov
"""

_LITERAL = {
    "tpcds_lit_q3": _Q3,
    "tpcds_lit_q7": _Q7,
    "tpcds_lit_q19": _Q19,
    "tpcds_lit_q42": _Q42,
    "tpcds_lit_q52": _Q52,
    "tpcds_lit_q55": _Q55,
    "tpcds_lit_q65": _Q65,
    "tpcds_lit_q89": _Q89,
    "tpcds_lit_q12": _Q12,
    "tpcds_lit_q20": _Q20,
    "tpcds_lit_q26": _Q26,
    "tpcds_lit_q33": _Q33,
    "tpcds_lit_q43": _Q43,
    "tpcds_lit_q45": _Q45,
    "tpcds_lit_q79": _Q79,
    "tpcds_lit_q98": _Q98,
    "tpcds_lit_q6": _Q6,
    "tpcds_lit_q13": _Q13,
    "tpcds_lit_q15": _Q15,
    "tpcds_lit_q48": _Q48,
    "tpcds_lit_q61": _Q61,
    "tpcds_lit_q68": _Q68,
    "tpcds_lit_q73": _Q73,
    "tpcds_lit_q36": _Q36,
    "tpcds_lit_q47": _Q47,
    "tpcds_lit_q62": _Q62,
    "tpcds_lit_q69": _Q69,
    "tpcds_lit_q86": _Q86,
    # batch 4 (r8 additions, graded r9): multi-sibling + returns-side pack
    "tpcds_lit_q8": _Q8,
    "tpcds_lit_q41": _Q41,
    "tpcds_lit_q46": _Q46,
    "tpcds_lit_q53": _Q53,
    "tpcds_lit_q85": _Q85,
}

# The multi-part a/b pairs (ext-table texts — flipped into the graded
# surface in r9 together with waves 2-8; the pytest oracle-parity gate
# additionally runs them at sf0.001/0.01/0.1 via
# tests/test_tpcds_literal_staged.py).
_STAGED = {
    "tpcds_lit_q14a": _Q14A,
    "tpcds_lit_q14b": _Q14B,
    "tpcds_lit_q23a": _Q23A,
    "tpcds_lit_q23b": _Q23B,
    "tpcds_lit_q24a": _Q24A,
    "tpcds_lit_q24b": _Q24B,
    "tpcds_lit_q39a": _Q39A,
    "tpcds_lit_q39b": _Q39B,
}


def _compose(ctes: str, qtext: str) -> str:
    """Prefix the star-derivation CTEs; a query that opens with its own
    WITH clause (q33) has it merged into the same CTE list."""
    stripped = qtext.lstrip()
    if stripped.lower().startswith("with "):
        return f"WITH {ctes},\n{stripped[5:]}"
    return f"WITH {ctes} {qtext}"


# Star tables the query texts reference (everything in _star_ctes except
# the two derivation-only intermediates tpcds_customer_base / all_dates).
_STAR_TABLES = (
    "date_dim", "store_sales", "catalog_sales", "web_sales", "web_returns",
    "web_page", "reason", "warehouse",
    "ship_mode", "web_site", "household_demographics", "item", "store",
    "promotion", "customer_demographics", "customer", "customer_address",
)


def _ensure_star(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the derived star ONCE per (session, sf_dir): each table
    becomes a persisted DataFrame behind a prefixed temp view
    (``tpcds_star_<name>`` — prefixed so the derived ``customer`` never
    shadows the base TPC-H view other query families use). Before this,
    every one of the 28 literal queries re-ran the lineitem⋈orders fact
    derivation inside its own CTE list (VERDICT r7 #4); now the derivation
    joins run once and the suite reads the materialized frames. Switching
    sf_dir rebuilds. The DuckDB oracle keeps its per-query CTEs — values
    are identical by construction, so hashes are unaffected.

    Materialization is ``localCheckpoint(eager=True)`` rather than
    ``persist()``: a temp view over a persisted CTE plan re-analyzes with
    fresh CTE ids on every reference, so the cache-manager's sameResult
    lookup misses and each query would silently re-derive from parquet.
    The checkpoint severs lineage — the view's plan IS the materialized
    RDD scan. (On a real cluster you'd write the star to a table once —
    localCheckpoint blocks don't survive executor loss; see SCALE.md.)"""
    key = os.path.abspath(sf_dir)
    if getattr(spark, "_graft_tpcds_star_for", None) == key:
        return
    register_views(spark, sf_dir)
    # The 17 checkpoint jobs are independent; running them from a small
    # thread pool lets each job's task tail back-fill the cores the
    # previous job left idle (guide §2.6) — the derivations are 1-2 task
    # jobs over small dims plus three fact slices, so serial execution
    # left local[32] ~empty per job. Analysis happens on the caller
    # thread (catalog lookups), only the eager checkpoint runs pooled.
    dfs = {name: spark.sql(f"WITH {_SPARK_CTES} SELECT * FROM {name}")
           for name in _STAR_TABLES}
    with ThreadPoolExecutor(max_workers=4) as pool:
        ckpts = {name: pool.submit(df.localCheckpoint, True)
                 for name, df in dfs.items()}
        for name, fut in ckpts.items():
            fut.result().createOrReplaceTempView(f"tpcds_star_{name}")
    spark._graft_tpcds_star_for = key


# Alias CTE list mapping each literal query's unqualified star names onto
# the cached views; _compose merges a query's own WITH clause after it.
_ALIAS_CTES = ",\n".join(
    f"{name} AS (SELECT * FROM tpcds_star_{name})" for name in _STAR_TABLES
)


# Batch-5 tables, materialized LAZILY on top of the graded star: inventory
# is |part| × ~350 Sundays × 2 warehouses — only q39 should pay its
# checkpoint cost, never the 33 graded literal queries or bench.
_STAR_TABLES_EXT = ("store_returns", "inventory", "catalog_returns",
                    "call_center", "catalog_page", "income_band", "time_dim")


def _ensure_star_ext(spark: SparkSession, sf_dir: str,
                     tables: tuple[str, ...] | None = None) -> None:
    """Materialize ext tables PER-TABLE on first reference (ADVICE r8 #2:
    the round-8 cut checkpointed all 7 on the first run of ANY staged
    query, so e.g. a store_returns query paid for the |part|×~350-Sundays
    ×2 inventory cross join). Graded queries and bench never touch this
    path at all."""
    key = os.path.abspath(sf_dir)
    _ensure_star(spark, sf_dir)
    done = getattr(spark, "_graft_tpcds_star_ext", None)
    if done is None or done.get("dir") != key:
        done = {"dir": key, "tables": set()}
        spark._graft_tpcds_star_ext = done
    todo = [name for name in (_STAR_TABLES_EXT if tables is None else tables)
            if name not in done["tables"]]
    if not todo:
        return
    dfs = {name: spark.sql(f"WITH {_SPARK_CTES} SELECT * FROM {name}")
           for name in todo}
    # same §2.6 overlap as _ensure_star (inventory's dense lattice job
    # dominates; the small ext dims back-fill its tail)
    with ThreadPoolExecutor(max_workers=4) as pool:
        ckpts = {name: pool.submit(df.localCheckpoint, True)
                 for name, df in dfs.items()}
        for name, fut in ckpts.items():
            fut.result().createOrReplaceTempView(f"tpcds_star_{name}")
            done["tables"].add(name)


def _runner(qtext: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_star(spark, sf_dir)
        return spark.sql(_compose(_ALIAS_CTES, qtext))

    return run


def _runner_ext(qtext: str):
    """Like _runner but for texts over the lazily-materialized ext tables:
    only the ext tables the text actually references are checkpointed and
    aliased (the rest stay underived). Detection runs on the comment-
    stripped text (ADVICE r9 #2: a table named only in a `--` comment must
    not trigger its checkpoint — e.g. the inventory cross join); the 3-SF
    staged parity suites backstop a detection miss."""
    sql_only = re.sub(r"--[^\n]*", "", qtext)
    needed = tuple(t for t in _STAR_TABLES_EXT
                   if re.search(rf"\b{t}\b", sql_only))
    alias = ",\n".join(f"{name} AS (SELECT * FROM tpcds_star_{name})"
                       for name in _STAR_TABLES + needed)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_star_ext(spark, sf_dir, needed)
        return spark.sql(_compose(alias, qtext))

    return run


def _split_with_ctes(qtext: str) -> tuple[list[tuple[str, str]], str]:
    """Split a literal text's leading ``WITH name AS (...), ...`` clause
    into ``[(name, body)]`` plus the main statement. The scanner is
    paren-balanced and skips ``--`` comments and single-quoted strings, so
    a paren inside either cannot desync it; it raises loudly on any shape
    it does not recognise (the 3-SF staged parity suites are the backstop
    for a silent mis-split)."""
    s = qtext
    i = 0
    n = len(s)

    def skip_ws(j: int) -> int:
        while j < n:
            if s[j].isspace():
                j += 1
            elif s.startswith("--", j):
                k = s.find("\n", j)
                j = n if k < 0 else k + 1
            else:
                break
        return j

    i = skip_ws(i)
    if s[i:i + 4].lower() != "with":
        raise ValueError("literal text does not start with WITH")
    i = skip_ws(i + 4)
    ctes: list[tuple[str, str]] = []
    while True:
        m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", s[i:])
        if not m:
            raise ValueError(f"expected CTE name at offset {i}")
        name = m.group(0)
        i = skip_ws(i + m.end())
        if s[i:i + 2].lower() != "as":
            raise ValueError(f"expected AS after CTE {name!r}")
        i = skip_ws(i + 2)
        if s[i] != "(":
            raise ValueError(f"expected ( after {name} AS")
        depth = 0
        j = i
        while j < n:
            c = s[j]
            if c == "'":
                j += 1
                while j < n and s[j] != "'":
                    j += 1
            elif s.startswith("--", j):
                k = s.find("\n", j)
                j = n if k < 0 else k
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            raise ValueError(f"unbalanced parens in CTE {name!r}")
        ctes.append((name, s[i + 1:j]))
        i = skip_ws(j + 1)
        if s[i] == ",":
            i = skip_ws(i + 1)
            continue
        return ctes, s[i:]


def _runner_shared(qname: str, qtext: str, shared: tuple[str, ...]):
    """_runner_ext variant that materializes the text's named leading CTEs
    ONCE PER RUNNER CALL (eager localCheckpoint behind per-query temp
    views) before composing the main body over them.

    Why: Spark inlines deterministic CTEs, so a CTE the main body
    references k times is planned and EXECUTED k times (guide §2.4 —
    remove repeated passes; §5 — materialise a reused subtree). q14a/q14b
    recompute the cross_items three-channel INTERSECT and the avg_sales
    tri-union scan once per channel; q64 runs the cs_ui
    catalog-returns aggregate once per cross_sales copy. Values are
    unchanged by construction: each shared CTE's text runs verbatim over
    the same star views, and the main body runs verbatim over views
    holding those results; the DuckDB oracle keeps the single inline
    text. Materialization is per-call (inside the timed region, no
    cross-run reuse) and localCheckpoint for the same cache-manager
    sameResult reason documented at _ensure_star."""
    ctes, main = _split_with_ctes(qtext)
    unknown = set(shared) - {name for name, _ in ctes}
    if unknown:
        raise ValueError(f"{qname}: shared CTEs not in text: {unknown}")
    sql_only = re.sub(r"--[^\n]*", "", qtext)
    needed = tuple(t for t in _STAR_TABLES_EXT
                   if re.search(rf"\b{t}\b", sql_only))
    base_alias = [f"{name} AS (SELECT * FROM tpcds_star_{name})"
                  for name in _STAR_TABLES + needed]

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_star_ext(spark, sf_dir, needed)
        alias = list(base_alias)
        i = 0
        while i < len(ctes):
            name, body = ctes[i]
            if name not in shared:
                alias.append(f"{name} AS ({body})")
                i += 1
                continue
            # Maximal run of consecutive shared CTEs with no intra-run
            # references: their checkpoint jobs are independent, so they
            # run concurrently from a thread pool (guide §2.6 — q14a/b's
            # cross_items and avg_sales overlap; q64's cross_sales
            # references cs_ui and stays sequential).
            level = [(name, body)]
            j = i + 1
            while j < len(ctes):
                nm, bd = ctes[j]
                if nm not in shared or any(
                        re.search(rf"\b{n}\b", bd) for n, _ in level):
                    break
                level.append((nm, bd))
                j += 1
            prefix = "WITH " + ",\n".join(alias)
            dfs = [(nm, spark.sql(f"{prefix} {bd}")) for nm, bd in level]
            if len(dfs) == 1:
                mats = [(dfs[0][0], dfs[0][1].localCheckpoint(eager=True))]
            else:
                with ThreadPoolExecutor(max_workers=len(dfs)) as pool:
                    futs = [(nm, pool.submit(df.localCheckpoint, True))
                            for nm, df in dfs]
                    mats = [(nm, fut.result()) for nm, fut in futs]
            for nm, df in mats:
                view = f"tpcds_cte_{qname}_{nm}"
                df.createOrReplaceTempView(view)
                alias.append(f"{nm} AS (SELECT * FROM {view})")
            i = j
        return spark.sql("WITH " + ",\n".join(alias) + " " + main)

    return run


# The r9 FLIP (ROADMAP's committed schedule): every formerly-staged
# literal text — the 8 multi-part a/b pairs plus waves 2-8 from
# tpcds_literal_staged2.py — joins the graded surface. Base-star texts
# run via _runner; texts over the lazily-materialized ext tables run via
# _runner_ext. The STAGED_* aliases remain for the pytest suites that
# exercise this family at all three SFs.
from flink_release_1_14_5_comment_spark.operators.tpcds_literal_staged2 import (  # noqa: E402
    TEXTS as _STAGED2,
)

_STAGED_ALL = {**_STAGED, **_STAGED2}

# Texts whose leading CTEs the main body references more than once — Spark
# inlines (re-executes) them per reference; the _runner_shared runner
# materializes each once per call (r10 optimization; A/B evidence in
# OPTIMIZATION_r10.md, plan diff in plans/r10/). Membership is measured,
# not inferred: a 23-candidate A/B (every repeated-CTE literal text)
# showed most candidates LOSE from materialization because Catalyst
# pushes each reference's filters into its inline copy (q4/q11's
# year_total year-slices, q39's inv month-slices, q95's ws_wh) — only
# texts whose repeated CTE is reused UNFILTERED from multiple references
# win: q14a/b cross_items+avg_sales, q64 cs_ui+cross_sales, q24a/b
# ssales (-25/-34%), q47/q57 v1 lag/lead self-join (-17/-13%).
_SHARED_CTES = {
    "tpcds_lit_q14a": ("cross_items", "avg_sales"),
    "tpcds_lit_q14b": ("cross_items", "avg_sales"),
    "tpcds_lit_q64": ("cs_ui", "cross_sales"),
    "tpcds_lit_q24a": ("ssales",),
    "tpcds_lit_q24b": ("ssales",),
    "tpcds_lit_q47": ("v1",),
    "tpcds_lit_q57": ("v1",),
}

QUERIES = {name: _runner(text) for name, text in _LITERAL.items()}
QUERIES.update({name: _runner_ext(text) for name, text in _STAGED_ALL.items()})
_ALL_TEXTS = {**_LITERAL, **_STAGED_ALL}
QUERIES.update({name: _runner_shared(name, _ALL_TEXTS[name], shared)
                for name, shared in _SHARED_CTES.items()})

ORACLE = {name: _compose(_DUCK_CTES, text)
          for name, text in {**_LITERAL, **_STAGED_ALL}.items()}

STAGED_QUERIES = {name: _runner_ext(text) for name, text in _STAGED_ALL.items()}
STAGED_QUERIES.update({name: QUERIES[name] for name in _SHARED_CTES
                       if name in _STAGED_ALL})

STAGED_ORACLE = {name: _compose(_DUCK_CTES, text) for name, text in _STAGED_ALL.items()}
