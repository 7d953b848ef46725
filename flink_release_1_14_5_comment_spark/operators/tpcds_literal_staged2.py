"""Literal TPC-DS batch 5, waves 2-8 (STAGED): the remaining 70 of the
reference's verbatim query texts (tpcds-tool/query/queryN.sql — the gate
list at flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:
76-87), completing ALL 103 texts together with the 33 graded ones.

PROVENANCE: these are the public TPC-DS benchmark query corpus as shipped
in the reference's tpcds-tool — running the reference's own literal gate
IS the parity target, so the texts are embedded near-verbatim with every
adaptation documented per query (the round-7 review adjudicated the same
embedding for the first 28 texts: benchmark corpus, not implementation
code). Wave 2 was unlocked by the round-8 star-schema additions
(store_returns, inventory, d_week_seq/d_quarter_name,
ss_ext_discount_amt, cs_net_profit):

* returns-family: q1 (per-store return concentration, correlated avg),
  q17/q25/q29 (the sale→return→catalog-repurchase triple-fact chain —
  non-degenerate because every catalog line is also a store line, so a
  returned catalog-slice line matches its own catalog copy on
  (customer, item))
* inventory-family: q21 (before/after ratio around a date), q22 (4-level
  ROLLUP of quantity-on-hand), q37/q82 (price-band items with bounded
  stock, semi-joined to a sales channel)
* week/day-grain: q2 (day-name pivot ratios week-over-year on d_week_seq),
  q9 (reason-anchored bucket census with correlated scalar subqueries)
* census shapes: q27 (2-level ROLLUP by state), q34 (order-size band per
  ticket), q38 (3-channel INTERSECT count), q87 (3-channel EXCEPT count)

Pure data module: query texts only — the runner/oracle wiring lives in
tpcds_literal.py (STAGED_QUERIES/STAGED_ORACLE), the verification in
tests/test_tpcds_literal_staged.py. Adaptations follow the suite standard
(documented per query): money at aggregate boundaries, float aggregates
rounded to 4dp, selectivity constants retargeted into the synthetic
domains, NULLS FIRST where ROLLUP output meets a LIMIT cut.
"""

from __future__ import annotations

# query1.sql — verbatim (constants all valid: d_year 2000, s_state 'TN').
_Q1 = """
with customer_total_return as
(select sr_customer_sk as ctr_customer_sk
,sr_store_sk as ctr_store_sk
,sum(sr_return_amt) as ctr_total_return
from store_returns
,date_dim
where sr_returned_date_sk = d_date_sk
and d_year = 2000
group by sr_customer_sk
,sr_store_sk)
 select  c_customer_id
from customer_total_return ctr1
,store
,customer
where ctr1.ctr_total_return > (select cast(sum(ctr_total_return) as double)*1.2 / count(ctr_total_return)
from customer_total_return ctr2
where ctr1.ctr_store_sk = ctr2.ctr_store_sk)
and s_store_sk = ctr1.ctr_store_sk
and s_state = 'TN'
and ctr1.ctr_customer_sk = c_customer_sk
order by c_customer_id
limit 100
"""

# query2.sql — d_year 2001/2002 → 2000/2001 (sales dates end 2001-08, so
# the 2002 side was empty); ratio columns aliased (the reference leaves
# them unnamed); the wscs UNION subquery gets an alias. Ratios divide two
# exact cent sums, so rounding is cross-engine stable.
_Q2 = """
with wscs as
 (select sold_date_sk
        ,sales_price
  from (select ws_sold_date_sk sold_date_sk
              ,ws_ext_sales_price sales_price
        from web_sales
        union all
        select cs_sold_date_sk sold_date_sk
              ,cs_ext_sales_price sales_price
        from catalog_sales) u),
 wswscs as
 (select d_week_seq,
        sum(case when (d_day_name='Sunday') then sales_price else null end) sun_sales,
        sum(case when (d_day_name='Monday') then sales_price else null end) mon_sales,
        sum(case when (d_day_name='Tuesday') then sales_price else  null end) tue_sales,
        sum(case when (d_day_name='Wednesday') then sales_price else null end) wed_sales,
        sum(case when (d_day_name='Thursday') then sales_price else null end) thu_sales,
        sum(case when (d_day_name='Friday') then sales_price else null end) fri_sales,
        sum(case when (d_day_name='Saturday') then sales_price else null end) sat_sales
 from wscs
     ,date_dim
 where d_date_sk = sold_date_sk
 group by d_week_seq)
 select d_week_seq1
       ,round(sun_sales1/sun_sales2,2) sun_ratio
       ,round(mon_sales1/mon_sales2,2) mon_ratio
       ,round(tue_sales1/tue_sales2,2) tue_ratio
       ,round(wed_sales1/wed_sales2,2) wed_ratio
       ,round(thu_sales1/thu_sales2,2) thu_ratio
       ,round(fri_sales1/fri_sales2,2) fri_ratio
       ,round(sat_sales1/sat_sales2,2) sat_ratio
 from
 (select wswscs.d_week_seq d_week_seq1
        ,sun_sales sun_sales1
        ,mon_sales mon_sales1
        ,tue_sales tue_sales1
        ,wed_sales wed_sales1
        ,thu_sales thu_sales1
        ,fri_sales fri_sales1
        ,sat_sales sat_sales1
  from wswscs,date_dim
  where date_dim.d_week_seq = wswscs.d_week_seq and
        d_year = 2000) y,
 (select wswscs.d_week_seq d_week_seq2
        ,sun_sales sun_sales2
        ,mon_sales mon_sales2
        ,tue_sales tue_sales2
        ,wed_sales wed_sales2
        ,thu_sales thu_sales2
        ,fri_sales fri_sales2
        ,sat_sales sat_sales2
  from wswscs
      ,date_dim
  where date_dim.d_week_seq = wswscs.d_week_seq and
        d_year = 2000+1) z
 where d_week_seq1=d_week_seq2-53
 order by d_week_seq1
"""

# query9.sql — quantity bands retargeted to the synthetic 1..50 range
# (the reference's 61-80/81-100 bands are empty by construction) and the
# row-count thresholds scaled so different SFs exercise BOTH branches of
# the CASE; averages of integer cents, rounded at the dollar boundary.
_Q9 = """
select case when (select count(*)
                  from store_sales
                  where ss_quantity between 1 and 10) > 5000
            then (select round(avg(ss_ext_discount_amt) / 100, 4)
                  from store_sales
                  where ss_quantity between 1 and 10)
            else (select round(avg(ss_net_paid) / 100, 4)
                  from store_sales
                  where ss_quantity between 1 and 10) end bucket1 ,
       case when (select count(*)
                  from store_sales
                  where ss_quantity between 11 and 20) > 50000
            then (select round(avg(ss_ext_discount_amt) / 100, 4)
                  from store_sales
                  where ss_quantity between 11 and 20)
            else (select round(avg(ss_net_paid) / 100, 4)
                  from store_sales
                  where ss_quantity between 11 and 20) end bucket2,
       case when (select count(*)
                  from store_sales
                  where ss_quantity between 21 and 30) > 2000
            then (select round(avg(ss_ext_discount_amt) / 100, 4)
                  from store_sales
                  where ss_quantity between 21 and 30)
            else (select round(avg(ss_net_paid) / 100, 4)
                  from store_sales
                  where ss_quantity between 21 and 30) end bucket3,
       case when (select count(*)
                  from store_sales
                  where ss_quantity between 31 and 40) > 500000
            then (select round(avg(ss_ext_discount_amt) / 100, 4)
                  from store_sales
                  where ss_quantity between 31 and 40)
            else (select round(avg(ss_net_paid) / 100, 4)
                  from store_sales
                  where ss_quantity between 31 and 40) end bucket4,
       case when (select count(*)
                  from store_sales
                  where ss_quantity between 41 and 50) > 1000
            then (select round(avg(ss_ext_discount_amt) / 100, 4)
                  from store_sales
                  where ss_quantity between 41 and 50)
            else (select round(avg(ss_net_paid) / 100, 4)
                  from store_sales
                  where ss_quantity between 41 and 50) end bucket5
from reason
where r_reason_sk = 1
"""

# query17.sql — verbatim constants (2001 quarters exist). r9 float
# hardening: avg/stddev_samp over INT quantities -> exact integer
# moments (sum, sum-of-squares, count) with single correctly-rounded
# divisions/sqrt, so the 4dp-rounded outputs are bit-identical in any
# engine build (engine-internal Welford/AVG merges are not — the q47
# lesson).
_Q17 = """
select  i_item_id
       ,i_item_desc
       ,s_state
       ,count(ss_quantity) as store_sales_quantitycount
       ,round(sum(ss_quantity) / cast(count(ss_quantity) as double), 4) as store_sales_quantityave
       ,round(case when count(ss_quantity) > 1 then sqrt(
            (count(ss_quantity) * sum(ss_quantity * ss_quantity) - sum(ss_quantity) * sum(ss_quantity))
            / cast(count(ss_quantity) * (count(ss_quantity) - 1) as double)) else null end, 4) as store_sales_quantitystdev
       ,round(case when count(ss_quantity) > 1 then sqrt(
            (count(ss_quantity) * sum(ss_quantity * ss_quantity) - sum(ss_quantity) * sum(ss_quantity))
            / cast(count(ss_quantity) * (count(ss_quantity) - 1) as double)) else null end
            / (sum(ss_quantity) / cast(count(ss_quantity) as double)), 4) as store_sales_quantitycov
       ,count(sr_return_quantity) as store_returns_quantitycount
       ,round(sum(sr_return_quantity) / cast(count(sr_return_quantity) as double), 4) as store_returns_quantityave
       ,round(case when count(sr_return_quantity) > 1 then sqrt(
            (count(sr_return_quantity) * sum(sr_return_quantity * sr_return_quantity) - sum(sr_return_quantity) * sum(sr_return_quantity))
            / cast(count(sr_return_quantity) * (count(sr_return_quantity) - 1) as double)) else null end, 4) as store_returns_quantitystdev
       ,round(case when count(sr_return_quantity) > 1 then sqrt(
            (count(sr_return_quantity) * sum(sr_return_quantity * sr_return_quantity) - sum(sr_return_quantity) * sum(sr_return_quantity))
            / cast(count(sr_return_quantity) * (count(sr_return_quantity) - 1) as double)) else null end
            / (sum(sr_return_quantity) / cast(count(sr_return_quantity) as double)), 4) as store_returns_quantitycov
       ,count(cs_quantity) as catalog_sales_quantitycount
       ,round(sum(cs_quantity) / cast(count(cs_quantity) as double), 4) as catalog_sales_quantityave
       ,round(case when count(cs_quantity) > 1 then sqrt(
            (count(cs_quantity) * sum(cs_quantity * cs_quantity) - sum(cs_quantity) * sum(cs_quantity))
            / cast(count(cs_quantity) * (count(cs_quantity) - 1) as double)) else null end, 4) as catalog_sales_quantitystdev
       ,round(case when count(cs_quantity) > 1 then sqrt(
            (count(cs_quantity) * sum(cs_quantity * cs_quantity) - sum(cs_quantity) * sum(cs_quantity))
            / cast(count(cs_quantity) * (count(cs_quantity) - 1) as double)) else null end
            / (sum(cs_quantity) / cast(count(cs_quantity) as double)), 4) as catalog_sales_quantitycov
 from store_sales
     ,store_returns
     ,catalog_sales
     ,date_dim d1
     ,date_dim d2
     ,date_dim d3
     ,store
     ,item
 where d1.d_quarter_name = '2001Q1'
   and d1.d_date_sk = ss_sold_date_sk
   and i_item_sk = ss_item_sk
   and s_store_sk = ss_store_sk
   and ss_customer_sk = sr_customer_sk
   and ss_item_sk = sr_item_sk
   and ss_ticket_number = sr_ticket_number
   and sr_returned_date_sk = d2.d_date_sk
   and d2.d_quarter_name in ('2001Q1','2001Q2','2001Q3')
   and sr_customer_sk = cs_bill_customer_sk
   and sr_item_sk = cs_item_sk
   and cs_sold_date_sk = d3.d_date_sk
   and d3.d_quarter_name in ('2001Q1','2001Q2','2001Q3')
 group by i_item_id
         ,i_item_desc
         ,s_state
 order by i_item_id
         ,i_item_desc
         ,s_state
limit 100
"""

# query21.sql — i_current_price 0.99..1.49 → 900..930 (synthetic retail
# prices span 900..1000); decimal(7,2) ratio casts → double (q7's
# standard — the 2/3 and 3/2 band edges are identical double literals in
# both engines).
_Q21 = """
select  *
 from(select w_warehouse_name
            ,i_item_id
            ,cast(sum(case when (cast(d_date as date) < cast ('2000-03-11' as date))
	                then inv_quantity_on_hand
                      else 0 end) as bigint) as inv_before
            ,cast(sum(case when (cast(d_date as date) >= cast ('2000-03-11' as date))
                      then inv_quantity_on_hand
                      else 0 end) as bigint) as inv_after
            -- ^ r10: uncast SUM(integer) -> DuckDB HUGEINT -> float64 vs
            -- Spark bigint; the driver hash is dtype-sensitive (r9 reds)
   from inventory
       ,warehouse
       ,item
       ,date_dim
   where i_current_price between 900 and 930
     and i_item_sk          = inv_item_sk
     and inv_warehouse_sk   = w_warehouse_sk
     and inv_date_sk    = d_date_sk
     and d_date between (cast ('2000-03-11' as date) - INTERVAL '30' day)
                    and (cast ('2000-03-11' as date) + INTERVAL '30' day)
   group by w_warehouse_name, i_item_id) x
 where (case when inv_before > 0
             then cast(inv_after as double) / cast(inv_before as double)
             else null
             end) between 2.0/3.0 and 3.0/2.0
 order by w_warehouse_name
         ,i_item_id
 limit 100
"""

# query22.sql — d_month_seq 1200..1211 → 61..72 (the q65 convention:
# synthetic month_seq counts from 1995-01, so 61..72 = year 2000); qoh
# rounded to 4dp; ORDER BY gets NULLS FIRST (4-level ROLLUP output
# exceeds the LIMIT and the engines' NULL-order defaults differ).
_Q22 = """
select  i_product_name
             ,i_brand
             ,i_class
             ,i_category
             ,round(avg(cast(inv_quantity_on_hand as double)), 4) qoh
       from inventory
           ,date_dim
           ,item
       where inv_date_sk=d_date_sk
              and inv_item_sk=i_item_sk
              and d_month_seq between 61 and 61 + 11
       group by rollup(i_product_name
                       ,i_brand
                       ,i_class
                       ,i_category)
order by qoh nulls first, i_product_name nulls first, i_brand nulls first,
         i_class nulls first, i_category nulls first
limit 100
"""

# query25.sql — verbatim constants (April 2001 exists); profit/loss sums
# at the dollar boundary.
_Q25 = """
select
 i_item_id
 ,i_item_desc
 ,s_store_id
 ,s_store_name
 ,round(sum(ss_net_profit) / 100, 2) as store_sales_profit
 ,round(sum(sr_net_loss) / 100, 2) as store_returns_loss
 ,round(sum(cs_net_profit) / 100, 2) as catalog_sales_profit
 from
 store_sales
 ,store_returns
 ,catalog_sales
 ,date_dim d1
 ,date_dim d2
 ,date_dim d3
 ,store
 ,item
 where
 d1.d_moy = 4
 and d1.d_year = 2001
 and d1.d_date_sk = ss_sold_date_sk
 and i_item_sk = ss_item_sk
 and s_store_sk = ss_store_sk
 and ss_customer_sk = sr_customer_sk
 and ss_item_sk = sr_item_sk
 and ss_ticket_number = sr_ticket_number
 and sr_returned_date_sk = d2.d_date_sk
 and d2.d_moy               between 4 and  10
 and d2.d_year              = 2001
 and sr_customer_sk = cs_bill_customer_sk
 and sr_item_sk = cs_item_sk
 and cs_sold_date_sk = d3.d_date_sk
 and d3.d_moy               between 4 and  10
 and d3.d_year              = 2001
 group by
 i_item_id
 ,i_item_desc
 ,s_store_id
 ,s_store_name
 order by
 i_item_id
 ,i_item_desc
 ,s_store_id
 ,s_store_name
 limit 100
"""

# query27.sql — d_year 2002 → 1996 (order dates end 2001-08, and the
# 1/70-demographic × TN-store slice is empty at sf0.001 for 2001 — an
# empty ROLLUP input is the q80 engine-divergence trap); averages
# rounded (q7's standard, cents at the dollar boundary); NULLS FIRST on
# the ROLLUP order keys.
_Q27 = """
select  i_item_id,
        s_state, grouping(s_state) g_state,
        round(avg(cast(ss_quantity as double)), 4) agg1,
        round(avg(ss_list_price) / 100, 4) agg2,
        round(avg(ss_coupon_amt) / 100, 4) agg3,
        round(avg(ss_sales_price) / 100, 4) agg4
 from store_sales, customer_demographics, date_dim, store, item
 where ss_sold_date_sk = d_date_sk and
       ss_item_sk = i_item_sk and
       ss_store_sk = s_store_sk and
       ss_cdemo_sk = cd_demo_sk and
       cd_gender = 'M' and
       cd_marital_status = 'S' and
       cd_education_status = 'College' and
       d_year = 1996 and
       s_state in ('TN','TN', 'TN', 'TN', 'TN', 'TN')
 group by rollup (i_item_id, s_state)
 order by i_item_id nulls first
         ,s_state nulls first
 limit 100
"""

# query29.sql — verbatim (quantity sums are exact integers, no rounding).
_Q29 = """
select
     i_item_id
    ,i_item_desc
    ,s_store_id
    ,s_store_name
    ,cast(sum(ss_quantity) as bigint)        as store_sales_quantity
    ,cast(sum(sr_return_quantity) as bigint) as store_returns_quantity
    ,cast(sum(cs_quantity) as bigint)        as catalog_sales_quantity
    -- ^ r10: driver-hash dtype class (DuckDB HUGEINT sums -> float64)
 from
    store_sales
   ,store_returns
   ,catalog_sales
   ,date_dim             d1
   ,date_dim             d2
   ,date_dim             d3
   ,store
   ,item
 where
     d1.d_moy               = 9
 and d1.d_year              = 1999
 and d1.d_date_sk           = ss_sold_date_sk
 and i_item_sk              = ss_item_sk
 and s_store_sk             = ss_store_sk
 and ss_customer_sk         = sr_customer_sk
 and ss_item_sk             = sr_item_sk
 and ss_ticket_number       = sr_ticket_number
 and sr_returned_date_sk    = d2.d_date_sk
 and d2.d_moy               between 9 and  9 + 3
 and d2.d_year              = 1999
 and sr_customer_sk         = cs_bill_customer_sk
 and sr_item_sk             = cs_item_sk
 and cs_sold_date_sk        = d3.d_date_sk
 and d3.d_year              in (1999,1999+1,1999+2)
 group by
    i_item_id
   ,i_item_desc
   ,s_store_id
   ,s_store_name
 order by
    i_item_id
   ,i_item_desc
   ,s_store_id
   ,s_store_name
 limit 100
"""

# query34.sql — cnt 15..20 → 2..7 (a synthetic ticket tops out at 7 lines,
# and only ~1/4 land in Williamson County stores — the same order-size
# retarget the adapted q34 shape uses).
_Q34 = """
select c_last_name
       ,c_first_name
       ,c_salutation
       ,c_preferred_cust_flag
       ,ss_ticket_number
       ,cnt from
   (select ss_ticket_number
          ,ss_customer_sk
          ,count(*) cnt
    from store_sales,date_dim,store,household_demographics
    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
    and store_sales.ss_store_sk = store.s_store_sk
    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    and (date_dim.d_dom between 1 and 3 or date_dim.d_dom between 25 and 28)
    and (household_demographics.hd_buy_potential = '>10000' or
         household_demographics.hd_buy_potential = 'Unknown')
    and household_demographics.hd_vehicle_count > 0
    and (case when household_demographics.hd_vehicle_count > 0
	then cast(household_demographics.hd_dep_count as double)/ cast(household_demographics.hd_vehicle_count as double)
	else null
	end)  > 1.2
    and date_dim.d_year in (1999,1999+1,1999+2)
    and store.s_county in ('Williamson County','Williamson County','Williamson County','Williamson County',
                           'Williamson County','Williamson County','Williamson County','Williamson County')
    group by ss_ticket_number,ss_customer_sk) dn,customer
    where ss_customer_sk = c_customer_sk
      and cnt between 2 and 7
    order by c_last_name,c_first_name,c_salutation,c_preferred_cust_flag desc, ss_ticket_number
"""

# query37.sql — i_current_price 68..98 → 940..970, i_manufact_id
# (677,940,694,808) → (7,9,19,23) (synthetic 1..25); inventory band kept.
_Q37 = """
select  i_item_id
       ,i_item_desc
       ,i_current_price
 from item, inventory, date_dim, catalog_sales
 where i_current_price between 940 and 940 + 30
 and inv_item_sk = i_item_sk
 and d_date_sk=inv_date_sk
 and d_date between cast('2000-02-01' as date) and (cast('2000-02-01' as date) +  INTERVAL '60' day)
 and i_manufact_id in (7,9,19,23)
 and inv_quantity_on_hand between 100 and 500
 and cs_item_sk = i_item_sk
 group by i_item_id,i_item_desc,i_current_price
 order by i_item_id
 limit 100
"""

# query38.sql — d_month_seq 1200..1211 → 61..72; the count aliased.
_Q38 = """
select  count(*) num_hot_cust from (
    select distinct c_last_name, c_first_name, d_date
    from store_sales, date_dim, customer
          where store_sales.ss_sold_date_sk = date_dim.d_date_sk
      and store_sales.ss_customer_sk = customer.c_customer_sk
      and d_month_seq between 61 and 61 + 11
  intersect
    select distinct c_last_name, c_first_name, d_date
    from catalog_sales, date_dim, customer
          where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
      and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
      and d_month_seq between 61 and 61 + 11
  intersect
    select distinct c_last_name, c_first_name, d_date
    from web_sales, date_dim, customer
          where web_sales.ws_sold_date_sk = date_dim.d_date_sk
      and web_sales.ws_bill_customer_sk = customer.c_customer_sk
      and d_month_seq between 61 and 61 + 11
) hot_cust
limit 100
"""

# query82.sql — i_current_price 62..92 → 920..950, i_manufact_id
# (129,270,821,423) → (3,5,14,22).
_Q82 = """
select  i_item_id
       ,i_item_desc
       ,i_current_price
 from item, inventory, date_dim, store_sales
 where i_current_price between 920 and 920+30
 and inv_item_sk = i_item_sk
 and d_date_sk=inv_date_sk
 and d_date between cast('2000-05-25' as date) and (cast('2000-05-25' as date) + INTERVAL '60' day)
 and i_manufact_id in (3, 5, 14, 22)
 and inv_quantity_on_hand between 100 and 500
 and ss_item_sk = i_item_sk
 group by i_item_id,i_item_desc,i_current_price
 order by i_item_id
 limit 100
"""

# query87.sql — d_month_seq 1200..1211 → 61..72; the count aliased.
_Q87 = """
select count(*) num_cool_cust
from ((select distinct c_last_name, c_first_name, d_date
       from store_sales, date_dim, customer
       where store_sales.ss_sold_date_sk = date_dim.d_date_sk
         and store_sales.ss_customer_sk = customer.c_customer_sk
         and d_month_seq between 61 and 61+11)
       except
      (select distinct c_last_name, c_first_name, d_date
       from catalog_sales, date_dim, customer
       where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
         and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
         and d_month_seq between 61 and 61+11)
       except
      (select distinct c_last_name, c_first_name, d_date
       from web_sales, date_dim, customer
       where web_sales.ws_sold_date_sk = date_dim.d_date_sk
         and web_sales.ws_bill_customer_sk = customer.c_customer_sk
         and d_month_seq between 61 and 61+11)
) cool_cust
"""

# ---- wave 3: no new tables needed --------------------------------------

# query28.sql — six quantity-band bucket scans with avg / count / count
# distinct of list price. Bands retargeted into the synthetic cents
# domains (list ~45k-970k, coupon ~11k-310k, wholesale ~36k-776k cents);
# averages rounded at the dollar boundary.
_Q28 = """
select  *
from (select round(avg(ss_list_price) / 100, 4) B1_LP
            ,count(ss_list_price) B1_CNT
            ,count(distinct ss_list_price) B1_CNTD
      from store_sales
      where ss_quantity between 0 and 5
        and (ss_list_price between 180000 and 180000+60000
             or ss_coupon_amt between 80000 and 80000+40000
             or ss_wholesale_cost between 140000 and 140000+60000)) B1,
     (select round(avg(ss_list_price) / 100, 4) B2_LP
            ,count(ss_list_price) B2_CNT
            ,count(distinct ss_list_price) B2_CNTD
      from store_sales
      where ss_quantity between 6 and 10
        and (ss_list_price between 90000 and 90000+60000
          or ss_coupon_amt between 50000 and 50000+40000
          or ss_wholesale_cost between 80000 and 80000+60000)) B2,
     (select round(avg(ss_list_price) / 100, 4) B3_LP
            ,count(ss_list_price) B3_CNT
            ,count(distinct ss_list_price) B3_CNTD
      from store_sales
      where ss_quantity between 11 and 15
        and (ss_list_price between 140000 and 140000+60000
          or ss_coupon_amt between 120000 and 120000+40000
          or ss_wholesale_cost between 170000 and 170000+60000)) B3,
     (select round(avg(ss_list_price) / 100, 4) B4_LP
            ,count(ss_list_price) B4_CNT
            ,count(distinct ss_list_price) B4_CNTD
      from store_sales
      where ss_quantity between 16 and 20
        and (ss_list_price between 130000 and 130000+60000
          or ss_coupon_amt between 60000 and 60000+40000
          or ss_wholesale_cost between 110000 and 110000+60000)) B4,
     (select round(avg(ss_list_price) / 100, 4) B5_LP
            ,count(ss_list_price) B5_CNT
            ,count(distinct ss_list_price) B5_CNTD
      from store_sales
      where ss_quantity between 21 and 25
        and (ss_list_price between 120000 and 120000+60000
          or ss_coupon_amt between 85000 and 85000+40000
          or ss_wholesale_cost between 95000 and 95000+60000)) B5,
     (select round(avg(ss_list_price) / 100, 4) B6_LP
            ,count(ss_list_price) B6_CNT
            ,count(distinct ss_list_price) B6_CNTD
      from store_sales
      where ss_quantity between 26 and 30
        and (ss_list_price between 150000 and 150000+60000
          or ss_coupon_amt between 70000 and 70000+40000
          or ss_wholesale_cost between 75000 and 75000+60000)) B6
limit 100
"""

# query56.sql — three-channel color-sliced UNION ALL at gmt -5.
# i_color ('slate','blanched','burnished') → ('col_1','col_2','col_3');
# the outer sum rounded at the dollar boundary (inner CTEs stay in cents
# so the rounding happens once).
_Q56 = """
with ss as (
 select i_item_id,sum(ss_ext_sales_price) total_sales
 from
 	store_sales,
 	date_dim,
         customer_address,
         item
 where i_item_id in (select
     i_item_id
from item
where i_color in ('col_1','col_2','col_3'))
 and     ss_item_sk              = i_item_sk
 and     ss_sold_date_sk         = d_date_sk
 and     d_year                  = 2001
 and     d_moy                   = 2
 and     ss_addr_sk              = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id),
 cs as (
 select i_item_id,sum(cs_ext_sales_price) total_sales
 from
 	catalog_sales,
 	date_dim,
         customer_address,
         item
 where
         i_item_id               in (select
  i_item_id
from item
where i_color in ('col_1','col_2','col_3'))
 and     cs_item_sk              = i_item_sk
 and     cs_sold_date_sk         = d_date_sk
 and     d_year                  = 2001
 and     d_moy                   = 2
 and     cs_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id),
 ws as (
 select i_item_id,sum(ws_ext_sales_price) total_sales
 from
 	web_sales,
 	date_dim,
         customer_address,
         item
 where
         i_item_id               in (select
  i_item_id
from item
where i_color in ('col_1','col_2','col_3'))
 and     ws_item_sk              = i_item_sk
 and     ws_sold_date_sk         = d_date_sk
 and     d_year                  = 2001
 and     d_moy                   = 2
 and     ws_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id)
  select  i_item_id ,round(sum(total_sales) / 100, 2) total_sales
 from  (select * from ss
        union all
        select * from cs
        union all
        select * from ws) tmp1
 group by i_item_id
 order by total_sales,
          i_item_id
 limit 100
"""

# query58.sql — same-week revenue balance across the three channels
# (nested scalar subquery resolving a date to its week). The anchor date
# 2000-01-03 exists at every SF; the ±10% balance band → (0.3x, 3x) (the
# catalog/web channels are disjoint 1/3 order slices, so an item selling
# in all three channels in ONE week is already rare — ±10% never fires at
# any SF); deviation ratios rounded to 4dp, the average at the dollar
# boundary. Empty at sf0.001 (q8's documented precedent).
_Q58 = """
with ss_items as
 (select i_item_id item_id
        ,sum(ss_ext_sales_price) ss_item_rev
 from store_sales
     ,item
     ,date_dim
 where ss_item_sk = i_item_sk
   and d_date in (select d_date
                  from date_dim
                  where d_week_seq = (select d_week_seq
                                      from date_dim
                                      where d_date = '2000-01-03'))
   and ss_sold_date_sk   = d_date_sk
 group by i_item_id),
 cs_items as
 (select i_item_id item_id
        ,sum(cs_ext_sales_price) cs_item_rev
  from catalog_sales
      ,item
      ,date_dim
 where cs_item_sk = i_item_sk
  and  d_date in (select d_date
                  from date_dim
                  where d_week_seq = (select d_week_seq
                                      from date_dim
                                      where d_date = '2000-01-03'))
  and  cs_sold_date_sk = d_date_sk
 group by i_item_id),
 ws_items as
 (select i_item_id item_id
        ,sum(ws_ext_sales_price) ws_item_rev
  from web_sales
      ,item
      ,date_dim
 where ws_item_sk = i_item_sk
  and  d_date in (select d_date
                  from date_dim
                  where d_week_seq =(select d_week_seq
                                     from date_dim
                                     where d_date = '2000-01-03'))
  and ws_sold_date_sk   = d_date_sk
 group by i_item_id)
  select  ss_items.item_id
       ,round(ss_item_rev / 100, 2) ss_item_rev
       ,round(ss_item_rev/((ss_item_rev+cs_item_rev+ws_item_rev)/3) * 100, 4) ss_dev
       ,round(cs_item_rev / 100, 2) cs_item_rev
       ,round(cs_item_rev/((ss_item_rev+cs_item_rev+ws_item_rev)/3) * 100, 4) cs_dev
       ,round(ws_item_rev / 100, 2) ws_item_rev
       ,round(ws_item_rev/((ss_item_rev+cs_item_rev+ws_item_rev)/3) * 100, 4) ws_dev
       ,round((ss_item_rev+cs_item_rev+ws_item_rev)/3 / 100, 2) average
 from ss_items,cs_items,ws_items
 where ss_items.item_id=cs_items.item_id
   and ss_items.item_id=ws_items.item_id
   and ss_item_rev between 0.3 * cs_item_rev and 3.0 * cs_item_rev
   and ss_item_rev between 0.3 * ws_item_rev and 3.0 * ws_item_rev
   and cs_item_rev between 0.3 * ss_item_rev and 3.0 * ss_item_rev
   and cs_item_rev between 0.3 * ws_item_rev and 3.0 * ws_item_rev
   and ws_item_rev between 0.3 * ss_item_rev and 3.0 * ss_item_rev
   and ws_item_rev between 0.3 * cs_item_rev and 3.0 * cs_item_rev
 order by ss_items.item_id
         ,ss_item_rev
 limit 100
"""

# query59.sql — store day-name sums week-over-year on d_week_seq.
# d_month_seq 1212..1223/1224..1235 → 61..72/73..84 (years 2000/2001);
# ratio columns aliased and rounded (exact cent sums divide
# deterministically).
_Q59 = """
with wss as
 (select d_week_seq,
        ss_store_sk,
        sum(case when (d_day_name='Sunday') then ss_sales_price else null end) sun_sales,
        sum(case when (d_day_name='Monday') then ss_sales_price else null end) mon_sales,
        sum(case when (d_day_name='Tuesday') then ss_sales_price else  null end) tue_sales,
        sum(case when (d_day_name='Wednesday') then ss_sales_price else null end) wed_sales,
        sum(case when (d_day_name='Thursday') then ss_sales_price else null end) thu_sales,
        sum(case when (d_day_name='Friday') then ss_sales_price else null end) fri_sales,
        sum(case when (d_day_name='Saturday') then ss_sales_price else null end) sat_sales
 from store_sales,date_dim
 where d_date_sk = ss_sold_date_sk
 group by d_week_seq,ss_store_sk
 )
  select  s_store_name1,s_store_id1,d_week_seq1
       ,round(sun_sales1/sun_sales2, 4) sun_ratio
       ,round(mon_sales1/mon_sales2, 4) mon_ratio
       ,round(tue_sales1/tue_sales2, 4) tue_ratio
       ,round(wed_sales1/wed_sales2, 4) wed_ratio
       ,round(thu_sales1/thu_sales2, 4) thu_ratio
       ,round(fri_sales1/fri_sales2, 4) fri_ratio
       ,round(sat_sales1/sat_sales2, 4) sat_ratio
 from
 (select s_store_name s_store_name1,wss.d_week_seq d_week_seq1
        ,s_store_id s_store_id1,sun_sales sun_sales1
        ,mon_sales mon_sales1,tue_sales tue_sales1
        ,wed_sales wed_sales1,thu_sales thu_sales1
        ,fri_sales fri_sales1,sat_sales sat_sales1
  from wss,store,date_dim d
  where d.d_week_seq = wss.d_week_seq and
        ss_store_sk = s_store_sk and
        d_month_seq between 61 and 61 + 11) y,
 (select s_store_name s_store_name2,wss.d_week_seq d_week_seq2
        ,s_store_id s_store_id2,sun_sales sun_sales2
        ,mon_sales mon_sales2,tue_sales tue_sales2
        ,wed_sales wed_sales2,thu_sales thu_sales2
        ,fri_sales fri_sales2,sat_sales sat_sales2
  from wss,store,date_dim d
  where d.d_week_seq = wss.d_week_seq and
        ss_store_sk = s_store_sk and
        d_month_seq between 61+ 12 and 61 + 23) x
 where s_store_id1=s_store_id2
   and d_week_seq1=d_week_seq2-52
 order by s_store_name1,s_store_id1,d_week_seq1
limit 100
"""

# query60.sql — q56's category sibling: 'Music' → 'CAT_3'.
_Q60 = """
with ss as (
 select
          i_item_id,sum(ss_ext_sales_price) total_sales
 from
 	store_sales,
 	date_dim,
         customer_address,
         item
 where
         i_item_id in (select
  i_item_id
from
 item
where i_category in ('CAT_3'))
 and     ss_item_sk              = i_item_sk
 and     ss_sold_date_sk         = d_date_sk
 and     d_year                  = 1998
 and     d_moy                   = 9
 and     ss_addr_sk              = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id),
 cs as (
 select
          i_item_id,sum(cs_ext_sales_price) total_sales
 from
 	catalog_sales,
 	date_dim,
         customer_address,
         item
 where
         i_item_id               in (select
  i_item_id
from
 item
where i_category in ('CAT_3'))
 and     cs_item_sk              = i_item_sk
 and     cs_sold_date_sk         = d_date_sk
 and     d_year                  = 1998
 and     d_moy                   = 9
 and     cs_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id),
 ws as (
 select
          i_item_id,sum(ws_ext_sales_price) total_sales
 from
 	web_sales,
 	date_dim,
         customer_address,
         item
 where
         i_item_id               in (select
  i_item_id
from
 item
where i_category in ('CAT_3'))
 and     ws_item_sk              = i_item_sk
 and     ws_sold_date_sk         = d_date_sk
 and     d_year                  = 1998
 and     d_moy                   = 9
 and     ws_bill_addr_sk         = ca_address_sk
 and     ca_gmt_offset           = -5
 group by i_item_id)
  select
  i_item_id
,round(sum(total_sales) / 100, 2) total_sales
 from  (select * from ss
        union all
        select * from cs
        union all
        select * from ws) tmp1
 group by i_item_id
 order by i_item_id
      ,total_sales
 limit 100
"""

# query63.sql — q53's monthly/manager sibling: d_month_seq → 61..72;
# category/class/brand IN-lists retargeted to mutually consistent
# synthetic values (category fixes p%10 → class p%5, brand p%40); money
# rounded inside the subquery exactly like the graded q53.
_Q63 = """
select  *
from (select i_manager_id
             ,round(sum(ss_sales_price) / 100, 2) sum_sales
             ,round(avg(sum(ss_sales_price)) over (partition by i_manager_id) / 100, 4) avg_monthly_sales
      from item
          ,store_sales
          ,date_dim
          ,store
      where ss_item_sk = i_item_sk
        and ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and d_month_seq in (61,61+1,61+2,61+3,61+4,61+5,61+6,61+7,61+8,61+9,61+10,61+11)
        and ((    i_category in ('CAT_2','CAT_4','CAT_7')
              and i_class in ('class_2','class_4')
              and i_brand in ('Brand#2','Brand#4',
		                  'Brand#12','Brand#34'))
           or(    i_category in ('CAT_1','CAT_6','CAT_9')
              and i_class in ('class_1','class_5')
              and i_brand in ('Brand#1','Brand#6','Brand#21',
		                 'Brand#26')))
group by i_manager_id, d_moy) tmp1
where case when avg_monthly_sales > 0 then abs (sum_sales - avg_monthly_sales) / avg_monthly_sales else null end > 0.1
order by i_manager_id
        ,avg_monthly_sales
        ,sum_sales
limit 100
"""

# query67.sql — 8-level ROLLUP with per-category rank ≤ 100 (the literal
# form of the graded adapted q67 shape). d_month_seq → 61..72; money
# rounded at the output (rank computed on the exact cent sums); ORDER BY
# keys get NULLS FIRST (8-level ROLLUP output far exceeds the LIMIT).
_Q67 = """
select  i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
        d_moy, s_store_id, round(sumsales / 100, 2) sumsales, rk
from (select i_category
            ,i_class
            ,i_brand
            ,i_product_name
            ,d_year
            ,d_qoy
            ,d_moy
            ,s_store_id
            ,sumsales
            ,rank() over (partition by i_category order by sumsales desc) rk
      from (select i_category
                  ,i_class
                  ,i_brand
                  ,i_product_name
                  ,d_year
                  ,d_qoy
                  ,d_moy
                  ,s_store_id
                  ,sum(coalesce(ss_sales_price*ss_quantity,0)) sumsales
            from store_sales
                ,date_dim
                ,store
                ,item
       where  ss_sold_date_sk=d_date_sk
          and ss_item_sk=i_item_sk
          and ss_store_sk = s_store_sk
          and d_month_seq between 61 and 61+11
       group by  rollup(i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,s_store_id))dw1) dw2
where rk <= 100
order by i_category nulls first
        ,i_class nulls first
        ,i_brand nulls first
        ,i_product_name nulls first
        ,d_year nulls first
        ,d_qoy nulls first
        ,d_moy nulls first
        ,s_store_id nulls first
        ,sumsales
        ,rk
limit 100
"""

# query70.sql — state/county profit ROLLUP gated on a ranked-states
# subquery (rank window inside an IN). d_month_seq → 61..72; money at the
# dollar boundary (the rank windows order on the exact cent sums).
_Q70 = """
select
    round(sum(ss_net_profit) / 100, 2) as total_sum
   ,s_state
   ,s_county
   ,grouping(s_state)+grouping(s_county) as lochierarchy
   ,rank() over (
 	partition by grouping(s_state)+grouping(s_county),
 	case when grouping(s_county) = 0 then s_state end
 	order by sum(ss_net_profit) desc) as rank_within_parent
 from
    store_sales
   ,date_dim       d1
   ,store
 where
    d1.d_month_seq between 61 and 61+11
 and d1.d_date_sk = ss_sold_date_sk
 and s_store_sk  = ss_store_sk
 and s_state in
             ( select s_state
               from  (select s_state as s_state,
 			    rank() over ( partition by s_state order by sum(ss_net_profit) desc) as ranking
                      from   store_sales, store, date_dim
                      where  d_month_seq between 61 and 61+11
 			    and d_date_sk = ss_sold_date_sk
 			    and s_store_sk  = ss_store_sk
                      group by s_state
                     ) tmp1
               where ranking <= 5
             )
 group by rollup(s_state,s_county)
 order by
   lochierarchy desc
  ,case when lochierarchy = 0 then s_state end
  ,rank_within_parent
 limit 100
"""

# ---- wave 4: customer-attribute / county / returns-side columns --------

# query4.sql — triple-channel year-over-year growth comparison on the
# half-margin formula. d_year 2001/2002 → 2000/2001 (sales end 2001-08);
# the /2 halves of integer cents are exact doubles, so the sums and growth
# ratios are cross-engine deterministic.
_Q4 = """
with year_total as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(((ss_ext_list_price-ss_ext_wholesale_cost-ss_ext_discount_amt)+ss_ext_sales_price)/2) year_total
       ,'s' sale_type
 from customer
     ,store_sales
     ,date_dim
 where c_customer_sk = ss_customer_sk
   and ss_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum((((cs_ext_list_price-cs_ext_wholesale_cost-cs_ext_discount_amt)+cs_ext_sales_price)/2) ) year_total
       ,'c' sale_type
 from customer
     ,catalog_sales
     ,date_dim
 where c_customer_sk = cs_bill_customer_sk
   and cs_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum((((ws_ext_list_price-ws_ext_wholesale_cost-ws_ext_discount_amt)+ws_ext_sales_price)/2) ) year_total
       ,'w' sale_type
 from customer
     ,web_sales
     ,date_dim
 where c_customer_sk = ws_bill_customer_sk
   and ws_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
         )
  select
                  t_s_secyear.customer_id
                 ,t_s_secyear.customer_first_name
                 ,t_s_secyear.customer_last_name
                 ,t_s_secyear.customer_preferred_cust_flag
 from year_total t_s_firstyear
     ,year_total t_s_secyear
     ,year_total t_c_firstyear
     ,year_total t_c_secyear
     ,year_total t_w_firstyear
     ,year_total t_w_secyear
 where t_s_secyear.customer_id = t_s_firstyear.customer_id
   and t_s_firstyear.customer_id = t_c_secyear.customer_id
   and t_s_firstyear.customer_id = t_c_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_secyear.customer_id
   and t_s_firstyear.sale_type = 's'
   and t_c_firstyear.sale_type = 'c'
   and t_w_firstyear.sale_type = 'w'
   and t_s_secyear.sale_type = 's'
   and t_c_secyear.sale_type = 'c'
   and t_w_secyear.sale_type = 'w'
   and t_s_firstyear.dyear = 2000
   and t_s_secyear.dyear = 2000+1
   and t_c_firstyear.dyear =  2000
   and t_c_secyear.dyear =  2000+1
   and t_w_firstyear.dyear = 2000
   and t_w_secyear.dyear = 2000+1
   and t_s_firstyear.year_total > 0
   and t_c_firstyear.year_total > 0
   and t_w_firstyear.year_total > 0
   and case when t_c_firstyear.year_total > 0 then t_c_secyear.year_total / t_c_firstyear.year_total else null end
           > case when t_s_firstyear.year_total > 0 then t_s_secyear.year_total / t_s_firstyear.year_total else null end
   and case when t_c_firstyear.year_total > 0 then t_c_secyear.year_total / t_c_firstyear.year_total else null end
           > case when t_w_firstyear.year_total > 0 then t_w_secyear.year_total / t_w_firstyear.year_total else null end
 order by t_s_secyear.customer_id
         ,t_s_secyear.customer_first_name
         ,t_s_secyear.customer_last_name
         ,t_s_secyear.customer_preferred_cust_flag
limit 100
"""

# query10.sql — active-customer demographic census gated on EXISTS over
# store + (web OR catalog). d_year 2002 → 2001; the county IN-list keeps
# two names from the synthetic 3-county pool.
_Q10 = """
select
  cd_gender,
  cd_marital_status,
  cd_education_status,
  count(*) cnt1,
  cd_purchase_estimate,
  count(*) cnt2,
  cd_credit_rating,
  count(*) cnt3,
  cd_dep_count,
  count(*) cnt4,
  cd_dep_employed_count,
  count(*) cnt5,
  cd_dep_college_count,
  count(*) cnt6
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  ca_county in ('Williamson County','Bronx County','Rush County','Jefferson County','Dona Ana County') and
  cd_demo_sk = c.c_current_cdemo_sk and
  exists (select *
          from store_sales,date_dim
          where c.c_customer_sk = ss_customer_sk and
                ss_sold_date_sk = d_date_sk and
                d_year = 2001 and
                d_moy between 1 and 1+3) and
   (exists (select *
            from web_sales,date_dim
            where c.c_customer_sk = ws_bill_customer_sk and
                  ws_sold_date_sk = d_date_sk and
                  d_year = 2001 and
                  d_moy between 1 ANd 1+3) or
    exists (select *
            from catalog_sales,date_dim
            where c.c_customer_sk = cs_ship_customer_sk and
                  cs_sold_date_sk = d_date_sk and
                  d_year = 2001 and
                  d_moy between 1 and 1+3))
 group by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 order by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
limit 100
"""

# query11.sql — store-vs-web year-over-year growth on list-minus-discount.
# d_year 2001/2002 → 2000/2001; cent sums keep the ratio comparison exact.
_Q11 = """
with year_total as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(ss_ext_list_price-ss_ext_discount_amt) year_total
       ,'s' sale_type
 from customer
     ,store_sales
     ,date_dim
 where c_customer_sk = ss_customer_sk
   and ss_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(ws_ext_list_price-ws_ext_discount_amt) year_total
       ,'w' sale_type
 from customer
     ,web_sales
     ,date_dim
 where c_customer_sk = ws_bill_customer_sk
   and ws_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
         )
  select
                  t_s_secyear.customer_id
                 ,t_s_secyear.customer_first_name
                 ,t_s_secyear.customer_last_name
                 ,t_s_secyear.customer_preferred_cust_flag
 from year_total t_s_firstyear
     ,year_total t_s_secyear
     ,year_total t_w_firstyear
     ,year_total t_w_secyear
 where t_s_secyear.customer_id = t_s_firstyear.customer_id
         and t_s_firstyear.customer_id = t_w_secyear.customer_id
         and t_s_firstyear.customer_id = t_w_firstyear.customer_id
         and t_s_firstyear.sale_type = 's'
         and t_w_firstyear.sale_type = 'w'
         and t_s_secyear.sale_type = 's'
         and t_w_secyear.sale_type = 'w'
         and t_s_firstyear.dyear = 2000
         and t_s_secyear.dyear = 2000+1
         and t_w_firstyear.dyear = 2000
         and t_w_secyear.dyear = 2000+1
         and t_s_firstyear.year_total > 0
         and t_w_firstyear.year_total > 0
         and case when t_w_firstyear.year_total > 0 then t_w_secyear.year_total / t_w_firstyear.year_total else 0.0 end
             > case when t_s_firstyear.year_total > 0 then t_s_secyear.year_total / t_s_firstyear.year_total else 0.0 end
 order by t_s_secyear.customer_id
         ,t_s_secyear.customer_first_name
         ,t_s_secyear.customer_last_name
         ,t_s_secyear.customer_preferred_cust_flag
limit 100
"""

# query18.sql — catalog demographics with a 4-level ROLLUP over the
# address hierarchy. decimal(12,x) casts → double + 4dp rounds (q7's
# standard; money at the dollar boundary); ca_state IN-list → synthetic
# states; NULLS FIRST on the ROLLUP order keys (output exceeds the LIMIT).
_Q18 = """
select  i_item_id,
        ca_country,
        ca_state,
        ca_county,
        round(avg( cast(cs_quantity as double)), 4) agg1,
        round(avg( cast(cs_list_price as double)) / 100, 4) agg2,
        round(avg( cast(cs_coupon_amt as double)) / 100, 4) agg3,
        round(avg( cast(cs_sales_price as double)) / 100, 4) agg4,
        round(avg( cast(cs_net_profit as double)) / 100, 4) agg5,
        round(avg( cast(c_birth_year as double)), 4) agg6,
        round(avg( cast(cd1.cd_dep_count as double)), 4) agg7
 from catalog_sales, customer_demographics cd1,
      customer_demographics cd2, customer, customer_address, date_dim, item
 where cs_sold_date_sk = d_date_sk and
       cs_item_sk = i_item_sk and
       cs_bill_cdemo_sk = cd1.cd_demo_sk and
       cs_bill_customer_sk = c_customer_sk and
       cd1.cd_gender = 'F' and
       cd1.cd_education_status = 'Unknown' and
       c_current_cdemo_sk = cd2.cd_demo_sk and
       c_current_addr_sk = ca_address_sk and
       c_birth_month in (1,6,8,9,12,2) and
       d_year = 1998 and
       ca_state in ('TX','OH','NY','GA','TN','OR','TX')
 group by rollup (i_item_id, ca_country, ca_state, ca_county)
 order by ca_country nulls first,
        ca_state nulls first,
        ca_county nulls first,
	i_item_id nulls first
 limit 100
"""

# query30.sql — web-return concentration per state (q1's web twin over
# the returning-customer keys). d_year 2002 → 2000 (return dates are ship
# dates, ending 2001-11); money at the dollar boundary.
_Q30 = """
with customer_total_return as
 (select wr_returning_customer_sk as ctr_customer_sk
        ,ca_state as ctr_state,
 	sum(wr_return_amt) as ctr_total_return
 from web_returns
     ,date_dim
     ,customer_address
 where wr_returned_date_sk = d_date_sk
   and d_year =2000
   and wr_returning_addr_sk = ca_address_sk
 group by wr_returning_customer_sk
         ,ca_state)
  select  c_customer_id,c_salutation,c_first_name,c_last_name,c_preferred_cust_flag
       ,c_birth_day,c_birth_month,c_birth_year,c_birth_country,c_login,c_email_address
       ,c_last_review_date_sk,round(ctr_total_return / 100, 2) ctr_total_return
 from customer_total_return ctr1
     ,customer_address
     ,customer
 where ctr1.ctr_total_return > (select cast(sum(ctr_total_return) as double)*1.2 / count(ctr_total_return)
 			  from customer_total_return ctr2
                  	  where ctr1.ctr_state = ctr2.ctr_state)
       and ca_address_sk = c_current_addr_sk
       and ca_state = 'GA'
       and ctr1.ctr_customer_sk = c_customer_sk
 order by c_customer_id,c_salutation,c_first_name,c_last_name,c_preferred_cust_flag
                  ,c_birth_day,c_birth_month,c_birth_year,c_birth_country,c_login,c_email_address
                  ,c_last_review_date_sk,ctr_total_return
limit 100
"""

# query31.sql — county-level store-vs-web quarter-over-quarter growth
# (six instances of two CTEs). Growth ratios divide exact cent sums —
# rounded to 4dp at the output, the comparisons use the raw values.
# d_year 2000 → 1995: the synthetic web channel is a 1/3 slice of the
# store orders, so the two growth series are tightly correlated and the
# web>store-twice predicate only fires on sampling noise — 1995 is the
# year where it fires at both oracle SFs (1 row at sf0.01, 2 at sf0.1;
# empty at sf0.001 like q8).
_Q31 = """
with ss as
 (select ca_county,d_qoy, d_year,sum(ss_ext_sales_price) as store_sales
 from store_sales,date_dim,customer_address
 where ss_sold_date_sk = d_date_sk
  and ss_addr_sk=ca_address_sk
 group by ca_county,d_qoy, d_year),
 ws as
 (select ca_county,d_qoy, d_year,sum(ws_ext_sales_price) as web_sales
 from web_sales,date_dim,customer_address
 where ws_sold_date_sk = d_date_sk
  and ws_bill_addr_sk=ca_address_sk
 group by ca_county,d_qoy, d_year)
 select
        ss1.ca_county
       ,ss1.d_year
       ,round(ws2.web_sales/ws1.web_sales, 4) web_q1_q2_increase
       ,round(ss2.store_sales/ss1.store_sales, 4) store_q1_q2_increase
       ,round(ws3.web_sales/ws2.web_sales, 4) web_q2_q3_increase
       ,round(ss3.store_sales/ss2.store_sales, 4) store_q2_q3_increase
 from
        ss ss1
       ,ss ss2
       ,ss ss3
       ,ws ws1
       ,ws ws2
       ,ws ws3
 where
    ss1.d_qoy = 1
    and ss1.d_year = 1995
    and ss1.ca_county = ss2.ca_county
    and ss2.d_qoy = 2
    and ss2.d_year = 1995
 and ss2.ca_county = ss3.ca_county
    and ss3.d_qoy = 3
    and ss3.d_year = 1995
    and ss1.ca_county = ws1.ca_county
    and ws1.d_qoy = 1
    and ws1.d_year = 1995
    and ws1.ca_county = ws2.ca_county
    and ws2.d_qoy = 2
    and ws2.d_year = 1995
    and ws1.ca_county = ws3.ca_county
    and ws3.d_qoy = 3
    and ws3.d_year =1995
    and case when ws1.web_sales > 0 then ws2.web_sales/ws1.web_sales else null end
       > case when ss1.store_sales > 0 then ss2.store_sales/ss1.store_sales else null end
    and case when ws2.web_sales > 0 then ws3.web_sales/ws2.web_sales else null end
       > case when ss2.store_sales > 0 then ss3.store_sales/ss2.store_sales else null end
 order by ss1.ca_county
"""

# query35.sql — demographic census of multi-channel shoppers (EXISTS over
# store AND (web OR catalog)). d_year 2002 → 2001; the reference's
# unnamed min/max/avg columns get aliases (the compare is name-keyed);
# integer avgs rounded to 4dp.
_Q35 = """
select
  ca_state,
  cd_gender,
  cd_marital_status,
  cd_dep_count,
  count(*) cnt1,
  min(cd_dep_count) min_dep,
  max(cd_dep_count) max_dep,
  round(avg(cd_dep_count), 4) avg_dep,
  cd_dep_employed_count,
  count(*) cnt2,
  min(cd_dep_employed_count) min_emp,
  max(cd_dep_employed_count) max_emp,
  round(avg(cd_dep_employed_count), 4) avg_emp,
  cd_dep_college_count,
  count(*) cnt3,
  min(cd_dep_college_count) min_col,
  max(cd_dep_college_count) max_col,
  round(avg(cd_dep_college_count), 4) avg_col
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  cd_demo_sk = c.c_current_cdemo_sk and
  exists (select *
          from store_sales,date_dim
          where c.c_customer_sk = ss_customer_sk and
                ss_sold_date_sk = d_date_sk and
                d_year = 2001 and
                d_qoy < 4) and
   (exists (select *
            from web_sales,date_dim
            where c.c_customer_sk = ws_bill_customer_sk and
                  ws_sold_date_sk = d_date_sk and
                  d_year = 2001 and
                  d_qoy < 4) or
    exists (select *
            from catalog_sales,date_dim
            where c.c_customer_sk = cs_ship_customer_sk and
                  cs_sold_date_sk = d_date_sk and
                  d_year = 2001 and
                  d_qoy < 4))
 group by ca_state,
          cd_gender,
          cd_marital_status,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 order by ca_state,
          cd_gender,
          cd_marital_status,
          cd_dep_count,
          cd_dep_employed_count,
          cd_dep_college_count
 limit 100
"""

# query50.sql — return-lag day bands per store (sale→return same-ticket
# join; the lag is a date_sk difference). August 2001 return dates exist
# (ship dates run to 2001-11); the reference's backtick-quoted band
# aliases become portable identifiers (DuckDB has no backtick quoting).
_Q50 = """
select
   s_store_name
  ,s_company_id
  ,s_street_number
  ,s_street_name
  ,s_street_type
  ,s_suite_number
  ,s_city
  ,s_county
  ,s_state
  ,s_zip
  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk <= 30 ) then 1 else 0 end) as bigint)  as d30_days
  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk > 30) and
                 (sr_returned_date_sk - ss_sold_date_sk <= 60) then 1 else 0 end ) as bigint)  as d31_60_days
  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk > 60) and
                 (sr_returned_date_sk - ss_sold_date_sk <= 90) then 1 else 0 end) as bigint)  as d61_90_days
  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk > 90) and
                 (sr_returned_date_sk - ss_sold_date_sk <= 120) then 1 else 0 end) as bigint)  as d91_120_days
  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk  > 120) then 1 else 0 end) as bigint)  as dgt120_days
  -- ^ r10: driver-hash dtype class (DuckDB HUGEINT sums -> float64)
from
   store_sales
  ,store_returns
  ,store
  ,date_dim d1
  ,date_dim d2
where
    d2.d_year = 2001
and d2.d_moy  = 8
and ss_ticket_number = sr_ticket_number
and ss_item_sk = sr_item_sk
and ss_sold_date_sk   = d1.d_date_sk
and sr_returned_date_sk   = d2.d_date_sk
and ss_customer_sk = sr_customer_sk
and ss_store_sk = s_store_sk
group by
   s_store_name
  ,s_company_id
  ,s_street_number
  ,s_street_name
  ,s_street_type
  ,s_suite_number
  ,s_city
  ,s_county
  ,s_state
  ,s_zip
order by s_store_name
        ,s_company_id
        ,s_street_number
        ,s_street_name
        ,s_street_type
        ,s_suite_number
        ,s_city
        ,s_county
        ,s_state
        ,s_zip
limit 100
"""

# query54.sql — revenue segments of December category buyers shopping at
# county/state-co-located stores in the following quarter. 'Women' /
# 'maternity' → CAT_1/class_1 (CRT-consistent: category fixes class);
# the segment cast rewritten engine-portably (DuckDB CAST(double AS INT)
# rounds half-away while Spark truncates — floor() is identical in both)
# and scaled to cents (revenue/5000 = 50-dollar segments).
_Q54 = """
with my_customers as (
 select distinct c_customer_sk
        , c_current_addr_sk
 from
        ( select cs_sold_date_sk sold_date_sk,
                 cs_bill_customer_sk customer_sk,
                 cs_item_sk item_sk
          from   catalog_sales
          union all
          select ws_sold_date_sk sold_date_sk,
                 ws_bill_customer_sk customer_sk,
                 ws_item_sk item_sk
          from   web_sales
         ) cs_or_ws_sales,
         item,
         date_dim,
         customer
 where   sold_date_sk = d_date_sk
         and item_sk = i_item_sk
         and i_category = 'CAT_1'
         and i_class = 'class_1'
         and c_customer_sk = cs_or_ws_sales.customer_sk
         and d_moy = 12
         and d_year = 1998
 )
 , my_revenue as (
 select c_customer_sk,
        sum(ss_ext_sales_price) as revenue
 from   my_customers,
        store_sales,
        customer_address,
        store,
        date_dim
 where  c_current_addr_sk = ca_address_sk
        and ca_county = s_county
        and ca_state = s_state
        and ss_sold_date_sk = d_date_sk
        and c_customer_sk = ss_customer_sk
        and d_month_seq between (select distinct d_month_seq+1
                                 from   date_dim where d_year = 1998 and d_moy = 12)
                           and  (select distinct d_month_seq+3
                                 from   date_dim where d_year = 1998 and d_moy = 12)
 group by c_customer_sk
 )
 , segments as
 (select cast(floor(revenue/5000) as int) as segment
  from   my_revenue
 )
  select  segment, count(*) as num_customers, segment*50 as segment_base
 from segments
 group by segment
 order by segment, num_customers
 limit 100
"""

# query74.sql — q11's net-paid sibling. d_year 2001/2002 → 2000/2001; the
# backtick-quoted `year` alias → dyear (DuckDB has no backtick quoting).
_Q74 = """
with year_total as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,d_year as dyear
       ,sum(ss_net_paid) year_total
       ,'s' sale_type
 from customer
     ,store_sales
     ,date_dim
 where c_customer_sk = ss_customer_sk
   and ss_sold_date_sk = d_date_sk
   and d_year in (2000,2000+1)
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,d_year as dyear
       ,sum(ws_net_paid) year_total
       ,'w' sale_type
 from customer
     ,web_sales
     ,date_dim
 where c_customer_sk = ws_bill_customer_sk
   and ws_sold_date_sk = d_date_sk
   and d_year in (2000,2000+1)
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,d_year
         )
  select
        t_s_secyear.customer_id, t_s_secyear.customer_first_name, t_s_secyear.customer_last_name
 from year_total t_s_firstyear
     ,year_total t_s_secyear
     ,year_total t_w_firstyear
     ,year_total t_w_secyear
 where t_s_secyear.customer_id = t_s_firstyear.customer_id
         and t_s_firstyear.customer_id = t_w_secyear.customer_id
         and t_s_firstyear.customer_id = t_w_firstyear.customer_id
         and t_s_firstyear.sale_type = 's'
         and t_w_firstyear.sale_type = 'w'
         and t_s_secyear.sale_type = 's'
         and t_w_secyear.sale_type = 'w'
         and t_s_firstyear.dyear = 2000
         and t_s_secyear.dyear = 2000+1
         and t_w_firstyear.dyear = 2000
         and t_w_secyear.dyear = 2000+1
         and t_s_firstyear.year_total > 0
         and t_w_firstyear.year_total > 0
         and case when t_w_firstyear.year_total > 0 then t_w_secyear.year_total / t_w_firstyear.year_total else null end
           > case when t_s_firstyear.year_total > 0 then t_s_secyear.year_total / t_s_firstyear.year_total else null end
 order by 1, 1, 1
limit 100
"""

# ---- wave 5: catalog_returns / call_center / catalog_page families -----

# query5.sql — per-channel sales+returns rollup over 14 days. The
# decimal(7,2) zero literals → bigint (cents are bigint; mixed-type UNION
# column resolution differs between engines otherwise); backtick-quoted
# `returns` → returns_amt (DuckDB has no backtick quoting); money at the
# dollar boundary.
_Q5 = """
with ssr as
 (select s_store_id,
        sum(sales_price) as sales,
        sum(profit) as profit,
        sum(return_amt) as returns_amt,
        sum(net_loss) as profit_loss
 from
  ( select  ss_store_sk as store_sk,
            ss_sold_date_sk  as date_sk,
            ss_ext_sales_price as sales_price,
            ss_net_profit as profit,
            cast(0 as bigint) as return_amt,
            cast(0 as bigint) as net_loss
    from store_sales
    union all
    select sr_store_sk as store_sk,
           sr_returned_date_sk as date_sk,
           cast(0 as bigint) as sales_price,
           cast(0 as bigint) as profit,
           sr_return_amt as return_amt,
           sr_net_loss as net_loss
    from store_returns
   ) salesreturns,
     date_dim,
     store
 where date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '14' day)
       and store_sk = s_store_sk
 group by s_store_id)
 ,
 csr as
 (select cp_catalog_page_id,
        sum(sales_price) as sales,
        sum(profit) as profit,
        sum(return_amt) as returns_amt,
        sum(net_loss) as profit_loss
 from
  ( select  cs_catalog_page_sk as page_sk,
            cs_sold_date_sk  as date_sk,
            cs_ext_sales_price as sales_price,
            cs_net_profit as profit,
            cast(0 as bigint) as return_amt,
            cast(0 as bigint) as net_loss
    from catalog_sales
    union all
    select cr_catalog_page_sk as page_sk,
           cr_returned_date_sk as date_sk,
           cast(0 as bigint) as sales_price,
           cast(0 as bigint) as profit,
           cr_return_amount as return_amt,
           cr_net_loss as net_loss
    from catalog_returns
   ) salesreturns,
     date_dim,
     catalog_page
 where date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '14' day)
       and page_sk = cp_catalog_page_sk
 group by cp_catalog_page_id)
 ,
 wsr as
 (select web_site_id,
        sum(sales_price) as sales,
        sum(profit) as profit,
        sum(return_amt) as returns_amt,
        sum(net_loss) as profit_loss
 from
  ( select  ws_web_site_sk as wsr_web_site_sk,
            ws_sold_date_sk  as date_sk,
            ws_ext_sales_price as sales_price,
            ws_net_profit as profit,
            cast(0 as bigint) as return_amt,
            cast(0 as bigint) as net_loss
    from web_sales
    union all
    select ws_web_site_sk as wsr_web_site_sk,
           wr_returned_date_sk as date_sk,
           cast(0 as bigint) as sales_price,
           cast(0 as bigint) as profit,
           wr_return_amt as return_amt,
           wr_net_loss as net_loss
    from web_returns left outer join web_sales on
         ( wr_item_sk = ws_item_sk
           and wr_order_number = ws_order_number)
   ) salesreturns,
     date_dim,
     web_site
 where date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '14' day)
       and wsr_web_site_sk = web_site_sk
 group by web_site_id)
  select  channel
        , id
        , round(sum(sales) / 100, 2) as sales
        , round(sum(returns_amt) / 100, 2) as returns_amt
        , round(sum(profit) / 100, 2) as profit
 from
 (select 'store channel' as channel
        , 'store' || s_store_id as id
        , sales
        , returns_amt
        , (profit - profit_loss) as profit
 from   ssr
 union all
 select 'catalog channel' as channel
        , 'catalog_page' || cp_catalog_page_id as id
        , sales
        , returns_amt
        , (profit - profit_loss) as profit
 from  csr
 union all
 select 'web channel' as channel
        , 'web_site' || web_site_id as id
        , sales
        , returns_amt
        , (profit - profit_loss) as profit
 from   wsr
 ) x
 group by rollup (channel, id)
 order by channel
         ,id
 limit 100
"""

# query16.sql — catalog orders shipped from multiple warehouses with no
# return (EXISTS + NOT EXISTS on the order key). '2002-2-01' → '2001-2-01'
# (ship dates end 2001-11); backtick aliases → identifiers; money at the
# dollar boundary.
_Q16 = """
select
   count(distinct cs_order_number) as order_count
  ,round(sum(cs_ext_ship_cost) / 100, 2) as total_shipping_cost
  ,round(sum(cs_net_profit) / 100, 2) as total_net_profit
from
   catalog_sales cs1
  ,date_dim
  ,customer_address
  ,call_center
where
    d_date between '2001-2-01' and
           (cast('2001-2-01' as date) + INTERVAL '60' day)
and cs1.cs_ship_date_sk = d_date_sk
and cs1.cs_ship_addr_sk = ca_address_sk
and ca_state = 'GA'
and cs1.cs_call_center_sk = cc_call_center_sk
and cc_county in ('Williamson County','Williamson County','Williamson County','Williamson County',
                  'Williamson County'
)
and exists (select *
            from catalog_sales cs2
            where cs1.cs_order_number = cs2.cs_order_number
              and cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
and not exists(select *
               from catalog_returns cr1
               where cs1.cs_order_number = cr1.cr_order_number)
order by count(distinct cs_order_number)
limit 100
"""

# query32.sql — catalog excess-discount (correlated 1.3×avg per item).
# i_manufact_id 977 → 9; backtick alias → identifier; dollar boundary.
_Q32 = """
select  round(sum(cs_ext_discount_amt) / 100, 2)  as excess_discount_amount
from
   catalog_sales
   ,item
   ,date_dim
where
i_manufact_id = 9
and i_item_sk = cs_item_sk
and d_date between '2000-01-27' and
        (cast('2000-01-27' as date) + INTERVAL '90' day)
and d_date_sk = cs_sold_date_sk
and cs_ext_discount_amt
     > (
         select
            1.3 * cast(sum(cs_ext_discount_amt) as double) / count(cs_ext_discount_amt)
         from
            catalog_sales
           ,date_dim
         where
              cs_item_sk = i_item_sk
          and d_date between '2000-01-27' and
                             (cast('2000-01-27' as date) + INTERVAL '90' day)
          and d_date_sk = cs_sold_date_sk
      )
limit 100
"""

# query40.sql — catalog sales net of refunds before/after a date, by
# warehouse state. i_current_price 0.99..1.49 → 900..930 (synthetic
# retail prices); money at the dollar boundary.
_Q40 = """
select
   w_state
  ,i_item_id
  ,round(sum(case when (cast(d_date as date) < cast ('2000-03-11' as date))
 		then cs_sales_price - coalesce(cr_refunded_cash,0) else 0 end) / 100, 2) as sales_before
  ,round(sum(case when (cast(d_date as date) >= cast ('2000-03-11' as date))
 		then cs_sales_price - coalesce(cr_refunded_cash,0) else 0 end) / 100, 2) as sales_after
 from
   catalog_sales left outer join catalog_returns on
       (cs_order_number = cr_order_number
        and cs_item_sk = cr_item_sk)
  ,warehouse
  ,item
  ,date_dim
 where
     i_current_price between 900 and 930
 and i_item_sk          = cs_item_sk
 and cs_warehouse_sk    = w_warehouse_sk
 and cs_sold_date_sk    = d_date_sk
 and d_date between (cast ('2000-03-11' as date) - INTERVAL '30' day)
                and (cast ('2000-03-11' as date) + INTERVAL '30' day)
 group by
    w_state,i_item_id
 order by w_state,i_item_id
limit 100
"""

# query49.sql — worst return ratios per channel, double-ranked. d_year
# 2001 → 2000 (December 2001 has no sold dates); decimal(15,4) casts →
# double (q7's standard); ratios rounded to 4dp at the output (the ranks
# order on values computed identically in both engines from exact sums).
_Q49 = """
select  channel, item, round(return_ratio, 4) return_ratio, return_rank, currency_rank from
 (select
 'web' as channel
 ,web.item
 ,web.return_ratio
 ,web.return_rank
 ,web.currency_rank
 from (
 	select
 	 item
 	,return_ratio
 	,currency_ratio
 	,rank() over (order by return_ratio) as return_rank
 	,rank() over (order by currency_ratio) as currency_rank
 	from
 	(	select ws.ws_item_sk as item
 		,(cast(sum(coalesce(wr.wr_return_quantity,0)) as double)/
 		cast(sum(coalesce(ws.ws_quantity,0)) as double )) as return_ratio
 		,(cast(sum(coalesce(wr.wr_return_amt,0)) as double)/
 		cast(sum(coalesce(ws.ws_net_paid,0)) as double )) as currency_ratio
 		from
 		 web_sales ws left outer join web_returns wr
 			on (ws.ws_order_number = wr.wr_order_number and
 			ws.ws_item_sk = wr.wr_item_sk)
                 ,date_dim
 		where
 			wr.wr_return_amt > 10000
 			and ws.ws_net_profit > 1
                         and ws.ws_net_paid > 0
                         and ws.ws_quantity > 0
                         and ws_sold_date_sk = d_date_sk
                         and d_year = 2000
                         and d_moy = 12
 		group by ws.ws_item_sk
 	) in_web
 ) web
 where
 (
 web.return_rank <= 10
 or
 web.currency_rank <= 10
 )
 union
 select
 'catalog' as channel
 ,catalog.item
 ,catalog.return_ratio
 ,catalog.return_rank
 ,catalog.currency_rank
 from (
 	select
 	 item
 	,return_ratio
 	,currency_ratio
 	,rank() over (order by return_ratio) as return_rank
 	,rank() over (order by currency_ratio) as currency_rank
 	from
 	(	select
 		cs.cs_item_sk as item
 		,(cast(sum(coalesce(cr.cr_return_quantity,0)) as double)/
 		cast(sum(coalesce(cs.cs_quantity,0)) as double )) as return_ratio
 		,(cast(sum(coalesce(cr.cr_return_amount,0)) as double)/
 		cast(sum(coalesce(cs.cs_net_paid,0)) as double )) as currency_ratio
 		from
 		catalog_sales cs left outer join catalog_returns cr
 			on (cs.cs_order_number = cr.cr_order_number and
 			cs.cs_item_sk = cr.cr_item_sk)
                ,date_dim
 		where
 			cr.cr_return_amount > 10000
 			and cs.cs_net_profit > 1
                         and cs.cs_net_paid > 0
                         and cs.cs_quantity > 0
                         and cs_sold_date_sk = d_date_sk
                         and d_year = 2000
                         and d_moy = 12
                 group by cs.cs_item_sk
 	) in_cat
 ) catalog
 where
 (
 catalog.return_rank <= 10
 or
 catalog.currency_rank <=10
 )
 union
 select
 'store' as channel
 ,store.item
 ,store.return_ratio
 ,store.return_rank
 ,store.currency_rank
 from (
 	select
 	 item
 	,return_ratio
 	,currency_ratio
 	,rank() over (order by return_ratio) as return_rank
 	,rank() over (order by currency_ratio) as currency_rank
 	from
 	(	select sts.ss_item_sk as item
 		,(cast(sum(coalesce(sr.sr_return_quantity,0)) as double)/cast(sum(coalesce(sts.ss_quantity,0)) as double )) as return_ratio
 		,(cast(sum(coalesce(sr.sr_return_amt,0)) as double)/cast(sum(coalesce(sts.ss_net_paid,0)) as double )) as currency_ratio
 		from
 		store_sales sts left outer join store_returns sr
 			on (sts.ss_ticket_number = sr.sr_ticket_number and sts.ss_item_sk = sr.sr_item_sk)
                ,date_dim
 		where
 			sr.sr_return_amt > 10000
 			and sts.ss_net_profit > 1
                         and sts.ss_net_paid > 0
                         and sts.ss_quantity > 0
                         and ss_sold_date_sk = d_date_sk
                         and d_year = 2000
                         and d_moy = 12
 		group by sts.ss_item_sk
 	) in_store
 ) store
 where  (
 store.return_rank <= 10
 or
 store.currency_rank <= 10
 )
 )
 order by 1,4,5,2
 limit 100
"""

# query57.sql — q47's call-center sibling (lag/lead via rn self-join).
# Sums rounded inside v1; the window AVG is an exact single division
# (see inline note); ORDER BY extended with
# the v2 keys (the q47 convention) so the LIMIT cut is deterministic.
_Q57 = """
with v1 as(
 select i_category, i_brand,
        cc_name,
        d_year, d_moy,
        round(sum(cs_sales_price) / 100, 2) sum_sales,
        -- r9 float hardening: the rounded window AVG sat EXACTLY on a 4dp
        -- half-boundary at sf0.01 (the q47/q89 class); emit a single IEEE
        -- division of the exact cent sum instead (bit-identical anywhere).
        sum(sum(cs_sales_price)) over
          (partition by i_category, i_brand,
                     cc_name, d_year)
          / cast(count(*) over
          (partition by i_category, i_brand,
                     cc_name, d_year) * 100 as double)
          avg_monthly_sales,
        rank() over
          (partition by i_category, i_brand,
                     cc_name
           order by d_year, d_moy) rn
 from item, catalog_sales, date_dim, call_center
 where cs_item_sk = i_item_sk and
       cs_sold_date_sk = d_date_sk and
       cc_call_center_sk= cs_call_center_sk and
       (
         d_year = 1999 or
         ( d_year = 1999-1 and d_moy =12) or
         ( d_year = 1999+1 and d_moy =1)
       )
 group by i_category, i_brand,
          cc_name , d_year, d_moy),
 v2 as(
 select v1.i_category, v1.i_brand, v1.cc_name
        ,v1.d_year, v1.d_moy
        ,v1.avg_monthly_sales
        ,v1.sum_sales, v1_lag.sum_sales psum, v1_lead.sum_sales nsum
 from v1, v1 v1_lag, v1 v1_lead
 where v1.i_category = v1_lag.i_category and
       v1.i_category = v1_lead.i_category and
       v1.i_brand = v1_lag.i_brand and
       v1.i_brand = v1_lead.i_brand and
       v1. cc_name = v1_lag. cc_name and
       v1. cc_name = v1_lead. cc_name and
       v1.rn = v1_lag.rn + 1 and
       v1.rn = v1_lead.rn - 1)
  select  *
 from v2
 where  d_year = 1999 and
        avg_monthly_sales > 0 and
        case when avg_monthly_sales > 0 then abs(sum_sales - avg_monthly_sales) / avg_monthly_sales else null end > 0.1
 order by sum_sales - avg_monthly_sales, cc_name, i_category, i_brand, d_moy
 limit 100
"""

# query77.sql — per-channel 30-day profit rollup. The reference's own
# text CROSS JOINS the cs/cr CTEs (no join predicate) — both sides are
# call-center-grained (≤6 rows), and the plan lock exempts q77 for
# exactly this reason. Backtick `returns` → returns_amt; dollar boundary.
_Q77 = """
with ss as
 (select s_store_sk,
         sum(ss_ext_sales_price) as sales,
         sum(ss_net_profit) as profit
 from store_sales,
      date_dim,
      store
 where ss_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '30' day)
       and ss_store_sk = s_store_sk
 group by s_store_sk)
 ,
 sr as
 (select s_store_sk,
         sum(sr_return_amt) as returns_amt,
         sum(sr_net_loss) as profit_loss
 from store_returns,
      date_dim,
      store
 where sr_returned_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '30' day)
       and sr_store_sk = s_store_sk
 group by s_store_sk),
 cs as
 (select cs_call_center_sk,
        sum(cs_ext_sales_price) as sales,
        sum(cs_net_profit) as profit
 from catalog_sales,
      date_dim
 where cs_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '30' day)
 group by cs_call_center_sk
 ),
 cr as
 (select cr_call_center_sk,
         sum(cr_return_amount) as returns_amt,
         sum(cr_net_loss) as profit_loss
 from catalog_returns,
      date_dim
 where cr_returned_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '30' day)
 group by cr_call_center_sk
 ),
 ws as
 ( select wp_web_page_sk,
        sum(ws_ext_sales_price) as sales,
        sum(ws_net_profit) as profit
 from web_sales,
      date_dim,
      web_page
 where ws_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '30' day)
       and ws_web_page_sk = wp_web_page_sk
 group by wp_web_page_sk),
 wr as
 (select wp_web_page_sk,
        sum(wr_return_amt) as returns_amt,
        sum(wr_net_loss) as profit_loss
 from web_returns,
      date_dim,
      web_page
 where wr_returned_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '30' day)
       and wr_web_page_sk = wp_web_page_sk
 group by wp_web_page_sk)
  select  channel
        , id
        , round(sum(sales) / 100, 2) as sales
        , round(sum(returns_amt) / 100, 2) as returns_amt
        , round(sum(profit) / 100, 2) as profit
 from
 (select 'store channel' as channel
        , ss.s_store_sk as id
        , sales
        , coalesce(returns_amt, 0) as returns_amt
        , (profit - coalesce(profit_loss,0)) as profit
 from   ss left join sr
        on  ss.s_store_sk = sr.s_store_sk
 union all
 select 'catalog channel' as channel
        , cs_call_center_sk as id
        , sales
        , returns_amt
        , (profit - profit_loss) as profit
 from  cs
       , cr
 union all
 select 'web channel' as channel
        , ws.wp_web_page_sk as id
        , sales
        , coalesce(returns_amt, 0) returns_amt
        , (profit - coalesce(profit_loss,0)) as profit
 from   ws left join wr
        on  ws.wp_web_page_sk = wr.wp_web_page_sk
 ) x
 group by rollup (channel, id)
 order by channel
         ,id
 limit 100
"""

# query80.sql — promotion-filtered per-channel sales/returns rollup.
# i_current_price > 50 → > 905 (sf0.001's retail prices span only
# 900..920, and an all-empty ROLLUP input is an engine-divergence trap:
# DuckDB emits the grand-total row, Spark emits nothing); backtick
# `returns` → returns_amt; dollar boundary.
_Q80 = """
with ssr as
 (select  s_store_id as store_id,
          sum(ss_ext_sales_price) as sales,
          sum(coalesce(sr_return_amt, 0)) as returns_amt,
          sum(ss_net_profit - coalesce(sr_net_loss, 0)) as profit
  from store_sales left outer join store_returns on
         (ss_item_sk = sr_item_sk and ss_ticket_number = sr_ticket_number),
     date_dim,
     store,
     item,
     promotion
 where ss_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '30' day)
       and ss_store_sk = s_store_sk
       and ss_item_sk = i_item_sk
       and i_current_price > 905
       and ss_promo_sk = p_promo_sk
       and p_channel_tv = 'N'
 group by s_store_id)
 ,
 csr as
 (select  cp_catalog_page_id as catalog_page_id,
          sum(cs_ext_sales_price) as sales,
          sum(coalesce(cr_return_amount, 0)) as returns_amt,
          sum(cs_net_profit - coalesce(cr_net_loss, 0)) as profit
  from catalog_sales left outer join catalog_returns on
         (cs_item_sk = cr_item_sk and cs_order_number = cr_order_number),
     date_dim,
     catalog_page,
     item,
     promotion
 where cs_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '30' day)
        and cs_catalog_page_sk = cp_catalog_page_sk
       and cs_item_sk = i_item_sk
       and i_current_price > 905
       and cs_promo_sk = p_promo_sk
       and p_channel_tv = 'N'
group by cp_catalog_page_id)
 ,
 wsr as
 (select  web_site_id,
          sum(ws_ext_sales_price) as sales,
          sum(coalesce(wr_return_amt, 0)) as returns_amt,
          sum(ws_net_profit - coalesce(wr_net_loss, 0)) as profit
  from web_sales left outer join web_returns on
         (ws_item_sk = wr_item_sk and ws_order_number = wr_order_number),
     date_dim,
     web_site,
     item,
     promotion
 where ws_sold_date_sk = d_date_sk
       and d_date between cast('2000-08-23' as date)
                  and (cast('2000-08-23' as date) + INTERVAL '30' day)
        and ws_web_site_sk = web_site_sk
       and ws_item_sk = i_item_sk
       and i_current_price > 905
       and ws_promo_sk = p_promo_sk
       and p_channel_tv = 'N'
group by web_site_id)
  select  channel
        , id
        , round(sum(sales) / 100, 2) as sales
        , round(sum(returns_amt) / 100, 2) as returns_amt
        , round(sum(profit) / 100, 2) as profit
 from
 (select 'store channel' as channel
        , 'store' || store_id as id
        , sales
        , returns_amt
        , profit
 from   ssr
 union all
 select 'catalog channel' as channel
        , 'catalog_page' || catalog_page_id as id
        , sales
        , returns_amt
        , profit
 from  csr
 union all
 select 'web channel' as channel
        , 'web_site' || web_site_id as id
        , sales
        , returns_amt
        , profit
 from   wsr
 ) x
 group by rollup (channel, id)
 order by channel
         ,id
 limit 100
"""

# query81.sql — q30's catalog sibling over the full address block
# (tax-inclusive return amounts). d_year 2002 → 2000; dollar boundary.
_Q81 = """
with customer_total_return as
 (select cr_returning_customer_sk as ctr_customer_sk
        ,ca_state as ctr_state,
 	sum(cr_return_amt_inc_tax) as ctr_total_return
 from catalog_returns
     ,date_dim
     ,customer_address
 where cr_returned_date_sk = d_date_sk
   and d_year =2000
   and cr_returning_addr_sk = ca_address_sk
 group by cr_returning_customer_sk
         ,ca_state )
  select  c_customer_id,c_salutation,c_first_name,c_last_name,ca_street_number,ca_street_name
                   ,ca_street_type,ca_suite_number,ca_city,ca_county,ca_state,ca_zip,ca_country,ca_gmt_offset
                  ,ca_location_type,round(ctr_total_return / 100, 2) ctr_total_return
 from customer_total_return ctr1
     ,customer_address
     ,customer
 where ctr1.ctr_total_return > (select cast(sum(ctr_total_return) as double)*1.2 / count(ctr_total_return)
 			  from customer_total_return ctr2
                  	  where ctr1.ctr_state = ctr2.ctr_state)
       and ca_address_sk = c_current_addr_sk
       and ca_state = 'GA'
       and ctr1.ctr_customer_sk = c_customer_sk
 order by c_customer_id,c_salutation,c_first_name,c_last_name,ca_street_number,ca_street_name
                   ,ca_street_type,ca_suite_number,ca_city,ca_county,ca_state,ca_zip,ca_country,ca_gmt_offset
                  ,ca_location_type,ctr_total_return
 limit 100
"""

# query91.sql — call-center return losses by demographic slice.
# ca_gmt_offset -7 → -6 (the synthetic offsets are -5/-6); dollar
# boundary on the loss sum.
_Q91 = """
select
        cc_call_center_id Call_Center,
        cc_name Call_Center_Name,
        cc_manager Manager,
        round(sum(cr_net_loss) / 100, 2) Returns_Loss
from
        call_center,
        catalog_returns,
        date_dim,
        customer,
        customer_address,
        customer_demographics,
        household_demographics
where
        cr_call_center_sk       = cc_call_center_sk
and     cr_returned_date_sk     = d_date_sk
and     cr_returning_customer_sk= c_customer_sk
and     cd_demo_sk              = c_current_cdemo_sk
and     hd_demo_sk              = c_current_hdemo_sk
and     ca_address_sk           = c_current_addr_sk
and     d_year                  = 1998
and     d_moy                   = 11
and     ( (cd_marital_status       = 'M' and cd_education_status     = 'Unknown')
        or(cd_marital_status       = 'W' and cd_education_status     = 'Advanced Degree'))
and     hd_buy_potential like 'Unknown%'
and     ca_gmt_offset           = -6
group by cc_call_center_id,cc_name,cc_manager,cd_marital_status,cd_education_status
order by sum(cr_net_loss) desc
"""

# query92.sql — web excess-discount (q32's web twin). i_manufact_id 350
# → 14; backtick alias → identifier; dollar boundary.
_Q92 = """
select
   round(sum(ws_ext_discount_amt) / 100, 2)  as excess_discount_amount
from
    web_sales
   ,item
   ,date_dim
where
i_manufact_id = 14
and i_item_sk = ws_item_sk
and d_date between '2000-01-27' and
        (cast('2000-01-27' as date) + INTERVAL '90' day)
and d_date_sk = ws_sold_date_sk
and ws_ext_discount_amt
     > (
         SELECT
            1.3 * cast(sum(ws_ext_discount_amt) as double) / count(ws_ext_discount_amt)
         FROM
            web_sales
           ,date_dim
         WHERE
              ws_item_sk = i_item_sk
          and d_date between '2000-01-27' and
                             (cast('2000-01-27' as date) + INTERVAL '90' day)
          and d_date_sk = ws_sold_date_sk
      )
order by sum(ws_ext_discount_amt)
limit 100
"""

# query94.sql — q16's web twin. ca_state 'IL' → 'TX'; web_company_name
# 'pri' maps to synthetic site 3; backtick aliases → identifiers.
_Q94 = """
select
   count(distinct ws_order_number) as order_count
  ,round(sum(ws_ext_ship_cost) / 100, 2) as total_shipping_cost
  ,round(sum(ws_net_profit) / 100, 2) as total_net_profit
from
   web_sales ws1
  ,date_dim
  ,customer_address
  ,web_site
where
    d_date between '1999-2-01' and
           (cast('1999-2-01' as date) + INTERVAL '60' day)
and ws1.ws_ship_date_sk = d_date_sk
and ws1.ws_ship_addr_sk = ca_address_sk
and ca_state = 'TX'
and ws1.ws_web_site_sk = web_site_sk
and web_company_name = 'pri'
and exists (select *
            from web_sales ws2
            where ws1.ws_order_number = ws2.ws_order_number
              and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
and not exists(select *
               from web_returns wr1
               where ws1.ws_order_number = wr1.wr_order_number)
order by count(distinct ws_order_number)
limit 100
"""

# query99.sql — q62's catalog twin: shipping-lag bands per warehouse /
# ship mode / call center. d_month_seq 1200..1211 → 61..72; backtick band
# aliases → identifiers.
_Q99 = """
select
   substr(w_warehouse_name,1,20) wh_name
  ,sm_type
  ,cc_name
  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk <= 30 ) then 1 else 0 end) as bigint)  as d30_days
  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk > 30) and
                 (cs_ship_date_sk - cs_sold_date_sk <= 60) then 1 else 0 end ) as bigint)  as d31_60_days
  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk > 60) and
                 (cs_ship_date_sk - cs_sold_date_sk <= 90) then 1 else 0 end) as bigint)  as d61_90_days
  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk > 90) and
                 (cs_ship_date_sk - cs_sold_date_sk <= 120) then 1 else 0 end) as bigint)  as d91_120_days
  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk  > 120) then 1 else 0 end) as bigint)  as dgt120_days
  -- ^ r10: driver-hash dtype class (DuckDB HUGEINT sums -> float64)
from
   catalog_sales
  ,warehouse
  ,ship_mode
  ,call_center
  ,date_dim
where
    d_month_seq between 61 and 61 + 11
and cs_ship_date_sk   = d_date_sk
and cs_warehouse_sk   = w_warehouse_sk
and cs_ship_mode_sk   = sm_ship_mode_sk
and cs_call_center_sk = cc_call_center_sk
group by
   substr(w_warehouse_name,1,20)
  ,sm_type
  ,cc_name
order by substr(w_warehouse_name,1,20)
        ,sm_type
        ,cc_name
limit 100
"""

# ---- wave 6: returns-complete shapes, no schema changes ----------------

# query51.sql — web-vs-store cumulative crossover via FULL OUTER + two
# running windows. d_month_seq 1200..1211 → 61..72; money rounded at the
# output (the crossover comparison uses exact cents; the d_date output
# column is cast to varchar — engines disagree on date object types). The
# synthetic web
# channel is a SUBSET slice of the store channel, so the literal
# web > store crossover is structurally empty — the filter compares
# 3×web (the slice's share factor) to restore the intended selectivity.
_Q51 = """
WITH web_v1 as (
select
  ws_item_sk item_sk, d_date,
  sum(sum(ws_sales_price))
      over (partition by ws_item_sk order by d_date rows between unbounded preceding and current row) cume_sales
from web_sales
    ,date_dim
where ws_sold_date_sk=d_date_sk
  and d_month_seq between 61 and 61+11
  and ws_item_sk is not NULL
group by ws_item_sk, d_date),
store_v1 as (
select
  ss_item_sk item_sk, d_date,
  sum(sum(ss_sales_price))
      over (partition by ss_item_sk order by d_date rows between unbounded preceding and current row) cume_sales
from store_sales
    ,date_dim
where ss_sold_date_sk=d_date_sk
  and d_month_seq between 61 and 61+11
  and ss_item_sk is not NULL
group by ss_item_sk, d_date)
 select  item_sk, cast(d_date as varchar(10)) d_date,
        round(web_sales / 100, 2) web_sales,
        round(store_sales / 100, 2) store_sales,
        round(web_cumulative / 100, 2) web_cumulative,
        round(store_cumulative / 100, 2) store_cumulative
from (select item_sk
     ,d_date
     ,web_sales
     ,store_sales
     ,max(web_sales)
         over (partition by item_sk order by d_date rows between unbounded preceding and current row) web_cumulative
     ,max(store_sales)
         over (partition by item_sk order by d_date rows between unbounded preceding and current row) store_cumulative
     from (select case when web.item_sk is not null then web.item_sk else store.item_sk end item_sk
                 ,case when web.d_date is not null then web.d_date else store.d_date end d_date
                 ,web.cume_sales web_sales
                 ,store.cume_sales store_sales
           from web_v1 web full outer join store_v1 store on (web.item_sk = store.item_sk
                                                          and web.d_date = store.d_date)
          )x )y
where web_cumulative * 3 > store_cumulative
order by item_sk
        ,d_date
limit 100
"""

# query75.sql — year-over-year net-of-returns decline across all three
# channels (UNION dedup of per-line detail). 'Books' → 'CAT_4'; d_year
# 2002 → 2001 (prev 2000); decimal(17,2) ratio casts → double with a
# nullif(., 0) divisor guard (net-of-returns counts can sum to zero and
# Spark's ANSI mode errors on division by zero); money diffs at the
# dollar boundary; the backtick `year` alias → curr_year.
_Q75 = """
WITH all_sales AS (
 SELECT d_year
       ,i_brand_id
       ,i_class_id
       ,i_category_id
       ,i_manufact_id
       ,CAST(SUM(sales_cnt) AS BIGINT) AS sales_cnt
       -- ^ r10: driver-hash dtype class (DuckDB HUGEINT sums -> float64);
       -- fixes prev_yr_cnt / curr_yr_cnt / sales_cnt_diff downstream
       ,SUM(sales_amt) AS sales_amt
 FROM (SELECT d_year
             ,i_brand_id
             ,i_class_id
             ,i_category_id
             ,i_manufact_id
             ,cs_quantity - COALESCE(cr_return_quantity,0) AS sales_cnt
             ,cs_ext_sales_price - COALESCE(cr_return_amount,0) AS sales_amt
       FROM catalog_sales JOIN item ON i_item_sk=cs_item_sk
                          JOIN date_dim ON d_date_sk=cs_sold_date_sk
                          LEFT JOIN catalog_returns ON (cs_order_number=cr_order_number
                                                    AND cs_item_sk=cr_item_sk)
       WHERE i_category='CAT_4'
       UNION
       SELECT d_year
             ,i_brand_id
             ,i_class_id
             ,i_category_id
             ,i_manufact_id
             ,ss_quantity - COALESCE(sr_return_quantity,0) AS sales_cnt
             ,ss_ext_sales_price - COALESCE(sr_return_amt,0) AS sales_amt
       FROM store_sales JOIN item ON i_item_sk=ss_item_sk
                        JOIN date_dim ON d_date_sk=ss_sold_date_sk
                        LEFT JOIN store_returns ON (ss_ticket_number=sr_ticket_number
                                                AND ss_item_sk=sr_item_sk)
       WHERE i_category='CAT_4'
       UNION
       SELECT d_year
             ,i_brand_id
             ,i_class_id
             ,i_category_id
             ,i_manufact_id
             ,ws_quantity - COALESCE(wr_return_quantity,0) AS sales_cnt
             ,ws_ext_sales_price - COALESCE(wr_return_amt,0) AS sales_amt
       FROM web_sales JOIN item ON i_item_sk=ws_item_sk
                      JOIN date_dim ON d_date_sk=ws_sold_date_sk
                      LEFT JOIN web_returns ON (ws_order_number=wr_order_number
                                            AND ws_item_sk=wr_item_sk)
       WHERE i_category='CAT_4') sales_detail
 GROUP BY d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
 SELECT  prev_yr.d_year AS prev_year
                          ,curr_yr.d_year AS curr_year
                          ,curr_yr.i_brand_id
                          ,curr_yr.i_class_id
                          ,curr_yr.i_category_id
                          ,curr_yr.i_manufact_id
                          ,prev_yr.sales_cnt AS prev_yr_cnt
                          ,curr_yr.sales_cnt AS curr_yr_cnt
                          ,curr_yr.sales_cnt-prev_yr.sales_cnt AS sales_cnt_diff
                          ,round((curr_yr.sales_amt-prev_yr.sales_amt) / 100, 2) AS sales_amt_diff
 FROM all_sales curr_yr, all_sales prev_yr
 WHERE curr_yr.i_brand_id=prev_yr.i_brand_id
   AND curr_yr.i_class_id=prev_yr.i_class_id
   AND curr_yr.i_category_id=prev_yr.i_category_id
   AND curr_yr.i_manufact_id=prev_yr.i_manufact_id
   AND curr_yr.d_year=2001
   AND prev_yr.d_year=2001-1
   AND CAST(curr_yr.sales_cnt AS double)/nullif(CAST(prev_yr.sales_cnt AS double), 0)<0.9
 ORDER BY sales_cnt_diff,sales_amt_diff
 limit 100
"""

# query83.sql — returned quantity balance across the three channels in
# anchor weeks. The decimal(7,2) cast dropped (quantities are exact
# ints; mixed decimal/bigint sums type-diverge across engines); deviation
# ratios rounded to 4dp. The reference's 3 anchor dates → 12 (one per
# month of 2000): the synthetic catalog/web channels are 1/3 slices, so
# an item returned in ALL three channels within 3 weeks almost never
# exists at the oracle SFs.
_Q83 = """
with sr_items as
 (select i_item_id item_id,
        cast(sum(sr_return_quantity) as bigint) sr_item_qty
        -- ^ r10 (and the two casts below): driver-hash dtype class
 from store_returns,
      item,
      date_dim
 where sr_item_sk = i_item_sk
 and   d_date    in
	(select d_date
	from date_dim
	where d_week_seq in
		(select d_week_seq
		from date_dim
	  where d_date in ('2000-01-14','2000-02-11','2000-03-10','2000-04-14','2000-05-12','2000-06-30','2000-07-14','2000-08-11','2000-09-27','2000-10-13','2000-11-17','2000-12-08')))
 and   sr_returned_date_sk   = d_date_sk
 group by i_item_id),
 cr_items as
 (select i_item_id item_id,
        cast(sum(cr_return_quantity) as bigint) cr_item_qty
 from catalog_returns,
      item,
      date_dim
 where cr_item_sk = i_item_sk
 and   d_date    in
	(select d_date
	from date_dim
	where d_week_seq in
		(select d_week_seq
		from date_dim
	  where d_date in ('2000-01-14','2000-02-11','2000-03-10','2000-04-14','2000-05-12','2000-06-30','2000-07-14','2000-08-11','2000-09-27','2000-10-13','2000-11-17','2000-12-08')))
 and   cr_returned_date_sk   = d_date_sk
 group by i_item_id),
 wr_items as
 (select i_item_id item_id,
        cast(sum(wr_return_quantity) as bigint) wr_item_qty
 from web_returns,
      item,
      date_dim
 where wr_item_sk = i_item_sk
 and   d_date    in
	(select d_date
	from date_dim
	where d_week_seq in
		(select d_week_seq
		from date_dim
		where d_date in ('2000-01-14','2000-02-11','2000-03-10','2000-04-14','2000-05-12','2000-06-30','2000-07-14','2000-08-11','2000-09-27','2000-10-13','2000-11-17','2000-12-08')))
 and   wr_returned_date_sk   = d_date_sk
 group by i_item_id)
  select  sr_items.item_id
       ,sr_item_qty
       ,round(sr_item_qty/(sr_item_qty+cr_item_qty+wr_item_qty)/3.0 * 100, 4) sr_dev
       ,cr_item_qty
       ,round(cr_item_qty/(sr_item_qty+cr_item_qty+wr_item_qty)/3.0 * 100, 4) cr_dev
       ,wr_item_qty
       ,round(wr_item_qty/(sr_item_qty+cr_item_qty+wr_item_qty)/3.0 * 100, 4) wr_dev
       ,round(cast(sr_item_qty+cr_item_qty+wr_item_qty as double)/3.0, 4) average
 from sr_items
     ,cr_items
     ,wr_items
 where sr_items.item_id=cr_items.item_id
   and sr_items.item_id=wr_items.item_id
 order by sr_items.item_id
         ,sr_item_qty
 limit 100
"""

# query84.sql — income-band customer lookup fanned out by store returns.
# ca_city 'Edgewood' → 'City_5' (synthetic city pool); the income-band
# bound constants are verbatim (bands 5..8 of the synthetic 10k-wide
# bands satisfy them).
_Q84 = """
select  c_customer_id as customer_id
       , coalesce(c_last_name,'') || ', ' || coalesce(c_first_name,'') as customername
 from customer
     ,customer_address
     ,customer_demographics
     ,household_demographics
     ,income_band
     ,store_returns
 where ca_city	        =  'City_5'
   and c_current_addr_sk = ca_address_sk
   and ib_lower_bound   >=  38128
   and ib_upper_bound   <=  38128 + 50000
   and ib_income_band_sk = hd_income_band_sk
   and cd_demo_sk = c_current_cdemo_sk
   and hd_demo_sk = c_current_hdemo_sk
   and sr_cdemo_sk = cd_demo_sk
 order by c_customer_id
 limit 100
"""

# query93.sql — sales net of same-ticket returns for one return reason.
# 'reason 28' → 'reason desc number 028' (the synthetic reason text);
# money at the dollar boundary.
_Q93 = """
select  ss_customer_sk
            ,round(sum(act_sales) / 100, 2) sumsales
      from (select ss_item_sk
                  ,ss_ticket_number
                  ,ss_customer_sk
                  ,case when sr_return_quantity is not null then (ss_quantity-sr_return_quantity)*ss_sales_price
                                                            else (ss_quantity*ss_sales_price) end act_sales
            from store_sales left outer join store_returns on (sr_item_sk = ss_item_sk
                                                               and sr_ticket_number = ss_ticket_number)
                ,reason
            where sr_reason_sk = r_reason_sk
              and r_reason_desc = 'reason desc number 028') t
      group by ss_customer_sk
      order by sumsales, ss_customer_sk
limit 100
"""

# query95.sql — q94 with the multi-warehouse condition as an IN over a
# self-joined CTE plus a returned-order IN (the literal form of the
# graded adapted multi-hop-exists shape). ca_state 'IL' → 'TX'; backtick
# aliases → identifiers; dollar boundary.
_Q95 = """
with ws_wh as
(select ws1.ws_order_number,ws1.ws_warehouse_sk wh1,ws2.ws_warehouse_sk wh2
 from web_sales ws1,web_sales ws2
 where ws1.ws_order_number = ws2.ws_order_number
   and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
 select
   count(distinct ws_order_number) as order_count
  ,round(sum(ws_ext_ship_cost) / 100, 2) as total_shipping_cost
  ,round(sum(ws_net_profit) / 100, 2) as total_net_profit
from
   web_sales ws1
  ,date_dim
  ,customer_address
  ,web_site
where
    d_date between '1999-2-01' and
           (cast('1999-2-01' as date) + INTERVAL '60' day)
and ws1.ws_ship_date_sk = d_date_sk
and ws1.ws_ship_addr_sk = ca_address_sk
and ca_state = 'TX'
and ws1.ws_web_site_sk = web_site_sk
and web_company_name = 'pri'
and ws1.ws_order_number in (select ws_order_number
                            from ws_wh)
and ws1.ws_order_number in (select wr_order_number
                            from web_returns,ws_wh
                            where wr_order_number = ws_wh.ws_order_number)
order by count(distinct ws_order_number)
limit 100
"""

# query97.sql — store/catalog basket overlap census via FULL OUTER join
# (the literal form of the graded adapted channel-overlap shape).
# d_month_seq 1200..1211 → 61..72.
_Q97 = """
with ssci as (
select ss_customer_sk customer_sk
      ,ss_item_sk item_sk
from store_sales,date_dim
where ss_sold_date_sk = d_date_sk
  and d_month_seq between 61 and 61 + 11
group by ss_customer_sk
        ,ss_item_sk),
csci as(
 select cs_bill_customer_sk customer_sk
      ,cs_item_sk item_sk
from catalog_sales,date_dim
where cs_sold_date_sk = d_date_sk
  and d_month_seq between 61 and 61 + 11
group by cs_bill_customer_sk
        ,cs_item_sk)
 select  cast(sum(case when ssci.customer_sk is not null and csci.customer_sk is null then 1 else 0 end) as bigint) store_only
      ,cast(sum(case when ssci.customer_sk is null and csci.customer_sk is not null then 1 else 0 end) as bigint) catalog_only
      ,cast(sum(case when ssci.customer_sk is not null and csci.customer_sk is not null then 1 else 0 end) as bigint) store_and_catalog
      -- ^ r10: driver-hash dtype class (DuckDB HUGEINT sums -> float64)
from ssci full outer join csci on (ssci.customer_sk=csci.customer_sk
                               and ssci.item_sk = csci.item_sk)
limit 100
"""

# ---- wave 7: time_dim family + NULL-key census + remaining shapes ------

# query44.sql — best/worst items by avg net profit, rank-joined. The
# synthetic fact now carries a rare NULL ss_addr_sk slice (1/41 of lines)
# so the reference's `ss_addr_sk is null` anchor subquery is non-empty.
_Q44 = """
select  asceding.rnk, i1.i_product_name best_performing, i2.i_product_name worst_performing
from(select *
     from (select item_sk,rank() over (order by rank_col asc) rnk
           from (select ss_item_sk item_sk,sum(ss_net_profit) / count(ss_net_profit) rank_col
                 from store_sales ss1
                 where ss_store_sk = 4
                 group by ss_item_sk
                 having sum(ss_net_profit) / count(ss_net_profit) > 0.9*(select sum(ss_net_profit) / count(ss_net_profit) rank_col
                                                  from store_sales
                                                  where ss_store_sk = 4
                                                    and ss_addr_sk is null
                                                  group by ss_store_sk))V1)V11
     where rnk  < 11) asceding,
    (select *
     from (select item_sk,rank() over (order by rank_col desc) rnk
           from (select ss_item_sk item_sk,sum(ss_net_profit) / count(ss_net_profit) rank_col
                 from store_sales ss1
                 where ss_store_sk = 4
                 group by ss_item_sk
                 having sum(ss_net_profit) / count(ss_net_profit) > 0.9*(select sum(ss_net_profit) / count(ss_net_profit) rank_col
                                                  from store_sales
                                                  where ss_store_sk = 4
                                                    and ss_addr_sk is null
                                                  group by ss_store_sk))V2)V21
     where rnk  < 11) descending,
item i1,
item i2
where asceding.rnk = descending.rnk
  and i1.i_item_sk=asceding.item_sk
  and i2.i_item_sk=descending.item_sk
order by asceding.rnk
limit 100
"""

# query66.sql — warehouse monthly shipping pivot over both non-store
# channels. Backtick `year` → dyear; money pivots at the dollar boundary,
# per-square-foot ratios rounded to 4dp; verbatim time band and carriers
# (the synthetic sm_carrier pool is exactly DHL/BARIAN).
_Q66 = """
select
         w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
        ,ship_carriers
        ,dyear
 	,round(sum(jan_sales) / 100, 2) as jan_sales
 	,round(sum(feb_sales) / 100, 2) as feb_sales
 	,round(sum(mar_sales) / 100, 2) as mar_sales
 	,round(sum(apr_sales) / 100, 2) as apr_sales
 	,round(sum(may_sales) / 100, 2) as may_sales
 	,round(sum(jun_sales) / 100, 2) as jun_sales
 	,round(sum(jul_sales) / 100, 2) as jul_sales
 	,round(sum(aug_sales) / 100, 2) as aug_sales
 	,round(sum(sep_sales) / 100, 2) as sep_sales
 	,round(sum(oct_sales) / 100, 2) as oct_sales
 	,round(sum(nov_sales) / 100, 2) as nov_sales
 	,round(sum(dec_sales) / 100, 2) as dec_sales
 	,round(sum(jan_sales/w_warehouse_sq_ft), 4) as jan_sales_per_sq_foot
 	,round(sum(feb_sales/w_warehouse_sq_ft), 4) as feb_sales_per_sq_foot
 	,round(sum(mar_sales/w_warehouse_sq_ft), 4) as mar_sales_per_sq_foot
 	,round(sum(apr_sales/w_warehouse_sq_ft), 4) as apr_sales_per_sq_foot
 	,round(sum(may_sales/w_warehouse_sq_ft), 4) as may_sales_per_sq_foot
 	,round(sum(jun_sales/w_warehouse_sq_ft), 4) as jun_sales_per_sq_foot
 	,round(sum(jul_sales/w_warehouse_sq_ft), 4) as jul_sales_per_sq_foot
 	,round(sum(aug_sales/w_warehouse_sq_ft), 4) as aug_sales_per_sq_foot
 	,round(sum(sep_sales/w_warehouse_sq_ft), 4) as sep_sales_per_sq_foot
 	,round(sum(oct_sales/w_warehouse_sq_ft), 4) as oct_sales_per_sq_foot
 	,round(sum(nov_sales/w_warehouse_sq_ft), 4) as nov_sales_per_sq_foot
 	,round(sum(dec_sales/w_warehouse_sq_ft), 4) as dec_sales_per_sq_foot
 	,round(sum(jan_net) / 100, 2) as jan_net
 	,round(sum(feb_net) / 100, 2) as feb_net
 	,round(sum(mar_net) / 100, 2) as mar_net
 	,round(sum(apr_net) / 100, 2) as apr_net
 	,round(sum(may_net) / 100, 2) as may_net
 	,round(sum(jun_net) / 100, 2) as jun_net
 	,round(sum(jul_net) / 100, 2) as jul_net
 	,round(sum(aug_net) / 100, 2) as aug_net
 	,round(sum(sep_net) / 100, 2) as sep_net
 	,round(sum(oct_net) / 100, 2) as oct_net
 	,round(sum(nov_net) / 100, 2) as nov_net
 	,round(sum(dec_net) / 100, 2) as dec_net
 from (
     select
 	w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
 	,'DHL' || ',' || 'BARIAN' as ship_carriers
       ,d_year as dyear
 	,sum(case when d_moy = 1
 		then ws_ext_sales_price* ws_quantity else 0 end) as jan_sales
 	,sum(case when d_moy = 2
 		then ws_ext_sales_price* ws_quantity else 0 end) as feb_sales
 	,sum(case when d_moy = 3
 		then ws_ext_sales_price* ws_quantity else 0 end) as mar_sales
 	,sum(case when d_moy = 4
 		then ws_ext_sales_price* ws_quantity else 0 end) as apr_sales
 	,sum(case when d_moy = 5
 		then ws_ext_sales_price* ws_quantity else 0 end) as may_sales
 	,sum(case when d_moy = 6
 		then ws_ext_sales_price* ws_quantity else 0 end) as jun_sales
 	,sum(case when d_moy = 7
 		then ws_ext_sales_price* ws_quantity else 0 end) as jul_sales
 	,sum(case when d_moy = 8
 		then ws_ext_sales_price* ws_quantity else 0 end) as aug_sales
 	,sum(case when d_moy = 9
 		then ws_ext_sales_price* ws_quantity else 0 end) as sep_sales
 	,sum(case when d_moy = 10
 		then ws_ext_sales_price* ws_quantity else 0 end) as oct_sales
 	,sum(case when d_moy = 11
 		then ws_ext_sales_price* ws_quantity else 0 end) as nov_sales
 	,sum(case when d_moy = 12
 		then ws_ext_sales_price* ws_quantity else 0 end) as dec_sales
 	,sum(case when d_moy = 1
 		then ws_net_paid * ws_quantity else 0 end) as jan_net
 	,sum(case when d_moy = 2
 		then ws_net_paid * ws_quantity else 0 end) as feb_net
 	,sum(case when d_moy = 3
 		then ws_net_paid * ws_quantity else 0 end) as mar_net
 	,sum(case when d_moy = 4
 		then ws_net_paid * ws_quantity else 0 end) as apr_net
 	,sum(case when d_moy = 5
 		then ws_net_paid * ws_quantity else 0 end) as may_net
 	,sum(case when d_moy = 6
 		then ws_net_paid * ws_quantity else 0 end) as jun_net
 	,sum(case when d_moy = 7
 		then ws_net_paid * ws_quantity else 0 end) as jul_net
 	,sum(case when d_moy = 8
 		then ws_net_paid * ws_quantity else 0 end) as aug_net
 	,sum(case when d_moy = 9
 		then ws_net_paid * ws_quantity else 0 end) as sep_net
 	,sum(case when d_moy = 10
 		then ws_net_paid * ws_quantity else 0 end) as oct_net
 	,sum(case when d_moy = 11
 		then ws_net_paid * ws_quantity else 0 end) as nov_net
 	,sum(case when d_moy = 12
 		then ws_net_paid * ws_quantity else 0 end) as dec_net
     from
          web_sales
         ,warehouse
         ,date_dim
         ,time_dim
 	  ,ship_mode
     where
            ws_warehouse_sk =  w_warehouse_sk
        and ws_sold_date_sk = d_date_sk
        and ws_sold_time_sk = t_time_sk
 	and ws_ship_mode_sk = sm_ship_mode_sk
        and d_year = 2001
 	and t_time between 30838 and 30838+28800
 	and sm_carrier in ('DHL','BARIAN')
     group by
        w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
       ,d_year
 union all
     select
 	w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
 	,'DHL' || ',' || 'BARIAN' as ship_carriers
       ,d_year as dyear
 	,sum(case when d_moy = 1
 		then cs_sales_price* cs_quantity else 0 end) as jan_sales
 	,sum(case when d_moy = 2
 		then cs_sales_price* cs_quantity else 0 end) as feb_sales
 	,sum(case when d_moy = 3
 		then cs_sales_price* cs_quantity else 0 end) as mar_sales
 	,sum(case when d_moy = 4
 		then cs_sales_price* cs_quantity else 0 end) as apr_sales
 	,sum(case when d_moy = 5
 		then cs_sales_price* cs_quantity else 0 end) as may_sales
 	,sum(case when d_moy = 6
 		then cs_sales_price* cs_quantity else 0 end) as jun_sales
 	,sum(case when d_moy = 7
 		then cs_sales_price* cs_quantity else 0 end) as jul_sales
 	,sum(case when d_moy = 8
 		then cs_sales_price* cs_quantity else 0 end) as aug_sales
 	,sum(case when d_moy = 9
 		then cs_sales_price* cs_quantity else 0 end) as sep_sales
 	,sum(case when d_moy = 10
 		then cs_sales_price* cs_quantity else 0 end) as oct_sales
 	,sum(case when d_moy = 11
 		then cs_sales_price* cs_quantity else 0 end) as nov_sales
 	,sum(case when d_moy = 12
 		then cs_sales_price* cs_quantity else 0 end) as dec_sales
 	,sum(case when d_moy = 1
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as jan_net
 	,sum(case when d_moy = 2
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as feb_net
 	,sum(case when d_moy = 3
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as mar_net
 	,sum(case when d_moy = 4
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as apr_net
 	,sum(case when d_moy = 5
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as may_net
 	,sum(case when d_moy = 6
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as jun_net
 	,sum(case when d_moy = 7
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as jul_net
 	,sum(case when d_moy = 8
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as aug_net
 	,sum(case when d_moy = 9
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as sep_net
 	,sum(case when d_moy = 10
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as oct_net
 	,sum(case when d_moy = 11
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as nov_net
 	,sum(case when d_moy = 12
 		then cs_net_paid_inc_tax * cs_quantity else 0 end) as dec_net
     from
          catalog_sales
         ,warehouse
         ,date_dim
         ,time_dim
 	 ,ship_mode
     where
            cs_warehouse_sk =  w_warehouse_sk
        and cs_sold_date_sk = d_date_sk
        and cs_sold_time_sk = t_time_sk
 	and cs_ship_mode_sk = sm_ship_mode_sk
        and d_year = 2001
 	and t_time between 30838 AND 30838+28800
 	and sm_carrier in ('DHL','BARIAN')
     group by
        w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
       ,d_year
 ) x
 group by
        w_warehouse_name
 	,w_warehouse_sq_ft
 	,w_city
 	,w_county
 	,w_state
 	,w_country
 	,ship_carriers
       ,dyear
 order by w_warehouse_name
 limit 100
"""

# query71.sql — breakfast/dinner brand sales by minute across all three
# channels. i_manager_id = 1 verbatim; money at the dollar boundary.
_Q71 = """
select i_brand_id brand_id, i_brand brand,t_hour,t_minute,
 	round(sum(ext_price) / 100, 2) ext_price
 from item, (select ws_ext_sales_price as ext_price,
                        ws_sold_date_sk as sold_date_sk,
                        ws_item_sk as sold_item_sk,
                        ws_sold_time_sk as time_sk
                 from web_sales,date_dim
                 where d_date_sk = ws_sold_date_sk
                   and d_moy=11
                   and d_year=1999
                 union all
                 select cs_ext_sales_price as ext_price,
                        cs_sold_date_sk as sold_date_sk,
                        cs_item_sk as sold_item_sk,
                        cs_sold_time_sk as time_sk
                 from catalog_sales,date_dim
                 where d_date_sk = cs_sold_date_sk
                   and d_moy=11
                   and d_year=1999
                 union all
                 select ss_ext_sales_price as ext_price,
                        ss_sold_date_sk as sold_date_sk,
                        ss_item_sk as sold_item_sk,
                        ss_sold_time_sk as time_sk
                 from store_sales,date_dim
                 where d_date_sk = ss_sold_date_sk
                   and d_moy=11
                   and d_year=1999
                 ) tmp,time_dim
 where
   sold_item_sk = i_item_sk
   and i_manager_id=1
   and time_sk = t_time_sk
   and (t_meal_time = 'breakfast' or t_meal_time = 'dinner')
 group by i_brand, i_brand_id,t_hour,t_minute
 order by ext_price desc, i_brand_id
"""

# query72.sql — catalog orders short on inventory in the sold week
# (9-way join with three date_dim roles and two LEFT joins). Verbatim
# constants (all the demographic values exist); counts only, no money;
# the trailing bare d_week_seq ORDER key qualified as d1 (ambiguous under
# DuckDB's resolution with three date_dim instances).
_Q72 = """
select  i_item_desc
      ,w_warehouse_name
      ,d1.d_week_seq
      ,cast(sum(case when p_promo_sk is null then 1 else 0 end) as bigint) no_promo
      ,cast(sum(case when p_promo_sk is not null then 1 else 0 end) as bigint) promo
      -- ^ r10: driver-hash dtype class (DuckDB HUGEINT sums -> float64)
      ,count(*) total_cnt
from catalog_sales
join inventory on (cs_item_sk = inv_item_sk)
join warehouse on (w_warehouse_sk=inv_warehouse_sk)
join item on (i_item_sk = cs_item_sk)
join customer_demographics on (cs_bill_cdemo_sk = cd_demo_sk)
join household_demographics on (cs_bill_hdemo_sk = hd_demo_sk)
join date_dim d1 on (cs_sold_date_sk = d1.d_date_sk)
join date_dim d2 on (inv_date_sk = d2.d_date_sk)
join date_dim d3 on (cs_ship_date_sk = d3.d_date_sk)
left outer join promotion on (cs_promo_sk=p_promo_sk)
left outer join catalog_returns on (cr_item_sk = cs_item_sk and cr_order_number = cs_order_number)
where d1.d_week_seq = d2.d_week_seq
  and inv_quantity_on_hand < cs_quantity
  and d3.d_date > d1.d_date + INTERVAL '5' day
  and hd_buy_potential = '>10000'
  and d1.d_year = 1999
  and cd_marital_status = 'D'
group by i_item_desc,w_warehouse_name,d1.d_week_seq
order by total_cnt desc, i_item_desc, w_warehouse_name, d1.d_week_seq
limit 100
"""

# query76.sql — NULL-key sales census per channel. The synthetic fact
# carries NULL slices on ws_ship_customer_sk and cs_ship_addr_sk (1/43 of
# lines); ss_store_sk is never NULL by construction (every synthetic sale
# records a store), so the store branch is legitimately empty — the
# census still exercises all three scans and the UNION.
_Q76 = """
select  channel, col_name, d_year, d_qoy, i_category, COUNT(*) sales_cnt, round(SUM(ext_sales_price) / 100, 2) sales_amt FROM (
        SELECT 'store' as channel, 'ss_store_sk' col_name, d_year, d_qoy, i_category, ss_ext_sales_price ext_sales_price
         FROM store_sales, item, date_dim
         WHERE ss_store_sk IS NULL
           AND ss_sold_date_sk=d_date_sk
           AND ss_item_sk=i_item_sk
        UNION ALL
        SELECT 'web' as channel, 'ws_ship_customer_sk' col_name, d_year, d_qoy, i_category, ws_ext_sales_price ext_sales_price
         FROM web_sales, item, date_dim
         WHERE ws_ship_customer_sk IS NULL
           AND ws_sold_date_sk=d_date_sk
           AND ws_item_sk=i_item_sk
        UNION ALL
        SELECT 'catalog' as channel, 'cs_ship_addr_sk' col_name, d_year, d_qoy, i_category, cs_ext_sales_price ext_sales_price
         FROM catalog_sales, item, date_dim
         WHERE cs_ship_addr_sk IS NULL
           AND cs_sold_date_sk=d_date_sk
           AND cs_item_sk=i_item_sk) foo
GROUP BY channel, col_name, d_year, d_qoy, i_category
ORDER BY channel, col_name, d_year, d_qoy, i_category
limit 100
"""

# query78.sql — store loyalty vs other channels for unreturned sales
# (LEFT-join anti pattern). The decimal(7,2) quantity cast dropped
# (exact int sums); money at the dollar boundary; ratio is int/int → the
# same double in both engines.
_Q78 = """
with ws as
  (select d_year AS ws_sold_year, ws_item_sk,
    ws_bill_customer_sk ws_customer_sk,
    cast(sum(ws_quantity) as bigint) ws_qty,
    -- ^ r10 (and the two casts below): driver-hash dtype class on the
    -- qty outputs (store_qty / other_chan_qty)
    sum(ws_wholesale_cost) ws_wc,
    sum(ws_sales_price) ws_sp
   from web_sales
   left join web_returns on wr_order_number=ws_order_number and ws_item_sk=wr_item_sk
   join date_dim on ws_sold_date_sk = d_date_sk
   where wr_order_number is null
   group by d_year, ws_item_sk, ws_bill_customer_sk
   ),
cs as
  (select d_year AS cs_sold_year, cs_item_sk,
    cs_bill_customer_sk cs_customer_sk,
    cast(sum(cs_quantity) as bigint) cs_qty,
    sum(cs_wholesale_cost) cs_wc,
    sum(cs_sales_price) cs_sp
   from catalog_sales
   left join catalog_returns on cr_order_number=cs_order_number and cs_item_sk=cr_item_sk
   join date_dim on cs_sold_date_sk = d_date_sk
   where cr_order_number is null
   group by d_year, cs_item_sk, cs_bill_customer_sk
   ),
ss as
  (select d_year AS ss_sold_year, ss_item_sk,
    ss_customer_sk,
    cast(sum(ss_quantity) as bigint) ss_qty,
    sum(ss_wholesale_cost) ss_wc,
    sum(ss_sales_price) ss_sp
   from store_sales
   left join store_returns on sr_ticket_number=ss_ticket_number and ss_item_sk=sr_item_sk
   join date_dim on ss_sold_date_sk = d_date_sk
   where sr_ticket_number is null
   group by d_year, ss_item_sk, ss_customer_sk
   )
 select
ss_sold_year, ss_item_sk, ss_customer_sk,
round(ss_qty/(coalesce(ws_qty,0)+coalesce(cs_qty,0)),2) ratio,
ss_qty store_qty, round(ss_wc / 100, 2) store_wholesale_cost, round(ss_sp / 100, 2) store_sales_price,
coalesce(ws_qty,0)+coalesce(cs_qty,0) other_chan_qty,
round((coalesce(ws_wc,0)+coalesce(cs_wc,0)) / 100, 2) other_chan_wholesale_cost,
round((coalesce(ws_sp,0)+coalesce(cs_sp,0)) / 100, 2) other_chan_sales_price
from ss
left join ws on (ws_sold_year=ss_sold_year and ws_item_sk=ss_item_sk and ws_customer_sk=ss_customer_sk)
left join cs on (cs_sold_year=ss_sold_year and cs_item_sk=ss_item_sk and cs_customer_sk=ss_customer_sk)
where (coalesce(ws_qty,0)>0 or coalesce(cs_qty, 0)>0) and ss_sold_year=2000
order by
  ss_sold_year, ss_item_sk, ss_customer_sk,
  ss_qty desc, ss_wc desc, ss_sp desc,
  other_chan_qty,
  other_chan_wholesale_cost,
  other_chan_sales_price,
  ratio
limit 100
"""

# query88.sql — eight half-hour store-traffic buckets cross-joined
# (single-row sides → broadcast nested loop). s_store_name 'ese' →
# 'Store_5'; counts only.
_Q88 = """
select  *
from
 (select count(*) h8_30_to_9
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 8
     and time_dim.t_minute >= 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'Store_5') s1,
 (select count(*) h9_to_9_30
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 9
     and time_dim.t_minute < 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'Store_5') s2,
 (select count(*) h9_30_to_10
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 9
     and time_dim.t_minute >= 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'Store_5') s3,
 (select count(*) h10_to_10_30
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 10
     and time_dim.t_minute < 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'Store_5') s4,
 (select count(*) h10_30_to_11
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 10
     and time_dim.t_minute >= 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'Store_5') s5,
 (select count(*) h11_to_11_30
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 11
     and time_dim.t_minute < 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'Store_5') s6,
 (select count(*) h11_30_to_12
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 11
     and time_dim.t_minute >= 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'Store_5') s7,
 (select count(*) h12_to_12_30
 from store_sales, household_demographics , time_dim, store
 where ss_sold_time_sk = time_dim.t_time_sk
     and ss_hdemo_sk = household_demographics.hd_demo_sk
     and ss_store_sk = s_store_sk
     and time_dim.t_hour = 12
     and time_dim.t_minute < 30
     and ((household_demographics.hd_dep_count = 4 and household_demographics.hd_vehicle_count<=4+2) or
          (household_demographics.hd_dep_count = 2 and household_demographics.hd_vehicle_count<=2+2) or
          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2))
     and store.s_store_name = 'Store_5') s8
"""

# query90.sql — web AM/PM traffic ratio. decimal(15,4) casts → double
# with a nullif guard (Spark ANSI errors on a zero PM count); the
# backtick `at` alias → am; ratio rounded to 4dp.
_Q90 = """
select  round(cast(amc as double)/nullif(cast(pmc as double), 0), 4) am_pm_ratio
 from ( select count(*) amc
       from web_sales, household_demographics , time_dim, web_page
       where ws_sold_time_sk = time_dim.t_time_sk
         and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
         and ws_web_page_sk = web_page.wp_web_page_sk
         and time_dim.t_hour between 8 and 8+1
         and household_demographics.hd_dep_count = 6
         and web_page.wp_char_count between 5000 and 5200) am
      ,( select count(*) pmc
       from web_sales, household_demographics , time_dim, web_page
       where ws_sold_time_sk = time_dim.t_time_sk
         and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
         and ws_web_page_sk = web_page.wp_web_page_sk
         and time_dim.t_hour between 19 and 19+1
         and household_demographics.hd_dep_count = 6
         and web_page.wp_char_count between 5000 and 5200) pt
 order by am_pm_ratio
 limit 100
"""

# query96.sql — evening store-traffic count. s_store_name 'ese' →
# 'Store_5'; the bare count aliased.
_Q96 = """
select  count(*) cnt
from store_sales
    ,household_demographics
    ,time_dim, store
where ss_sold_time_sk = time_dim.t_time_sk
    and ss_hdemo_sk = household_demographics.hd_demo_sk
    and ss_store_sk = s_store_sk
    and time_dim.t_hour = 20
    and time_dim.t_minute >= 30
    and household_demographics.hd_dep_count = 7
    and store.s_store_name = 'Store_5'
order by count(*)
limit 100
"""

# ---- wave 8: the q64 cross-sales monster --------------------------------

# query64.sql — the 18-relation cross-sales self-join (two demographic /
# household / address / income-band roles, three date roles, the cs_ui
# refund-gated catalog aggregate). Adaptations: i_color list and the
# double price band retargeted into the synthetic domains; the duplicate
# output names (syear/cnt from both sides) aliased *1/*2; money at the
# dollar boundary.
_Q64 = """
with cs_ui as
 (select cs_item_sk
        ,sum(cs_ext_list_price) as sale,sum(cr_refunded_cash+cr_reversed_charge+cr_store_credit) as refund
  from catalog_sales
      ,catalog_returns
  where cs_item_sk = cr_item_sk
    and cs_order_number = cr_order_number
  group by cs_item_sk
  having sum(cs_ext_list_price)>2*sum(cr_refunded_cash+cr_reversed_charge+cr_store_credit)),
cross_sales as
 (select i_product_name product_name
     ,i_item_sk item_sk
     ,s_store_name store_name
     ,s_zip store_zip
     ,ad1.ca_street_number b_street_number
     ,ad1.ca_street_name b_street_name
     ,ad1.ca_city b_city
     ,ad1.ca_zip b_zip
     ,ad2.ca_street_number c_street_number
     ,ad2.ca_street_name c_street_name
     ,ad2.ca_city c_city
     ,ad2.ca_zip c_zip
     ,d1.d_year as syear
     ,d2.d_year as fsyear
     ,d3.d_year s2year
     ,count(*) cnt
     ,sum(ss_wholesale_cost) s1
     ,sum(ss_list_price) s2
     ,sum(ss_coupon_amt) s3
  FROM   store_sales
        ,store_returns
        ,cs_ui
        ,date_dim d1
        ,date_dim d2
        ,date_dim d3
        ,store
        ,customer
        ,customer_demographics cd1
        ,customer_demographics cd2
        ,promotion
        ,household_demographics hd1
        ,household_demographics hd2
        ,customer_address ad1
        ,customer_address ad2
        ,income_band ib1
        ,income_band ib2
        ,item
  WHERE  ss_store_sk = s_store_sk AND
         ss_sold_date_sk = d1.d_date_sk AND
         ss_customer_sk = c_customer_sk AND
         ss_cdemo_sk= cd1.cd_demo_sk AND
         ss_hdemo_sk = hd1.hd_demo_sk AND
         ss_addr_sk = ad1.ca_address_sk and
         ss_item_sk = i_item_sk and
         ss_item_sk = sr_item_sk and
         ss_ticket_number = sr_ticket_number and
         ss_item_sk = cs_ui.cs_item_sk and
         c_current_cdemo_sk = cd2.cd_demo_sk AND
         c_current_hdemo_sk = hd2.hd_demo_sk AND
         c_current_addr_sk = ad2.ca_address_sk and
         c_first_sales_date_sk = d2.d_date_sk and
         c_first_shipto_date_sk = d3.d_date_sk and
         ss_promo_sk = p_promo_sk and
         hd1.hd_income_band_sk = ib1.ib_income_band_sk and
         hd2.hd_income_band_sk = ib2.ib_income_band_sk and
         cd1.cd_marital_status <> cd2.cd_marital_status and
         i_color in ('col_1','col_3','col_5','col_7','col_9','col_11') and
         i_current_price between 900 and 900 + 60 and
         i_current_price between 900 + 5 and 900 + 70
group by i_product_name
       ,i_item_sk
       ,s_store_name
       ,s_zip
       ,ad1.ca_street_number
       ,ad1.ca_street_name
       ,ad1.ca_city
       ,ad1.ca_zip
       ,ad2.ca_street_number
       ,ad2.ca_street_name
       ,ad2.ca_city
       ,ad2.ca_zip
       ,d1.d_year
       ,d2.d_year
       ,d3.d_year
)
select cs1.product_name
     ,cs1.store_name
     ,cs1.store_zip
     ,cs1.b_street_number
     ,cs1.b_street_name
     ,cs1.b_city
     ,cs1.b_zip
     ,cs1.c_street_number
     ,cs1.c_street_name
     ,cs1.c_city
     ,cs1.c_zip
     ,cs1.syear syear1
     ,cs1.cnt cnt1
     ,round(cs1.s1 / 100, 2) as s11
     ,round(cs1.s2 / 100, 2) as s21
     ,round(cs1.s3 / 100, 2) as s31
     ,round(cs2.s1 / 100, 2) as s12
     ,round(cs2.s2 / 100, 2) as s22
     ,round(cs2.s3 / 100, 2) as s32
     ,cs2.syear syear2
     ,cs2.cnt cnt2
from cross_sales cs1,cross_sales cs2
where cs1.item_sk=cs2.item_sk and
     cs1.syear = 1999 and
     cs2.syear = 1999 + 1 and
     cs2.cnt <= cs1.cnt and
     cs1.store_name = cs2.store_name and
     cs1.store_zip = cs2.store_zip
order by cs1.product_name
       ,cs1.store_name
       ,cs2.cnt
       ,cs1.s1
       ,cs2.s1
"""

TEXTS = {
    "tpcds_lit_q1": _Q1,
    "tpcds_lit_q2": _Q2,
    "tpcds_lit_q9": _Q9,
    "tpcds_lit_q17": _Q17,
    "tpcds_lit_q21": _Q21,
    "tpcds_lit_q22": _Q22,
    "tpcds_lit_q25": _Q25,
    "tpcds_lit_q27": _Q27,
    "tpcds_lit_q29": _Q29,
    "tpcds_lit_q34": _Q34,
    "tpcds_lit_q37": _Q37,
    "tpcds_lit_q38": _Q38,
    "tpcds_lit_q82": _Q82,
    "tpcds_lit_q87": _Q87,
    # wave 3
    "tpcds_lit_q28": _Q28,
    "tpcds_lit_q56": _Q56,
    "tpcds_lit_q58": _Q58,
    "tpcds_lit_q59": _Q59,
    "tpcds_lit_q60": _Q60,
    "tpcds_lit_q63": _Q63,
    "tpcds_lit_q67": _Q67,
    "tpcds_lit_q70": _Q70,
    # wave 4
    "tpcds_lit_q4": _Q4,
    "tpcds_lit_q10": _Q10,
    "tpcds_lit_q11": _Q11,
    "tpcds_lit_q18": _Q18,
    "tpcds_lit_q30": _Q30,
    "tpcds_lit_q31": _Q31,
    "tpcds_lit_q35": _Q35,
    "tpcds_lit_q50": _Q50,
    "tpcds_lit_q54": _Q54,
    "tpcds_lit_q74": _Q74,
    # wave 5 (catalog_returns / call_center / catalog_page)
    "tpcds_lit_q5": _Q5,
    "tpcds_lit_q16": _Q16,
    "tpcds_lit_q32": _Q32,
    "tpcds_lit_q40": _Q40,
    "tpcds_lit_q49": _Q49,
    "tpcds_lit_q57": _Q57,
    "tpcds_lit_q77": _Q77,
    "tpcds_lit_q80": _Q80,
    "tpcds_lit_q81": _Q81,
    "tpcds_lit_q91": _Q91,
    "tpcds_lit_q92": _Q92,
    "tpcds_lit_q94": _Q94,
    "tpcds_lit_q99": _Q99,
    # wave 6
    "tpcds_lit_q51": _Q51,
    "tpcds_lit_q75": _Q75,
    "tpcds_lit_q83": _Q83,
    "tpcds_lit_q84": _Q84,
    "tpcds_lit_q93": _Q93,
    "tpcds_lit_q95": _Q95,
    "tpcds_lit_q97": _Q97,
    # wave 7
    "tpcds_lit_q44": _Q44,
    "tpcds_lit_q66": _Q66,
    "tpcds_lit_q71": _Q71,
    "tpcds_lit_q72": _Q72,
    "tpcds_lit_q76": _Q76,
    "tpcds_lit_q78": _Q78,
    "tpcds_lit_q88": _Q88,
    "tpcds_lit_q90": _Q90,
    "tpcds_lit_q96": _Q96,
    # wave 8
    "tpcds_lit_q64": _Q64,
}
