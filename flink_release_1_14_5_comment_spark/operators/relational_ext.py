"""Extended relational coverage (SURVEY §2 long tail): outer-join null
semantics, LATERAL correlate, additional OVER frames, null-safe comparison,
min-subquery join (TPC-H Q2 shape), distinct-count anti pattern (Q16 shape),
positional UNNEST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


def q_left_join_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with null-producing side + null-aware aggregation
    (OuterJoinRecordStateViews.java null-padding semantics, batch flavor)."""
    return _sql(spark, sf_dir, """
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total,
               CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
        GROUP BY c.c_custkey
    """)


ORACLE_Q_LEFT_JOIN_NULLS = """
SELECT c.c_custkey,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total,
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
GROUP BY c.c_custkey
"""


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the reference's Correlate exec node
    (StreamExecCorrelate.java:45) beyond UDTF: per-customer top order."""
    return _sql(spark, sf_dir, """
        SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
    """)


ORACLE_Q_LATERAL_TOPK = """
SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
"""


def q_over_frames_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric ROWS frame (k preceding AND following) + NTH/min/max in
    frame (SlidingOverFrame.java both-direction frames)."""
    return _sql(spark, sf_dir, """
        SELECT l_orderkey, l_linenumber,
               ROUND(AVG(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS smooth_qty,
               ROUND(MIN(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS min3,
               ROUND(MAX(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                     ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING), 2) AS max3f
        FROM lineitem WHERE l_orderkey % 20 = 0
    """)


ORACLE_Q_OVER_FRAMES_EXT = """
SELECT l_orderkey, l_linenumber,
       ROUND(AVG(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS smooth_qty,
       ROUND(MIN(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS min3,
       ROUND(MAX(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING), 2) AS max3f
FROM lineitem WHERE l_orderkey % 20 = 0
"""


def q_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] DISTINCT FROM (FlinkSqlOperatorTable.java:1011-1012) —
    null-safe comparison through a join on a nullable derived key."""
    return _sql(spark, sf_dir, """
        WITH a AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS s FROM orders),
             b AS (SELECT DISTINCT nullif(o_orderstatus, 'P') AS s FROM orders)
        SELECT b.s, CAST(COUNT(*) AS BIGINT) AS n
        FROM a JOIN b ON a.s <=> b.s
        GROUP BY b.s
    """)


ORACLE_Q_NULL_SAFE_EQ = """
WITH a AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS s FROM orders),
     b AS (SELECT DISTINCT nullif(o_orderstatus, 'P') AS s FROM orders)
SELECT b.s, CAST(COUNT(*) AS BIGINT) AS n
FROM a JOIN b ON a.s IS NOT DISTINCT FROM b.s
GROUP BY b.s
"""


def q_min_subquery_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: row matching the per-group minimum via subquery join."""
    return _sql(spark, sf_dir, """
        SELECT l.l_orderkey, l.l_linenumber, ROUND(l.l_extendedprice, 2) AS price
        FROM lineitem l
        JOIN (SELECT l_orderkey AS k, MIN(l_extendedprice) AS mn
              FROM lineitem GROUP BY l_orderkey) m
          ON l.l_orderkey = m.k AND l.l_extendedprice = m.mn
    """)


ORACLE_Q_MIN_SUBQUERY_JOIN = """
SELECT l.l_orderkey, l.l_linenumber, ROUND(l.l_extendedprice, 2) AS price
FROM lineitem l
JOIN (SELECT l_orderkey AS k, MIN(l_extendedprice) AS mn
      FROM lineitem GROUP BY l_orderkey) m
  ON l.l_orderkey = m.k AND l.l_extendedprice = m.mn
"""


def q_distinct_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) with a NOT IN anti-subquery."""
    return _sql(spark, sf_dir, """
        SELECT p_type, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size >= 10
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_type
    """)


ORACLE_Q_DISTINCT_NOT_IN = """
SELECT p_type, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size >= 10
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_type
"""


def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY (posexplode): token positions for the first
    tokens of each document."""
    t = register_views(spark, sf_dir)
    return (
        t["documents"]
        .select("doc_id", F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("pos", "tok"))
        .filter(F.col("pos") < 3)
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    )


ORACLE_Q_POSEXPLODE_TOKENS = r"""
SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, toks[pos] AS tok
FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
     (SELECT unnest([1, 2, 3]) AS pos)
WHERE pos <= len(toks)
"""


def q_having_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation with HAVING over a derived aggregate (TPC-DS-ish
    shape: agg of agg, filter on the outer)."""
    return _sql(spark, sf_dir, """
        WITH per_cust AS (
          SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
                 SUM(o_totalprice) AS spent
          FROM orders GROUP BY o_custkey
        )
        SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(SUM(spent), 2) AS total_spent
        FROM per_cust
        GROUP BY n_orders
        HAVING COUNT(*) >= 2
    """)


ORACLE_Q_HAVING_TWO_LEVEL = """
WITH per_cust AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(o_totalprice) AS spent
  FROM orders GROUP BY o_custkey
)
SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(spent), 2) AS total_spent
FROM per_cust
GROUP BY n_orders
HAVING COUNT(*) >= 2
"""


def q_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via conditional aggregation (SUM(CASE WHEN …)) — the
    portable spelling of PIVOT used across the reference's SQL tests."""
    return _sql(spark, sf_dir, """
        SELECT l_returnflag,
               ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_extendedprice ELSE 0 END), 2) AS open_amt,
               ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END), 2) AS filled_amt,
               CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
               CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_small
        FROM lineitem
        GROUP BY l_returnflag
    """)


ORACLE_Q_CONDITIONAL_PIVOT = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_extendedprice ELSE 0 END), 2) AS open_amt,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END), 2) AS filled_amt,
       CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_small
FROM lineitem
GROUP BY l_returnflag
"""


def q_exists_and_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined EXISTS + NOT EXISTS (semi ∧ anti in one plan) — TPC-H Q21/
    TPC-DS Q16 shape."""
    return _sql(spark, sf_dir, """
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'O')
          AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_totalprice > 450000)
        GROUP BY c_mktsegment
    """)


ORACLE_Q_EXISTS_AND_NOT_EXISTS = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderstatus = 'O')
  AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey
                  AND o2.o_totalprice > 450000)
GROUP BY c_mktsegment
"""


def q_window_over_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function over a join result (rank segments per region by
    revenue) — mixes broadcast join, agg, and ranking in one plan."""
    return _sql(spark, sf_dir, """
        WITH seg_rev AS (
          SELECT n.n_name, c.c_mktsegment,
                 ROUND(SUM(o.o_totalprice), 2) AS revenue
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name, c.c_mktsegment
        )
        SELECT n_name, c_mktsegment, revenue,
               CAST(RANK() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_mktsegment) AS BIGINT) AS rnk
        FROM seg_rev
        WHERE revenue > 0
    """)


ORACLE_Q_WINDOW_OVER_JOIN = """
WITH seg_rev AS (
  SELECT n.n_name, c.c_mktsegment,
         ROUND(SUM(o.o_totalprice), 2) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_mktsegment
)
SELECT n_name, c_mktsegment, revenue,
       CAST(RANK() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_mktsegment) AS BIGINT) AS rnk
FROM seg_rev
WHERE revenue > 0
"""


# URL / key-value parsing surface (reference BuiltInFunctionDefinitions
# PARSE_URL + STR_TO_MAP, FlinkSqlOperatorTable string families): Spark uses
# the built-ins; the DuckDB oracle mirrors them with RE2 extracts. Inputs
# are deterministic URLs/kv-strings derived from document columns so the
# functions run over real distributed data, not literals.
_URL_EXPR = (
    "concat('https://', source, '.example.com/', lang, '/', cast(doc_id as string), "
    "'?k=', lang, '&x=', cast(doc_id % 7 as string))"
)
_KV_EXPR = "concat('a=', cast(n_chars as string), ',b=', cast(doc_id as string), ',c=', lang)"


def q_scalar_url_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARSE_URL (HOST/PATH/QUERY-param) + STR_TO_MAP lookups over derived
    per-document URLs and kv-strings."""
    t = register_views(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.expr(f"parse_url({_URL_EXPR}, 'HOST')").alias("host"),
        F.expr(f"parse_url({_URL_EXPR}, 'PATH')").alias("path"),
        F.expr(f"parse_url({_URL_EXPR}, 'QUERY', 'x')").alias("xval"),
        F.expr(f"str_to_map({_KV_EXPR}, ',', '=')['b']").alias("bval"),
        F.expr(f"str_to_map({_KV_EXPR}, ',', '=')['c']").alias("cval"),
    )


ORACLE_Q_SCALAR_URL_MAP = """
WITH d AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || lang || '/' || doc_id::VARCHAR
           || '?k=' || lang || '&x=' || (doc_id % 7)::VARCHAR AS url,
         'a=' || n_chars::VARCHAR || ',b=' || doc_id::VARCHAR || ',c=' || lang AS kv
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, 'https?://([^/]+)', 1) AS host,
       regexp_extract(url, 'https?://[^/]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]x=([^&#]*)', 1) AS xval,
       regexp_extract(kv, 'b=([^,]*)', 1) AS bval,
       regexp_extract(kv, 'c=([^,]*)', 1) AS cval
FROM d
"""


QUERIES = {
    "scalar_url_map": q_scalar_url_map,
    "left_join_nulls": q_left_join_nulls,
    "having_two_level": q_having_two_level,
    "conditional_pivot": q_conditional_pivot,
    "exists_and_not_exists": q_exists_and_not_exists,
    "window_over_join": q_window_over_join,
    "lateral_topk": q_lateral_topk,
    "over_frames_ext": q_over_frames_ext,
    "null_safe_eq": q_null_safe_eq,
    "min_subquery_join": q_min_subquery_join,
    "distinct_not_in": q_distinct_not_in,
    "posexplode_tokens": q_posexplode_tokens,
}

ORACLE = {
    "left_join_nulls": ORACLE_Q_LEFT_JOIN_NULLS,
    "having_two_level": ORACLE_Q_HAVING_TWO_LEVEL,
    "conditional_pivot": ORACLE_Q_CONDITIONAL_PIVOT,
    "exists_and_not_exists": ORACLE_Q_EXISTS_AND_NOT_EXISTS,
    "window_over_join": ORACLE_Q_WINDOW_OVER_JOIN,
    "lateral_topk": ORACLE_Q_LATERAL_TOPK,
    "over_frames_ext": ORACLE_Q_OVER_FRAMES_EXT,
    "null_safe_eq": ORACLE_Q_NULL_SAFE_EQ,
    "min_subquery_join": ORACLE_Q_MIN_SUBQUERY_JOIN,
    "distinct_not_in": ORACLE_Q_DISTINCT_NOT_IN,
    "posexplode_tokens": ORACLE_Q_POSEXPLODE_TOKENS,
    "scalar_url_map": ORACLE_Q_SCALAR_URL_MAP,
}
