"""Oracle-graded connector/format round-trip queries (SURVEY §2.1).

Every file-format and connector row in §2.1 is pytest-round-trip-tested
(tests/test_io_formats.py, tests/test_avro.py); these queries additionally
put the SAME code paths behind the driver's DuckDB oracle gate: each query
writes a base table through a sink, reads it back through the matching
source, and aggregates — the oracle is the identical aggregate over the
original parquet, so any loss/corruption anywhere in the write→read chain
(type formatting, quoting, null encoding, partition reconstruction) breaks
the value hash.

Reference parity anchors:
  * CSV  — flink-csv CsvRowDataSerializationSchema/…Deserialization…
    (quoting, header, timestamp text round-trip).
  * JSON — flink-json JsonRowDataSerializationSchema (null-field omission on
    write must reconstruct as SQL NULL on schema-driven read).
  * Avro — flink-avro AvroRowDataSerializationSchema + FileSink bucket
    layout (here: the partitioned directory sink from avro_format.py, with
    partition-column reconstruction on the full-tree read).
  * JDBC — flink-connector-jdbc JdbcDynamicTableSource/Sink (embedded Derby:
    the same jar Spark bundles; any served JDBC URL behaves identically).

Scale notes (100 TB):
  * The file-format chains are pure executor-side distributed IO — one task
    per output/input split; nothing driver-side but the commit.
  * JDBC is the deliberate exception: a relational sink/source is bounded by
    the database, not Spark — the read side uses the partitioned-scan knobs
    (scan.partition.* analogs) so N connections share the range; the graded
    table here is a dimension (supplier), which is the realistic JDBC role
    in a 100 TB star schema (facts live on the filesystem, dims in an RDBMS).
  * Scratch location is a per-sf_dir tempdir with mode=overwrite — reruns
    replace, never accumulate.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from flink_release_1_14_5_comment_spark.catalog import load_tables
from flink_release_1_14_5_comment_spark.io_formats import (
    read_jdbc,
    read_table,
    write_jdbc,
    write_table,
)

_DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _scratch(sf_dir: str, leaf: str) -> str:
    """Stable per-sf_dir scratch path: reruns overwrite instead of leaking
    one directory per run (the replay-source tempdirs are per-run because a
    stream checkpoint must never see a mutated source; a batch round-trip
    has no such constraint)."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_io_{key}")
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, leaf)


_LINEITEM_DDL = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
    "l_linenumber int, l_quantity double, l_extendedprice double, "
    "l_discount double, l_tax double, l_returnflag string, "
    "l_linestatus string, l_shipdate timestamp"
)

_ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def q_io_roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → CSV sink (quoted, header) → schema-explicit CSV source →
    pricing rollup. Grades text round-trip of BIGINT/INT/DOUBLE/STRING/
    TIMESTAMP — a formatting drift anywhere (double shortest-repr, timestamp
    pattern, quote escaping) changes the sums/extremes vs the parquet truth."""
    li = load_tables(spark, sf_dir)["lineitem"]
    dest = _scratch(sf_dir, "lineitem_csv")
    write_table(li, dest, fmt="csv")
    back = read_table(spark, dest, fmt="csv", schema=_LINEITEM_DDL)
    back.createOrReplaceTempView("io_csv_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT)            AS n_rows,
               ROUND(SUM(l_quantity), 2)           AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)      AS sum_price,
               MIN(l_shipdate)                     AS min_ship,
               MAX(l_shipdate)                     AS max_ship
        FROM io_csv_lineitem
        GROUP BY l_returnflag, l_linestatus
    """)


ORACLE_Q_IO_ROUNDTRIP_CSV = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT)       AS n_rows,
       ROUND(SUM(l_quantity), 2)      AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       MIN(l_shipdate)                AS min_ship,
       MAX(l_shipdate)                AS max_ship
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_io_roundtrip_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → JSON-lines sink → schema-explicit JSON source → per-status/
    priority rollup. JSON write omits null fields; the schema-driven read
    must reconstruct them as SQL NULLs (flink-json's map-null-key /
    fail-on-missing-field surface) — count/sum drift exposes any loss."""
    orders = load_tables(spark, sf_dir)["orders"]
    dest = _scratch(sf_dir, "orders_json")
    write_table(orders, dest, fmt="json")
    back = read_table(spark, dest, fmt="json", schema=_ORDERS_DDL)
    back.createOrReplaceTempView("io_json_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT)       AS n_orders,
               ROUND(SUM(o_totalprice), 2)    AS sum_price,
               MIN(o_orderdate)               AS first_order,
               MAX(o_orderdate)               AS last_order
        FROM io_json_orders
        GROUP BY o_orderstatus, o_orderpriority
    """)


ORACLE_Q_IO_ROUNDTRIP_JSON = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT)    AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       MIN(o_orderdate)            AS first_order,
       MAX(o_orderdate)            AS last_order
FROM orders
GROUP BY o_orderstatus, o_orderpriority
"""


def q_io_roundtrip_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → PARTITIONED avro directory sink (lang=<val>/ Hive layout,
    staged commit) → full-tree avro source (partition column reconstructed
    from directory names) → per-lang/source rollup. Grades the round-5
    partitioned avro sink end-to-end: a mis-bucketed row or a lost/mangled
    partition value changes the group counts vs parquet truth."""
    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "lang", "source", "n_chars")
    dest = _scratch(sf_dir, "documents_avro")
    write_table(docs, dest, fmt="avro", partition_by=["lang"])
    back = read_table(spark, dest, fmt="avro")
    back.createOrReplaceTempView("io_avro_documents")
    return spark.sql("""
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT)  AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(MIN(doc_id) AS BIGINT)  AS min_doc
        FROM io_avro_documents
        GROUP BY lang, source
    """)


ORACLE_Q_IO_ROUNDTRIP_AVRO = """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT)     AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT)  AS min_doc
FROM documents
GROUP BY lang, source
"""


def q_io_roundtrip_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → JDBC sink (embedded Derby) → partitioned JDBC source
    (4 range-partitioned connections on s_suppkey — the reference's
    scan.partition.* knobs) → broadcast join to nation → per-nation rollup.
    The Derby database lives in a fresh per-run tempdir: an embedded Derby
    dir must never be re-booted after an unclean JVM exit (stale db.lck), so
    unlike the file formats this chain pays one small dir per run."""
    tables = load_tables(spark, sf_dir)
    sup, nation = tables["supplier"], tables["nation"]
    dbdir = tempfile.mkdtemp(prefix="spark_graft_derby_")
    url = f"jdbc:derby:{dbdir}/db;create=true"
    write_jdbc(sup, url, "supplier", driver=_DERBY_DRIVER)
    lo, hi = 0, sup.count() * 2 + 1
    back = read_jdbc(spark, url, "supplier", partition_column="s_suppkey",
                     num_partitions=4, lower_bound=lo, upper_bound=hi,
                     driver=_DERBY_DRIVER)
    back.createOrReplaceTempView("io_jdbc_supplier")
    nation.createOrReplaceTempView("io_jdbc_nation")
    return spark.sql("""
        SELECT n.n_name,
               CAST(COUNT(*) AS BIGINT)    AS n_suppliers,
               ROUND(SUM(s.s_acctbal), 2)  AS total_bal,
               ROUND(MAX(s.s_acctbal), 2)  AS best_bal
        FROM io_jdbc_supplier s
        JOIN io_jdbc_nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name
    """)


ORACLE_Q_IO_ROUNDTRIP_JDBC = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT)   AS n_suppliers,
       ROUND(SUM(s.s_acctbal), 2) AS total_bal,
       ROUND(MAX(s.s_acctbal), 2) AS best_bal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
"""


def q_ddl_filesystem_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Flink DDL front door, oracle-graded: CREATE TABLE with a
    declared schema + filesystem connector WITH-options (reference
    FlinkSqlParserImpl DDL + FileSystemTableSource option binding), then an
    aggregate through TableEnvironment.sql_query. The declared-schema scan
    (never inferred — the reference's model) and the option plumbing are
    what this grades; the aggregate mirrors the direct-parquet oracle, so a
    mis-bound path/format/schema fails the hash. The orders table is read
    through the DDL-declared TIMESTAMP column, covering the NANOS parquet
    conversion on the DDL path too."""
    from flink_release_1_14_5_comment_spark.api.table_env import (
        TableEnvironment,
    )

    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TEMPORARY TABLE orders_ddl_q (
            o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
            o_totalprice DOUBLE, o_orderdate TIMESTAMP,
            o_orderpriority STRING
        ) WITH ('connector' = 'filesystem',
                'path' = '{sf_dir}/orders.parquet', 'format' = 'parquet')
    """)
    return env.sql_query("""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price,
               MIN(o_orderdate) AS first_order
        FROM orders_ddl_q
        GROUP BY o_orderpriority
    """).to_data_frame()


ORACLE_Q_DDL_FILESYSTEM_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       MIN(o_orderdate) AS first_order
FROM orders
GROUP BY o_orderpriority
"""


def q_sink_not_null_enforcer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SinkNotNullEnforcer graded (reference SinkNotNullEnforcer.java —
    table.exec.sink.not-null-enforcer): a NOT NULL sink column receives
    injected NULLs (every 13th order's priority), the enforcer in DROP mode
    silently filters them before the write, and the surviving rollup must
    equal the oracle's explicit IS NOT NULL filter. ERROR mode (assert_true
    job failure) is covered in pytest — a raised exception cannot be a
    hash."""
    from flink_release_1_14_5_comment_spark.streaming.changelog import (
        enforce_not_null,
    )
    from pyspark.sql import functions as F

    orders = load_tables(spark, sf_dir)["orders"].withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 13 == 0, None)
        .otherwise(F.col("o_orderpriority")))
    kept = enforce_not_null(orders, ["o_orderpriority"], mode="drop")
    return kept.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"))


ORACLE_Q_SINK_NOT_NULL_ENFORCER = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
WHERE o_orderkey % 13 <> 0
GROUP BY o_orderpriority
"""


QUERIES = {
    "io_roundtrip_csv": q_io_roundtrip_csv,
    "io_roundtrip_json": q_io_roundtrip_json,
    "io_roundtrip_avro": q_io_roundtrip_avro,
    "io_roundtrip_jdbc": q_io_roundtrip_jdbc,
    "ddl_filesystem_sql": q_ddl_filesystem_sql,
    "sink_not_null_enforcer": q_sink_not_null_enforcer,
}

ORACLE = {
    "io_roundtrip_csv": ORACLE_Q_IO_ROUNDTRIP_CSV,
    "io_roundtrip_json": ORACLE_Q_IO_ROUNDTRIP_JSON,
    "io_roundtrip_avro": ORACLE_Q_IO_ROUNDTRIP_AVRO,
    "io_roundtrip_jdbc": ORACLE_Q_IO_ROUNDTRIP_JDBC,
    "ddl_filesystem_sql": ORACLE_Q_DDL_FILESYSTEM_SQL,
    "sink_not_null_enforcer": ORACLE_Q_SINK_NOT_NULL_ENFORCER,
}
