"""Persistent (warehouse-backed) catalog — SURVEY §2.1/§3 catalog rows.

Reference: `HiveCatalog.java:143` (persistent metastore-backed catalog) and
`GenericInMemoryCatalog.java:50` (the in-memory default). The repo's
`catalog.py` covers the in-memory side (temp views over parquet dirs); this
module is the persistent side: `CREATE TABLE ... USING parquet` into a
warehouse directory with table metadata in an embedded Derby metastore, so
tables SURVIVE session restarts — the property users hit immediately in
real deployments (round-3 punch list #4).

Spark-first mapping: Spark's own HiveExternalCatalog does everything the
reference's HiveCatalog does (databases, tables, partitions, stats); we pin
the metastore INSIDE the warehouse dir so a warehouse is one self-contained,
relocatable directory. All data files are plain parquet readable by any
engine (DuckDB included) — like the reference's catalog, the metadata layer
adds discoverability, not a proprietary format.

Scale: saveAsTable writes are task-committed through Spark's FileFormatWriter
(safe on HDFS/S3 object stores), `partition_by` yields directory-partitioned
layouts that Catalyst partition-prunes, and `bucket_by` pre-shuffles on the
bucket key so later equi-joins/aggs on that key are zero-Exchange (the same
co-location contract as catalog.write_bucketed, now on permanent tables).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def get_warehouse_spark(warehouse_dir: str,
                        app_name: str = "warehouse",
                        cpus: int = 4) -> SparkSession:
    """SparkSession with a PERSISTENT catalog rooted at ``warehouse_dir``.

    Both the table data (parquet) and the metastore (embedded Derby) live
    under the warehouse dir — delete the dir, the catalog is gone; keep it,
    every table survives restarts. catalogImplementation is a STATIC conf:
    this must build a fresh session (stop any live one first); it cannot be
    retrofitted onto an existing SparkSession.
    """
    os.makedirs(warehouse_dir, exist_ok=True)
    metastore = os.path.join(os.path.abspath(warehouse_dir), "metastore_db")
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.warehouse.dir", os.path.abspath(warehouse_dir))
        .config("spark.sql.catalogImplementation", "hive")
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={metastore};create=true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )


def create_table(spark: SparkSession, name: str, source: DataFrame,
                 mode: str = "error",
                 partition_by: list[str] | None = None,
                 bucket_by: tuple[int, list[str]] | None = None) -> None:
    """Persist ``source`` as a permanent parquet table (CREATE TABLE AS).

    ``partition_by`` → hive-style dir partitioning (partition pruning);
    ``bucket_by=(n, cols)`` → bucketed layout (co-located joins on cols).
    """
    w = source.write.format("parquet").mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        w = w.bucketBy(n, *cols).sortBy(*cols)
    w.saveAsTable(name)


def create_table_ddl(spark: SparkSession, name: str, columns_ddl: str,
                     partitioned_by: list[str] | None = None,
                     comment: str | None = None) -> None:
    """Empty permanent table via DDL (`CREATE TABLE ... USING parquet`) —
    the reference's `CatalogTable` create path (HiveCatalog.createTable)."""
    parts = f" PARTITIONED BY ({', '.join(partitioned_by)})" if partitioned_by else ""
    cmt = f" COMMENT '{comment}'" if comment else ""
    spark.sql(
        f"CREATE TABLE {name} ({columns_ddl}) USING parquet{cmt}{parts}")


def register_external_table(spark: SparkSession, name: str, path: str,
                            fmt: str = "parquet") -> None:
    """Permanent EXTERNAL table over existing files (HiveCatalog external
    tables): metadata in the catalog, data stays where it is; DROP TABLE
    leaves the files."""
    spark.sql(
        f"CREATE TABLE {name} USING {fmt} LOCATION '{os.path.abspath(path)}'")


def table_names(spark: SparkSession, database: str = "default") -> list[str]:
    return sorted(t.name for t in spark.catalog.listTables(database))
