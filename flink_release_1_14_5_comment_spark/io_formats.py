"""File formats + file sink (SURVEY §2.1).

Reference surface → Spark built-ins:
  * CSV   (flink-csv CsvRowDataDeserializationSchema)   → spark.read/write.csv
  * JSON  (flink-json JsonRowDataDeserializationSchema) → .json
  * Parquet (flink-parquet, vectorized)                 → .parquet (vectorized)
  * ORC   (flink-orc)                                   → .orc
  * Avro  (flink-avro) — pure-Python Object Container File codec in
    avro_format.py (spark-avro isn't bundled here); read = binaryFile scan +
    mapInPandas decode, write = per-partition executor-side encode.
  * FileSink (FileSink.java:111 — bucketed rolling files, exactly-once) →
    `write.partitionBy(...)` for bucketed layout; exactly-once comes from
    Spark's commit protocol; streaming variant via
    `writeStream.format(...).option("checkpointLocation", ...)`.

Schemas are explicit on read (Flink's model: DDL-declared, never inferred).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "csv", "json", "orc", "avro")


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Batch file sink. `partition_by` gives the reference's bucketed layout
    (BucketAssigner) via directory partitioning — which also enables
    partition pruning on read."""
    if fmt == "avro":
        from flink_release_1_14_5_comment_spark.avro_format import write_avro

        write_avro(df, path, mode=mode, partition_by=partition_by)
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        # \N as the null literal (the reference's csv.null-literal option):
        # without it CSV cannot distinguish NULL from empty string — Spark
        # writes both as an empty field. Embedded newlines/quotes/delimiters
        # are quoted by the writer; read_table's multiLine handles them back.
        # ignore*WhiteSpace default TRUE on write and silently trim padded
        # values — the reference's serializer writes values verbatim.
        writer = (writer.option("header", "true").option("nullValue", "\\N")
                  .option("ignoreLeadingWhiteSpace", "false")
                  .option("ignoreTrailingWhiteSpace", "false"))
    getattr(writer, fmt)(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: StructType | str | None = None,
               csv_multiline: bool = True) -> DataFrame:
    """Schema-explicit batch file source.

    ``csv_multiline`` (default on) makes quoted embedded newlines parse as
    one record — the correctness default, matching what write_table's quoted
    output needs. The cost: a multiLine CSV file is NOT splittable (one task
    per file). Pass False for line-splittable scans of data known to carry
    no embedded newlines — the same trade the reference's per-line CSV
    reader makes implicitly (it cannot split quoted-newline files either).
    """
    if fmt == "avro":
        from flink_release_1_14_5_comment_spark.avro_format import read_avro

        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        return read_avro(spark, path, schema)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = (reader.option("header", "true")
                  .option("nullValue", "\\N")
                  .option("multiLine", "true" if csv_multiline else "false"))
    return getattr(reader, fmt)(path)


# --- JDBC connector (reference flink-connector-jdbc: JdbcDynamicTableSource /
# JdbcDynamicTableSink, JdbcRowDataInputFormat parallel reads). Spark's
# built-in jdbc source covers both directions; the options below mirror the
# reference's scan.partition.{column,num,lower-bound,upper-bound} knobs,
# which are THE scale lever: without partitionColumn the whole table comes
# through one connection/task. Tested against the Derby jar Spark bundles
# (embedded, no server) — any served JDBC URL works identically.


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite",
               driver: str | None = None) -> None:
    """JDBC batch sink (JdbcDynamicTableSink analog)."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        w = w.option("driver", driver)
    w.mode(mode).save()


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound: int | None = None, upper_bound: int | None = None,
              num_partitions: int = 1, driver: str | None = None) -> DataFrame:
    """JDBC source with optional partitioned parallel scan
    (JdbcRowDataInputFormat's scan.partition.* contract)."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        r = (r.option("partitionColumn", partition_column)
             .option("lowerBound", str(lower_bound))
             .option("upperBound", str(upper_bound))
             .option("numPartitions", str(num_partitions)))
    return r.load()


