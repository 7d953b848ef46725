"""File formats + file sink (SURVEY §2.1).

Reference surface → Spark built-ins:
  * CSV   (flink-csv CsvRowDataDeserializationSchema)   → spark.read/write.csv
  * JSON  (flink-json JsonRowDataDeserializationSchema) → .json
  * Parquet (flink-parquet, vectorized)                 → .parquet (vectorized)
  * ORC   (flink-orc)                                   → .orc
  * Avro  (flink-avro) — requires the spark-avro package; gated, raises a
    clear error when absent (not bundled in this environment).
  * FileSink (FileSink.java:111 — bucketed rolling files, exactly-once) →
    `write.partitionBy(...)` for bucketed layout; exactly-once comes from
    Spark's commit protocol; streaming variant via
    `writeStream.format(...).option("checkpointLocation", ...)`.

Schemas are explicit on read (Flink's model: DDL-declared, never inferred).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "csv", "json", "orc")


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Batch file sink. `partition_by` gives the reference's bucketed layout
    (BucketAssigner) via directory partitioning — which also enables
    partition pruning on read."""
    if fmt == "avro":
        _require_avro(df.sparkSession)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: StructType | str | None = None) -> DataFrame:
    """Schema-explicit batch file source."""
    if fmt == "avro":
        _require_avro(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return getattr(reader, fmt)(path)


def _require_avro(spark: SparkSession) -> None:
    try:
        spark.read.format("avro")
        # triggering load needs a path; probe the class directly
        spark._jvm.org.apache.spark.sql.avro.AvroFileFormat  # noqa: SLF001
    except Exception as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "Avro needs the spark-avro package (--packages org.apache.spark:spark-avro)"
        ) from exc
