"""SparkSession factory tuned for the engine.

Design notes for 100 TB scale (SURVEY §4.2, BASELINE.md):

* AQE on — runtime coalescing, skew-join splitting, dynamic join-strategy
  switch replace Flink's static `Exchange` planning
  (reference: flink-table-planner exec `BatchExecExchange.java:57`).
* ``spark.sql.shuffle.partitions`` defaults to 2× cores locally; on a real
  cluster this should be ~2-3× total executor cores — AQE coalesces down.
* Broadcast threshold 10 MB mirrors the reference's TPC-DS bench config
  (`TpcdsTestProgram.java:143-158`); its engine default is 1 MB
  (`OptimizerConfigOptions.java:51`).
* Arrow enabled — every Pandas-UDF operator (our custom stateful ops) rides
  the vectorized Arrow path instead of row-at-a-time pickling.
* UTC session timezone so parquet TIMESTAMP round-trips bit-identically with
  the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def get_spark(app_name: str = "flink_release_1_14_5_comment_spark",
              cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    cpus = cpus or CPUS
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # Testdata parquet stores TIMESTAMP(NANOS); Spark has no nanos type —
        # read as long and convert to micros in catalog.load_tables (same
        # truncation DuckDB applies).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Naive-micros parquet timestamps read as TIMESTAMP (LTZ), not NTZ:
        # watermarks need LTZ and the oracle compare was validated under LTZ.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
