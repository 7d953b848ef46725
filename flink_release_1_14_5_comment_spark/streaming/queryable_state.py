"""Queryable state (SURVEY §2.9 "Queryable state" row).

Reference surface: ``KeyedStream.asQueryableState`` (KeyedStream.java:1031)
registers a keyed state as externally queryable, and
``QueryableStateClient`` (flink-queryable-state/.../client/
QueryableStateClient.java:76) fetches the value for one key over the
network from the TaskManager's ``KvStateService``.

Spark-first re-expression: Structured Streaming already externalizes every
stateful operator's keyed state — it lives in the checkpoint's state store
(HDFS/RocksDB provider), versioned per micro-batch. Spark 4's **State Data
Source** (`spark.read.format("statestore")` / `"state-metadata"`,
SPARK-45511) reads that store back as a DataFrame, which is strictly more
capable than the reference's point-lookup RPC:

* point lookups: filter on ``key.<field>`` — Catalyst prunes partitions and
  pushes the predicate into the state-store scan;
* full-state scans / joins / aggregates over live state: a plain DataFrame,
  impossible through the reference's one-key-at-a-time client;
* time travel: ``batchId`` option reads the state as of any retained
  checkpoint (the reference client can only see "latest").

Scale: the state read is a distributed scan over the store's shuffle
partitions (one split per state-store partition) — no driver materialization;
a `get_kv_state` point lookup scans only until the key is found and returns
one row. At 100 TB of state the same code holds: the store is already
partitioned by key hash, and the reader exposes `partition_id` so a sharded
client can target one partition.

No oracle_sql entry: state inspection has no ANSI-SQL equivalent (it reads a
checkpoint directory, not a table) — covered by the pytest harness
(tests/test_queryable_state.py) which cross-checks the state contents
against the batch-computed expected values instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def state_operators(spark: SparkSession, checkpoint: str) -> DataFrame:
    """List the stateful operators persisted under ``checkpoint``.

    Mirrors the discovery half of the reference's KvState registry
    (KvStateService → which states exist, under what name): returns one row
    per (operatorId, operatorName, stateStoreName) with the batch range the
    store retains.
    """
    return spark.read.format("state-metadata").load(checkpoint)


def read_keyed_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int | None = None,
    store_name: str | None = None,
    batch_id: int | None = None,
    join_side: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """Read a stateful operator's keyed state as a DataFrame.

    ``batch_id`` time-travels to the state as of that micro-batch (default:
    latest committed). ``join_side`` ("left"/"right") selects one side of a
    stream-stream join's buffered state. With ``flatten=True`` the key and
    value structs are exploded to ``key_<field>`` / ``value_<field>``
    columns (prefixing avoids cross-struct name collisions).
    """
    reader = spark.read.format("statestore")
    if operator_id is not None:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if join_side is not None:
        reader = reader.option("joinSide", join_side)
    df = reader.load(checkpoint)
    if not flatten:
        return df
    key_fields = df.schema["key"].dataType.fieldNames()
    val_fields = df.schema["value"].dataType.fieldNames()
    cols = (
        [F.col(f"key.{f}").alias(f"key_{f}") for f in key_fields]
        + [F.col(f"value.{f}").alias(f"value_{f}") for f in val_fields]
        + [F.col("partition_id")]
    )
    return df.select(*cols)


class QueryableStateClient:
    """Point-lookup client over a checkpoint's state store.

    API shape mirrors the reference's ``QueryableStateClient.getKvState``
    (QueryableStateClient.java:76: client.getKvState(jobId, name, key, ...)
    → future of the state value): here the "job id" is the checkpoint
    location, the "state name" is (operator_id, store_name), and the lookup
    is a filtered distributed scan with the key predicate pushed into the
    state-store source.
    """

    def __init__(self, spark: SparkSession, checkpoint: str):
        self.spark = spark
        self.checkpoint = checkpoint

    def get_kv_state(
        self,
        key: dict,
        operator_id: int = 0,
        store_name: str | None = None,
        batch_id: int | None = None,
    ) -> Row | None:
        """Return the value struct for ``key`` (a {field: value} dict over
        the operator's grouping columns), or None if the key has no state."""
        df = read_keyed_state(
            self.spark, self.checkpoint,
            operator_id=operator_id, store_name=store_name,
            batch_id=batch_id, flatten=False,
        )
        cond = None
        for f, v in key.items():
            c = F.col(f"key.{f}") == F.lit(v)
            cond = c if cond is None else (cond & c)
        if cond is not None:
            df = df.filter(cond)
        row = df.select("value").head(1)
        return row[0]["value"] if row else None
