"""Queryable state over the Structured-Streaming state store (SURVEY §2.9
"Queryable state"; reference KeyedStream.asQueryableState
(KeyedStream.java:1031) + QueryableStateClient.java:76).

Evidence strategy: run a keyed streaming aggregation to a checkpoint, then
query the live state through streaming/queryable_state.py and cross-check
every read against the batch-computed ground truth — discovery (metadata),
full-state scan, point lookup, and batch-id time travel (a capability the
reference's RPC client doesn't even have).
"""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.streaming import queryable_state as qs


def _write_one_file(spark, rows, schema, data_dir: str, name: str) -> None:
    tmp = data_dir + f".stage_{name}"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp)
                if f.startswith("part-") and f.endswith(".parquet"))
    os.makedirs(data_dir, exist_ok=True)
    shutil.move(os.path.join(tmp, part), os.path.join(data_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture(scope="module")
def agg_checkpoint(spark, tmp_path_factory):
    """Two-micro-batch keyed count with state persisted at each batch."""
    base = tmp_path_factory.mktemp("qs")
    data_dir, ckpt = str(base / "data"), str(base / "ckpt")
    schema = "k int, v int"
    # batch 0: key k appears k+1 times (k=0..4); batch 1: 3 more for k=0, 2 for k=1
    _write_one_file(spark, [(k, 1) for k in range(5) for _ in range(k + 1)],
                    schema, data_dir, "a.parquet")
    _write_one_file(spark, [(0, 1)] * 3 + [(1, 1)] * 2, schema, data_dir,
                    "b.parquet")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(data_dir))
    agg = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    q = (agg.writeStream.format("noop").outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180), "stream did not finish"
    return ckpt


def test_state_metadata_discovery(spark, agg_checkpoint):
    meta = qs.state_operators(spark, agg_checkpoint).collect()
    assert len(meta) == 1
    row = meta[0]
    assert row["operatorId"] == 0
    assert row["stateStoreName"] == "default"
    # two micro-batches committed (maxFilesPerTrigger=1, two files)
    assert row["maxBatchId"] == 1


def test_full_state_scan_matches_ground_truth(spark, agg_checkpoint):
    state = qs.read_keyed_state(spark, agg_checkpoint, operator_id=0)
    got = {r["key_k"]: r["value_count"] for r in state.collect()}
    # batch ground truth: k+1 base occurrences, plus 3 for k=0 and 2 for k=1
    assert got == {0: 4, 1: 4, 2: 3, 3: 4, 4: 5}


def test_point_lookup(spark, agg_checkpoint):
    client = qs.QueryableStateClient(spark, agg_checkpoint)
    assert client.get_kv_state({"k": 3})["count"] == 4
    assert client.get_kv_state({"k": 99}) is None


def test_batch_id_time_travel(spark, agg_checkpoint):
    """State as of batch 0 shows only the first file's counts — the reference
    client can only read 'latest'; the state source reads any retained
    version."""
    at0 = qs.read_keyed_state(spark, agg_checkpoint, batch_id=0)
    got = {r["key_k"]: r["value_count"] for r in at0.collect()}
    assert got == {k: k + 1 for k in range(5)}


def test_join_side_state_read(spark, tmp_path):
    """Stream-stream join buffers both sides in the state store (the
    Spark analog of the reference's JoinRecordStateViews) — the reader's
    joinSide option exposes each side's buffered rows."""
    import datetime

    from pyspark.sql import functions as F  # noqa: F811

    TS = datetime.datetime
    base = tmp_path
    ldir, rdir, ckpt = str(base / "l"), str(base / "r"), str(base / "ck")
    _write_one_file(spark,
                    [(1, TS(2024, 1, 1, 10, 0)), (2, TS(2024, 1, 1, 10, 5))],
                    "k int, lts timestamp", ldir, "a.parquet")
    _write_one_file(spark,
                    [(1, TS(2024, 1, 1, 10, 1))],
                    "k int, rts timestamp", rdir, "a.parquet")
    ls = (spark.readStream.schema("k int, lts timestamp").parquet(ldir)
          .withWatermark("lts", "1 hour"))
    rs = (spark.readStream.schema("k int, rts timestamp").parquet(rdir)
          .withWatermark("rts", "1 hour"))
    joined = ls.join(
        rs, (ls["k"] == rs["k"])
        & (rs["rts"] >= ls["lts"] - F.expr("INTERVAL 10 MINUTES"))
        & (rs["rts"] <= ls["lts"] + F.expr("INTERVAL 10 MINUTES")))
    q = (joined.writeStream.format("noop").outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180)

    left = qs.read_keyed_state(spark, ckpt, join_side="left", flatten=False)
    right = qs.read_keyed_state(spark, ckpt, join_side="right", flatten=False)
    lkeys = sorted(r["key"]["field0"] for r in left.collect())
    rkeys = sorted(r["key"]["field0"] for r in right.collect())
    assert lkeys == [1, 2]   # both left rows buffered
    assert rkeys == [1]      # one right row buffered
