"""Savepoint semantics (streaming/savepoints.py; reference
SavepointRestoreSettings.java:132): fork a query from a snapshot and prove
(1) the fork resumes from the savepoint's state AND source offsets —
re-processing input the original consumed after the snapshot — and (2) the
original's post-savepoint progress never leaks into the fork."""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.streaming import savepoints as sp


def _write_one_file(spark, rows, schema, data_dir: str, name: str) -> None:
    tmp = data_dir + f".stage_{name}"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp)
                if f.startswith("part-") and f.endswith(".parquet"))
    os.makedirs(data_dir, exist_ok=True)
    shutil.move(os.path.join(tmp, part), os.path.join(data_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _run_counts(spark, data_dir: str, ckpt: str) -> dict[int, int]:
    """Run the keyed count to completion against `ckpt`; return final
    per-key counts from the state store (the authoritative snapshot)."""
    from flink_release_1_14_5_comment_spark.streaming import queryable_state as qs

    stream = (spark.readStream.schema("k int, v int")
              .option("maxFilesPerTrigger", "1").parquet(data_dir))
    agg = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    q = (agg.writeStream.format("noop").outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    state = qs.read_keyed_state(spark, ckpt)
    return {r["key_k"]: r["value_count"] for r in state.collect()}


def test_savepoint_fork_rewinds_and_isolates(spark, tmp_path):
    data, ckpt = str(tmp_path / "data"), str(tmp_path / "ckpt")
    sp_dir = str(tmp_path / "sp")
    schema = "k int, v int"

    # phase 1: two keys — run and SAVEPOINT
    _write_one_file(spark, [(0, 1), (0, 1), (1, 1)], schema, data, "a.parquet")
    assert _run_counts(spark, data, ckpt) == {0: 2, 1: 1}
    assert sp.trigger_savepoint(ckpt, sp_dir) == sp_dir
    sp_batch = sp.last_committed_batch(sp_dir)

    # phase 2: the ORIGINAL query advances past the savepoint
    _write_one_file(spark, [(0, 1), (2, 1)], schema, data, "b.parquet")
    assert _run_counts(spark, data, ckpt) == {0: 3, 1: 1, 2: 1}

    # phase 3: fork from the savepoint — it REWINDS: file b, already
    # consumed by the original after the snapshot, is re-processed from the
    # savepoint's offsets; final state matches the original, reached
    # independently
    assert _run_counts(spark, data, sp_dir) == {0: 3, 1: 1, 2: 1}
    assert sp.last_committed_batch(sp_dir) > sp_batch
    # isolation both ways: the original kept its own progress
    assert sp.last_committed_batch(ckpt) > sp_batch


def test_savepoint_guards(spark, tmp_path):
    empty = str(tmp_path / "not_a_ckpt")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no committed batch"):
        sp.trigger_savepoint(empty, str(tmp_path / "sp1"))

    data, ckpt = str(tmp_path / "d"), str(tmp_path / "c")
    _write_one_file(spark, [(0, 1)], "k int, v int", data, "a.parquet")
    _run_counts(spark, data, ckpt)
    target = str(tmp_path / "sp2")
    sp.trigger_savepoint(ckpt, target)
    with pytest.raises(ValueError, match="already exists"):
        sp.trigger_savepoint(ckpt, target)
