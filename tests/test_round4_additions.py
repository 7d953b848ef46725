"""Round-4 session additions: event-time keep-first dedup (late-row
correction), label propagation semantics, and the replayed flush-chunk
mechanism behind the oracle-checked streaming as-of join."""

from __future__ import annotations

import datetime
import sys
import uuid

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.dedup import (
    dedup_keep_first_rowtime,
)

T0 = datetime.datetime(2024, 3, 1, 9, 0, 0)
T1 = datetime.datetime(2024, 3, 1, 10, 0, 0)
T2 = datetime.datetime(2024, 3, 1, 11, 0, 0)


def _mem(sdf, mode="update"):
    name = "t" + uuid.uuid4().hex[:10]
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(180)
    return sdf.sparkSession.table(name)


def test_keep_first_rowtime_in_order(spark):
    """In-order replay: one +I per key, the (min ts, min id) row."""
    df = spark.createDataFrame(
        [(1, 10, T0, 1), (1, 11, T1, 2), (2, 20, T1, 3), (2, 21, T2, 4)],
        "k long, eid long, ts timestamp, __seq long")
    stream, tmp = sources.replay_as_stream(spark, df, n_chunks=2, order_col="__seq")
    try:
        out = _mem(dedup_keep_first_rowtime(stream, ["k"], "ts", "eid"))
        rows = {(r.k, r.eid, r["__rowkind"]) for r in out.collect()}
        assert rows == {(1, 10, "+I"), (2, 20, "+I")}
    finally:
        sources.cleanup(tmp)


def test_keep_first_rowtime_late_row_corrects(spark):
    """A LATER batch delivering an EARLIER rowtime emits a corrective +U —
    reference RowTimeDeduplicateFunction keep-first under late data."""
    df = spark.createDataFrame(
        [(1, 11, T1, 1),   # batch 1: first seen
         (1, 10, T0, 2)],  # batch 2: late row with earlier event time
        "k long, eid long, ts timestamp, __seq long")
    stream, tmp = sources.replay_as_stream(spark, df, n_chunks=2, order_col="__seq")
    try:
        out = _mem(dedup_keep_first_rowtime(stream, ["k"], "ts", "eid"))
        rows = sorted((r["__rowkind"], r.eid) for r in out.collect())
        assert rows == [("+I", 11), ("+U", 10)]
    finally:
        sources.cleanup(tmp)


def test_keep_first_rowtime_later_batch_ignored(spark):
    """Rows at-or-after the stored winner in later batches emit nothing."""
    df = spark.createDataFrame(
        [(1, 10, T0, 1), (1, 11, T1, 2), (1, 12, T2, 2)],
        "k long, eid long, ts timestamp, __seq long")
    stream, tmp = sources.replay_as_stream(spark, df, n_chunks=2, order_col="__seq")
    try:
        out = _mem(dedup_keep_first_rowtime(stream, ["k"], "ts", "eid"))
        rows = [(r["__rowkind"], r.eid) for r in out.collect()]
        assert rows == [("+I", 10)]
    finally:
        sources.cleanup(tmp)


def test_label_propagation_triangle_converges_to_min(spark):
    """A triangle converges to the minimum node id within 3 rounds; a
    2-node component oscillates under synchronous LPA (documented)."""
    from flink_release_1_14_5_comment_spark.pipeline.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5)], "src long, dst long")
    labels = {r.node: r.label for r in label_propagation(edges, iters=3).collect()}
    assert labels[1] == labels[2] == labels[3] == 1
    # synchronous LPA on a 2-cycle swaps labels every round: after an odd
    # number of rounds each holds the other's id — deterministic oscillation
    assert (labels[4], labels[5]) == (5, 4)


def test_replay_final_dfs_replay_last(spark):
    """final_dfs files replay in list order strictly after all data chunks."""
    data = spark.createDataFrame([(i, i) for i in range(6)], "v long, o long")
    fin1 = spark.createDataFrame([(100, 100)], "v long, o long")
    fin2 = spark.createDataFrame([(200, 200)], "v long, o long")
    stream, tmp = sources.replay_as_stream(
        spark, data, n_chunks=2, order_col="o", final_dfs=[fin1, fin2])
    try:
        name = "t" + uuid.uuid4().hex[:10]
        batches: list[list[int]] = []

        def sink(bdf, _bid):
            batches.append(sorted(r.v for r in bdf.collect()))

        q = (stream.writeStream.foreachBatch(sink)
             .trigger(availableNow=True).queryName(name).start())
        q.awaitTermination(180)
        nonempty = [b for b in batches if b]
        assert nonempty[-2:] == [[100], [200]]
        assert sorted(v for b in nonempty[:-2] for v in b) == list(range(6))
    finally:
        sources.cleanup(tmp)
