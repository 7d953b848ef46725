"""Lookup join + streaming over-agg harness tests (SURVEY §2.3, §2.5)."""

from __future__ import annotations

import sys
import uuid

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.catalog import load_tables
from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.lookup import (
    lookup_join,
    lookup_join_foreach_batch,
)
from flink_release_1_14_5_comment_spark.streaming.over_agg import (
    range_bounded_over,
    rows_bounded_over,
)


def _mem(sdf, mode="append"):
    name = "t" + uuid.uuid4().hex[:10]
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return sdf.sparkSession.table(name)


def test_lookup_join_stream_static(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    ev = t["events"].limit(400)
    dim = t["customer"].select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3)
    try:
        joined = lookup_join(stream, dim, "user_id", "left")
        got = _mem(joined)
        assert got.count() == 400
        # every user_id 0-149 resolves against the customer dim at sf0.001
        assert got.filter(F.col("c_mktsegment").isNull()).count() == \
            ev.join(dim, "user_id", "left_anti").count()
    finally:
        sources.cleanup(tmpdir)


def test_lookup_join_foreach_batch_refresh(spark, sf_dir, tmp_path):
    t = load_tables(spark, sf_dir)
    ev = t["events"].limit(300)
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3)
    calls = []

    def dim_loader():
        calls.append(1)  # proves per-batch refresh
        return t["customer"].select(F.col("c_custkey").alias("user_id"), "c_acctbal")

    out_dir = str(tmp_path / "out")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out_dir)

    try:
        q = lookup_join_foreach_batch(stream, dim_loader, "user_id", sink)
        q.awaitTermination(120)
        result = spark.read.parquet(out_dir)
        assert result.count() == 300
        assert len(calls) >= 3  # one refresh per micro-batch
        assert "c_acctbal" in result.columns
    finally:
        sources.cleanup(tmpdir)


def test_rows_bounded_over_matches_batch_window(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"].limit(600).select(
        "user_id", "event_id", "ts", "value"
    )
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=4, order_col="ts")
    try:
        out = rows_bounded_over(stream, ["user_id"], "ts", "event_id", "value", n_rows=3)
        got = _mem(out).select("user_id", "event_id", "running_sum", "running_count")
        w = (W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0))
        expected = ev.select(
            "user_id", "event_id",
            F.sum("value").over(w).alias("running_sum"),
            F.count(F.lit(1)).over(w).cast("int").alias("running_count"),
        )
        # float-tolerant compare via rounding both to 6 dp
        g = got.withColumn("running_sum", F.round("running_sum", 6))
        e = expected.withColumn("running_sum", F.round("running_sum", 6))
        assert g.count() == e.count() == 600
        assert g.exceptAll(e).count() == 0
    finally:
        sources.cleanup(tmpdir)


def test_range_bounded_over_matches_batch_window(spark, sf_dir):
    """RANGE 10-minute-PRECEDING frame vs the batch window — including the
    peer-inclusive rule: equal-ts rows share a frame containing all peers."""
    ev = load_tables(spark, sf_dir)["events"].limit(600).select(
        "user_id", "event_id", "ts", "value"
    )
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=4, order_col="ts")
    try:
        out = range_bounded_over(stream, ["user_id"], "ts", "event_id", "value",
                                 range_seconds=600)
        got = _mem(out).select("user_id", "event_id", "running_sum", "running_count")
        w = (W.partitionBy("user_id").orderBy(F.unix_micros("ts"))
             .rangeBetween(-600 * 1_000_000, 0))
        expected = ev.select(
            "user_id", "event_id",
            F.sum("value").over(w).alias("running_sum"),
            F.count(F.lit(1)).over(w).cast("int").alias("running_count"),
        )
        g = got.withColumn("running_sum", F.round("running_sum", 6))
        e = expected.withColumn("running_sum", F.round("running_sum", 6))
        assert g.count() == e.count() == 600
        assert g.exceptAll(e).count() == 0
    finally:
        sources.cleanup(tmpdir)


def test_unbounded_preceding_over_matches_batch_window(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.streaming.over_agg import (
        unbounded_preceding_over,
    )

    ev = load_tables(spark, sf_dir)["events"].limit(500).select(
        "user_id", "event_id", "ts", "value"
    )
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=4, order_col="ts")
    try:
        out = unbounded_preceding_over(stream, ["user_id"], "ts", "event_id", "value")
        got = _mem(out).select(
            "user_id", "event_id", "running_sum", "running_count",
            "running_min", "running_max")
        w = (W.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(W.unboundedPreceding, 0))
        expected = ev.select(
            "user_id", "event_id",
            F.sum("value").over(w).alias("running_sum"),
            F.count(F.lit(1)).over(w).alias("running_count"),
            F.min("value").over(w).alias("running_min"),
            F.max("value").over(w).alias("running_max"),
        )
        g = got.withColumn("running_sum", F.round("running_sum", 6))
        e = expected.withColumn("running_sum", F.round("running_sum", 6))
        assert g.count() == e.count() == 500
        assert g.exceptAll(e).count() == 0
    finally:
        sources.cleanup(tmpdir)
