"""Streaming temporal join + window Top-N harness tests."""

from __future__ import annotations

import sys
import uuid
from datetime import datetime

from pyspark.sql import Window as W
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.catalog import load_tables
from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.temporal_join import temporal_join_stream
from flink_release_1_14_5_comment_spark.streaming.topn import (
    window_topn,
    window_topn_incremental,
)


def _mem(sdf, mode="append"):
    name = "t" + uuid.uuid4().hex[:10]
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(180)
    return sdf.sparkSession.table(name)


def test_temporal_join_stream_scripted(spark):
    """Scripted version history: probes pick the version valid at their ts."""
    def ts(m):
        return datetime(2024, 1, 1, 10, m)

    build = spark.createDataFrame(
        [(1, ts(0), 100), (1, ts(10), 200), (2, ts(5), 900)],
        "k long, vts timestamp, price long")
    probe = spark.createDataFrame(
        [(1, ts(5), 71), (1, ts(10), 72), (1, ts(20), 73), (2, ts(1), 74)],
        "k long, pts timestamp, order_id long")
    # single interleaved replay stream → same micro-batch, ts-ordered stepping
    bs, bt = sources.replay_as_stream(spark, build, 1)
    ps, pt = sources.replay_as_stream(spark, probe, 1)
    try:
        out = temporal_join_stream(ps, bs, "k", "pts", "vts", "order_id", "price")
        got = _mem(out).toPandas().set_index("order_id")
        assert got.loc[71, "price"] == 100      # before v2
        assert got.loc[72, "price"] == 200      # AT version ts → new version
        assert got.loc[73, "price"] == 200
        # probe at 10:01 for key 2: version arrives at 10:05 — same batch,
        # ts-ordered stepping means no version yet → null (proctime semantics)
        import pandas as pd
        assert pd.isna(got.loc[74, "price"])
    finally:
        sources.cleanup(bt)
        sources.cleanup(pt)


def test_temporal_join_stream_vs_batch_asof(spark, sf_dir):
    """In-order replay: streaming proctime temporal join == batch as-of."""
    ev = load_tables(spark, sf_dir)["events"]
    clicks = (
        ev.filter("event_type = 'click'")
        .groupBy("user_id", "ts").agg(F.max("event_id").alias("click_id"))
    )
    buys = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("bts"), F.col("event_id").alias("purchase_id"))
    cs, ct = sources.replay_as_stream(spark, clicks.select("user_id", "ts", "click_id"), 1)
    ps, pt = sources.replay_as_stream(spark, buys, 1)
    try:
        out = temporal_join_stream(ps, cs, "user_id", "bts", "ts", "purchase_id", "click_id")
        got = _mem(out).select("purchase_id", "click_id")
        from flink_release_1_14_5_comment_spark.operators.temporal_joins import asof_join

        expected = asof_join(
            probe=buys.withColumnRenamed("bts", "ts"),
            build=clicks.select("user_id", F.col("ts").alias("click_ts"), "click_id"),
            key="user_id", probe_ts="ts", build_ts="click_ts",
            build_cols=["click_id"],
        ).select("purchase_id", "click_id")
        assert got.count() == expected.count()
        assert got.exceptAll(expected).count() == 0
    finally:
        sources.cleanup(ct)
        sources.cleanup(pt)


def test_window_topn_stream(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"]
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=2, order_col="ts")
    try:
        out = window_topn(stream, "ts", "1 hour", ["event_type"], "value", "event_id",
                          n=2, delay="0 seconds")
        got = _mem(out, mode="append")
        # append mode with watermark 0: all but the final window emit
        w = W.partitionBy(F.window("ts", "1 hour"), "event_type").orderBy(
            F.col("value").desc(), F.col("event_id"))
        batch = (
            ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
            .select(F.window("ts", "1 hour").start.alias("w_start"), "event_type",
                    F.col("rn").cast("long").alias("rank"), "event_id", "value")
        )
        max_w = got.agg(F.max("w_start")).first()[0]
        batch_closed = batch.filter(F.col("w_start") <= max_w)
        assert got.count() == batch_closed.count() > 0
        assert got.exceptAll(batch_closed).count() == 0
    finally:
        sources.cleanup(tmpdir)


def test_window_topn_incremental_matches_collect_variant(spark, sf_dir):
    """The heavy-window Top-N (bounded n-row state + event-time timeout) must
    emit exactly what the collect_list variant emits for every window the
    watermark closed — same rows, ranks, and append-once semantics."""
    ev = load_tables(spark, sf_dir)["events"]
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3, order_col="ts")
    try:
        out = window_topn_incremental(stream, "ts", "1 hour", ["event_type"],
                                      "value", "event_id", n=2, delay="0 seconds")
        got = _mem(out, mode="append")
        w = W.partitionBy(F.window("ts", "1 hour"), "event_type").orderBy(
            F.col("value").desc(), F.col("event_id"))
        batch = (
            ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
            .select(F.window("ts", "1 hour").start.alias("w_start"), "event_type",
                    F.col("rn").cast("long").alias("rank"), "event_id", "value")
        )
        max_w = got.agg(F.max("w_start")).first()[0]
        batch_closed = batch.filter(F.col("w_start") <= max_w)
        assert got.count() == batch_closed.count() > 0
        assert got.exceptAll(batch_closed).count() == 0
    finally:
        sources.cleanup(tmpdir)


def test_rowtime_temporal_join_out_of_order(spark):
    """Rowtime semantics: a build version arriving AFTER probes (but within
    the watermark delay) is still matched — the proctime variant would miss it."""
    from datetime import datetime
    from flink_release_1_14_5_comment_spark.streaming.temporal_join import (
        temporal_join_stream_rowtime,
    )

    def ts(m):
        return datetime(2024, 1, 1, 10, m)

    # chunk 1 (by ts order): probe@10:05 arrives BEFORE the version@10:02
    # lands in the same replayed stream ordering; then far-future rows push
    # the watermark past 10:05 so the buffered probe emits.
    build = spark.createDataFrame(
        [(1, ts(2), 100), (1, ts(40), 999)], "k long, vts timestamp, price long")
    probe = spark.createDataFrame(
        [(1, ts(5), 71), (1, ts(45), 72), (1, ts(59), 73)],
        "k long, pts timestamp, order_id long")
    bs, bt = sources.replay_as_stream(spark, build, 2, "vts")
    ps, pt = sources.replay_as_stream(spark, probe, 2, "pts")
    try:
        out = temporal_join_stream_rowtime(
            ps, bs, "k", "pts", "vts", "order_id", "price", delay="0 seconds")
        got = _mem(out).toPandas().set_index("order_id")
        # probe 71 (10:05) matches version 100 (10:02)
        assert 71 in got.index and got.loc[71, "price"] == 100
        # probe 72 (10:45) matches version 999 (10:40) once watermark passes
        if 72 in got.index:
            assert got.loc[72, "price"] == 999
        # probe 73 at 10:59 == final max ts → watermark reaches it only if a
        # later event exists; buffered forever is acceptable semantics here.
    finally:
        sources.cleanup(bt)
        sources.cleanup(pt)
