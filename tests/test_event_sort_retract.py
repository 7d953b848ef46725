"""Event-time sort + retraction-consuming aggregate harness tests."""

from __future__ import annotations

import sys
import uuid
from datetime import datetime

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.catalog import load_tables
from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.event_sort import rowtime_sort
from flink_release_1_14_5_comment_spark.streaming.retract_agg import (
    retract_agg_stream,
    retract_count_expr,
    retract_sum_expr,
)


def _mem(sdf, mode="append"):
    name = "t" + uuid.uuid4().hex[:10]
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(180)
    return sdf.sparkSession.table(name)


def test_rowtime_sort_emits_in_order(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"].limit(400).select("user_id", "event_id", "ts")
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3, order_col="ts")
    try:
        got = _mem(rowtime_sort(stream, ["user_id"], "ts", "event_id")).toPandas()
        assert len(got) > 0
        # per key: seq order == ts order, seqs contiguous from 0
        for uid, grp in got.groupby("user_id"):
            grp = grp.sort_values("seq")
            assert list(grp["seq"]) == list(range(len(grp)))
            assert grp["ts"].is_monotonic_increasing
        # emitted rows are exactly those at-or-below the final watermark —
        # i.e. a prefix of each key's timeline (nothing skipped)
        batch = ev.toPandas()
        for uid, grp in got.groupby("user_id"):
            all_ts = sorted(batch[batch.user_id == uid]["ts"])
            assert list(grp.sort_values("seq")["ts"]) == all_ts[: len(grp)]
    finally:
        sources.cleanup(tmpdir)


def _changelog(spark):
    rows = [
        # chunk 1 (seq 1-2)    chunk 2 (seq 3-4)      chunk 3 (seq 5-6)
        # key 1: +10 | +5, -10 (max falls 10→5) | +12 → net 17, cnt 2
        (1, 10.0, "+I", 1),
        (2, 7.0, "+I", 2),
        (1, 5.0, "+I", 3),
        (1, 10.0, "-U", 4),
        (1, 12.0, "+U", 5),
        # key 2: deleted in a later batch than its insert → -D downstream
        (2, 7.0, "-D", 6),
    ]
    return spark.createDataFrame(rows, "k long, v double, __rowkind string, seq long")


def test_retract_sum_batch_expr(spark):
    df = _changelog(spark)
    got = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k").agg(
            retract_sum_expr("v").alias("s"), retract_count_expr().alias("c")
        ).collect()
    }
    assert got[1] == (17.0, 2)
    assert got[2] == (0.0, 0)


def test_retract_agg_stream(spark):
    df = _changelog(spark)
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=3, order_col="seq")
    try:
        got = _mem(retract_agg_stream(stream, ["k"], "v"), mode="update").toPandas()
        final = got.sort_index().groupby("k").last()
        assert final.loc[1, "sum_value"] == 17.0 and final.loc[1, "cnt"] == 2
        # fully-retracted group emits DELETE, not a zero-valued +U
        assert final.loc[2, "__rowkind"] == "-D" and final.loc[2, "cnt"] == 0
        kinds = set(got["__rowkind"])
        assert kinds <= {"+I", "+U", "-D"}
    finally:
        sources.cleanup(tmpdir)


def test_retract_agg_stream_minmax(spark):
    """A retraction of the current MAX must fall back to the next value in
    the multiset — the MaxWithRetractAggFunction case a plain accumulator
    cannot answer."""
    df = _changelog(spark)
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=3, order_col="seq")
    try:
        got = _mem(retract_agg_stream(stream, ["k"], "v"), mode="update").toPandas()
        k1 = got[got["k"] == 1].sort_index()
        # batch 1: {10}; batch 2: +5 then -10 → {5} (max falls); batch 3: +12
        assert list(k1["max_value"]) == [10.0, 5.0, 12.0]
        assert list(k1["min_value"]) == [10.0, 5.0, 5.0]
    finally:
        sources.cleanup(tmpdir)
