"""CountEvictor / TimeEvictor semantics on event-time tumbling windows
(streaming/evictors.py) — checked against a batch-side reference computed
with window functions over the same rows."""

from __future__ import annotations

import sys
import uuid

from pyspark.sql import Window as W
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.catalog import load_tables
from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.evictors import (
    tumble_agg_count_evictor,
    tumble_agg_time_evictor,
)


def _mem(sdf):
    name = "t" + uuid.uuid4().hex[:10]
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return sdf.sparkSession.table(name)


def _events(spark, sf_dir, n=600):
    ev = load_tables(spark, sf_dir)["events"].limit(n)
    return ev.select("user_id", "ts", "value")


def _batch_reference(ev, size_s, keep_fn):
    """Expected (user_id, w_start, n_kept, sum_value) for CLOSED windows:
    rank rows per (key, window) by ts desc, apply keep_fn's predicate."""
    win = F.window("ts", f"{size_s} seconds")
    base = ev.withColumn("w_start", win.start).withColumn("w_end", win.end)
    kept = keep_fn(base)
    # the final watermark is max(ts); windows ending after it never fire
    max_ts = ev.agg(F.max("ts")).first()[0]
    return (
        kept.filter(F.col("w_end") <= F.lit(max_ts))
        .groupBy("user_id", "w_start")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.sum("value").alias("sum_value"))
    )


def _assert_frames_match(got, exp):
    g = {(r["user_id"], r["w_start"]): (r["n_kept"], round(r["sum_value"], 6))
         for r in got.collect()}
    e = {(r["user_id"], r["w_start"]): (r["n_kept"], round(r["sum_value"], 6))
         for r in exp.collect()}
    assert g == e, f"only-got={set(g) - set(e)} only-exp={set(e) - set(g)}"
    assert g  # non-trivial


def test_count_evictor_keeps_latest_n(spark, sf_dir):
    ev = _events(spark, sf_dir)
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3, order_col="ts")
    try:
        out = tumble_agg_count_evictor(
            stream, ["user_id"], "ts", "value", "60 seconds", n_keep=3)
        got = _mem(out)

        def keep(base):
            w = W.partitionBy("user_id", "w_start").orderBy(
                F.col("ts").desc(), F.col("value").desc())
            return base.withColumn("rk", F.row_number().over(w)).filter("rk <= 3")

        _assert_frames_match(got, _batch_reference(ev, 60, keep))
    finally:
        sources.cleanup(tmpdir)


def test_time_evictor_keeps_trailing_span(spark, sf_dir):
    ev = _events(spark, sf_dir)
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3, order_col="ts")
    try:
        out = tumble_agg_time_evictor(
            stream, ["user_id"], "ts", "value", "60 seconds", keep="20 seconds")
        got = _mem(out)

        def keep(base):
            return base.filter(
                F.col("ts") >= F.col("w_end") - F.expr("INTERVAL 20 SECONDS"))

        _assert_frames_match(got, _batch_reference(ev, 60, keep))
    finally:
        sources.cleanup(tmpdir)


def test_count_evictor_state_is_bounded(spark, sf_dir):
    """Eviction happens on insert: an open window never holds more than
    n_keep rows of state (asserted via the emitted n_kept cap)."""
    ev = _events(spark, sf_dir, n=400)
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=2, order_col="ts")
    try:
        out = tumble_agg_count_evictor(
            stream, ["user_id"], "ts", "value", "300 seconds", n_keep=2)
        got = _mem(out)
        assert got.agg(F.max("n_kept")).first()[0] <= 2
    finally:
        sources.cleanup(tmpdir)
