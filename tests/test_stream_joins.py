"""Stream-stream join + count window tests (SURVEY §2.3 streaming, §2.9)."""

from __future__ import annotations

import sys
import uuid

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.catalog import load_tables
from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.count_windows import tumbling_count_window
from flink_release_1_14_5_comment_spark.streaming.stream_joins import (
    interval_join_stream,
    window_join_stream,
)


def _mem(sdf, mode="append"):
    name = "t" + uuid.uuid4().hex[:10]
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(180)
    return sdf.sparkSession.table(name)


def test_stream_stream_interval_join(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"),
        F.col("ts").alias("c_ts"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"),
        F.col("ts").alias("p_ts"),
    )
    cs, ctmp = sources.replay_as_stream(spark, clicks, n_chunks=2, order_col="c_ts")
    bs, btmp = sources.replay_as_stream(spark, buys, n_chunks=2, order_col="p_ts")
    try:
        joined = interval_join_stream(
            bs, cs, F.col("pu") == F.col("cu"), "p_ts", "c_ts",
            lower="30 MINUTES", upper="0 SECONDS",
            left_delay="40 days", right_delay="40 days",
        )
        got = _mem(joined.select("purchase_id", "click_id"))
        batch = (
            buys.join(clicks, (F.col("pu") == F.col("cu"))
                      & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
                      & (F.col("c_ts") <= F.col("p_ts")))
            .select("purchase_id", "click_id")
        )
        assert got.count() == batch.count() > 0
        assert got.exceptAll(batch).count() == 0
    finally:
        sources.cleanup(ctmp)
        sources.cleanup(btmp)


def test_stream_stream_window_join(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"].limit(500)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"))
    vs, vtmp = sources.replay_as_stream(spark, views, n_chunks=2, order_col="v_ts")
    cs, ctmp = sources.replay_as_stream(spark, clicks, n_chunks=2, order_col="c_ts")
    try:
        joined = window_join_stream(vs, cs, ["user_id"], "v_ts", "c_ts",
                                    size="1 hour", delay="40 days")
        got = _mem(joined.select("user_id", "view_id", "click_id"))
        batch = (
            views.withColumn("w", F.window("v_ts", "1 hour"))
            .join(clicks.withColumn("w", F.window("c_ts", "1 hour")), ["w", "user_id"])
            .select("user_id", "view_id", "click_id")
        )
        assert got.count() == batch.count()
        assert got.exceptAll(batch).count() == 0
    finally:
        sources.cleanup(vtmp)
        sources.cleanup(ctmp)


def test_tumbling_count_window(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"].limit(400).select("user_id", "event_id", "value")
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3, order_col="event_id")
    try:
        got = _mem(tumbling_count_window(stream, ["user_id"], "value", "event_id", size=5))
        pdf = got.toPandas()
        assert (pdf["n"] == 5).all()
        # per key: windows emitted == floor(count/5), seqs contiguous from 0
        counts = ev.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
        for uid, grp in pdf.groupby("user_id"):
            assert len(grp) == counts[uid] // 5
            assert sorted(grp["window_seq"]) == list(range(len(grp)))
    finally:
        sources.cleanup(tmpdir)


def test_sliding_count_window(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.streaming.count_windows import (
        sliding_count_window,
    )

    ev = load_tables(spark, sf_dir)["events"].limit(300).select("user_id", "event_id", "value")
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3, order_col="event_id")
    try:
        got = _mem(sliding_count_window(
            stream, ["user_id"], "value", "event_id", size=4, slide=2))
        pdf = got.toPandas()
        # batch-side reference: replay each key's values in event_id order
        ref = {}
        for r in ev.orderBy("event_id").collect():
            vals = ref.setdefault(r["user_id"], [])
            vals.append(r["value"])
        for uid, grp in pdf.groupby("user_id"):
            vals = ref[uid]
            fires = len(vals) // 2
            assert len(grp) == fires
            g = grp.sort_values("fire_seq").reset_index(drop=True)
            for k in range(fires):
                upto = (k + 1) * 2
                window = vals[max(0, upto - 4):upto]
                assert g.loc[k, "n"] == len(window)
                assert abs(g.loc[k, "sum_value"] - sum(window)) < 1e-6
    finally:
        sources.cleanup(tmpdir)


def test_co_group_stream(spark, sf_dir):
    """coGroup: per (user, 1h window) the fn sees BOTH sides' rows — and
    fires for windows where one side is empty (the semantics window join
    cannot give). Verified against a batch full-outer window aggregate."""
    from flink_release_1_14_5_comment_spark.streaming.stream_joins import co_group_stream

    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    cs, ctmp = sources.replay_as_stream(spark, clicks, n_chunks=2, order_col="ts")
    bs, btmp = sources.replay_as_stream(spark, buys, n_chunks=2, order_col="ts")
    try:
        out = co_group_stream(
            cs, bs, ["user_id"], "ts", "ts", "1 hour",
            fn=lambda l, r: {"n_clicks": len(l), "n_buys": len(r)},
            extra_schema="n_clicks long, n_buys long",
        )
        got = _mem(out)
        # batch expectation: full outer of per-window counts per side
        w = F.window("ts", "1 hour").getField("start").alias("w_start")
        bc = clicks.groupBy("user_id", w).agg(F.count("*").alias("n_clicks"))
        bb = buys.groupBy("user_id", w).agg(F.count("*").alias("n_buys"))
        exp = (bc.join(bb, ["user_id", "w_start"], "full")
               .fillna(0, ["n_clicks", "n_buys"]))
        # the stream can't fire windows past the final watermark; compare on
        # the windows that did fire — they must match the batch counts exactly
        assert got.count() > 0
        exp2 = exp.select("user_id", "w_start",
                          F.col("n_clicks").alias("e_clicks"),
                          F.col("n_buys").alias("e_buys"))
        j = got.join(exp2, ["user_id", "w_start"], "left")
        assert j.filter(F.col("e_clicks").isNull()).count() == 0  # no phantom windows
        assert j.filter((F.col("n_clicks") != F.col("e_clicks"))
                        | (F.col("n_buys") != F.col("e_buys"))).count() == 0
        # one-side-empty windows DID fire
        assert got.filter((F.col("n_clicks") == 0) | (F.col("n_buys") == 0)).count() > 0
    finally:
        sources.cleanup(ctmp)
        sources.cleanup(btmp)
