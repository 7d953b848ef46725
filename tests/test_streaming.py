"""Streaming-surface tests, mirroring the reference's operator-harness style
(SURVEY §5: scripted micro-batches through a stateful operator, asserted
against golden/batch-equivalent results)."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.catalog import load_tables
from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.changelog import (
    INSERT, UPDATE_AFTER, UPDATE_BEFORE, DELETE, changelog_normalize, drop_update_before,
    infer_output_mode,
)
from flink_release_1_14_5_comment_spark.streaming.dedup import dedup_keep_first, dedup_keep_last
from flink_release_1_14_5_comment_spark.streaming.topn import streaming_topn
from flink_release_1_14_5_comment_spark.streaming.watermarks import parse_watermark_ddl, with_rowtime
from flink_release_1_14_5_comment_spark.streaming.windows import tumble_agg


def _events(spark, sf_dir, n=None):
    ev = load_tables(spark, sf_dir)["events"]
    return ev.limit(n) if n else ev


def _run_stream(sdf, mode="update"):
    """Run a streaming DF to completion into a memory sink; return batch DF."""
    import uuid

    name = "t" + uuid.uuid4().hex[:12]
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sdf.sparkSession.table(name)


def test_streaming_tumble_agg_matches_batch(spark, sf_dir):
    ev = _events(spark, sf_dir)
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=4, order_col="ts")
    try:
        # Delay covers the whole data span: the file source may process the
        # chunk files in any order (identical mtimes), and this test checks
        # refinement semantics, not late-drop policy.
        sdf = tumble_agg(
            stream, "ts", "1 hour", ["event_type"],
            [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
            delay="40 days",
        )
        got = _run_stream(sdf, mode="update")
        # update mode emits refinements; last emit per (window, key) is final.
        # With in-order chunk replay + availableNow, final refinement = batch result.
        final = (
            got.groupBy("w_start", "event_type")
            .agg(F.max_by("n", "n").alias("n"), F.max_by("sum_value", "n").alias("sum_value"))
        )
        batch = (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
        )
        diff = final.join(batch, ["w_start", "event_type", "n"], "full_outer").filter(
            F.col("n").isNull()
        )
        assert batch.count() > 0
        assert final.count() == batch.count()
        assert diff.count() == 0
    finally:
        sources.cleanup(tmpdir)


def test_streaming_dedup_keep_first(spark, sf_dir):
    ev = _events(spark, sf_dir, 200).select("event_id", "user_id", "ts", "value")
    doubled = ev.union(ev)  # duplicate every row
    stream, tmpdir = sources.replay_as_stream(spark, doubled, n_chunks=3)
    try:
        got = _run_stream(dedup_keep_first(stream, ["event_id"]), mode="append")
        assert got.count() == 200
        assert got.select("event_id").distinct().count() == 200
    finally:
        sources.cleanup(tmpdir)


def test_streaming_dedup_keep_last(spark, sf_dir):
    ev = _events(spark, sf_dir, 500)
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=4, order_col="ts")
    try:
        out = dedup_keep_last(stream, ["user_id"], "ts", ["event_id", "value"])
        got = _run_stream(out, mode="update")
        # Last emission per user (by ts) must equal the batch keep-last winner.
        last_emit = (
            got.groupBy("user_id").agg(F.max_by("event_id", "ts").alias("event_id"))
        )
        batch_last = (
            ev.groupBy("user_id").agg(F.max_by("event_id", "ts").alias("event_id"))
        )
        assert last_emit.exceptAll(batch_last).count() == 0
        kinds = {r["__rowkind"] for r in got.select("__rowkind").distinct().collect()}
        assert kinds <= {"+I", "+U"} and "+I" in kinds
    finally:
        sources.cleanup(tmpdir)


def test_streaming_topn(spark, sf_dir):
    ev = _events(spark, sf_dir, 800)
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=4, order_col="ts")
    try:
        out = streaming_topn(stream, ["event_type"], "value", "event_id", n=3)
        got = _run_stream(out, mode="update")
        # Every batch-final top-3 row must have been emitted at some point
        # with the correct value (append-only input → final winners were
        # admitted when they arrived).
        from pyspark.sql import Window as W

        w = W.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
        batch_top = (
            ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
            .select("event_type", "event_id")
        )
        missed = batch_top.join(got.select("event_type", "event_id").distinct(),
                                ["event_type", "event_id"], "left_anti")
        assert missed.count() == 0
    finally:
        sources.cleanup(tmpdir)


def test_changelog_topn_retractable(spark):
    """Changelog input drives the Updatable/Retractable Top-N: a delete of
    the current #1 promotes the next-best from below full state, an upsert
    re-ranks, and the output changelog carries +I/+U/-D."""
    from flink_release_1_14_5_comment_spark.streaming.topn import changelog_topn

    rows = [
        # chunk 1: three inserts, top-2 = id2(20), id1(10)
        (1, 10, 10.0, "+I", 1), (1, 20, 20.0, "+I", 2), (1, 30, 5.0, "+I", 3),
        # chunk 2: delete the leader → id1 promoted, id30 enters
        (1, 20, 20.0, "-D", 4), (1, 99, 1.0, "+I", 5),
        # chunk 3: upsert id30 to 50 → takes rank 1
        (1, 30, 50.0, "+U", 6),
    ]
    df = spark.createDataFrame(rows, "k long, rid long, v double, __rowkind string, seq long")
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=3, order_col="seq")
    try:
        out = changelog_topn(stream, ["k"], "v", "rid", n=2)
        got = _run_stream(out, mode="update").toPandas()
        # replay the emitted changelog: final top-2 must be id30(50) r1, id10(10) r2
        final: dict = {}
        for _, r in got.iterrows():
            if r["__rowkind"] == "-D":
                final.pop(r["rid"], None)
            else:
                final[r["rid"]] = (r["rank"], r["v"])
        assert final == {30: (1, 50.0), 10: (2, 10.0)}
        # the -D for the deleted leader was emitted
        assert ((got["rid"] == 20) & (got["__rowkind"] == "-D")).any()
        # id1's promotion to rank 1 after the delete was emitted as +U
        assert ((got["rid"] == 10) & (got["__rowkind"] == "+U") & (got["rank"] == 1)).any()
    finally:
        sources.cleanup(tmpdir)


def test_upsert_kafka_standin_normalize_chain(spark):
    """The upsert-kafka → ChangelogNormalize chain with a file-backed topic
    stand-in (no broker in this environment): an upsert stream (+U/-D only,
    keyed, offset-ordered) is completed into a full -U/+U changelog by the
    streaming normalize, and the completed changelog drives a retracting
    SUM to the correct result (the reason the planner inserts the operator)."""
    from flink_release_1_14_5_comment_spark.streaming.changelog import (
        changelog_normalize_stream,
    )
    from flink_release_1_14_5_comment_spark.streaming.retract_agg import (
        retract_count_expr, retract_sum_expr,
    )

    rows = [
        (1, 10.0, 1, "+U"), (2, 7.0, 2, "+U"),   # chunk 1: first values
        (1, 12.0, 3, "+U"), (2, 7.0, 4, "-D"),   # chunk 2: update + delete
    ]
    df = spark.createDataFrame(rows, "k long, v double, offset long, __rowkind string")
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=2, order_col="offset")
    try:
        out = changelog_normalize_stream(stream, ["k"], "offset")
        got = _run_stream(out, mode="update").toPandas()
        per_key = {k: list(g["__rowkind"]) for k, g in got.groupby("k")}
        assert per_key[1] == ["+I", "-U", "+U"]   # missing UPDATE_BEFORE emitted
        assert per_key[2] == ["+I", "-D"]
        # the -U row carries the OLD value (10), the +U the new one (12)
        k1 = got[got["k"] == 1]
        assert list(k1[k1["__rowkind"] == "-U"]["v"]) == [10.0]
        assert list(k1[k1["__rowkind"] == "+U"]["v"]) == [12.0]
        # completed changelog → retracting agg lands on the true final state
        agg = {r["k"]: (r["s"], r["c"]) for r in
               spark.createDataFrame(got).groupBy("k").agg(
                   retract_sum_expr("v").alias("s"),
                   retract_count_expr().alias("c")).collect()}
        assert agg[1] == (12.0, 1)
        assert agg[2] == (0.0, 0)
    finally:
        sources.cleanup(tmpdir)


def test_cascading_window_rollup(spark, sf_dir):
    """Two chained stateful window aggs in ONE streaming query (append mode):
    10-minute tumble sums rolled into 1-hour sums. Emitted (closed) 1-hour
    windows must equal the direct batch 1-hour aggregate."""
    from flink_release_1_14_5_comment_spark.streaming.windows import cascade_tumble_agg

    ev = load_tables(spark, sf_dir)["events"]
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3, order_col="ts")
    try:
        out = cascade_tumble_agg(
            stream, "ts", "10 minutes", "1 hour", ["event_type"],
            inner_aggs=[F.sum("value").alias("s"), F.count(F.lit(1)).alias("n")],
            outer_aggs=[F.round(F.sum("s"), 2).alias("sum_value"),
                        F.sum("n").alias("n")],
        )
        got = _run_stream(out, mode="append")
        batch = (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.round(F.sum("value"), 2).alias("sum_value"),
                 F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("w_start"), "event_type", "sum_value", "n")
        )
        max_w = got.agg(F.max("w_start")).first()[0]
        closed = batch.filter(F.col("w_start") <= max_w)
        assert got.count() == closed.count() > 0
        assert got.select("w_start", "event_type", "sum_value", "n").exceptAll(closed).count() == 0
    finally:
        sources.cleanup(tmpdir)


def test_changelog_normalize_and_drop_update_before(spark):
    rows = [
        (1, "a", 1, INSERT),
        (1, "b", 2, UPDATE_AFTER),
        (1, "a", 2, UPDATE_BEFORE),
        (2, "x", 1, INSERT),
        (2, "x", 2, DELETE),
        (3, "z", 1, INSERT),
    ]
    df = spark.createDataFrame(rows, "k int, v string, seq int, __rowkind string")
    assert drop_update_before(df).filter(F.col("__rowkind") == UPDATE_BEFORE).count() == 0
    live = changelog_normalize(df, ["k"], "seq")
    got = {(r["k"], r["v"]) for r in live.select("k", "v").collect()}
    assert got == {(1, "b"), (3, "z")}  # key 2 deleted, key 1 upserted to b


def test_upsert_sink_cross_batch_delete(spark, tmp_path):
    """A -D arriving in a LATER micro-batch than its +I must remove the key
    from the materialized table (SinkUpsertMaterializer propagates deletes;
    round-2 ADVICE regression)."""
    from flink_release_1_14_5_comment_spark.streaming.changelog import upsert_sink

    rows = [
        (1, "a", 1, "+I"), (2, "x", 2, "+I"),   # chunk 1
        (1, "b", 3, "+U"), (2, "x", 4, "-D"),   # chunk 2: delete key 2
    ]
    df = spark.createDataFrame(rows, "k int, v string, seq int, __rowkind string")
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=2, order_col="seq")
    target = str(tmp_path / "materialized")
    try:
        q = upsert_sink(stream, ["k"], "seq", target)
        q.processAllAvailable()
        q.stop()
        final = {(r["k"], r["v"]) for r in
                 spark.read.parquet(target).select("k", "v").collect()}
        assert final == {(1, "b")}  # key 2 deleted, not resurrected
    finally:
        sources.cleanup(tmpdir)


def test_watermark_ddl_translation(spark, sf_dir):
    assert parse_watermark_ddl("WATERMARK FOR ts AS ts - INTERVAL '5' SECOND") == ("ts", "5 second")
    ev = _events(spark, sf_dir, 10)
    wm = with_rowtime(ev, "ts", "5 seconds")
    assert wm.schema == ev.schema  # watermark is metadata, not schema


def test_infer_output_mode():
    assert infer_output_mode(has_agg=False, has_watermark=False) == "append"
    assert infer_output_mode(has_agg=True, has_watermark=True) == "append"
    assert infer_output_mode(has_agg=True, has_watermark=False) == "update"


def test_plan_changelog_classification(spark, sf_dir):
    """FlinkChangelogModeInferenceProgram analog: classify plans."""
    from flink_release_1_14_5_comment_spark.streaming.changelog import plan_changelog
    from flink_release_1_14_5_comment_spark.streaming import sources
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    # batch frame → insert-only
    p = plan_changelog(ev.groupBy("event_type").count())
    assert p.output_mode == "append" and not p.emits_updates

    stream, tmpdir = sources.replay_as_stream(spark, ev.limit(50), n_chunks=2)
    try:
        # stateless streaming pipeline → append
        p = plan_changelog(stream.filter("value > 0"))
        assert p.output_mode == "append"
        # unbounded agg → update + upsert materializer unless sink has PK
        p = plan_changelog(stream.groupBy("event_type").count())
        assert p.output_mode == "update" and p.emits_updates and p.needs_upsert_materializer
        p = plan_changelog(stream.groupBy("event_type").count(), sink_has_primary_key=True)
        assert p.drop_update_before_safe and not p.needs_upsert_materializer
        # watermark + windowed agg → append on window close
        wm = stream.withWatermark("ts", "1 hour")
        p = plan_changelog(wm.groupBy(F.window("ts", "1 hour")).count())
        assert p.output_mode == "append"
        # streaming dedup → append
        p = plan_changelog(stream.dropDuplicates(["event_id"]))
        assert p.output_mode == "append"
    finally:
        sources.cleanup(tmpdir)


def test_enforce_not_null(spark):
    from flink_release_1_14_5_comment_spark.streaming.changelog import enforce_not_null

    df = spark.createDataFrame([(1, "a"), (2, None)], "k int, v string")
    assert enforce_not_null(df, ["v"], mode="drop").count() == 1
    import pytest as _pytest
    with _pytest.raises(Exception):
        enforce_not_null(df, ["v"], mode="error").collect()


def test_dedup_keep_last_with_ttl_plumbs(spark, sf_dir):
    """TTL variant returns the same winners within a no-expiry window."""
    ev = _events(spark, sf_dir, 200)
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=2, order_col="ts")
    try:
        out = dedup_keep_last(stream, ["user_id"], "ts", ["event_id"], ttl_ms=3_600_000)
        got = _run_stream(out, mode="update")
        last_emit = got.groupBy("user_id").agg(F.max_by("event_id", "ts").alias("event_id"))
        batch_last = ev.groupBy("user_id").agg(F.max_by("event_id", "ts").alias("event_id"))
        assert last_emit.exceptAll(batch_last).count() == 0
    finally:
        sources.cleanup(tmpdir)


def test_session_dynamic_gap(spark, sf_dir):
    """Per-element session gap (DynamicEventTimeSessionWindows): purchases
    tolerate 2h idle, everything else 30min. Streaming result must equal
    the same dynamic-gap session agg computed in batch."""
    from flink_release_1_14_5_comment_spark.streaming.windows import session_agg_dynamic_gap

    ev = load_tables(spark, sf_dir)["events"]
    # session_window's dynamic gap requires CalendarIntervalType → make_interval
    gap = F.expr("CASE WHEN event_type = 'purchase' THEN make_interval(0,0,0,0,2,0,0) "
                 "ELSE make_interval(0,0,0,0,0,30,0) END")
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3, order_col="ts")
    try:
        out = session_agg_dynamic_gap(
            stream, "ts", gap, ["user_id"],
            [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")],
        )
        got = _run_stream(out, mode="append").select(
            F.col("w_start").alias("ws"), F.col("w_end").alias("we"),
            "user_id", "n", "s")
        batch = (
            ev.groupBy(F.session_window("ts", gap).alias("window"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
            .select(F.col("window.start").alias("ws"), F.col("window.end").alias("we"),
                    "user_id", "n", "s")
        )
        # Sessions merge, so "closed" is defined by window END vs the final
        # watermark: every emitted window must match batch exactly, and every
        # batch window ending strictly before the latest emitted end must
        # have been emitted.
        assert got.count() > 0
        assert got.exceptAll(batch).count() == 0
        max_we = got.agg(F.max("we")).first()[0]
        must_have = batch.filter(F.col("we") < max_we)
        assert must_have.exceptAll(got).count() == 0
    finally:
        sources.cleanup(tmpdir)
