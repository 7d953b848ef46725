"""Unbounded full-history stream-stream join with retractions
(streaming/stream_joins.regular_join_stream; reference
StreamingJoinOperator.java:36 + JoinRecordStateViews) — scripted-batch
harness tests in the reference's operator-test style: feed a deterministic
arrival sequence, assert the emitted changelog."""

from __future__ import annotations

import datetime
import sys
from collections import Counter

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.stream_joins import (
    regular_join_stream,
    semi_anti_join_stream,
)

TS = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _mem(sdf):
    import uuid

    name = "t" + uuid.uuid4().hex[:10]
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return sdf.sparkSession.table(name)


def _script(spark):
    """Arrival script: L(a) — R(x) — retract R(x) — R(y); plus an
    unmatched left row on another key."""
    left = spark.createDataFrame(
        [(1, "a", TS, 1), (2, "b", TS, 5)],
        "k long, lval string, l_ts timestamp, __seq long")
    right = spark.createDataFrame(
        [(1, "x", "+I", 2), (1, "x", "-D", 3), (1, "y", "+I", 4)],
        "k long, rval string, __op string, __seq long")
    ls, ltmp = sources.replay_as_stream(spark, left, n_chunks=2, order_col="__seq")
    rs, rtmp = sources.replay_as_stream(spark, right, n_chunks=3, order_col="__seq")
    return ls, rs, [ltmp, rtmp]


def _changelog(df):
    rows = df.collect()
    ops = Counter(r.op for r in rows)
    net = Counter()
    for r in rows:
        net[(r.lval, r.rval)] += 1 if r.op == "+I" else -1
    live = {pair for pair, n in net.items() if n == 1}
    assert all(n in (0, 1) for n in net.values()), net
    return ops, live, rows


def test_left_outer_retracts_null_padding(spark):
    ls, rs, tmps = _script(spark)
    try:
        out = regular_join_stream(ls, rs, ["k"], how="left", seq_col="__seq")
        ops, live, rows = _changelog(_mem(out))
        # a ends joined to y; b stays null-padded
        assert live == {("a", "y"), ("b", None)}
        # +I: (a,null) (a,x) (a,null again after x retracted) (a,y) (b,null)
        assert ops["+I"] == 5 and ops["-D"] == 3
        # timestamp payload survives the JSON hop
        assert all(r.l_ts == TS for r in rows)
    finally:
        for t in tmps:
            sources.cleanup(t)


def test_inner_join_changelog(spark):
    ls, rs, tmps = _script(spark)
    try:
        out = regular_join_stream(ls, rs, ["k"], how="inner", seq_col="__seq")
        ops, live, rows = _changelog(_mem(out))
        assert live == {("a", "y")}
        assert ops["+I"] == 2 and ops["-D"] == 1  # +I(a,x) -D(a,x) +I(a,y)
        assert all(r.k == 1 for r in rows)  # key 2 never matches
    finally:
        for t in tmps:
            sources.cleanup(t)


def test_left_retraction_input(spark):
    """Retracting a LEFT row removes all its join output (build side of the
    reference's JoinRecordStateView)."""
    left = spark.createDataFrame(
        [(1, "a", "+I", 1), (1, "a", "-D", 4)],
        "k long, lval string, __op string, __seq long")
    right = spark.createDataFrame(
        [(1, "x", 2), (1, "y", 3)], "k long, rval string, __seq long")
    ls, ltmp = sources.replay_as_stream(spark, left, n_chunks=2, order_col="__seq")
    rs, rtmp = sources.replay_as_stream(spark, right, n_chunks=2, order_col="__seq")
    try:
        out = regular_join_stream(ls, rs, ["k"], how="left", seq_col="__seq")
        ops, live, _ = _changelog(_mem(out))
        assert live == set()  # everything retracted
        assert ops["+I"] == ops["-D"] == 3  # (a,null), (a,x), (a,y) each live+dead
    finally:
        sources.cleanup(ltmp)
        sources.cleanup(rtmp)


def test_ttl_accepted_and_correct_within_window(spark):
    ls, rs, tmps = _script(spark)
    try:
        out = regular_join_stream(ls, rs, ["k"], how="inner", ttl="1 hour",
                                  seq_col="__seq")
        _, live, _ = _changelog(_mem(out))
        assert live == {("a", "y")}
    finally:
        for t in tmps:
            sources.cleanup(t)


def test_right_outer_pads_unmatched_right(spark):
    """Mirror of the left-outer case: the retract-R(x) script means x's join
    rows die; y arrives while a is present so it is never padded, and the
    unmatched-left key-2 row contributes nothing under how="right"."""
    ls, rs, tmps = _script(spark)
    try:
        out = regular_join_stream(ls, rs, ["k"], how="right", seq_col="__seq")
        ops, live, rows = _changelog(_mem(out))
        assert live == {("a", "y")}
        # +I(a,x) -D(a,x) +I(a,y); no pads (a precedes every right row)
        assert ops["+I"] == 2 and ops["-D"] == 1
    finally:
        for t in tmps:
            sources.cleanup(t)


def test_right_outer_pad_retract_on_first_left_match(spark):
    """Right rows arrive FIRST → padded; the late left row retracts both
    pads and emits the join rows (numOfAssociations flip, mirrored).
    Each replay source advances one file per trigger, so micro-batch k
    unions chunk k of BOTH sides; the key-99 filler keeps the real left
    row out of batch 1, and __seq orders y before a inside batch 2."""
    left = spark.createDataFrame(
        [(99, "filler", 0), (1, "a", 3)], "k long, lval string, __seq long")
    right = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], "k long, rval string, __seq long")
    ls, ltmp = sources.replay_as_stream(spark, left, n_chunks=2, order_col="__seq")
    rs, rtmp = sources.replay_as_stream(spark, right, n_chunks=2, order_col="__seq")
    try:
        out = regular_join_stream(ls, rs, ["k"], how="right", seq_col="__seq")
        ops, live, _ = _changelog(_mem(out))
        assert live == {("a", "x"), ("a", "y")}
        # +I(null,x) +I(null,y) -D both pads, +I(a,x) +I(a,y);
        # the unmatched key-99 left row emits nothing under how="right"
        assert ops["+I"] == 4 and ops["-D"] == 2
    finally:
        sources.cleanup(ltmp)
        sources.cleanup(rtmp)


def test_full_outer_pads_both_sides(spark):
    """Full outer: the L(a)-R(x)-retract(x)-R(y) script plus the unmatched
    left key keeps BOTH sides' pads live where appropriate."""
    ls, rs, tmps = _script(spark)
    try:
        out = regular_join_stream(ls, rs, ["k"], how="full", seq_col="__seq")
        ops, live, _ = _changelog(_mem(out))
        assert live == {("a", "y"), ("b", None)}
        # left-outer's 5 +I / 3 -D; right rows always match a on arrival,
        # so no right pads appear
        assert ops["+I"] == 5 and ops["-D"] == 3
    finally:
        for t in tmps:
            sources.cleanup(t)


def test_full_outer_repad_when_side_drains(spark):
    """Retracting the ONLY left row under full outer re-pads the surviving
    right rows (the drain → re-pad transition on the opposite side)."""
    left = spark.createDataFrame(
        [(1, "a", "+I", 2), (1, "a", "-D", 4)],
        "k long, lval string, __op string, __seq long")
    right = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 3)], "k long, rval string, __seq long")
    ls, ltmp = sources.replay_as_stream(spark, left, n_chunks=2, order_col="__seq")
    rs, rtmp = sources.replay_as_stream(spark, right, n_chunks=2, order_col="__seq")
    try:
        out = regular_join_stream(ls, rs, ["k"], how="full", seq_col="__seq")
        ops, live, _ = _changelog(_mem(out))
        # end state: a gone, x and y live as right pads
        assert live == {(None, "x"), (None, "y")}
        # +I(null,x) [x first, padded] -D pad +I(a,x) [a arrives]
        # +I(a,y) [y joins a directly] -D(a,x) -D(a,y) +I(null,x) +I(null,y)
        assert ops["+I"] == 5 and ops["-D"] == 3
    finally:
        sources.cleanup(ltmp)
        sources.cleanup(rtmp)


def _semi_changelog(df):
    rows = df.collect()
    ops = Counter(r.op for r in rows)
    net = Counter()
    for r in rows:
        net[r.lval] += 1 if r.op == "+I" else -1
    assert all(n in (0, 1) for n in net.values()), net
    return ops, {v for v, n in net.items() if n == 1}


def test_semi_join_stream_flips_on_right_count(spark):
    """StreamingSemiAntiJoinOperator semi semantics: left rows are born at
    the right side's 0→1 transition, die at 1→0, reborn when y arrives."""
    ls, rs, tmps = _script(spark)
    try:
        out = semi_anti_join_stream(ls, rs, ["k"], how="semi", seq_col="__seq")
        ops, live = _semi_changelog(_mem(out))
        assert live == {"a"}          # y keeps key 1 matched at end-of-input
        assert ops["+I"] == 2 and ops["-D"] == 1
    finally:
        for t in tmps:
            sources.cleanup(t)


def test_anti_join_stream_mirror(spark):
    """Anti is the exact mirror: +I while the right side is empty, retract
    on first match, re-emit when the last right row is retracted."""
    ls, rs, tmps = _script(spark)
    try:
        out = semi_anti_join_stream(ls, rs, ["k"], how="anti", seq_col="__seq")
        ops, live = _semi_changelog(_mem(out))
        assert live == {"b"}          # key 1 ends matched → a not in anti
        assert ops["+I"] == 3 and ops["-D"] == 2
    finally:
        for t in tmps:
            sources.cleanup(t)


def test_overlapping_payload_rejected(spark):
    df = spark.createDataFrame([(1, "v")], "k long, val string")
    with pytest.raises(ValueError, match="disjoint"):
        regular_join_stream(df, df, ["k"])
    with pytest.raises(NotImplementedError):
        regular_join_stream(
            df, df.withColumnRenamed("val", "val2"), ["k"], how="cross")
