"""CEP NFA operator harness tests (reference-style: scripted micro-batches →
asserted matches; SURVEY §5 harness pattern)."""

from __future__ import annotations

import sys
from datetime import datetime

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.cep import Pattern, cep


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 10, minute)


@pytest.fixture()
def scripted(spark):
    rows = [
        # user 1: view(1) → click(2) → purchase(3): one full match
        (1, 1, _ts(1), "view"),
        (2, 1, _ts(2), "click"),
        (3, 1, _ts(3), "purchase"),
        # user 1 again later: view(4) → click(5), no purchase → no match
        (4, 1, _ts(30), "view"),
        (5, 1, _ts(31), "click"),
        # user 2: click without preceding view → no match
        (6, 2, _ts(1), "click"),
        (7, 2, _ts(2), "purchase"),
        # user 3: match spread across micro-batches
        (8, 3, _ts(5), "view"),
        (9, 3, _ts(50), "click"),
        (10, 3, _ts(51), "purchase"),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")


def _pattern():
    return (
        Pattern.begin("v", lambda r: r["event_type"] == "view")
        .followed_by("c", lambda r: r["event_type"] == "click")
        .followed_by("p", lambda r: r["event_type"] == "purchase")
        .within(3600)
    )


def _run(spark, df, n_chunks):
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=n_chunks, order_col="ts")
    try:
        out = cep(stream, _pattern(), ["user_id"], "ts", "event_id")
        import uuid

        name = "t" + uuid.uuid4().hex[:10]
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.table(name).toPandas()
    finally:
        sources.cleanup(tmpdir)


def test_cep_matches_full_sequences(spark, scripted):
    got = _run(spark, scripted, n_chunks=1)
    assert set(got["user_id"]) == {1, 3}
    m1 = got[got.user_id == 1].iloc[0]
    assert list(m1["step_ids"]) == [1, 2, 3]
    m3 = got[got.user_id == 3].iloc[0]
    assert list(m3["step_ids"]) == [8, 9, 10]


def test_cep_state_survives_microbatches(spark, scripted):
    # 3 chunks → user-3's run must be carried in state across batches
    got = _run(spark, scripted, n_chunks=3)
    assert set(got["user_id"]) == {1, 3}


def test_cep_within_expires_runs(spark):
    rows = [
        (1, 1, _ts(0), "view"),
        (2, 1, _ts(2), "click"),
        # purchase 2 hours later — outside within(3600) → run expired
        (3, 1, datetime(2024, 1, 1, 12, 30), "purchase"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = _run(spark, df, n_chunks=1)
    assert len(got) == 0


def test_one_or_more_quantifier(spark):
    """V C+ P: greedy click absorption between view and purchase."""
    from flink_release_1_14_5_comment_spark.streaming.match_recognize import match_recognize

    rows = [
        (1, 1, _ts(1), "view"),
        (2, 1, _ts(2), "click"),
        (3, 1, _ts(3), "click"),
        (4, 1, _ts(4), "click"),
        (5, 1, _ts(5), "purchase"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    stream, tmpdir = sources.replay_as_stream(spark, df, n_chunks=1)
    try:
        out = match_recognize(
            stream, ["user_id"], "ts", "V C+ P",
            define={"V": "event_type = 'view'", "C": "event_type = 'click'",
                    "P": "event_type = 'purchase'"},
            id_col="event_id", within_seconds=3600,
        )
        import uuid
        name = "t" + uuid.uuid4().hex[:10]
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.table(name).toPandas()
        assert len(got) == 1
        assert list(got.iloc[0]["step_ids"]) == [1, 2, 3, 4, 5]  # all clicks absorbed
    finally:
        sources.cleanup(tmpdir)


def test_match_recognize_define_parsing():
    from flink_release_1_14_5_comment_spark.streaming.match_recognize import compile_predicate
    import pandas as pd

    p = compile_predicate("event_type = 'click' AND value > 10")
    assert p(pd.Series({"event_type": "click", "value": 11}))
    assert not p(pd.Series({"event_type": "click", "value": 9}))
    assert not p(pd.Series({"event_type": "view", "value": 11}))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        compile_predicate("event_type IN ('a','b')")
