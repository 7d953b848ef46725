"""MATCH_RECOGNIZE long-tail scenarios (VERDICT r4 #5), modeled on the
reference's test suites: GreedyITCase.java (greedy vs reluctant quantifier
interplay), AfterMatchSkipITCase.java (SKIP TO FIRST edge cases that throw
in Flink), and MatchRecognizeITCase.scala (WITHIN expiry on SQL text)."""

from __future__ import annotations

import datetime as dt
import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.streaming.match_recognize import (
    match_recognize,
    match_recognize_sql,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


_SCHEMA = "event_id long, user_id long, ts timestamp, event_type string, value double"


def _ids(out):
    return sorted(tuple(r["step_ids"]) for r in out.collect())


def test_greedy_one_or_more_single_match(spark):
    """GreedyITCase.testGreedyOneOrMore: c a+ (greedy) d over [c,a,a,a,d]
    emits ONLY the full absorption [c,a1,a2,a3,d] — no prefix matches."""
    rows = [(1, 1, _ts(1), "c", 0.0), (2, 1, _ts(2), "a", 0.0),
            (3, 1, _ts(3), "a", 0.0), (4, 1, _ts(4), "a", 0.0),
            (5, 1, _ts(5), "d", 0.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = match_recognize(
        df, ["user_id"], "ts", "C A+ D",
        define={"C": "event_type = 'c'", "A": "event_type = 'a'",
                "D": "event_type = 'd'"},
        id_col="event_id", after_match="skip past last row")
    assert _ids(out) == [(1, 2, 3, 4, 5)]


def test_greedy_vs_reluctant_overlapping_predicates(spark):
    """The quantifier-preference crux: an event matching BOTH the loop and
    the next step. Greedy (SQL default) prefers the longer absorption;
    reluctant (+?) completes at the earliest opportunity — the
    one-row-per-match determinism of the reference's StreamExecMatch."""
    rows = [(1, 1, _ts(1), "c", 1.0), (2, 1, _ts(2), "m", 15.0),
            (3, 1, _ts(3), "m", 25.0), (4, 1, _ts(4), "e", 21.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    defs = {"S": "event_type = 'c'", "M": "event_type = 'm'",
            "E": "value > 20"}
    greedy = match_recognize(df, ["user_id"], "ts", "S M+ E", define=defs,
                             id_col="event_id",
                             after_match="skip past last row")
    assert _ids(greedy) == [(1, 2, 3, 4)]  # m@25 absorbed, e@21 ends
    reluctant = match_recognize(df, ["user_id"], "ts", "S M+? E",
                                define=defs, id_col="event_id",
                                after_match="skip past last row")
    assert _ids(reluctant) == [(1, 2, 3)]  # m@25 ends the match instead


def test_reluctant_optional_and_times_range(spark):
    """?? leaves the optional un-absorbed when the next step also matches;
    {n,m}? stops at the minimum."""
    rows = [(1, 1, _ts(1), "c", 1.0), (2, 1, _ts(2), "m", 25.0),
            (3, 1, _ts(3), "m", 30.0), (4, 1, _ts(4), "e", 21.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    defs = {"S": "event_type = 'c'", "M": "event_type = 'm'",
            "E": "value > 20"}
    # M?? : m@25 matches both M and E; reluctant optional skips straight to E
    rel = match_recognize(df, ["user_id"], "ts", "S M?? E", define=defs,
                          id_col="event_id",
                          after_match="skip past last row")
    assert _ids(rel)[0] == (1, 2)
    # M{1,2}? : stops after one m when E can take over
    rng = match_recognize(df, ["user_id"], "ts", "S M{1,2}? E", define=defs,
                          id_col="event_id",
                          after_match="skip past last row")
    assert _ids(rng)[0] == (1, 2, 3)


def test_skip_to_first_of_match_start_raises(spark):
    """AfterMatchSkipITCase: AFTER MATCH SKIP TO FIRST A where A starts the
    match would loop forever — the reference throws, and so do we."""
    rows = [(1, 1, _ts(1), "a", 0.0), (2, 1, _ts(2), "b", 0.0),
            (3, 1, _ts(3), "a", 0.0), (4, 1, _ts(4), "b", 0.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = match_recognize(
        df, ["user_id"], "ts", "A B",
        define={"A": "event_type = 'a'", "B": "event_type = 'b'"},
        id_col="event_id", after_match="skip to first A")
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "Could not skip to first element" in str(ei.value)


def test_skip_to_first_missing_var_raises(spark):
    """Skip target never matched (optional var absent from the match) —
    also an infinite-loop position; the reference's default throws."""
    rows = [(1, 1, _ts(1), "a", 0.0), (2, 1, _ts(2), "b", 0.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = match_recognize(
        df, ["user_id"], "ts", "A X? B",
        define={"A": "event_type = 'a'", "X": "event_type = 'x'",
                "B": "event_type = 'b'"},
        id_col="event_id", after_match="skip to first X")
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "Could not skip to first element" in str(ei.value)


def test_within_expiry_on_sql_text(spark):
    """MatchRecognizeITCase WITHIN: a partial match older than the horizon
    never completes; a fresh one does. SQL-text path end-to-end."""
    rows = [(1, 1, _ts(1), "a", 0.0), (2, 1, _ts(50), "b", 0.0),
            (3, 2, _ts(10), "a", 0.0), (4, 2, _ts(20), "b", 0.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    df.createOrReplaceTempView("mr_within_ev")
    out = match_recognize_sql(df, """
        SELECT * FROM mr_within_ev MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES COUNT(B) AS nb
          PATTERN (A B) WITHIN INTERVAL '30' MINUTE
          DEFINE A AS event_type = 'a', B AS event_type = 'b'
        )""", id_col="event_id")
    got = sorted((r["user_id"], tuple(r["step_ids"])) for r in out.collect())
    # user 1: b arrives 49 min after a — expired; user 2: 10 min — matches
    assert got == [(2, (3, 4))]


def test_reluctant_parse_via_sql_text(spark):
    rows = [(1, 1, _ts(1), "c", 1.0), (2, 1, _ts(2), "m", 15.0),
            (3, 1, _ts(3), "m", 25.0), (4, 1, _ts(4), "e", 21.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    df.createOrReplaceTempView("mr_rel_ev")
    out = match_recognize_sql(df, """
        SELECT * FROM mr_rel_ev MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES LAST(E.value) AS last_e
          PATTERN (S M+? E)
          DEFINE S AS event_type = 'c', M AS event_type = 'm',
                 E AS value > 20
        )""", id_col="event_id")
    [r] = out.collect()
    assert tuple(r["step_ids"]) == (1, 2, 3) and r["last_e"] == 25.0
