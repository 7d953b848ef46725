"""SQL-text MATCH_RECOGNIZE front door (streaming/match_recognize.py
parse_match_recognize_sql / match_recognize_sql + TableEnvironment
routing). Reference: the SQL bridge StreamExecMatch.java:89 — Flink users
write MATCH_RECOGNIZE as SQL, not API calls."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest

from flink_release_1_14_5_comment_spark.api.table_env import TableEnvironment
from flink_release_1_14_5_comment_spark.streaming.match_recognize import (
    match_recognize,
    parse_match_recognize_sql,
)

MR_SQL = """
SELECT * FROM clicks MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES COUNT(C) AS n_clicks, SUM(C.value) AS click_value
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (V C+ P)
  WITHIN INTERVAL '1' HOUR
  DEFINE
    V AS event_type = 'view',
    C AS event_type = 'click',
    P AS event_type = 'purchase'
)
"""


def test_parse_clauses():
    kw = parse_match_recognize_sql(MR_SQL)
    assert kw["table"] == "clicks"
    assert kw["partition_by"] == ["user_id"]
    assert kw["order_by"] == "ts"
    assert kw["pattern"] == "V C+ P"
    assert kw["define"] == {
        "V": "event_type = 'view'",
        "C": "event_type = 'click'",
        "P": "event_type = 'purchase'",
    }
    assert kw["measures"] == {
        "n_clicks": "COUNT(C)", "click_value": "SUM(C.value)"}
    assert kw["after_match"] == "SKIP PAST LAST ROW"
    assert kw["within_seconds"] == 3600


@pytest.fixture(scope="module")
def clicks(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: view, click, click, purchase → one match, 2 clicks
    for i, (et, v) in enumerate([("view", 1.0), ("click", 2.0),
                                 ("click", 3.0), ("purchase", 9.0)]):
        rows.append((1, i, t0 + dt.timedelta(minutes=i), et, v))
    # user 2: view then purchase 2h later → outside WITHIN, no match
    rows.append((2, 10, t0, "view", 1.0))
    rows.append((2, 11, t0 + dt.timedelta(minutes=1), "click", 5.0))
    rows.append((2, 12, t0 + dt.timedelta(hours=2), "purchase", 1.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double")
    df.createOrReplaceTempView("clicks")
    return df


def test_sql_text_end_to_end(spark, clicks):
    env = TableEnvironment(spark)
    out = env.execute_sql(MR_SQL).to_data_frame()
    got = {r.user_id: (r.n_clicks, r.click_value) for r in out.collect()}
    assert got == {1: (2, 5.0)}


def test_sql_matches_api_call(spark, clicks):
    env = TableEnvironment(spark)
    via_sql = env.sql_query(MR_SQL).to_data_frame()
    via_api = match_recognize(
        clicks,
        partition_by=["user_id"], order_by="ts",
        pattern="V C+ P",
        define={"V": "event_type = 'view'", "C": "event_type = 'click'",
                "P": "event_type = 'purchase'"},
        measures={"n_clicks": "COUNT(C)", "click_value": "SUM(C.value)"},
        after_match="SKIP PAST LAST ROW", within_seconds=3600,
        id_col="event_id",
    )
    cols = ["user_id", "n_clicks", "click_value"]
    assert (sorted(tuple(r) for r in via_sql.select(cols).collect())
            == sorted(tuple(r) for r in via_api.select(cols).collect()))


def test_unsupported_shapes_raise():
    with pytest.raises(ValueError, match="ORDER BY"):
        parse_match_recognize_sql(
            "SELECT * FROM t MATCH_RECOGNIZE (PATTERN (A) DEFINE A AS x = 1)")
    with pytest.raises(ValueError, match="DEFINE"):
        parse_match_recognize_sql(
            "SELECT * FROM t MATCH_RECOGNIZE (ORDER BY ts PATTERN (A))")
    with pytest.raises(ValueError, match="shape"):
        parse_match_recognize_sql("SELECT a, b FROM t MATCH_RECOGNIZE (x)")


def test_define_measures_with_multiarg_functions():
    """ADVICE r4: commas inside function calls (COALESCE(a, b)) in DEFINE /
    MEASURES items are not item separators — paren-aware split."""
    from flink_release_1_14_5_comment_spark.streaming.match_recognize import (
        parse_match_recognize_sql,
    )

    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      MEASURES COALESCE(FIRST(A.v), 0) AS first_v,
               GREATEST(LAST(B.v), 1, 2) AS last_v
      PATTERN (A B)
      DEFINE A AS COALESCE(A.v, 0) > 1,
             B AS B.v IN (1, 2, 3)
    )"""
    out = parse_match_recognize_sql(sql)
    assert set(out["define"]) == {"A", "B"}
    assert out["define"]["A"] == "COALESCE(A.v, 0) > 1"
    assert out["define"]["B"] == "B.v IN (1, 2, 3)"
    assert out["measures"]["first_v"] == "COALESCE(FIRST(A.v), 0)"
    assert out["measures"]["last_v"] == "GREATEST(LAST(B.v), 1, 2)"
