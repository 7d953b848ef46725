"""Flink window-SQL → Spark-SQL translation (api/sql_translate.py):
legacy group windows, auxiliary accessors, and window TVFs, each checked
against an independently built DataFrame equivalent on the events table.
Reference syntax: FlinkSqlOperatorTable.java:923-992 (legacy),
SqlTumbleTableFunction / window TVFs (FLIP-145)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.api.sql_translate import (
    translate_flink_sql,
)
from flink_release_1_14_5_comment_spark.api.table_env import TableEnvironment
from flink_release_1_14_5_comment_spark.catalog import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def env(spark):
    ev = load_tables(spark, SF)["events"].select(
        "event_id", "event_type", "ts", "value")
    ev.createOrReplaceTempView("ev")
    return TableEnvironment(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_passthrough_untouched():
    sql = "SELECT event_type, COUNT(*) FROM ev GROUP BY event_type"
    assert translate_flink_sql(sql) == sql


def test_legacy_tumble(env, spark):
    got = env.sql_query("""
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start,
               event_type, COUNT(*) AS n
        FROM ev
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
    """).to_data_frame()
    want = (
        spark.table("ev")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("w_start"), "event_type", "n")
    )
    assert _rows(got) == _rows(want)


def test_legacy_tumble_end_and_rowtime(env, spark):
    got = env.sql_query("""
        SELECT TUMBLE_END(ts, INTERVAL '1' HOUR) AS w_end,
               TUMBLE_ROWTIME(ts, INTERVAL '1' HOUR) AS rt,
               COUNT(*) AS n
        FROM ev GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
    """).to_data_frame()
    want = (
        spark.table("ev").groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.end").alias("w_end"),
                (F.col("window.end") - F.expr("INTERVAL 1 MILLISECOND")).alias("rt"),
                "n")
    )
    assert _rows(got) == _rows(want)


def test_legacy_hop_flips_argument_order(env, spark):
    # Flink: HOP(ts, slide=30m, size=1h); Spark: window(ts, size, slide)
    got = env.sql_query("""
        SELECT HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) AS w_start,
               COUNT(*) AS n
        FROM ev GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)
    """).to_data_frame()
    want = (
        spark.table("ev").groupBy(F.window("ts", "1 hour", "30 minute"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("w_start"), "n")
    )
    assert _rows(got) == _rows(want)


def test_legacy_session(env, spark):
    got = env.sql_query("""
        SELECT event_type, SESSION_START(ts, INTERVAL '30' MINUTE) AS s_start,
               COUNT(*) AS n
        FROM ev GROUP BY event_type, SESSION(ts, INTERVAL '30' MINUTE)
    """).to_data_frame()
    want = (
        spark.table("ev")
        .groupBy("event_type", F.session_window("ts", "30 minute"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.col("session_window.start").alias("s_start"), "n")
    )
    assert _rows(got) == _rows(want)


def test_tvf_tumble(env, spark):
    got = env.sql_query("""
        SELECT window_start, window_end, event_type, COUNT(*) AS n
        FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, window_end, event_type
    """).to_data_frame()
    want = (
        spark.table("ev")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"), "event_type", "n")
    )
    assert _rows(got) == _rows(want)


def test_tvf_hop(env, spark):
    # Flink TVF arg order: slide then size
    got = env.sql_query("""
        SELECT window_start, COUNT(*) AS n
        FROM TABLE(HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '30' MINUTE,
                       INTERVAL '1' HOUR))
        GROUP BY window_start
    """).to_data_frame()
    want = (
        spark.table("ev").groupBy(F.window("ts", "1 hour", "30 minute"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )
    assert _rows(got) == _rows(want)


def test_tvf_hop_row_multiplicity(env, spark):
    # every row lands in exactly size/slide windows
    got = env.sql_query("""
        SELECT COUNT(*) AS n
        FROM TABLE(HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '30' MINUTE,
                       INTERVAL '1' HOUR))
    """).to_data_frame().collect()[0]["n"]
    base = spark.table("ev").count()
    assert got == 2 * base


def test_tvf_cumulate(env, spark):
    # step 1h, size 4h: a row at offset o inside its 4h frame appears in
    # windows ending at every full hour strictly after o, up to 4h
    got = env.sql_query("""
        SELECT window_start, window_end, COUNT(*) AS n
        FROM TABLE(CUMULATE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR,
                            INTERVAL '4' HOUR))
        GROUP BY window_start, window_end
    """).to_data_frame()
    from flink_release_1_14_5_comment_spark.operators.time_windows import (
        cumulate,
    )

    assigned = cumulate(spark.table("ev"), "ts", 60, 240).select(
        F.col("w_start").alias("window_start"),
        F.col("w_end").alias("window_end"))
    want = (assigned.groupBy("window_start", "window_end")
            .agg(F.count(F.lit(1)).alias("n")))
    assert _rows(got) == _rows(want)


def test_tvf_window_bounds_contain_ts(env, spark):
    bad = env.sql_query("""
        SELECT COUNT(*) AS n
        FROM TABLE(HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '30' MINUTE,
                       INTERVAL '1' HOUR))
        WHERE ts < window_start OR ts >= window_end
    """).to_data_frame().collect()[0]["n"]
    assert bad == 0


# --- property-based robustness (pure string-level, no Spark session) ------

from hypothesis import given, settings
from hypothesis import strategies as st

_units = st.sampled_from(["SECOND", "MINUTE", "HOUR", "DAY"])
_n = st.integers(min_value=1, max_value=48)
_col = st.sampled_from(["ts", "event_time", "order_ts"])
_tbl = st.sampled_from(["ev", "orders_t", "t1"])


@settings(max_examples=200, deadline=None)
@given(tbl=_tbl, col=_col, n=_n, unit=_units)
def test_prop_tvf_tumble_always_rewrites(tbl, col, n, unit):
    sql = (f"SELECT window_start, COUNT(*) FROM TABLE(TUMBLE(TABLE {tbl}, "
           f"DESCRIPTOR({col}), INTERVAL '{n}' {unit})) GROUP BY window_start")
    out = translate_flink_sql(sql)
    assert "TUMBLE" not in out.upper()
    assert "window_start" in out and f"FROM {tbl}" in out
    # size arithmetic is the exact micros value
    us = n * {"SECOND": 10**6, "MINUTE": 60 * 10**6,
              "HOUR": 3600 * 10**6, "DAY": 86400 * 10**6}[unit]
    assert str(us) in out


@settings(max_examples=200, deadline=None)
@given(col=_col, slide_n=_n, size_mult=st.integers(1, 4), unit=_units)
def test_prop_legacy_hop_flips_order(col, slide_n, size_mult, unit):
    size_n = slide_n * size_mult
    sql = (f"SELECT COUNT(*) FROM ev GROUP BY HOP({col}, "
           f"INTERVAL '{slide_n}' {unit}, INTERVAL '{size_n}' {unit})")
    out = translate_flink_sql(sql)
    assert out == (f"SELECT COUNT(*) FROM ev GROUP BY window({col}, "
                   f"'{size_n} {unit.lower()}', '{slide_n} {unit.lower()}')")


@settings(max_examples=100, deadline=None)
@given(text=st.text(alphabet=st.characters(
    whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x7f),
    max_size=80))
def test_prop_plain_sql_passthrough(text):
    # SQL with none of the window keywords is byte-identical after translate
    sql = f"SELECT {text!r} FROM t WHERE a > 1"
    assert translate_flink_sql(sql) == sql


def test_tvf_window_join(env, spark):
    """FLIP-145 window JOIN: two window-TVF subqueries joined on
    (window_start, window_end, key) — the reference's StreamExecWindowJoin
    SQL shape — must compose through the translator unchanged and match an
    independently built window-aggregate join."""
    load_tables(spark, SF)["events"].select(
        "event_id", "event_type", "ts", "user_id", "value") \
        .createOrReplaceTempView("ev_wj")
    got = env.sql_query("""
        SELECT c.window_start AS ws, c.user_id,
               c.n AS n_clicks, v.n AS n_views
        FROM (
          SELECT window_start, user_id, COUNT(*) AS n
          FROM TABLE(TUMBLE(TABLE ev_wj, DESCRIPTOR(ts), INTERVAL '1' HOUR))
          WHERE event_type = 'click'
          GROUP BY window_start, user_id
        ) c JOIN (
          SELECT window_start, user_id, COUNT(*) AS n
          FROM TABLE(TUMBLE(TABLE ev_wj, DESCRIPTOR(ts), INTERVAL '1' HOUR))
          WHERE event_type = 'view'
          GROUP BY window_start, user_id
        ) v ON c.window_start = v.window_start AND c.user_id = v.user_id
    """).to_data_frame()

    ev = load_tables(spark, SF)["events"]
    def agg(kind):
        return (ev.filter(F.col("event_type") == kind)
                .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.col("w.start").alias("ws"), "user_id", "n"))
    want = (agg("click").alias("c")
            .join(agg("view").alias("v"), ["ws", "user_id"])
            .select("ws", "user_id",
                    F.col("c.n").alias("n_clicks"), F.col("v.n").alias("n_views")))
    assert _rows(got) == _rows(want)


def test_tvf_hop_gap_windows(env, spark):
    """ADVICE r4: size < slide (gap windows) — rows between windows fall in
    NO window; a bare sequence() would throw (first > last). Flink's HOP
    allows this shape (SliceAssigners.hopping handles any slide/size)."""
    got = env.sql_query("""
        SELECT window_start, window_end, COUNT(*) AS n
        FROM TABLE(HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR,
                       INTERVAL '30' MINUTE))
        GROUP BY window_start, window_end
    """).to_data_frame()
    rows = got.collect()
    assert rows, "gap-window HOP produced no windows"
    # every emitted window is exactly 30 minutes and hour-aligned
    for r in rows:
        delta = (r["window_end"] - r["window_start"]).total_seconds()
        assert delta == 1800
        assert r["window_start"].minute == 0 and r["window_start"].second == 0
    # only rows whose minute < 30 belong to a window
    want = (spark.table("ev")
            .filter(F.minute("ts") < 30).count())
    assert sum(r["n"] for r in rows) == want
