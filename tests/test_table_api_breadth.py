"""Table API facade breadth (VERDICT r4 #3; reference Table.java:462-519
schema ops, :975 over windows, :1056-1154 map/flatMap/aggregate) — each
method checked for parity against the equivalent SQL path."""

from __future__ import annotations

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.api import Over, TableEnvironment
from flink_release_1_14_5_comment_spark.catalog import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def env(spark):
    t = load_tables(spark, SF)
    t["orders"].select("o_orderkey", "o_custkey", "o_orderstatus",
                       "o_totalprice").createOrReplaceTempView("ord")
    return TableEnvironment(spark)


def _rows(t):
    return sorted(tuple(r) for r in t.to_data_frame().collect())


def test_add_columns(env):
    got = env.from_path("ord").add_columns(
        "o_totalprice * 2 AS dbl, upper(o_orderstatus) AS st")
    want = env.sql_query(
        "SELECT *, o_totalprice * 2 AS dbl, upper(o_orderstatus) AS st FROM ord")
    assert _rows(got) == _rows(want)
    with pytest.raises(ValueError, match="already exist"):
        env.from_path("ord").add_columns("1 AS o_custkey")


def test_add_or_replace_columns(env):
    got = env.from_path("ord").add_or_replace_columns(
        "o_totalprice * 2 AS o_totalprice, 'x' AS tag")
    want = env.sql_query(
        "SELECT o_orderkey, o_custkey, o_orderstatus, "
        "o_totalprice * 2 AS o_totalprice, 'x' AS tag FROM ord")
    assert got.to_data_frame().columns == want.to_data_frame().columns
    assert _rows(got) == _rows(want)


def test_rename_and_drop_columns(env):
    got = (env.from_path("ord")
           .rename_columns("o_orderkey AS k, o_totalprice AS price")
           .drop_columns("o_custkey, o_orderstatus"))
    want = env.sql_query(
        "SELECT o_orderkey AS k, o_totalprice AS price FROM ord")
    assert got.to_data_frame().columns == ["k", "price"]
    assert _rows(got) == _rows(want)
    with pytest.raises(ValueError, match="no field"):
        env.from_path("ord").rename_columns("nope AS x")
    with pytest.raises(ValueError, match="no field"):
        env.from_path("ord").drop_columns("nope")


def test_map_expression_and_callable(env):
    t = env.from_path("ord")
    got_expr = t.map("o_orderkey, o_totalprice * 0.9 AS discounted")
    want = env.sql_query(
        "SELECT o_orderkey, o_totalprice * 0.9 AS discounted FROM ord")
    assert _rows(got_expr) == _rows(want)

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_orderkey": pdf["o_orderkey"],
                             "discounted": pdf["o_totalprice"] * 0.9})

    got_fn = t.map(f, "o_orderkey bigint, discounted double")
    assert _rows(got_fn) == _rows(want)
    with pytest.raises(ValueError, match="schema"):
        t.map(f)


def test_flat_map(env):
    def dup(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat([pdf, pdf[pdf["o_orderstatus"] == "O"]])
        return out[["o_orderkey"]]

    got = env.from_path("ord").flat_map(dup, "o_orderkey bigint")
    n_all = env.from_path("ord").to_data_frame().count()
    n_open = env.sql_query(
        "SELECT * FROM ord WHERE o_orderstatus = 'O'").to_data_frame().count()
    assert got.to_data_frame().count() == n_all + n_open


def test_grouped_aggregate_and_flat_aggregate(env):
    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.nlargest(2, "o_totalprice")
        return out[["o_orderstatus", "o_orderkey", "o_totalprice"]]

    got = (env.from_path("ord").group_by("o_orderstatus")
           .flat_aggregate(top2,
                           "o_orderstatus string, o_orderkey bigint, "
                           "o_totalprice double"))
    want = env.sql_query("""
        SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice DESC) AS rn FROM ord) WHERE rn <= 2
    """)
    assert _rows(got) == _rows(want)


def test_global_aggregate(env):
    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [len(pdf)],
                             "total": [pdf["o_totalprice"].sum()]})

    got = env.from_path("ord").aggregate(stats, "n bigint, total double")
    [r] = got.to_data_frame().collect()
    [w] = env.sql_query(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(o_totalprice) AS total "
        "FROM ord").to_data_frame().collect()
    assert r["n"] == w["n"] and abs(r["total"] - w["total"]) < 1e-6


def test_over_window_unbounded(env):
    w = (Over.partition_by("o_orderstatus").order_by("o_orderkey")
         .preceding("UNBOUNDED_RANGE").alias("w"))
    got = env.from_path("ord").window(w).select(
        "o_orderkey, o_orderstatus, o_totalprice.sum over w AS running,"
        " o_totalprice.max over w AS peak")
    want = env.sql_query("""
        SELECT o_orderkey, o_orderstatus,
               SUM(o_totalprice) OVER (PARTITION BY o_orderstatus
                   ORDER BY o_orderkey) AS running,
               MAX(o_totalprice) OVER (PARTITION BY o_orderstatus
                   ORDER BY o_orderkey) AS peak
        FROM ord""")
    assert _rows(got) == _rows(want)


def test_over_window_row_bounded(env):
    w = (Over.partition_by("o_orderstatus").order_by("o_orderkey")
         .preceding(2).following("CURRENT_ROW").alias("w"))
    got = env.from_path("ord").window(w).select(
        "o_orderkey, o_totalprice.avg over w AS ma3")
    want = env.sql_query("""
        SELECT o_orderkey,
               AVG(o_totalprice) OVER (PARTITION BY o_orderstatus
                   ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND
                   CURRENT ROW) AS ma3
        FROM ord""")
    assert _rows(got) == _rows(want)


def test_over_window_errors(env):
    with pytest.raises(NotImplementedError, match="bound"):
        w = (Over.partition_by("o_orderstatus").order_by("o_orderkey")
             .preceding("INTERVAL 1 HOUR").alias("w"))
        env.from_path("ord").window(w).select("o_totalprice.sum over w")
    with pytest.raises(ValueError, match="unknown over window"):
        w2 = (Over.partition_by("o_orderstatus").order_by("o_orderkey")
              .alias("w"))
        env.from_path("ord").window(w2).select("o_totalprice.sum over nope")


def test_group_window_tumble(env, spark):
    """Tumble.over("1.hour").on("ts").alias("w") + group_by("w, k") —
    reference Tumble.java/GroupWindowedTable.java — vs the SQL
    GROUP BY window() equivalent, incl. w.start/w.end/w.rowtime."""
    from flink_release_1_14_5_comment_spark.api import Tumble
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    load_tables(spark, SF)["events"].select(
        "event_type", "ts", "value").createOrReplaceTempView("ev_gw")
    w = Tumble.over("1.hour").on("ts").alias("w")
    got = (env.from_path("ev_gw").window(w).group_by("w, event_type")
           .select("event_type, value.sum AS total, value.count AS n, "
                   "w.start AS ws, w.end AS we, w.rowtime AS rt"))
    want = env.sql_query("""
        SELECT event_type, SUM(value) AS total, COUNT(value) AS n,
               window.start AS ws, window.end AS we,
               window.end - INTERVAL 1 MILLISECOND AS rt
        FROM ev_gw GROUP BY window(ts, '1 hour'), event_type""")
    assert _rows(got) == _rows(want)


def test_group_window_slide_and_session(env, spark):
    from flink_release_1_14_5_comment_spark.api import Session, Slide
    from pyspark.sql import functions as F

    w = Slide.over("1.hour").every("30.minutes").on("ts").alias("w")
    got = (env.from_path("ev_gw").window(w).group_by("w, event_type")
           .select("event_type, value.count AS n, w.start AS ws"))
    want = (spark.table("ev_gw")
            .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                     "event_type")
            .agg(F.count("value").alias("n"))
            .select("event_type", "n", F.col("w.start").alias("ws")))
    assert _rows(got) == sorted(tuple(r) for r in want.collect())

    s = Session.with_gap("30.minutes").on("ts").alias("s")
    got_s = (env.from_path("ev_gw").window(s).group_by("s, event_type")
             .select("event_type, value.count AS n, s.start AS ws"))
    want_s = (spark.table("ev_gw")
              .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                       "event_type")
              .agg(F.count("value").alias("n"))
              .select("event_type", "n", F.col("w.start").alias("ws")))
    assert _rows(got_s) == sorted(tuple(r) for r in want_s.collect())


def test_group_window_errors(env):
    from flink_release_1_14_5_comment_spark.api import Tumble

    w = Tumble.over("1.hour").on("ts").alias("w")
    with pytest.raises(ValueError, match="window .*alias|alias .*window"):
        env.from_path("ev_gw").window(w).group_by("event_type")
    with pytest.raises(ValueError, match="interval"):
        Tumble.over("banana")
