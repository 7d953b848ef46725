"""INSERT INTO/OVERWRITE on filesystem tables + StatementSet
(api/table_env.py; reference CommonExecSink / StatementSetImpl.java)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.api.table_env import TableEnvironment


@pytest.fixture()
def env(spark, tmp_path):
    env = TableEnvironment(spark)
    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, tag string, v double")
    env.register_table("src", src)
    return env


def test_create_sink_then_insert(env, tmp_path):
    path = str(tmp_path / "sink1")
    env.execute_sql(f"""
        CREATE TABLE sink1 (id BIGINT, tag STRING, v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{path}',
              'format' = 'parquet')
    """)
    # sink table registers empty with the DECLARED schema
    assert env.from_path("sink1").to_data_frame().count() == 0
    env.execute_sql("INSERT INTO sink1 SELECT id, tag, v FROM src WHERE v > 15")
    got = sorted(r.id for r in env.from_path("sink1").to_data_frame().collect())
    assert got == [2, 3]
    # append semantics
    env.execute_sql("INSERT INTO sink1 SELECT id, tag, v FROM src WHERE id = 1")
    assert env.from_path("sink1").to_data_frame().count() == 3
    # overwrite semantics
    env.execute_sql("INSERT OVERWRITE sink1 SELECT id, tag, v FROM src WHERE id = 1")
    assert [r.id for r in env.from_path("sink1").to_data_frame().collect()] == [1]
    assert os.path.isdir(path)


def test_insert_into_non_sink_raises(env):
    with pytest.raises(ValueError, match="filesystem table"):
        env.execute_sql("INSERT INTO src SELECT * FROM src")


def test_statement_set_multi_insert(env, tmp_path):
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    env.execute_sql(f"CREATE TABLE sink_a (tag STRING, total DOUBLE) WITH "
                    f"('connector'='filesystem','path'='{pa}','format'='parquet')")
    env.execute_sql(f"CREATE TABLE sink_b (n BIGINT) WITH "
                    f"('connector'='filesystem','path'='{pb}','format'='parquet')")
    ss = env.create_statement_set()
    ss.add_insert_sql(
        "INSERT INTO sink_a SELECT tag, SUM(v) AS total FROM src GROUP BY tag")
    ss.add_insert_sql("INSERT INTO sink_b SELECT COUNT(*) AS n FROM src")
    assert ss.execute() == ["sink_a", "sink_b"]
    a = {r.tag: r.total for r in env.from_path("sink_a").to_data_frame().collect()}
    assert a == {"a": 40.0, "b": 20.0}
    assert env.from_path("sink_b").to_data_frame().collect()[0].n == 3
    # buffered statements clear after execute
    assert ss.execute() == []


def test_statement_set_add_insert_table(env, tmp_path):
    p = str(tmp_path / "c")
    env.execute_sql(f"CREATE TABLE sink_c (id BIGINT, tag STRING, v DOUBLE) WITH "
                    f"('connector'='filesystem','path'='{p}','format'='parquet')")
    t = env.sql_query("SELECT id, tag, v FROM src WHERE tag = 'a'")
    env.create_statement_set().add_insert("sink_c", t).execute()
    assert env.from_path("sink_c").to_data_frame().count() == 2


def test_statement_set_rejects_non_insert(env):
    with pytest.raises(ValueError, match="INSERT"):
        env.create_statement_set().add_insert_sql("SELECT 1")


def test_legacy_cast_mode(spark):
    """Flink 1.14 legacy CAST (null on malformed input) via
    TableEnvironment(legacy_cast=True): CAST rewrites to TRY_CAST so
    migrated SQL keeps null-on-error semantics under Spark's ANSI mode."""
    strict = TableEnvironment(spark)
    lenient = TableEnvironment(spark, legacy_cast=True)
    sql = "SELECT CAST('abc' AS INT) AS x, TRY_CAST('7' AS INT) AS y"
    with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        strict.execute_sql(sql).to_data_frame().collect()
    row = lenient.execute_sql(sql).to_data_frame().collect()[0]
    assert row.x is None and row.y == 7


def test_insert_maps_columns_to_declared_schema_positionally(spark, tmp_path):
    """ADVICE r4: Flink maps INSERT columns to the DECLARED sink schema by
    position (DynamicSinkUtils) — the written files and the re-registered
    view must carry the CREATE TABLE names, even for SELECT aliases or
    INSERT ... VALUES (which produces col1/col2 internally)."""
    from flink_release_1_14_5_comment_spark.api import TableEnvironment

    env = TableEnvironment.create(spark)
    env.execute_sql(f"""
        CREATE TABLE named_sink (k BIGINT, label STRING, amount DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{tmp_path}/named_sink',
              'format' = 'parquet')
    """)
    env.execute_sql(
        "INSERT INTO named_sink SELECT 1 AS some_alias, 'x' AS other, 2.5 AS v")
    env.execute_sql("INSERT INTO named_sink VALUES (2, 'y', 3.5)")
    got = spark.table("named_sink")
    assert got.columns == ["k", "label", "amount"]
    assert sorted(tuple(r) for r in got.collect()) == [
        (1, "x", 2.5), (2, "y", 3.5)]

    import pytest
    with pytest.raises(ValueError, match="declares 3"):
        env.execute_sql("INSERT INTO named_sink SELECT 1, 'x'")


def test_csv_sink_reread_uses_declared_schema(spark, tmp_path):
    """INSERT into a CSV sink table re-registers the view through the
    DECLARED schema — not string inference (round-5 fix, the sink-side twin
    of the CREATE TABLE scan-path fix)."""
    from flink_release_1_14_5_comment_spark.api.table_env import (
        TableEnvironment,
    )

    env = TableEnvironment.create(spark)
    env.execute_sql(f"""
        CREATE TABLE csv_sink_sch_t (a BIGINT, b DOUBLE)
        WITH ('connector' = 'filesystem',
              'path' = '{tmp_path}/snk', 'format' = 'csv')
    """)
    env.execute_sql("INSERT INTO csv_sink_sch_t VALUES (1, 2.5), (2, 3.5)")
    df = env.from_path("csv_sink_sch_t").to_data_frame()
    assert dict(df.dtypes) == {"a": "bigint", "b": "double"}
    assert sorted(r["b"] for r in df.collect()) == [2.5, 3.5]
