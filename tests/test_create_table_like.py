"""CREATE TABLE ... LIKE (FLIP-110) — reference parser SqlCreateTableLike,
merge semantics MergeTableLikeUtil.java (flink-table-planner). Scenarios
modeled on the reference's TableEnvironmentTest / MergeTableLikeUtilTest:
schema + options inheritance, the three merge strategies, and the
documented error cases."""

from __future__ import annotations

import os

import pytest

from flink_release_1_14_5_comment_spark.api.table_env import TableEnvironment


@pytest.fixture()
def tenv(spark):
    return TableEnvironment(spark)


@pytest.fixture()
def base_dir(spark, tmp_path):
    p = str(tmp_path / "base_tbl")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, amount double"
    ).write.parquet(p)
    return p


def _create_base(tenv, base_dir, extra_cols=""):
    tenv.execute_sql(f"""
        CREATE TABLE base_t (id BIGINT, name STRING, amount DOUBLE{extra_cols})
        WITH ('connector'='filesystem', 'path'='{base_dir}', 'format'='parquet')
    """)


def test_like_pure_clone(tenv, base_dir):
    _create_base(tenv, base_dir)
    tenv.execute_sql("CREATE TABLE clone_t LIKE base_t")
    rows = tenv.sql_query("SELECT * FROM clone_t ORDER BY id").to_data_frame().collect()
    assert [r.id for r in rows] == [1, 2]
    assert tenv._ddl["clone_t"]["options"]["path"] == base_dir


def test_like_new_sink_path_overwriting_options(tenv, base_dir, tmp_path):
    """The canonical Flink use: clone a source table's schema into a sink
    table that only swaps the path."""
    _create_base(tenv, base_dir)
    sink = str(tmp_path / "sink_tbl")
    tenv.execute_sql(f"""
        CREATE TABLE sink_t WITH ('path'='{sink}')
        LIKE base_t (OVERWRITING OPTIONS)
    """)
    tenv.execute_sql("INSERT INTO sink_t SELECT id, name, amount FROM base_t")
    assert os.path.isdir(sink)
    got = tenv.sql_query("SELECT COUNT(*) AS n FROM sink_t").to_data_frame().collect()
    assert got[0].n == 2


def test_like_appends_new_columns(tenv, base_dir, tmp_path):
    _create_base(tenv, base_dir)
    sink = str(tmp_path / "sink2")
    tenv.execute_sql(f"""
        CREATE TABLE wide_t (note STRING) WITH ('path'='{sink}')
        LIKE base_t (OVERWRITING OPTIONS)
    """)
    tenv.execute_sql(
        "INSERT INTO wide_t SELECT id, name, amount, 'x' FROM base_t")
    row = tenv.sql_query(
        "SELECT note FROM wide_t LIMIT 1").to_data_frame().collect()[0]
    assert row.note == "x"


def test_like_duplicate_column_errors(tenv, base_dir):
    _create_base(tenv, base_dir)
    with pytest.raises(ValueError, match="already defined"):
        tenv.execute_sql(
            "CREATE TABLE dup_t (id BIGINT) WITH ('x'='y') LIKE base_t")


def test_like_conflicting_option_requires_overwriting(tenv, base_dir):
    _create_base(tenv, base_dir)
    with pytest.raises(ValueError, match="OVERWRITING OPTIONS"):
        tenv.execute_sql(
            "CREATE TABLE c_t WITH ('path'='/other') LIKE base_t")


def test_like_excluding_options_requires_connector(tenv, base_dir):
    _create_base(tenv, base_dir)
    with pytest.raises(ValueError, match="connector"):
        tenv.execute_sql(
            "CREATE TABLE e_t WITH ('path'='/other') LIKE base_t (EXCLUDING OPTIONS)")


def test_like_excluding_all_fresh_options(tenv, base_dir, tmp_path):
    _create_base(tenv, base_dir)
    sink = str(tmp_path / "fresh")
    tenv.execute_sql(f"""
        CREATE TABLE f_t WITH ('connector'='filesystem', 'path'='{sink}',
                               'format'='parquet')
        LIKE base_t (EXCLUDING OPTIONS)
    """)
    assert tenv._ddl["f_t"]["options"]["path"] == sink
    # schema still inherited
    assert [f.name for f in tenv.sql_query(
        "SELECT * FROM f_t").to_data_frame().schema.fields] == [
        "id", "name", "amount"]


def test_like_watermark_inherited_and_overwriting(spark, tenv, tmp_path):
    p = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "id long, ts_s string"
    ).selectExpr("id", "cast(ts_s as timestamp) as ts").write.parquet(p)
    tenv.execute_sql(f"""
        CREATE TABLE ev_t (id BIGINT, ts TIMESTAMP(3),
                           WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
        WITH ('connector'='filesystem', 'path'='{p}', 'format'='parquet')
    """)
    tenv.execute_sql("CREATE TABLE ev_clone LIKE ev_t")
    assert tenv._watermarks["ev_clone"] == tenv._watermarks["ev_t"]
    # duplicate watermark without OVERWRITING → reference error
    with pytest.raises(ValueError, match="OVERWRITING WATERMARKS"):
        tenv.execute_sql("""
            CREATE TABLE ev_bad (WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
            LIKE ev_t
        """)
    tenv.execute_sql("""
        CREATE TABLE ev_ow (WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
        LIKE ev_t (OVERWRITING WATERMARKS)
    """)
    assert tenv._watermarks["ev_ow"][1] != tenv._watermarks["ev_t"][1]
    # EXCLUDING WATERMARKS drops it entirely
    tenv.execute_sql("CREATE TABLE ev_nowm LIKE ev_t (EXCLUDING WATERMARKS)")
    assert "ev_nowm" not in tenv._watermarks


def test_like_unknown_source_and_bad_option(tenv):
    with pytest.raises(ValueError, match="unknown"):
        tenv.execute_sql("CREATE TABLE x_t LIKE nope_t")


def test_alter_table_rename(tenv, base_dir):
    _create_base(tenv, base_dir)
    tenv.execute_sql("ALTER TABLE base_t RENAME TO renamed_t")
    rows = tenv.sql_query(
        "SELECT COUNT(*) AS n FROM renamed_t").to_data_frame().collect()
    assert rows[0].n == 2
    assert "renamed_t" in tenv._ddl and "base_t" not in tenv._ddl
    with pytest.raises(Exception):
        tenv.sql_query("SELECT * FROM base_t").to_data_frame().collect()


def test_alter_table_set_path(tenv, base_dir, spark, tmp_path):
    _create_base(tenv, base_dir)
    other = str(tmp_path / "other")
    spark.createDataFrame([(9, "z", 1.0)] * 3,
                          "id long, name string, amount double").write.parquet(other)
    tenv.execute_sql(f"ALTER TABLE base_t SET ('path'='{other}')")
    rows = tenv.sql_query("SELECT COUNT(*) AS n FROM base_t").to_data_frame().collect()
    assert rows[0].n == 3
    assert tenv._ddl["base_t"]["options"]["path"] == other


def test_show_create_table(tenv, base_dir):
    _create_base(tenv, base_dir)
    out = tenv.execute_sql("SHOW CREATE TABLE base_t").to_data_frame().collect()
    text = out[0].result
    assert text.startswith("CREATE TABLE base_t (")
    assert "id BIGINT" in text and "'connector' = 'filesystem'" in text
    with pytest.raises(ValueError, match="unknown table"):
        tenv.execute_sql("SHOW CREATE TABLE ghost")


def test_from_values_and_catalog_listing(tenv):
    """TableEnvironment.fromValues (untyped → f0/f1 names, typed via DDL
    schema), Table.offset/fetch, listTables."""
    t = tenv.from_values([(1, "a"), (2, "b")])
    assert [f.name for f in t.get_schema().fields] == ["f0", "f1"]
    t2 = tenv.from_values([(3, "x"), (1, "y"), (2, "z")], "id long, v string")
    got = t2.order_by("id").offset(1).fetch(1).to_data_frame().collect()
    assert [(r.id, r.v) for r in got] == [(2, "z")]
    t2.to_data_frame().createOrReplaceTempView("fv_listing")
    assert "fv_listing" in tenv.list_tables()


def test_alter_unknown_table_errors(tenv):
    with pytest.raises(ValueError, match="ALTER TABLE target"):
        tenv.execute_sql("ALTER TABLE ghost_t RENAME TO x_t")


def test_like_invalid_like_option_errors(tenv, base_dir):
    _create_base(tenv, base_dir)
    with pytest.raises(ValueError, match="unsupported LIKE option"):
        tenv.execute_sql("CREATE TABLE y_t LIKE base_t (INCLUDING NONSENSE)")
    with pytest.raises(ValueError, match="not valid Flink syntax"):
        tenv.execute_sql("CREATE TABLE z_t LIKE base_t (OVERWRITING ALL)")
