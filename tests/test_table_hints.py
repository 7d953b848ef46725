"""FLIP-113 dynamic table options — ``FROM t /*+ OPTIONS('k'='v') */``.
Reference: FlinkHints.HINT_NAME_OPTIONS applied in
CatalogSourceTable.createDynamicTableSource; Spark can't parse
relation-position hints, so the facade rewrites them (table_env.
_apply_table_hints)."""

from __future__ import annotations

import pytest

from flink_release_1_14_5_comment_spark.api.table_env import TableEnvironment


@pytest.fixture()
def tenv(spark, tmp_path):
    t = TableEnvironment(spark)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame([(1, "a"), (2, "b")],
                          "id long, v string").write.parquet(d1)
    spark.createDataFrame([(9, "z")], "id long, v string").write.parquet(d2)
    t.execute_sql(f"""
        CREATE TABLE ht (id BIGINT, v STRING)
        WITH ('connector'='filesystem','path'='{d1}','format'='parquet')
    """)
    t._alt_path = d2
    return t


def test_hint_overrides_path_no_alias(tenv):
    r = tenv.sql_query(
        f"SELECT ht.id FROM ht /*+ OPTIONS('path'='{tenv._alt_path}') */ "
        f"WHERE ht.id > 0").to_data_frame().collect()
    assert [x.id for x in r] == [9]
    # the base table registration is untouched
    n = tenv.sql_query("SELECT COUNT(*) AS n FROM ht").to_data_frame().collect()
    assert n[0].n == 2


def test_hint_with_explicit_and_bare_alias(tenv):
    r = tenv.sql_query(
        f"SELECT o.v FROM ht /*+ OPTIONS('path'='{tenv._alt_path}') */ AS o"
    ).to_data_frame().collect()
    assert [x.v for x in r] == ["z"]
    r = tenv.sql_query(
        f"SELECT o.id, ht.id AS base_id "
        f"FROM ht /*+ OPTIONS('path'='{tenv._alt_path}') */ o "
        f"JOIN ht ON o.id <> ht.id").to_data_frame().collect()
    assert sorted((x.id, x.base_id) for x in r) == [(9, 1), (9, 2)]


def test_hint_on_non_ddl_table_raises(tenv, spark):
    spark.range(3).createOrReplaceTempView("plain_view")
    with pytest.raises(NotImplementedError, match="dynamic table options"):
        tenv.sql_query("SELECT * FROM plain_view /*+ OPTIONS('a'='b') */")
