"""PARTITIONED BY DDL + INSERT ... PARTITION static specs on the
TableEnvironment facade — reference SqlCreateTable partitionKeyList /
FileSystemTableSink partition support / SqlPartitionUtils static specs.
"""

from __future__ import annotations

import os

import pytest

from flink_release_1_14_5_comment_spark.api.table_env import TableEnvironment


@pytest.fixture()
def tenv(spark):
    return TableEnvironment(spark)


def _create_partitioned(tenv, path):
    tenv.execute_sql(f"""
        CREATE TABLE pt (id BIGINT, v STRING, dt STRING)
        PARTITIONED BY (dt)
        WITH ('connector'='filesystem', 'path'='{path}', 'format'='parquet')
    """)


def test_partitioned_insert_layout(tenv, tmp_path):
    p = str(tmp_path / "pt")
    _create_partitioned(tenv, p)
    tenv.execute_sql(
        "INSERT INTO pt VALUES (1, 'a', '2024-01-01'), (2, 'b', '2024-01-02')")
    # Hive-style directory layout on disk
    assert sorted(d for d in os.listdir(p) if d.startswith("dt=")) == [
        "dt=2024-01-01", "dt=2024-01-02"]
    rows = tenv.sql_query("SELECT * FROM pt ORDER BY id").to_data_frame().collect()
    assert [(r.id, r.v, r.dt) for r in rows] == [
        (1, "a", "2024-01-01"), (2, "b", "2024-01-02")]


def test_static_partition_insert(tenv, tmp_path):
    p = str(tmp_path / "pt2")
    _create_partitioned(tenv, p)
    # the query supplies only the non-static columns, in declared order
    tenv.execute_sql(
        "INSERT INTO pt PARTITION (dt='2024-02-01') VALUES (3, 'c')")
    assert os.path.isdir(os.path.join(p, "dt=2024-02-01"))
    row = tenv.sql_query("SELECT * FROM pt").to_data_frame().collect()[0]
    assert (row.id, row.v, row.dt) == (3, "c", "2024-02-01")


def test_partition_grain_overwrite(tenv, tmp_path):
    """INSERT OVERWRITE on a partitioned table replaces only the touched
    partitions (Flink filesystem-sink semantics), not the whole table."""
    p = str(tmp_path / "pt3")
    _create_partitioned(tenv, p)
    tenv.execute_sql(
        "INSERT INTO pt VALUES (1, 'a', 'd1'), (2, 'b', 'd2')")
    tenv.execute_sql(
        "INSERT OVERWRITE pt PARTITION (dt='d2') VALUES (9, 'z')")
    rows = sorted((r.id, r.v, r.dt) for r in
                  tenv.sql_query("SELECT * FROM pt").to_data_frame().collect())
    assert rows == [(1, "a", "d1"), (9, "z", "d2")]


def test_static_partition_errors(tenv, tmp_path):
    p = str(tmp_path / "pt4")
    _create_partitioned(tenv, p)
    with pytest.raises(ValueError, match="not in PARTITIONED BY"):
        tenv.execute_sql("INSERT INTO pt PARTITION (nope='x') VALUES (1,'a')")
    tenv.execute_sql(f"""
        CREATE TABLE flat_t (id BIGINT)
        WITH ('connector'='filesystem', 'path'='{tmp_path / "flat"}',
              'format'='parquet')
    """)
    with pytest.raises(ValueError, match="no\\s+PARTITIONED BY"):
        tenv.execute_sql("INSERT INTO flat_t PARTITION (dt='x') VALUES (1)")


def test_like_inherits_partitions(tenv, tmp_path):
    p = str(tmp_path / "pt5")
    _create_partitioned(tenv, p)
    sink = str(tmp_path / "pt5_clone")
    tenv.execute_sql(
        f"CREATE TABLE pt_clone WITH ('path'='{sink}') "
        f"LIKE pt (OVERWRITING OPTIONS)")
    assert tenv._sinks["pt_clone"]["partition_by"] == ["dt"]
    tenv.execute_sql("INSERT INTO pt_clone VALUES (1, 'a', 'dx')")
    assert os.path.isdir(os.path.join(sink, "dt=dx"))
    # EXCLUDING PARTITIONS drops the spec
    tenv.execute_sql(
        f"CREATE TABLE pt_flat WITH ('path'='{tmp_path / 'pt5_flat'}') "
        f"LIKE pt (OVERWRITING OPTIONS, EXCLUDING PARTITIONS)")
    assert tenv._sinks["pt_flat"]["partition_by"] == []


def test_statement_set_static_partition(tenv, tmp_path):
    p = str(tmp_path / "pt6")
    _create_partitioned(tenv, p)
    ss = tenv.create_statement_set()
    ss.add_insert_sql("INSERT INTO pt PARTITION (dt='s1') VALUES (1, 'a')")
    ss.add_insert_sql("INSERT INTO pt PARTITION (dt='s2') VALUES (2, 'b')")
    assert ss.execute() == ["pt", "pt"]
    rows = sorted((r.id, r.dt) for r in
                  tenv.sql_query("SELECT * FROM pt").to_data_frame().collect())
    assert rows == [(1, "s1"), (2, "s2")]
