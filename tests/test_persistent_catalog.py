"""Persistent warehouse catalog (persistent_catalog.py; reference
HiveCatalog.java:143): permanent tables must survive a full session restart.
catalogImplementation is a static conf, so each phase runs in its own
subprocess — a REAL restart, not a newSession() simulation."""

from __future__ import annotations

import json
import subprocess
import sys

SETUP = """
import sys, json
sys.path.insert(0, "/root/repo")
from flink_release_1_14_5_comment_spark.persistent_catalog import (
    create_table, create_table_ddl, get_warehouse_spark, register_external_table,
    table_names)
spark = get_warehouse_spark({wh!r}, "phase1", cpus=2)
df = spark.range(100).selectExpr("id", "id % 7 AS grp", "cast(id * 1.5 as double) AS v")
create_table(spark, "facts", df, partition_by=["grp"])
create_table_ddl(spark, "empty_t", "id BIGINT, name STRING", comment="made by ddl")
register_external_table(spark, "ext_nation", {ext!r})
print(json.dumps({{"tables": table_names(spark)}}))
spark.stop()
"""

REOPEN = """
import sys, json
sys.path.insert(0, "/root/repo")
from flink_release_1_14_5_comment_spark.persistent_catalog import (
    get_warehouse_spark, table_names)
spark = get_warehouse_spark({wh!r}, "phase2", cpus=2)
out = {{
    "tables": table_names(spark),
    "facts_rows": spark.table("facts").count(),
    "facts_sum": spark.table("facts").selectExpr("sum(id) s").collect()[0].s,
    "empty_cols": spark.table("empty_t").columns,
    "ext_rows": spark.table("ext_nation").count(),
    "pruned_files": len(spark.sql("SELECT * FROM facts WHERE grp = 3").inputFiles()),
    "all_files": len(spark.table("facts").inputFiles()),
}}
spark.sql("DROP TABLE ext_nation")
out["after_drop"] = table_names(spark)
print(json.dumps(out))
spark.stop()
"""


def _run(code: str) -> dict:
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, cwd="/tmp")
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_permanent_tables_survive_restart(tmp_path):
    wh = str(tmp_path / "warehouse")
    ext = "/root/testdata/sf0.001/nation.parquet"
    out1 = _run(SETUP.format(wh=wh, ext=ext))
    assert set(out1["tables"]) >= {"facts", "empty_t", "ext_nation"}
    out2 = _run(REOPEN.format(wh=wh))
    # the restart: a brand-new JVM + metastore connection sees everything
    assert set(out2["tables"]) >= {"facts", "empty_t", "ext_nation"}
    assert out2["facts_rows"] == 100
    assert out2["facts_sum"] == sum(range(100))
    assert out2["empty_cols"] == ["id", "name"]
    assert out2["ext_rows"] == 25
    # partition filter reached the scan: only grp=3's files are read
    assert 0 < out2["pruned_files"] < out2["all_files"]
    # DROP removes catalog entry; external data files remain untouched
    assert "ext_nation" not in out2["after_drop"]
    import os

    assert os.path.exists(ext)
