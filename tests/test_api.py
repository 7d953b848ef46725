"""Table/SQL + DataStream facade tests (SURVEY §3) — the reference-user
migration surface."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.api import (
    DataStream,
    StreamExecutionEnvironment,
    Table,
    TableEnvironment,
)


@pytest.fixture(scope="module")
def tenv(spark, sf_dir):
    env = TableEnvironment.create(spark)
    env.execute_sql(f"""
        CREATE TABLE orders_t (
            o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
            o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING
        ) WITH ('connector' = 'filesystem', 'path' = '{sf_dir}/orders.parquet',
                'format' = 'parquet')
    """)
    return env


def test_ddl_and_sql_query(tenv):
    t = tenv.execute_sql("SELECT o_orderstatus, count(*) AS n FROM orders_t GROUP BY o_orderstatus")
    pdf = t.to_pandas()
    assert set(pdf["o_orderstatus"]) == {"O", "F", "P"}
    assert pdf["n"].sum() == tenv.from_path("orders_t").to_data_frame().count()


def test_table_api_chain(tenv):
    t = (
        tenv.from_path("orders_t")
        .where("o_totalprice > 100000")
        .group_by("o_orderpriority")
        .select("o_orderpriority, o_totalprice.sum AS total, o_orderkey.count AS n")
    )
    pdf = t.to_pandas()
    assert set(pdf.columns) == {"o_orderpriority", "total", "n"}
    assert (pdf["total"] > 0).all()


def test_table_setops_and_order(tenv):
    t = tenv.from_path("orders_t")
    a = t.where("o_orderstatus = 'O'").select("o_custkey")
    b = t.where("o_totalprice > 300000").select("o_custkey")
    merged = a.union_all(b).distinct().order_by("o_custkey").fetch(5)
    pdf = merged.to_pandas()
    assert len(pdf) == 5
    assert list(pdf["o_custkey"]) == sorted(pdf["o_custkey"])


def test_table_join(tenv, spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    tenv.register_table("customer_t", load_tables(spark, sf_dir)["customer"])
    j = (
        tenv.from_path("orders_t")
        .join(tenv.from_path("customer_t"), "o_custkey = c_custkey")
        .group_by("c_mktsegment")
        .select("c_mktsegment, o_totalprice.sum AS revenue")
    )
    pdf = j.to_pandas()
    assert len(pdf) == 5 and (pdf["revenue"] > 0).all()


def test_watermark_ddl_is_captured(spark, sf_dir, tmp_path):
    env = TableEnvironment.create(spark)
    env.execute_sql(f"""
        CREATE TABLE ev_t (
            event_id BIGINT, ts TIMESTAMP,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector' = 'filesystem', 'path' = '{sf_dir}/events.parquet',
                'format' = 'parquet')
    """)
    assert env.rowtime_of("ev_t") == ("ts", "5 second")


def test_datastream_batch_topology(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ev = load_tables(spark, sf_dir)["events"]
    out = (
        env.from_data_frame(ev)
        .filter("event_type = 'click'")
        .map(["user_id", "value * 2 AS v2", "ts"])
        .key_by("user_id")
        .window("ts", "1 hour")
        .aggregate([F.count(F.lit(1)).alias("n"), F.round(F.sum("v2"), 2).alias("s")])
    )
    pdf = out.to_data_frame().toPandas()
    assert {"w_start", "w_end", "user_id", "n", "s"} == set(pdf.columns)
    assert (pdf["n"] > 0).all()


def test_keyed_rolling_aggregates(spark, sf_dir):
    """KeyedStream.sum/min/max/min_by/max_by (KeyedStream.java:779-934):
    bounded-stream end state == batch aggregate; min_by/max_by return the
    extremal ROW per key."""
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", "value")
    ks = env.from_data_frame(ev).key_by("user_id")

    got = {r.user_id: r.value for r in ks.sum("value").to_data_frame().collect()}
    want = {r.user_id: r.s for r in
            ev.groupBy("user_id").agg(F.sum("value").alias("s")).collect()}
    assert got.keys() == want.keys()
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)

    mn = {r.user_id: r.value for r in ks.min("value").to_data_frame().collect()}
    mx = {r.user_id: r.value for r in ks.max("value").to_data_frame().collect()}
    assert all(mn[k] <= mx[k] for k in mn)

    # min_by/max_by carry the full extremal row
    mb = ks.max_by("value").to_data_frame()
    assert set(mb.columns) == {"user_id", "value", "event_id"}
    top = {r.user_id: (r.value, r.event_id) for r in mb.collect()}
    want_top = {
        r.user_id: (r.value, r.event_id)
        for r in ev.withColumn(
            "rn", F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("user_id")
                .orderBy(F.desc("value"), F.desc("event_id")))
        ).filter("rn = 1").collect()
    }
    assert top == want_top


def test_datastream_pandas_map_and_side_output(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ev = load_tables(spark, sf_dir)["events"].limit(100)
    ds = env.from_data_frame(ev.select("event_id", "value"))
    mapped = ds.map(lambda pdf: pdf.assign(value=pdf.value + 1), "event_id long, value double")
    assert mapped.to_data_frame().count() == 100
    main, side = ds.side_output("value > 50")
    assert main.to_data_frame().count() + side.to_data_frame().count() == 100


def test_datastream_keyed_process(spark, sf_dir):
    """KeyedProcessFunction emulation: per-key running count via state."""
    import pandas as pd
    from flink_release_1_14_5_comment_spark.catalog import load_tables
    from flink_release_1_14_5_comment_spark.streaming import sources

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ev = load_tables(spark, sf_dir)["events"].limit(300).select("user_id", "event_id")
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=3)
    try:
        def counter(key, pdfs, state):
            n = state.get[0] if state.exists else 0
            for pdf in pdfs:
                n += len(pdf)
            state.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

        out = (
            env.from_data_frame(stream)
            .key_by("user_id")
            .process(counter, "user_id long, n long", "n long")
        )
        import uuid

        name = "t" + uuid.uuid4().hex[:10]
        q = (out.to_data_frame().writeStream.format("memory").queryName(name)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.table(name).groupBy("user_id").agg(F.max("n").alias("n"))
        batch = ev.groupBy("user_id").count().withColumnRenamed("count", "n")
        assert got.exceptAll(batch).count() == 0
    finally:
        sources.cleanup(tmpdir)


def test_flink_dialect_functions(spark):
    """Flink SQL function names run unchanged through the TableEnvironment."""
    env = TableEnvironment.create(spark)
    row = env.sql_query("""
        SELECT SPLIT_INDEX('a#b#c', '#', 2) AS si,
               IS_DECIMAL('-3.25') AS dec_ok, IS_DECIMAL('x') AS dec_no,
               IS_DIGIT('123') AS dig, IS_ALPHA('abc') AS alp,
               TRUNCATE_NUM(-1.239, 2) AS tr,
               TO_BASE64('hi') AS b64, FROM_BASE64(TO_BASE64('hi')) AS rt,
               JSON_VALUE('{"k": 5}', '$.k') AS jv,
               JSON_EXISTS('{"k": 5}', '$.x') AS je
    """).to_data_frame().first()
    assert row["si"] == "c" and row["dec_ok"] and not row["dec_no"]
    assert row["dig"] and row["alp"]
    assert row["tr"] == -1.23
    assert row["rt"] == "hi"
    assert row["jv"] == "5" and row["je"] is False


def test_computed_and_metadata_columns(spark, sf_dir):
    """FLIP-70 computed columns and SupportsReadingMetadata METADATA
    columns in CREATE TABLE DDL: applied to the scanned frame in
    declaration order; PROCTIME() becomes the wall-clock attribute;
    filesystem metadata keys map onto Spark's _metadata struct."""
    from flink_release_1_14_5_comment_spark.api import TableEnvironment

    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(f"""
        CREATE TABLE orders_gen (
            o_orderkey BIGINT,
            o_totalprice DOUBLE,
            double_price AS o_totalprice * 2,
            proc AS PROCTIME(),
            fp STRING METADATA FROM 'file.path',
            fsize BIGINT METADATA FROM 'file.size'
        ) WITH ('connector' = 'filesystem',
                'path' = '{sf_dir}/orders.parquet', 'format' = 'parquet')
    """)
    row = tenv.sql_query(
        "SELECT o_totalprice, double_price, proc, fp, fsize "
        "FROM orders_gen LIMIT 1").to_data_frame().collect()[0]
    assert row.double_price == row.o_totalprice * 2
    assert row.proc is not None
    assert row.fp.endswith("orders.parquet")
    assert row.fsize > 0

    # unknown metadata key fails loudly, not silently
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="metadata key"):
        tenv.execute_sql(f"""
            CREATE TABLE bad_meta (x STRING METADATA FROM 'topic')
            WITH ('connector' = 'filesystem',
                  'path' = '{sf_dir}/orders.parquet', 'format' = 'parquet')
        """)


def test_view_show_describe_drop_ddl(spark, sf_dir):
    """CREATE VIEW / SHOW TABLES / DESCRIBE / DROP TABLE through
    execute_sql — the reference TableEnvironment's catalog statements."""
    from flink_release_1_14_5_comment_spark.api import TableEnvironment

    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(f"""
        CREATE TABLE orders_cat (x INT) WITH ('connector' = 'filesystem',
            'path' = '{sf_dir}/orders.parquet', 'format' = 'parquet')
    """)
    tenv.execute_sql(
        "CREATE TEMPORARY VIEW big_orders AS "
        "SELECT * FROM orders_cat WHERE o_totalprice > 100000")
    n = tenv.sql_query("SELECT COUNT(*) AS n FROM big_orders") \
        .to_data_frame().collect()[0].n
    assert n > 0
    shown = {r.tableName for r in
             tenv.execute_sql("SHOW TABLES").to_data_frame().collect()}
    assert {"orders_cat", "big_orders"} <= shown
    desc = tenv.execute_sql("DESCRIBE big_orders").to_data_frame().collect()
    assert any(r.col_name == "o_totalprice" for r in desc)
    tenv.execute_sql("DROP VIEW big_orders")
    tenv.execute_sql("DROP TABLE IF EXISTS orders_cat")
    left = {r.tableName for r in
            tenv.execute_sql("SHOW TABLES").to_data_frame().collect()}
    assert "big_orders" not in left and "orders_cat" not in left


def test_set_and_explain_statements(spark, sf_dir):
    """Flink SQL-script SET options and EXPLAIN [PLAN FOR] through
    execute_sql (reference TableEnvironment.executeSql statement kinds)."""
    from flink_release_1_14_5_comment_spark.api import TableEnvironment

    tenv = TableEnvironment.create(spark)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        tenv.execute_sql("SET 'table.exec.resource.default-parallelism' = '8'")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
        tenv.execute_sql("SET 'table.exec.state.ttl' = '1 h'")
        assert tenv._config["table.exec.state.ttl"] == "1 h"  # recorded
        tenv.execute_sql(f"""
            CREATE TABLE orders_ex (x INT) WITH ('connector' = 'filesystem',
                'path' = '{sf_dir}/orders.parquet', 'format' = 'parquet')
        """)
        plan = tenv.execute_sql(
            "EXPLAIN SELECT COUNT(*) FROM orders_ex").to_data_frame() \
            .collect()[0].plan
        assert "Aggregate" in plan or "aggregate" in plan.lower()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_changelog_stream_bridge(spark):
    """from_changelog_stream / to_changelog_stream / to_retract_stream —
    the reference StreamTableEnvironment Table<->DataStream bridge."""
    from flink_release_1_14_5_comment_spark.api import TableEnvironment

    tenv = TableEnvironment.create(spark)
    cl = spark.createDataFrame(
        [("+I", 1, "a", 0), ("+I", 2, "b", 1),
         ("-U", 1, "a", 2), ("+U", 1, "a2", 3), ("-D", 2, "b", 4)],
        "__rowkind string, id long, name string, seq long")
    tbl = tenv.from_changelog_stream(cl, ["id"], "seq")
    assert {(r.id, r.name) for r in tbl.to_data_frame().collect()} == {(1, "a2")}

    # insert-only table → all +I / retract=False
    base = tenv.from_path  # noqa: F841  (bridge works on any Table)
    from flink_release_1_14_5_comment_spark.api.table_env import Table
    t2 = Table(spark.createDataFrame([(1, "x")], "id long, name string"), tenv)
    ops = {r["__rowkind"] for r in tenv.to_changelog_stream(t2).collect()}
    assert ops == {"+I"}
    rs = tenv.to_retract_stream(t2).collect()
    assert all(r.retract is False for r in rs)

    # a changelog-carrying table passes through with retract flags mapped
    t3 = Table(cl.drop("seq"), tenv)
    flags = {(r.id, r.name, r.retract)
             for r in tenv.to_retract_stream(t3).collect()}
    assert (1, "a", True) in flags and (1, "a2", False) in flags


def test_ddl_splitter_parameterized_types():
    """DDL column lists with MAP<STRING, INT> / nested STRUCT commas split
    on column boundaries only; computed-column `<` comparisons untouched."""
    from flink_release_1_14_5_comment_spark.api.table_env import (
        _split_top_level_ddl,
    )

    cols = ("id BIGINT, m MAP<STRING, INT>, "
            "a ARRAY<STRUCT<x: INT, y: STRING>>, d DECIMAL(10,2), "
            "flag AS d < 5, name STRING")
    assert _split_top_level_ddl(cols) == [
        "id BIGINT", "m MAP<STRING, INT>",
        "a ARRAY<STRUCT<x: INT, y: STRING>>", "d DECIMAL(10,2)",
        "flag AS d < 5", "name STRING"]


def test_temporal_table_function_api_and_sql(spark):
    """Flink 1.14 temporal table FUNCTION (Table.createTemporalTableFunction
    + LATERAL TABLE(f(ts)) comma join): versions visible as-of probe time,
    INNER semantics, key equality taken from WHERE (reference
    LogicalCorrelateToJoinFromTemporalTableRule / TemporalJoinITCase)."""
    env = TableEnvironment.create(spark)
    rates = spark.createDataFrame(
        [("eur", 1, 114), ("eur", 5, 116), ("usd", 1, 100)],
        "r_currency string, r_ts bigint, rate bigint")
    orders = spark.createDataFrame(
        [(2, "eur", 10), (6, "eur", 20), (3, "usd", 30), (1, "gbp", 40),
         (0, "eur", 50)],
        "o_ts bigint, currency string, amount bigint")
    env.register_table("orders_ttf", orders)
    ttf = env.from_data_frame(rates).create_temporal_table_function(
        "r_ts", "r_currency")
    env.create_temporary_function("rates_fn", ttf)
    got = env.sql_query("""
        SELECT o.o_ts, o.currency, o.amount * r.rate AS converted
        FROM orders_ttf AS o, LATERAL TABLE(rates_fn(o.o_ts)) AS r
        WHERE o.currency = r.r_currency
    """).to_data_frame()
    rows = sorted(tuple(r) for r in got.collect())
    # o_ts=2 eur → rate@1=114; o_ts=6 eur → rate@5=116; usd@3 → 100;
    # gbp (no version) and eur@0 (before first version) DROP (inner).
    assert rows == [(2, "eur", 1140), (3, "usd", 3000), (6, "eur", 2320)]


def test_temporal_table_function_df_api(spark):
    from flink_release_1_14_5_comment_spark.operators.temporal_joins import (
        TemporalTableFunction,
        temporal_table_join,
    )

    rates = spark.createDataFrame(
        [("eur", 1, 114), ("eur", 5, 116)],
        "r_currency string, r_ts bigint, rate bigint")
    orders = spark.createDataFrame(
        [(2, "eur", 10), (0, "eur", 50)],
        "o_ts bigint, currency string, amount bigint")
    fn = TemporalTableFunction(rates, "r_ts", "r_currency")
    got = temporal_table_join(orders, fn, probe_ts="o_ts",
                              probe_key="currency")
    assert sorted(tuple(r) for r in got.collect()) == [
        (2, "eur", 10, "eur", 1, 114)]
    # left keeps the unmatched probe row with null version
    left = temporal_table_join(orders, fn, probe_ts="o_ts",
                               probe_key="currency", how="left")
    assert left.count() == 2


def test_temporal_table_function_errors(spark):
    from flink_release_1_14_5_comment_spark.operators.temporal_joins import (
        TemporalTableFunction,
        temporal_table_join,
    )

    rates = spark.createDataFrame([("eur", 1, 114)],
                                  "currency string, r_ts bigint, rate bigint")
    orders = spark.createDataFrame([(2, "eur", 10)],
                                   "o_ts bigint, currency string, amount bigint")
    fn = TemporalTableFunction(rates, "r_ts", "currency")
    with pytest.raises(NotImplementedError, match="overlapping"):
        temporal_table_join(orders, fn, probe_ts="o_ts", probe_key="currency")
    with pytest.raises(ValueError, match="not in"):
        TemporalTableFunction(rates, "nope", "currency")

    env = TableEnvironment.create(spark)
    env.register_table("orders_ttf2", orders)
    env.create_temporary_function(
        "r2", TemporalTableFunction(
            rates.withColumnRenamed("currency", "r_currency"),
            "r_ts", "r_currency"))
    with pytest.raises(ValueError, match="primary-key equality"):
        env.sql_query("""
            SELECT o.amount FROM orders_ttf2 AS o,
            LATERAL TABLE(r2(o.o_ts)) AS r WHERE r.rate > 0
        """)


def test_datastream_partitioning_wrappers(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.api import (
        StreamExecutionEnvironment,
    )
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    env = StreamExecutionEnvironment(spark)
    ds = env.from_data_frame(load_tables(spark, sf_dir)["nation"])
    assert ds.rebalance(4).to_data_frame().rdd.getNumPartitions() == 4
    assert ds.rescale(2).to_data_frame().rdd.getNumPartitions() == 2
    big = env.from_data_frame(load_tables(spark, sf_dir)["orders"])
    joined = big.to_data_frame().join(
        ds.broadcast_hint().to_data_frame(),
        F.expr("o_orderkey % 25 = n_nationkey"))
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().toString()


def test_csv_ddl_uses_declared_schema(spark, tmp_path):
    """Text formats must be read through the DECLARED DDL schema, never
    inference (round-5 fix: CSV filesystem tables came back all-strings).
    Reference model: CsvRowDataDeserializationSchema is built from the DDL
    row type."""
    d = str(tmp_path / "csvddl")
    spark.createDataFrame([(1, 2.5, "x"), (2, None, "y")],
                          "a bigint, b double, c string") \
        .write.mode("overwrite").option("header", "true").csv(d)
    env = TableEnvironment.create(spark)
    env.execute_sql(f"""
        CREATE TABLE csv_ddl_schema_t (a BIGINT, b DOUBLE, c STRING)
        WITH ('connector' = 'filesystem', 'path' = '{d}', 'format' = 'csv')
    """)
    df = env.from_path("csv_ddl_schema_t").to_data_frame()
    assert dict(df.dtypes) == {"a": "bigint", "b": "double", "c": "string"}
    assert df.filter("a = 1").collect()[0]["b"] == 2.5


def test_csv_format_options_mapping(spark, tmp_path):
    """flink-csv WITH-options map to Spark reader options (round-5):
    csv.field-delimiter, csv.null-literal, csv.ignore-parse-errors; an
    unmapped csv.* option raises instead of silently changing the file
    contract."""
    import pytest

    d = str(tmp_path / "csvopts")
    import os
    os.makedirs(d)
    with open(d + "/part.csv", "w") as f:
        f.write("a;b\n1;2.5\n2;\\N\nGARBAGE-LINE-NO-DELIM-EXTRA;;;;\n")
    env = TableEnvironment.create(spark)
    env.execute_sql(f"""
        CREATE TABLE csv_opts_map_t (a BIGINT, b DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{d}', 'format' = 'csv',
              'csv.field-delimiter' = ';', 'csv.null-literal' = '\\N',
              'csv.ignore-parse-errors' = 'true')
    """)
    rows = sorted(env.from_path("csv_opts_map_t").to_data_frame().collect())
    assert [(r["a"], r["b"]) for r in rows] == [(1, 2.5), (2, None)]
    with pytest.raises(NotImplementedError, match="no Spark mapping"):
        env.execute_sql(f"""
            CREATE TABLE csv_opts_bad_t (a BIGINT)
            WITH ('connector' = 'filesystem', 'path' = '{d}',
                  'format' = 'csv', 'csv.disable-quote-character' = 'true')
        """)


def test_catalog_navigation_statements(spark):
    """1.14 catalog navigation: SHOW CURRENT CATALOG/DATABASE, SHOW
    CATALOGS/DATABASES/MODULES, USE — result column names mirror Flink's
    (TableEnvironmentImpl executeSql SHOW operations)."""
    env = TableEnvironment.create(spark)
    cur = env.execute_sql("SHOW CURRENT CATALOG").to_data_frame()
    assert cur.columns == ["current catalog name"]
    assert cur.collect()[0][0] == "spark_catalog"
    db = env.execute_sql("SHOW CURRENT DATABASE").to_data_frame()
    assert db.columns == ["current database name"]
    assert env.execute_sql("SHOW MODULES").to_data_frame().collect()[0][0] == "core"
    assert "database name" in env.execute_sql("SHOW DATABASES").to_data_frame().columns
    assert env.execute_sql("USE default") is None
    assert env.execute_sql("SHOW CURRENT DATABASE").to_data_frame() \
        .collect()[0][0] == "default"
