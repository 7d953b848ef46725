"""Side-by-side migration guide: Flink 1.14 programs → this engine.

Each section shows the reference API (as a comment, from the Flink docs /
reference source cited in SURVEY.md) and the equivalent here. Run directly:

    python examples/migration_from_flink.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark import get_spark
from flink_release_1_14_5_comment_spark.api import (
    StreamExecutionEnvironment,
    TableEnvironment,
)

SF_DIR = "/root/testdata/sf0.001"


def sql_migration(spark):
    """Flink:
        TableEnvironment tEnv = TableEnvironment.create(settings);
        tEnv.executeSql("CREATE TABLE orders (...) WITH ('connector'='filesystem',
                         'path'='...', 'format'='parquet')");
        tEnv.executeSql("SELECT o_orderstatus, SPLIT_INDEX('a#b','#',0), count(*)
                         FROM orders GROUP BY o_orderstatus").print();
    """
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(f"""
        CREATE TABLE orders (x INT) WITH ('connector' = 'filesystem',
            'path' = '{SF_DIR}/orders.parquet', 'format' = 'parquet')
    """)
    # Flink-dialect functions (SPLIT_INDEX, IS_DECIMAL, JSON_VALUE, …) are
    # pre-registered — Flink SQL text runs unchanged.
    tenv.execute_sql("""
        SELECT o_orderstatus, SPLIT_INDEX('a#b', '#', 0) AS first_part,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus
    """).to_data_frame().show()


def table_api_migration(spark):
    """Flink:
        tEnv.from("orders")
            .filter($("o_totalprice").isGreater(100000))
            .groupBy($("o_orderpriority"))
            .select($("o_orderpriority"), $("o_totalprice").sum().as("total"));
    """
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(f"""
        CREATE TABLE orders (x INT) WITH ('connector' = 'filesystem',
            'path' = '{SF_DIR}/orders.parquet', 'format' = 'parquet')
    """)
    (
        tenv.from_path("orders")
        .filter("o_totalprice > 100000")
        .group_by("o_orderpriority")
        .select("o_orderpriority, o_totalprice.sum AS total")
        .to_data_frame()
        .show()
    )


def table_api_breadth_migration(spark):
    """Flink:
        table.addColumns($("price").times(2).as("dbl"))
             .renameColumns($("o_orderkey").as("k"))
             .dropColumns($("o_orderstatus"));
        table.window(Over.partitionBy($("st")).orderBy($("k"))
                        .preceding(UNBOUNDED_RANGE).as("w"))
             .select($("k"), $("price").sum().over($("w")));
        ratesHistory.createTemporalTableFunction($("r_ts"), $("r_currency"));
        tEnv.createTemporarySystemFunction("rates", rates);
        // SELECT ... FROM Orders o, LATERAL TABLE (rates(o.o_ts)) r
        //  WHERE o.currency = r.r_currency
    """
    from flink_release_1_14_5_comment_spark.api import Over

    tenv = TableEnvironment.create(spark)
    spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(500) \
        .createOrReplaceTempView("orders_b")
    t = (tenv.from_path("orders_b")
         .add_columns("o_totalprice * 2 AS dbl")
         .rename_columns("o_orderkey AS k")
         .drop_columns("o_custkey, o_orderdate"))
    w = (Over.partition_by("o_orderstatus").order_by("k")
         .preceding("UNBOUNDED_RANGE").alias("w"))
    t.window(w).select(
        "k, o_orderstatus, o_totalprice.sum over w AS running"
    ).to_data_frame().show(5)

    # temporal table FUNCTION (Flink 1.14 LATERAL TABLE form)
    rates = spark.createDataFrame(
        [("eur", 1, 114), ("eur", 5, 116), ("usd", 1, 100)],
        "r_currency string, r_ts bigint, rate bigint")
    orders = spark.createDataFrame(
        [(2, "eur", 10), (6, "eur", 20), (3, "usd", 30)],
        "o_ts bigint, currency string, amount bigint")
    tenv.register_table("orders_fx", orders)
    tenv.create_temporary_function(
        "rates", tenv.from_data_frame(rates)
        .create_temporal_table_function("r_ts", "r_currency"))
    tenv.sql_query("""
        SELECT o.o_ts, o.currency, o.amount * r.rate AS converted
        FROM orders_fx AS o, LATERAL TABLE(rates(o.o_ts)) AS r
        WHERE o.currency = r.r_currency
    """).to_data_frame().show()


def datastream_migration(spark):
    """Flink:
        env.addSource(...)
           .filter(e -> e.getType().equals("click"))
           .keyBy(Event::getUserId)
           .window(TumblingEventTimeWindows.of(Time.hours(1)))
           .aggregate(new CountAggregate());
    """
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ev = load_tables(spark, SF_DIR)["events"]
    (
        env.from_data_frame(ev)
        .filter("event_type = 'click'")
        .key_by("user_id")
        .window("ts", "1 hour")
        .aggregate([F.count(F.lit(1)).alias("n")])
        .to_data_frame()
        .show(5)
    )


def cep_migration(spark):
    """Flink:
        Pattern<Event, ?> p = Pattern.<Event>begin("v").where(isView)
            .followedBy("c").where(isClick).oneOrMore()
            .followedBy("p").where(isPurchase)
            .within(Time.hours(1));
        CEP.pattern(stream.keyBy(...), p).select(...);

       SQL equivalent: SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id ORDER BY ts
           PATTERN (V C+ P) DEFINE V AS ..., C AS ..., P AS ...)
    """
    from flink_release_1_14_5_comment_spark.catalog import load_tables
    from flink_release_1_14_5_comment_spark.streaming import sources
    from flink_release_1_14_5_comment_spark.streaming.match_recognize import match_recognize

    ev = load_tables(spark, SF_DIR)["events"].limit(500)
    stream, tmpdir = sources.replay_as_stream(spark, ev, n_chunks=2, order_col="ts")
    try:
        out = match_recognize(
            stream, ["user_id"], "ts", "V C+ P",
            define={"V": "event_type = 'view'", "C": "event_type = 'click'",
                    "P": "event_type = 'purchase'"},
            id_col="event_id", within_seconds=86400,
        )
        q = (out.writeStream.format("memory").queryName("matches")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        spark.table("matches").show(5, truncate=False)
    finally:
        sources.cleanup(tmpdir)


def connectors_migration(spark):
    """Flink:
        tEnv.executeSql("CREATE TABLE n (...) WITH ('connector'='jdbc', 'url'=..., 'table-name'='nation')");
        env.fromSource(FileSource.forRecordStreamFormat(AvroFormat...), ...);
        a.coGroup(b).where(k).equalTo(k)
         .window(TumblingEventTimeWindows.of(Time.hours(1)))
         .apply(new CoGroupFunction() {...});
    """
    import tempfile

    from flink_release_1_14_5_comment_spark.catalog import load_tables
    from flink_release_1_14_5_comment_spark.io_formats import (
        read_jdbc, read_table, write_jdbc, write_table,
    )

    t = load_tables(spark, SF_DIR)
    tmp = tempfile.mkdtemp(prefix="mig_")

    # Avro round-trip (pure-Python container codec; distributed both ways)
    write_table(t["nation"], f"{tmp}/nation_avro", fmt="avro")
    print("avro rows:", read_table(spark, f"{tmp}/nation_avro", fmt="avro").count())

    # JDBC round-trip against the embedded Derby Spark bundles
    url = f"jdbc:derby:{tmp}/db;create=true"
    drv = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    write_jdbc(t["region"], url, "region", driver=drv)
    print("jdbc rows:", read_jdbc(spark, url, "region", driver=drv).count())


def co_group_migration(spark):
    """Flink: a.coGroup(b).where(user).equalTo(user).window(tumble 1h).apply(fn)."""
    from flink_release_1_14_5_comment_spark.api.datastream import StreamExecutionEnvironment
    from flink_release_1_14_5_comment_spark.catalog import load_tables
    from flink_release_1_14_5_comment_spark.streaming import sources

    ev = load_tables(spark, SF_DIR)["events"].limit(400)
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts", "value")
    views = ev.filter("event_type = 'view'").select("user_id", "ts", "value")
    cs, ct = sources.replay_as_stream(spark, clicks, n_chunks=2, order_col="ts")
    vs, vt = sources.replay_as_stream(spark, views, n_chunks=2, order_col="ts")
    try:
        out = env.from_data_frame(cs).co_group(
            env.from_data_frame(vs), ["user_id"], "ts", "ts", "1 hour",
            fn=lambda l, r: {"n_clicks": len(l), "n_views": len(r)},
            extra_schema="n_clicks long, n_views long",
        )
        q = (out.to_data_frame().writeStream.format("memory").queryName("cg")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        spark.table("cg").show(5)
    finally:
        sources.cleanup(ct)
        sources.cleanup(vt)


def regular_join_migration(spark):
    """Flink:
        // StreamingJoinOperator: unbounded two-stream join, retract output
        SELECT * FROM Orders o JOIN Shipments s ON o.id = s.order_id
        -- (regular join, state kept forever / table.exec.state.ttl)
    """
    import datetime

    from flink_release_1_14_5_comment_spark.streaming import sources
    from flink_release_1_14_5_comment_spark.streaming.stream_joins import (
        regular_join_stream,
    )

    ts = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(1, "o-100", ts, 1), (2, "o-200", ts, 3)],
        "k long, order_ref string, o_ts timestamp, __seq long")
    ships = spark.createDataFrame(
        [(1, "ship-a", 2), (1, "ship-b", 4)],
        "k long, ship_ref string, __seq long")
    os_, ot = sources.replay_as_stream(spark, orders, n_chunks=2, order_col="__seq")
    ss, st = sources.replay_as_stream(spark, ships, n_chunks=2, order_col="__seq")
    try:
        out = regular_join_stream(os_, ss, ["k"], how="left",
                                  ttl="1 hour", seq_col="__seq")
        q = (out.writeStream.format("memory").queryName("rj")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        spark.table("rj").orderBy("k", "op").show(10)
    finally:
        sources.cleanup(ot)
        sources.cleanup(st)


def semi_anti_join_migration(spark):
    """Flink:
        // StreamingSemiAntiJoinOperator: EXISTS / NOT EXISTS on two streams
        SELECT * FROM Orders o WHERE EXISTS
          (SELECT 1 FROM Shipments s WHERE s.order_id = o.id)
    """
    import datetime

    from flink_release_1_14_5_comment_spark.streaming import sources
    from flink_release_1_14_5_comment_spark.streaming.stream_joins import (
        semi_anti_join_stream,
    )

    ts = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(1, "o-100", ts, 1), (2, "o-200", ts, 2)],
        "k long, order_ref string, o_ts timestamp, __seq long")
    ships = spark.createDataFrame(
        [(1, "ship-a", "+I", 3), (1, "ship-a", "-D", 4)],
        "k long, ship_ref string, __op string, __seq long")
    os_, ot = sources.replay_as_stream(spark, orders, n_chunks=1, order_col="__seq")
    ss, st = sources.replay_as_stream(spark, ships, n_chunks=2, order_col="__seq")
    try:
        # semi: order 1 is born when ship-a arrives, dies when it retracts
        out = semi_anti_join_stream(os_, ss, ["k"], how="semi", seq_col="__seq")
        q = (out.writeStream.format("memory").queryName("saj")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        spark.table("saj").orderBy("k", "op").show(10)
    finally:
        sources.cleanup(ot)
        sources.cleanup(st)


def cdc_formats_migration(spark):
    """Flink:
        CREATE TABLE orders_cdc (...) WITH ('connector'='kafka',
          'format'='debezium-json');
        -- DebeziumJsonDeserializationSchema: envelope → RowKind rows
    """
    from pyspark.sql import functions as F

    from flink_release_1_14_5_comment_spark.streaming.cdc_formats import (
        debezium_decode,
    )
    from flink_release_1_14_5_comment_spark.streaming.changelog import (
        changelog_normalize,
    )

    payloads = [
        '{"before": null, "after": {"id": 1, "name": "a"}, "op": "c"}',
        '{"before": {"id": 1, "name": "a"}, "after": {"id": 1, "name": "a2"}, "op": "u"}',
        '{"before": null, "after": {"id": 2, "name": "b"}, "op": "c"}',
    ]
    raw = spark.createDataFrame([(p,) for p in payloads], "value string")
    decoded = debezium_decode(raw, "value", "id BIGINT, name STRING")
    decoded.show()
    current = changelog_normalize(
        decoded.withColumn("seq", F.monotonically_increasing_id()),
        ["id"], "seq")
    print("current state after normalize:")
    current.orderBy("id").show()


def tpch_partsupp_migration(spark):
    """Flink:
        // flink-tpch-test runs spec TPC-H; Q2/Q9/Q11/Q16/Q20 need partsupp.
        // Here partsupp derives from lineitem's (partkey, suppkey) pairs —
        // same plan shapes, oracle-identical CTE text in both engines.
    """
    from flink_release_1_14_5_comment_spark.operators import tpch

    tpch.QUERIES["tpch_q11"](spark, SF_DIR).show(5)


def ann_pq_migration(spark):
    """No Flink counterpart (the reference has no vector ops) — the PQ/IVF-PQ
    family serves the LLM-pipeline similarity brief: codes are ~64x smaller
    than the float corpus and ADC scoring never touches raw vectors."""
    from flink_release_1_14_5_comment_spark.pipeline import similarity

    similarity.QUERIES["ann_ivfpq_topk"](spark, SF_DIR).show(5)


def persistent_catalog_migration(spark):
    """Flink:
        HiveCatalog catalog = new HiveCatalog("hive", "default", "<conf-dir>");
        tEnv.registerCatalog("hive", catalog);
        tEnv.executeSql("CREATE TABLE hive.db.facts (...) PARTITIONED BY (grp)");
    (Needs its OWN session: catalogImplementation is a static conf, so this
    section runs in a subprocess the same way the tests do.)
    """
    import subprocess
    import sys as _sys
    import tempfile

    wh = tempfile.mkdtemp(prefix="mig_wh_")
    code = f"""
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from flink_release_1_14_5_comment_spark.persistent_catalog import (
    create_table, get_warehouse_spark, table_names)
s = get_warehouse_spark({wh!r}, "mig", cpus=2)
create_table(s, "facts", s.range(10).selectExpr("id", "id % 3 AS grp"),
             partition_by=["grp"])
print("permanent tables:", table_names(s)); s.stop()
"""
    r = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, cwd="/tmp")
    print(r.stdout.strip().splitlines()[-1] if r.returncode == 0 else r.stderr[-500:])


def kafka_migration(spark):
    """Flink:
        CREATE TABLE clicks (...) WITH ('connector'='kafka', 'topic'='t',
          'properties.bootstrap.servers'='b:9092',
          'scan.startup.mode'='earliest-offset', 'format'='json');
    (No broker here — show the exact Spark options the DDL translates to.)
    """
    from flink_release_1_14_5_comment_spark.streaming.kafka_translate import (
        sink_options, source_options,
    )

    ddl_opts = {
        "connector": "kafka", "topic": "clicks",
        "properties.bootstrap.servers": "b:9092",
        "scan.startup.mode": "earliest-offset", "format": "json",
    }
    print("readStream options:", source_options(ddl_opts))
    print("writeStream options:", sink_options(ddl_opts))


def graph_migration(spark):
    """Flink:
        Graph<Long, Double, Double> g = Graph.fromDataSet(edges, env);
        g.run(new PageRank<>(0.85, 5));  g.run(new SingleSourceShortestPaths<>(src, 4));
    """
    from flink_release_1_14_5_comment_spark.pipeline.graph import (
        pagerank, single_source_shortest_paths,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], "src string, dst string")
    pagerank(edges, iters=5).orderBy(F.desc("pr")).show()
    single_source_shortest_paths(edges, "a", max_hops=3).orderBy("dist").show()



def queryable_state_migration(spark):
    """Flink:
        // job side
        stream.keyBy(r -> r.k).asQueryableState("counts");   // KeyedStream.java:1031
        // client side
        QueryableStateClient client = new QueryableStateClient(host, port);
        client.getKvState(jobId, "counts", key, keyTypeInfo, stateDesc);
    Here: every stateful operator's state is ALREADY externally readable from
    the checkpoint via Spark's State Data Source — discovery, scans, point
    lookups, and batch-id time travel (which the Flink client cannot do).
    """
    import shutil
    import tempfile

    from flink_release_1_14_5_comment_spark.streaming import queryable_state as qs

    d = tempfile.mkdtemp(prefix="qs_demo_")
    data, ckpt = os.path.join(d, "data"), os.path.join(d, "ckpt")
    try:
        spark.createDataFrame(
            [(k, 1) for k in range(4) for _ in range(k + 1)], "k int, v int"
        ).write.parquet(data)
        agg = (spark.readStream.schema("k int, v int").parquet(data)
               .groupBy("k").agg(F.count(F.lit(1)).alias("n")))
        q = (agg.writeStream.format("noop").outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)
        qs.state_operators(spark, ckpt).show()
        qs.read_keyed_state(spark, ckpt).orderBy("key_k").show()
        client = qs.QueryableStateClient(spark, ckpt)
        print("point lookup k=3 →", client.get_kv_state({"k": 3}))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def watermark_strategy_migration(spark):
    """Flink:
        WatermarkStrategy.<T>forBoundedOutOfOrderness(Duration.ofSeconds(5))
            .withIdleness(Duration.ofMinutes(1));            // WatermarkStrategy.java:169
    Here: per-input withWatermark + idle_tolerant_union — the global
    watermark follows the fastest input (multipleWatermarkPolicy=max), so a
    quiet source can't stall window firing (same late-data trade-off Flink
    documents for idleness).
    """
    import datetime

    from flink_release_1_14_5_comment_spark.streaming import sources
    from flink_release_1_14_5_comment_spark.streaming.watermarks import (
        idle_tolerant_union,
    )

    TS = datetime.datetime
    active = spark.createDataFrame(
        [(TS(2024, 1, 1, 10, 5), 1), (TS(2024, 1, 1, 11, 50), 2)],
        "ts timestamp, v int")
    idle = spark.createDataFrame([(TS(2024, 1, 1, 0, 10), 9)],
                                 "ts timestamp, v int")
    a, atmp = sources.replay_as_stream(spark, active, n_chunks=1)
    i, itmp = sources.replay_as_stream(spark, idle, n_chunks=1)
    try:
        union = idle_tolerant_union(
            spark, a.withWatermark("ts", "0 seconds"),
            i.withWatermark("ts", "0 seconds"))
        agg = union.groupBy(F.window("ts", "1 hour")).count()
        q = (agg.writeStream.format("memory").queryName("idle_demo")
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(120)
        spark.table("idle_demo").show(truncate=False)
    finally:
        spark.conf.unset("spark.sql.streaming.multipleWatermarkPolicy")
        sources.cleanup(atmp)
        sources.cleanup(itmp)


def clustering_migration(spark):
    """Flink (flink-ml style iterative clustering on DataSet iterations):
        DataSet<Centroid> centroids = initial.iterate(3)
            .closeWith(newCentroids);                        // bulk iteration
    Here: Lloyd's k-means as a driver loop of DataFrame ops — broadcast
    centroids, codegen cosine assignment, one map-side-combined shuffle per
    iteration (pipeline/clustering.py).
    """
    from flink_release_1_14_5_comment_spark.pipeline.clustering import kmeans_fit

    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [2.0, 0.1]), (3, [0.1, 2.0])],
        "vec_id long, embedding array<double>")
    kmeans_fit(vecs, k=2, iters=2).orderBy("vec_id").show()


def savepoint_migration(spark):
    """Flink:
        bin/flink stop --savepointPath s3://my-bucket/savepoints/ <jobId>          // stop-with-savepoint
        bin/flink run -s s3://my-bucket/savepoints/savepoint-xxxx app.jar          // SavepointRestoreSettings.forPath
    Here: a committed checkpoint directory is the snapshot; trigger_savepoint
    copies it, and any query started with the copy as checkpointLocation
    resumes from the snapshot's state + source offsets (rewind semantics).
    """
    import shutil
    import tempfile

    from flink_release_1_14_5_comment_spark.streaming import savepoints as sp

    d = tempfile.mkdtemp(prefix="sp_demo_")
    data, ckpt = os.path.join(d, "data"), os.path.join(d, "ckpt")
    try:
        spark.createDataFrame([(1, 1), (1, 1), (2, 1)], "k int, v int") \
            .write.parquet(data)
        agg = (spark.readStream.schema("k int, v int").parquet(data)
               .groupBy("k").agg(F.count(F.lit(1)).alias("n")))
        q = (agg.writeStream.format("noop").outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)
        spath = sp.trigger_savepoint(ckpt, os.path.join(d, "savepoint-0001"))
        print("savepoint at", spath,
              "— committed batch", sp.last_committed_batch(spath))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def window_sql_migration(spark):
    """Flink window SQL — BOTH generations run unchanged:
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR), count(*)
        FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR);          -- legacy
        SELECT window_start, count(*) FROM TABLE(
          HOP(TABLE events, DESCRIPTOR(ts), INTERVAL '30' MINUTE,
              INTERVAL '1' HOUR)) GROUP BY window_start;             -- TVF
    api/sql_translate.py rewrites them onto window()/session_window()
    and floor-arithmetic TVF subqueries."""
    tenv = TableEnvironment.create(spark)
    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView(
        "events_w")
    tenv.execute_sql("""
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w, COUNT(*) AS n
        FROM events_w GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
    """).to_data_frame().show(3)
    tenv.execute_sql("""
        SELECT window_start, COUNT(*) AS n
        FROM TABLE(HOP(TABLE events_w, DESCRIPTOR(ts), INTERVAL '30' MINUTE,
                       INTERVAL '1' HOUR))
        GROUP BY window_start
    """).to_data_frame().show(3)


def match_recognize_sql_migration(spark):
    """Flink: SELECT * FROM events MATCH_RECOGNIZE (PARTITION BY user_id
    ORDER BY ts MEASURES COUNT(C) AS clicks PATTERN (V C+ P) DEFINE ...)
    — the SQL text routes onto the CEP NFA automatically."""
    tenv = TableEnvironment.create(spark)
    spark.read.parquet(f"{SF_DIR}/events.parquet").createOrReplaceTempView(
        "events_mr")
    tenv.execute_sql("""
        SELECT * FROM events_mr MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES COUNT(C) AS clicks
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V C+ P)
          WITHIN INTERVAL '1' DAY
          DEFINE V AS event_type = 'view',
                 C AS event_type = 'click',
                 P AS event_type = 'purchase'
        )
    """).to_data_frame().show(3)


def statement_set_migration(spark):
    """Flink: StatementSet ss = tEnv.createStatementSet();
    ss.addInsertSql(...); ss.addInsertSql(...); ss.execute();"""
    import tempfile

    tenv = TableEnvironment.create(spark)
    d = tempfile.mkdtemp(prefix="graft_stmtset_")
    tenv.execute_sql(f"""
        CREATE TABLE by_status (o_orderstatus STRING, n BIGINT)
        WITH ('connector'='filesystem','path'='{d}/by_status','format'='parquet')
    """)
    tenv.execute_sql(f"""
        CREATE TABLE by_prio (o_orderpriority STRING, n BIGINT)
        WITH ('connector'='filesystem','path'='{d}/by_prio','format'='parquet')
    """)
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView(
        "orders_ss")
    (tenv.create_statement_set()
     .add_insert_sql("INSERT INTO by_status SELECT o_orderstatus, COUNT(*) AS n "
                     "FROM orders_ss GROUP BY o_orderstatus")
     .add_insert_sql("INSERT INTO by_prio SELECT o_orderpriority, COUNT(*) AS n "
                     "FROM orders_ss GROUP BY o_orderpriority")
     .execute())
    print("statement set wrote",
          tenv.from_path("by_status").to_data_frame().count(), "+",
          tenv.from_path("by_prio").to_data_frame().count(), "rows")
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def ddl_breadth_migration(spark):
    """Flink 1.14 DDL forms that port unchanged:
    CREATE TABLE ... PARTITIONED BY (...) WITH (...);
    INSERT INTO t PARTITION (dt='...') SELECT ...;
    CREATE TABLE sink WITH ('path'='...') LIKE src (OVERWRITING OPTIONS);
    ALTER TABLE t RENAME TO t2 / ALTER TABLE t SET ('k'='v')."""
    import shutil
    import tempfile

    tenv = TableEnvironment.create(spark)
    d = tempfile.mkdtemp(prefix="graft_ddl_")
    tenv.execute_sql(f"""
        CREATE TABLE part_sink (o_orderkey BIGINT, o_totalprice DOUBLE,
                                o_orderstatus STRING)
        PARTITIONED BY (o_orderstatus)
        WITH ('connector'='filesystem','path'='{d}/part_sink','format'='parquet')
    """)
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView(
        "orders_ddl")
    tenv.execute_sql(
        "INSERT INTO part_sink SELECT o_orderkey, o_totalprice, o_orderstatus "
        "FROM orders_ddl")
    tenv.execute_sql(
        "INSERT OVERWRITE part_sink PARTITION (o_orderstatus='X') "
        "SELECT -1, 0.0 FROM orders_ddl LIMIT 1")
    tenv.execute_sql(f"""
        CREATE TABLE like_clone WITH ('path'='{d}/clone')
        LIKE part_sink (OVERWRITING OPTIONS, EXCLUDING PARTITIONS)
    """)
    tenv.execute_sql("ALTER TABLE like_clone RENAME TO clone_renamed")
    n = tenv.from_path("part_sink").to_data_frame().count()
    print("ddl breadth: partitioned rows", n,
          "| clone registered:", "clone_renamed" in tenv._ddl)
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    spark = get_spark("migration-examples", cpus=8)
    sql_migration(spark)
    window_sql_migration(spark)
    match_recognize_sql_migration(spark)
    statement_set_migration(spark)
    ddl_breadth_migration(spark)
    table_api_migration(spark)
    table_api_breadth_migration(spark)
    datastream_migration(spark)
    cep_migration(spark)
    connectors_migration(spark)
    co_group_migration(spark)
    regular_join_migration(spark)
    semi_anti_join_migration(spark)
    cdc_formats_migration(spark)
    tpch_partsupp_migration(spark)
    ann_pq_migration(spark)
    persistent_catalog_migration(spark)
    kafka_migration(spark)
    graph_migration(spark)
    queryable_state_migration(spark)
    watermark_strategy_migration(spark)
    clustering_migration(spark)
    savepoint_migration(spark)
    print("migration examples: all sections ran")
