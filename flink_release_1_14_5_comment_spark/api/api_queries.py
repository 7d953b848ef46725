"""Oracle-graded facade queries: the Table API and DataStream API front
doors (SURVEY §2 Table/DataStream API rows, reference Table.java /
DataStream.java).

Both facades are parity-tested against the SQL path in pytest
(tests/test_table_api_breadth.py, tests/test_api.py); these queries put the
facades behind the driver's DuckDB gate so a translation bug in the fluent
layer (expression parsing, `.sum`/`.count` property aggregates, window
aliasing, keyed topology wiring) fails the official value hash — the same
treatment the MATCH_RECOGNIZE SQL text and the window-TVF translation got.

Scale: the facades emit ordinary DataFrame plans — everything Catalyst does
for the SQL path (pushdown, broadcast, codegen) applies verbatim; nothing
here adds an operator."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views


def q_table_api_fluent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One fluent Table-API chain exercising where / add_columns /
    rename_columns / drop_columns / group_by / select with Flink's
    `.sum`/`.count` property-aggregate spelling (reference Table.java:462-519
    column ops, ApiExpressionUtils aggregates)."""
    from flink_release_1_14_5_comment_spark.api.table_env import (
        TableEnvironment,
    )

    register_views(spark, sf_dir)
    env = TableEnvironment(spark)
    t = (env.from_path("documents")
         .where("lang IN ('en', 'de', 'fr')")
         .add_columns("n_chars / 10.0 AS deci")
         .rename_columns("source AS src")
         .drop_columns("text")
         .group_by("lang, src")
         .select("lang, src, doc_id.count AS n_docs, n_chars.sum AS chars, "
                 "deci.avg AS avg_deci"))
    df = t.to_data_frame()
    return df.select("lang", "src", F.col("n_docs").cast("long").alias("n_docs"),
                     F.col("chars").cast("long").alias("chars"),
                     F.round(F.col("avg_deci").cast("double"), 4)
                     .alias("avg_deci"))


ORACLE_Q_TABLE_API_FLUENT = """
SELECT lang, source AS src,
       CAST(COUNT(doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)  AS chars,
       ROUND(AVG(n_chars / 10.0), 4) AS avg_deci
FROM documents
WHERE lang IN ('en', 'de', 'fr')
GROUP BY lang, source
"""


def q_datastream_api_fluent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DataStream-API topology on a bounded frame — from_data_frame →
    filter → map (expression fast path) → key_by → window → aggregate
    (reference DataStream.java map/filter, KeyedStream.window, 1.14's
    unified batch execution of DataStream programs). End state of the
    bounded topology == the batch windowed aggregate the oracle states."""
    from flink_release_1_14_5_comment_spark.api.datastream import (
        StreamExecutionEnvironment,
    )
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ev = load_tables(spark, sf_dir)["events"]
    out = (env.from_data_frame(ev)
           .filter("event_type = 'click'")
           .map(["user_id", "value * 2 AS v2", "ts"])
           .key_by("user_id")
           .window("ts", "1 hour")
           .aggregate([F.count(F.lit(1)).alias("n"),
                       F.round(F.sum("v2"), 2).alias("sum_v2")]))
    return out.to_data_frame().select(
        "w_start", "user_id", F.col("n").cast("long").alias("n"), "sum_v2")


ORACLE_Q_DATASTREAM_API_FLUENT = """
SELECT date_trunc('hour', ts) AS w_start, user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value * 2), 2) AS sum_v2
FROM events
WHERE event_type = 'click'
GROUP BY 1, 2
"""


def q_legacy_cast_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink 1.14 LEGACY CAST semantics graded: pre-FLIP-211 CAST returns
    NULL on malformed input, while this engine runs Spark with ANSI mode
    (errors). TableEnvironment(legacy_cast=True) rewrites every CAST( in
    the SQL text to TRY_CAST( — this query puts that rewrite behind the
    oracle: CAST('en' AS INT) must yield NULL (counted per language), and
    the numeric suffix cast must still succeed, under one GROUP BY."""
    from flink_release_1_14_5_comment_spark.api.table_env import (
        TableEnvironment,
    )

    register_views(spark, sf_dir)
    env = TableEnvironment(spark, legacy_cast=True)
    return env.sql_query("""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(substr(source, 4) AS INT)) AS BIGINT) AS src_sum,
               CAST(SUM(CASE WHEN CAST(lang AS INT) IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS null_casts
        FROM documents GROUP BY lang
    """).to_data_frame()


ORACLE_Q_LEGACY_CAST_SQL = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(TRY_CAST(substr(source, 4) AS INT)) AS BIGINT) AS src_sum,
       CAST(SUM(CASE WHEN TRY_CAST(lang AS INT) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS null_casts
FROM documents GROUP BY lang
"""


def q_table_flat_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table AGGREGATE function with multi-row emit graded (reference
    Table.flatAggregate / TableAggregateFunction — the canonical Top2
    example from the Flink docs): a pandas table-agg emits the two
    highest-price orders per status with their rank. Deterministic
    tiebreak (price desc, then orderkey) keeps the pandas emission and the
    oracle's ROW_NUMBER in lockstep."""
    from flink_release_1_14_5_comment_spark.api.table_env import (
        TableEnvironment,
    )

    register_views(spark, sf_dir)
    env = TableEnvironment(spark)

    def top2(pdf):
        out = pdf.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True]).head(2).copy()
        out["rank"] = range(1, len(out) + 1)
        return out[["o_orderstatus", "o_orderkey", "o_totalprice", "rank"]]

    t = (env.from_path("orders")
         .group_by("o_orderstatus")
         .flat_aggregate(top2,
                         "o_orderstatus string, o_orderkey bigint, "
                         "o_totalprice double, rank bigint"))
    return t.to_data_frame().select(
        "o_orderstatus", "o_orderkey",
        F.round("o_totalprice", 2).alias("price"), "rank")


ORACLE_Q_TABLE_FLAT_AGGREGATE = """
SELECT o_orderstatus, o_orderkey, ROUND(o_totalprice, 2) AS price,
       CAST(rn AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 2
"""


QUERIES = {
    "table_api_fluent": q_table_api_fluent,
    "datastream_api_fluent": q_datastream_api_fluent,
    "legacy_cast_sql": q_legacy_cast_sql,
    "table_flat_aggregate": q_table_flat_aggregate,
}

ORACLE = {
    "table_api_fluent": ORACLE_Q_TABLE_API_FLUENT,
    "datastream_api_fluent": ORACLE_Q_DATASTREAM_API_FLUENT,
    "legacy_cast_sql": ORACLE_Q_LEGACY_CAST_SQL,
    "table_flat_aggregate": ORACLE_Q_TABLE_FLAT_AGGREGATE,
}
