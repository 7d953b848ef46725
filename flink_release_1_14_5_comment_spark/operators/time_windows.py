"""Time-window aggregations (SURVEY.md §2.4 group-window / window-TVF aggs),
batch flavor. The same window expressions are reused by streaming/windows.py —
in Spark `window()` / `session_window()` are plain expressions valid in both
modes, which is exactly Flink's unified window-TVF story
(SqlTumbleTableFunction / SqlCumulateTableFunction).

Reference operators re-expressed here:
  * TUMBLE  — TumblingWindowAssigner.java:36  → F.window(ts, size)
  * HOP     — SlidingWindowAssigner.java:40   → F.window(ts, size, slide)
  * SESSION — SessionWindowAssigner.java:36   → F.session_window(ts, gap)
  * CUMULATE — CumulativeWindowAssigner.java:39 / SliceAssigners.java — no
    Spark builtin → explode into the k cumulative windows that contain each
    row (k = size/step, a bounded constant), then a plain groupBy. The row
    multiplication is the same cost the reference pays logically per slice;
    partial aggregation keeps the shuffle at #windows × #keys.

Scale: every query here shuffles once on (window, key) with map-side partial
aggregation; window count is bounded by time-range/size, so state and shuffle
are independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views


def tumble(df: DataFrame, ts_col: str, size: str) -> F.Column:
    """TUMBLE window assigner expression."""
    return F.window(ts_col, size)


def q_window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregate per event_type."""
    t = register_views(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )


ORACLE_Q_WINDOW_TUMBLE = """
SELECT date_trunc('hour', ts) AS w_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


_TVF_SQL_TEXT = """
SELECT window_start, window_end, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
GROUP BY window_start, window_end, event_type
"""


def q_window_tvf_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME hourly tumble as window_tumble, entered through the Flink
    WINDOW TVF SQL TEXT (FLIP-145 `TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts),
    INTERVAL '1' HOUR))`, reference StreamExecWindowTableFunction):
    TableEnvironment.sql_query translates the TVF onto Spark's window()
    (api/sql_translate.py) — so this grades the TRANSLATION layer against
    the closed-form oracle, where window_tumble grades only the operator.
    window_start AND window_end both surface (the TVF's extra column)."""
    from flink_release_1_14_5_comment_spark.api.table_env import (
        TableEnvironment,
    )

    register_views(spark, sf_dir)
    env = TableEnvironment(spark)
    return env.sql_query(_TVF_SQL_TEXT).to_data_frame()


ORACLE_Q_WINDOW_TVF_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def q_window_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (HOP). Spark's window() with a
    slide duplicates each row into size/slide windows — identical to the
    reference's SlidingWindowAssigner row-multiplexing."""
    t = register_views(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        # round(sum)/count, not avg(): see q_agg_pricing_summary note.
        .agg(F.count(F.lit(1)).alias("n"),
             (F.round(F.sum("value"), 2) / F.count(F.lit(1))).alias("avg_value"))
        .select(F.col("w.start").alias("w_start"), "n", "avg_value")
    )


ORACLE_Q_WINDOW_HOP = """
SELECT w_start, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) / COUNT(*) AS avg_value
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS w_start, value
  FROM events, (SELECT unnest([0, 1]) AS k)
)
GROUP BY w_start
"""


def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap per user. Spark session_window
    merges rows whose windows overlap (next ts < prev ts + gap) — the same
    merge rule as the reference's SessionWindowAssigner/MergingWindowSet."""
    t = register_views(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n",
            "sum_value",
        )
    )


# Gaps-and-islands formulation: a new session starts when the gap since the
# previous event is >= 30 minutes (Spark merges only strictly-overlapping
# [ts, ts+gap) windows). w_end = last ts + gap.
ORACLE_Q_WINDOW_SESSION = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, new_s DESC
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts) AS w_start, MAX(ts) + INTERVAL '30 minutes' AS w_end,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, sid
"""


def cumulate(df: DataFrame, ts_col: str, step_minutes: int, size_minutes: int) -> DataFrame:
    """CUMULATE window TVF: emit each row into every cumulative window
    [size-aligned start, start + k*step) that contains it, k = 1..size/step.

    Returns df with added `w_start`, `w_end` columns (row multiplied by the
    number of containing cumulative windows).
    """
    assert size_minutes % step_minutes == 0
    k = size_minutes // step_minutes
    base = F.window(ts_col, f"{size_minutes} minutes")
    df = (
        df.withColumn("__base", base)
        .withColumn("__k", F.explode(F.array(*[F.lit(i) for i in range(1, k + 1)])))
        .withColumn("w_start", F.col("__base.start"))
        .withColumn(
            "w_end",
            (F.unix_timestamp("__base.start") + F.col("__k") * (step_minutes * 60)).cast("timestamp"),
        )
        .filter(F.col(ts_col) < F.col("w_end"))
        .drop("__base", "__k")
    )
    return df


def q_window_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE(step=6h, size=24h) over events: daily windows that grow in
    6-hour increments (reference SqlCumulateTableFunction /
    CumulativeWindowAssigner.java:39)."""
    t = register_views(spark, sf_dir)
    rows = cumulate(t["events"], "ts", step_minutes=360, size_minutes=1440)
    return (
        rows.groupBy("w_start", "w_end", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


ORACLE_Q_WINDOW_CUMULATE = """
SELECT w_start, w_end, event_type,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS sum_value
FROM (
  SELECT date_trunc('day', ts) AS w_start,
         date_trunc('day', ts) + k * INTERVAL '6 hours' AS w_end,
         event_type, value, ts
  FROM events, (SELECT unnest([1, 2, 3, 4]) AS k)
)
WHERE ts < w_end
GROUP BY w_start, w_end, event_type
"""


# Hypertable-style continuous-aggregate rollup: the same event stream
# aggregated at multiple granularities in one statement (the materialized
# rollup tree a timeseries store maintains). Each granularity is one
# scan+agg branch; Catalyst reuses the scan across the UNION ALL branches
# (exchange reuse), and at 100 TB each branch is a plain partial+final agg
# whose coarser levels could equally fold from the finer one.
_HYPER_ROLLUP_SQL = """
SELECT gran, w_start, event_type, n, sum_value
FROM (
  SELECT 'hour' AS gran, date_trunc('hour', ts) AS w_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS sum_value
  FROM events GROUP BY date_trunc('hour', ts), event_type
  UNION ALL
  SELECT 'day', date_trunc('day', ts), event_type,
         CAST(COUNT(*) AS BIGINT), ROUND(SUM(value), 2)
  FROM events GROUP BY date_trunc('day', ts), event_type
)
"""


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity (hour + day) rollup of the events stream in one
    statement — the batch face of the cascading streaming window rollup
    (streaming/windows.py cascade_tumble_agg)."""
    t = register_views(spark, sf_dir)
    t["events"].createOrReplaceTempView("events")
    return spark.sql(_HYPER_ROLLUP_SQL)


QUERIES = {
    "window_tumble": q_window_tumble,
    "window_tvf_sql": q_window_tvf_sql,
    "window_hop": q_window_hop,
    "window_session": q_window_session,
    "window_cumulate": q_window_cumulate,
    "hypertable_rollup": q_hypertable_rollup,
}

ORACLE = {
    "window_tumble": ORACLE_Q_WINDOW_TUMBLE,
    "window_tvf_sql": ORACLE_Q_WINDOW_TVF_SQL,
    "window_hop": ORACLE_Q_WINDOW_HOP,
    "window_session": ORACLE_Q_WINDOW_SESSION,
    "window_cumulate": ORACLE_Q_WINDOW_CUMULATE,
    "hypertable_rollup": _HYPER_ROLLUP_SQL,
}
