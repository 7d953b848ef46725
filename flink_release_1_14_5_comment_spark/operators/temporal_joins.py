"""Temporal joins: interval join and as-of (temporal) join (SURVEY.md §2.3).

Reference operators re-expressed Spark-first:

* Interval join — TimeIntervalJoin.java:51 / IntervalJoinOperator.java:87:
  `l.ts BETWEEN r.ts - X AND r.ts + Y` on an equi-key. In Spark this is a
  plain join with a range residual: the equi-key drives the shuffle, the time
  band is evaluated as a post-probe filter. At 100 TB both sides shuffle once
  on the key; no state, no explosion as long as the band is selective.

* As-of join — TemporalRowTimeJoinOperator.java:78 (`FOR SYSTEM_TIME AS OF`):
  probe row joins the single most recent build row with ts <= probe ts.
  A naive range-join explodes (every probe row matches every earlier build
  row). The scalable batch formulation is UNION + single sort per key:
  tag build rows 0 and probe rows 1, sort by (key, ts, tag), and carry the
  last non-null build row forward with last(ignorenulls) over an unbounded
  preceding ROWS frame — one shuffle, one sort, zero row multiplication.
  This is the batch analog of the reference's per-key sorted version list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: Column,
    time_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key join constrained to a time band (Flink interval join)."""
    return left.join(right, key & time_cond, how)


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    build_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """As-of join: for each probe row, the latest build row with
    build_ts <= probe_ts for the same key.

    Build side MUST be unique per (key, build_ts) — pre-dedup upstream.
    Returns probe columns + requested build columns (null when no build row
    precedes, matching LEFT semantics; how='inner' drops those).
    """
    p = probe.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(probe_ts))
    b = build.withColumn("__tag", F.lit(0)).withColumn("__ts", F.col(build_ts))

    # Align schemas for the union: probe cols ∪ build cols, null-filled.
    p_cols = set(probe.columns)
    b_cols = set(build.columns)
    all_cols = list(probe.columns) + [c for c in build.columns if c not in p_cols]
    p_sel = [
        (F.col(c) if c in p_cols else F.lit(None).cast(dict(build.dtypes)[c])).alias(c)
        for c in all_cols
    ] + [F.col("__tag"), F.col("__ts")]
    b_sel = [
        (F.col(c) if c in b_cols else F.lit(None).cast(dict(probe.dtypes)[c])).alias(c)
        for c in all_cols
    ] + [F.col("__tag"), F.col("__ts")]
    unioned = p.select(*p_sel).unionByName(b.select(*b_sel))

    # Build rows sort before probe rows at equal ts (tag 0 < 1) so a build row
    # AT the probe timestamp is visible — Flink's AS OF <= semantics.
    w = (
        W.partitionBy(key)
        .orderBy(F.col("__ts"), F.col("__tag"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("__tag") == 0, F.col(c)), ignorenulls=True).over(w).alias(f"__b_{c}")
            for c in build_cols
        ],
    )
    out = carried.filter(F.col("__tag") == 1)
    keep = [c for c in probe.columns]
    out = out.select(
        *keep, *[F.col(f"__b_{c}").alias(c) for c in build_cols]
    )
    if how == "inner":
        out = out.filter(F.col(build_cols[0]).isNotNull())
    return out


# ---------------------------------------------------------------------------
# Temporal table FUNCTION (Flink 1.14 `LATERAL TABLE(rates(o.ts))`)
# ---------------------------------------------------------------------------


class TemporalTableFunction:
    """The Flink 1.14 temporal table function
    (``Table.createTemporalTableFunction(timeAttribute, primaryKey)``,
    reference flink-table-api-java Table.java createTemporalTableFunction;
    planner rewrite LogicalCorrelateToJoinFromTemporalTableRule.scala).

    Wraps a versioned table: ``df`` holds the full version history,
    ``time_attr`` is the version timestamp, ``primary_key`` the versioned
    key. Applying it via ``temporal_table_join`` (or SQL
    ``LATERAL TABLE(f(probe_ts))`` through TableEnvironment) yields, per
    probe row, the newest version with time_attr <= probe time for the
    matching key — identical runtime semantics to the `FOR SYSTEM_TIME
    AS OF` join, which is exactly what the reference's planner rule
    rewrites the function form into.
    """

    def __init__(self, df: DataFrame, time_attr: str, primary_key: str):
        missing = [c for c in (time_attr, primary_key) if c not in df.columns]
        if missing:
            raise ValueError(
                f"temporal table function: column(s) {missing} not in "
                f"versioned table columns {df.columns}")
        self.df = df
        self.time_attr = time_attr
        self.primary_key = primary_key


def temporal_table_join(
    probe: DataFrame,
    fn: TemporalTableFunction,
    probe_ts: str,
    probe_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join ``probe`` against a TemporalTableFunction: per probe row, the
    newest build version with ``fn.time_attr <= probe[probe_ts]`` and
    matching key. Flink's comma-join `LATERAL TABLE(...)` form has INNER
    semantics (probe rows with no valid version drop) — the default here.

    Column names of probe and the versioned table must be disjoint (Flink
    resolves collisions via aliases at the Calcite layer; pre-rename here).
    Build side must be unique per (primary_key, time_attr).
    """
    build = fn.df
    overlap = set(probe.columns) & set(build.columns)
    if overlap:
        raise NotImplementedError(
            f"temporal table join: overlapping column names {sorted(overlap)}; "
            "rename one side (Flink's examples use disjoint names, e.g. "
            "r_currency vs currency)")
    # carry the build key under the probe key's name so the as-of union
    # partitions both sides on one column
    build2 = build.withColumn(probe_key, F.col(fn.primary_key))
    build_cols = [fn.time_attr] + [c for c in build.columns
                                   if c != fn.time_attr]
    return asof_join(
        probe=probe,
        build=build2,
        key=probe_key,
        probe_ts=probe_ts,
        build_ts=fn.time_attr,
        build_cols=build_cols,
        how=how,
    ).select(*probe.columns, *build.columns)


# ---------------------------------------------------------------------------
# Oracle-checked queries
# ---------------------------------------------------------------------------

def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks followed by a purchase of the same user within 30 minutes."""
    t = register_views(spark, sf_dir)
    e = t["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts").alias("click_ts")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = interval_join(
        clicks,
        buys,
        clicks.user_id == buys.p_user,
        (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return joined.select("user_id", "click_id", "purchase_id")


ORACLE_Q_INTERVAL_JOIN = """
SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at-or-before it
    (FOR SYSTEM_TIME AS OF — TemporalRowTimeJoinOperator.java:78)."""
    t = register_views(spark, sf_dir)
    e = t["events"]
    # Dedup build side per (user_id, ts): keep max event_id — makes the as-of
    # target unique and the result deterministic on both engines.
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    out = asof_join(
        probe=buys,
        build=clicks.select("user_id", F.col("ts").alias("click_ts"), "click_id"),
        key="user_id",
        probe_ts="ts",
        build_ts="click_ts",
        build_cols=["click_id", "click_ts"],
        how="left",
    )
    return out.select("user_id", "purchase_id", "ts", "click_id", "click_ts")


ORACLE_Q_ASOF_JOIN = """
WITH clicks AS (
  SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), buys AS (
  SELECT user_id, event_id AS purchase_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT b.user_id AS user_id, b.purchase_id, b.ts, c.click_id, c.click_ts
FROM buys b ASOF LEFT JOIN clicks c
  ON b.user_id = c.user_id AND b.ts >= c.click_ts
"""


def q_temporal_table_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink 1.14 temporal table FUNCTION syntax end-to-end: clicks form a
    versioned "rates" table (per-user value history), purchases probe it
    with `LATERAL TABLE(rates(o.ts))` — INNER comma-join semantics, key
    equality in WHERE, exactly the reference's
    createTemporalTableFunction + LogicalCorrelateToJoinFromTemporalTableRule
    pipeline (TemporalJoinITCase scenarios)."""
    from flink_release_1_14_5_comment_spark.api.table_env import (
        TableEnvironment,
    )

    t = register_views(spark, sf_dir)
    e = t["events"]
    rates = (
        e.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("r_user"),
                 F.col("ts").alias("r_ts"))
        .agg(F.max("value").alias("rate"))
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts",
        F.col("value").alias("amount"))
    env = TableEnvironment(spark)
    env.register_table("buys_ttf", buys)
    env.create_temporary_function(
        "rates", env.from_data_frame(rates)
        .create_temporal_table_function("r_ts", "r_user"))
    return env.sql_query("""
        SELECT o.user_id, o.purchase_id, o.ts,
               o.amount * r.rate AS converted, r.r_ts
        FROM buys_ttf AS o, LATERAL TABLE(rates(o.ts)) AS r
        WHERE o.user_id = r.r_user
    """).to_data_frame()


ORACLE_Q_TEMPORAL_TABLE_FN = """
WITH rates AS (
  SELECT user_id AS r_user, ts AS r_ts, MAX(value) AS rate
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), buys AS (
  SELECT user_id, event_id AS purchase_id, ts, value AS amount
  FROM events WHERE event_type = 'purchase'
)
SELECT o.user_id, o.purchase_id, o.ts, o.amount * r.rate AS converted, r.r_ts
FROM buys o ASOF JOIN rates r
  ON o.user_id = r.r_user AND o.ts >= r.r_ts
"""


# SCD Type-2 history build — the PRODUCER side of the versioned tables the
# temporal joins above consume (reference: the "versioned table" the
# temporal table function wraps, TemporalTableFunction docs / the per-key
# sorted version list TemporalRowTimeJoinOperator.java keeps as state).
# Shared SQL text for both engines: max_by picks the last write per (key,
# ts) instant (event_id = the total write order), LEAD closes each
# version's validity interval, the open interval marks the current row.
_SCD2_SQL = """
WITH chg AS (
  SELECT user_id, ts, max_by(value, event_id) AS value
  FROM events GROUP BY user_id, ts
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       ROUND(value, 2) AS value,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       (LEAD(ts) OVER w IS NULL) AS is_current
FROM chg
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
"""


def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) history table from a raw change
    stream: one validity interval [valid_from, valid_to) per version per
    key, open-ended for the current row. One (key, ts) collapse + one
    window over the per-key version list — the same shape the temporal
    table function's state keeps, materialized as a queryable table. At
    100 TB the window partitions by key (unbounded key count → scales with
    the shuffle, no global sort); incremental maintenance is a MERGE that
    closes only the affected keys' open intervals.
    tests/test_scd2_consistency.py proves the interval semantics: probing
    the built history with valid_from <= t < valid_to reproduces the as-of
    join's answer exactly."""
    register_views(spark, sf_dir)
    return spark.sql(_SCD2_SQL)


_SCD2_HISTORY_DDL = (
    "user_id bigint, version bigint, value double, "
    "valid_from timestamp, valid_to timestamp, is_current boolean"
)


def scd2_merge(history: DataFrame, batch: DataFrame) -> DataFrame:
    """Incremental SCD2 maintenance — the MERGE q_scd2_build's docstring
    promises: fold a change batch (raw rows: user_id, ts, value, event_id)
    into an existing history table, rewriting ONLY the affected keys'
    version chains. Keys untouched by the batch pass through verbatim
    (at 100 TB this is a key-partition-pruned MERGE on a Delta/Iceberg
    table; expressed here as anti-join + union of the affected slice).

    Equivalence contract (tests/test_scd2_consistency.py): folding batches
    in event_id order reproduces q_scd2_build's full rebuild exactly. A
    (key, ts) collision between an existing version and a batch change is
    won by the batch (the later write), matching the rebuild's
    max_by(value, event_id) when batches arrive in write order."""
    chg_new = batch.groupBy("user_id", "ts").agg(
        F.expr("max_by(value, event_id)").alias("value"))
    affected = chg_new.select("user_id").distinct()
    untouched = history.join(affected, "user_id", "left_anti")
    old_chg = (
        history.join(affected, "user_id", "left_semi")
        .select("user_id", F.col("valid_from").alias("ts"), "value")
    )
    merged_chg = (
        old_chg.join(chg_new, ["user_id", "ts"], "left_anti")
        .unionByName(chg_new)
    )
    w = W.partitionBy("user_id").orderBy("ts")
    rebuilt = (
        merged_chg.select(
            "user_id",
            F.row_number().over(w).cast("long").alias("version"),
            F.round("value", 2).alias("value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return untouched.unionByName(rebuilt.select(*history.columns))


def _hadoop_path_ops(spark, path: str):
    """(exists, delete) closures over the Hadoop FileSystem owning `path`
    — works on any scheme (local, HDFS, object stores), unlike
    os.path.exists."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return (lambda: fs.exists(hpath)), (lambda: fs.delete(hpath, True))


def scd2_maintain_stream(change_stream: DataFrame, target_path: str):
    """Streaming SCD2 maintenance: a foreachBatch sink that merges each
    micro-batch of raw changes into the history parquet at `target_path`
    via scd2_merge — the same read-merge-rewrite topology as
    streaming/changelog.py's upsert_sink (SinkUpsertMaterializer
    semantics), specialized to versioned-interval output.

    Failure posture (ADVICE r7): "no history yet" is decided by an explicit
    existence check, never by swallowing read exceptions — a transient read
    error on batch N>1 must fail the batch (Structured Streaming retries
    it), not silently discard all accumulated state. The rewrite stages
    through `_tmp`; if a crash lands between deleting the target and
    finishing the rewrite, the next batch restores the target from `_tmp`
    first (scd2_merge is idempotent by (user_id, ts) last-write-wins, so
    replaying the in-flight batch over the restored copy converges). `_tmp`
    is deleted after every successful rewrite so stale staging data can
    never masquerade as recovery state."""
    spark = change_stream.sparkSession

    def merge(batch: DataFrame, batch_id: int) -> None:
        tmp = target_path + "_tmp"
        target_exists, _ = _hadoop_path_ops(spark, target_path)
        tmp_exists, tmp_delete = _hadoop_path_ops(spark, tmp)
        if not target_exists() and tmp_exists():
            # crash recovery: prior rewrite died after removing the target;
            # _tmp holds the authoritative pre-crash merge result
            spark.read.parquet(tmp).write.mode("overwrite").parquet(target_path)
        if target_exists():
            current = spark.read.parquet(target_path)  # errors propagate
        else:
            current = spark.createDataFrame([], _SCD2_HISTORY_DDL)
        merged = scd2_merge(current, batch)
        merged.write.mode("overwrite").parquet(tmp)
        (spark.read.parquet(tmp)
         .write.mode("overwrite").parquet(target_path))
        tmp_delete()

    return (change_stream.writeStream.outputMode("append").foreachBatch(merge)
            .option("checkpointLocation", target_path + "_ckpt").start())


QUERIES = {
    "interval_join": q_interval_join,
    "asof_join": q_asof_join,
    "temporal_table_fn": q_temporal_table_fn,
    "scd2_build": q_scd2_build,
}

ORACLE = {
    "interval_join": ORACLE_Q_INTERVAL_JOIN,
    "asof_join": ORACLE_Q_ASOF_JOIN,
    "temporal_table_fn": ORACLE_Q_TEMPORAL_TABLE_FN,
    "scd2_build": _SCD2_SQL,
}
