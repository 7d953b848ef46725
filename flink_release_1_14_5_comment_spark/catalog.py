"""Catalog: register the testdata star schema as temp views.

Mirrors the reference's catalog layer (`CatalogManager.java:65`,
`GenericInMemoryCatalog.java:50`) in spirit: a named-table registry the SQL
surface resolves against. Spark's own session catalog does the real work.

Scale note: the dimension tables (region/nation/supplier/part/customer) are
orders of magnitude smaller than the fact tables (lineitem/orders/events) at
every SF — Spark's 10 MB autoBroadcastJoinThreshold (see session.py) makes
every dim join a broadcast-hash join with zero shuffle on the fact side, the
same decision the reference's broadcast-threshold planner makes
(`OptimizerConfigOptions.java:51`).
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Tables small enough to always broadcast in joins at any SF (bounded cardinality).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


@lru_cache(maxsize=64)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as long
    (spark.sql.legacy.parquet.nanosAsLong); we convert to micros timestamps,
    truncating exactly like DuckDB's nanos→TIMESTAMP mapping."""
    schema = pq.read_schema(path)
    return tuple(
        f.name for f in schema
        if str(f.type).startswith("timestamp[ns")
    )


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make the engine correct under ANY caller-provided SparkSession.

    The driver builds its own vanilla session — if these confs only lived in
    ``session.get_spark`` every read of events.parquet (TIMESTAMP(NANOS))
    would die with PARQUET_TYPE_ILLEGAL. Both confs are runtime-settable.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # UTC so parquet TIMESTAMP values hash-match the DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Testdata timestamps are naive micros (isAdjustedToUTC=false). Read them
    # as TIMESTAMP (LTZ, wall-clock identical under the UTC session) instead
    # of TIMESTAMP_NTZ: streaming watermarks require LTZ, and LTZ matches the
    # round-2 semantics the whole engine + oracle suite was validated under.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every parquet table under ``sf_dir`` that exists.

    Cached per (SparkSession, sf_dir): the testdata dirs are immutable, and
    every one of the ~90 queries starts by loading the same 10 tables —
    without the cache each call re-reads parquet footers and re-runs schema
    inference (~100 ms of driver overhead per query, pure constant cost).
    The cache lives on the session object so it dies with the session and
    never leaks frames across sessions (DataFrames are session-bound).

    Failure isolation (round-1 lesson: an unreadable `events.parquet` took
    down all 50 graded queries, including ones that never touch events): a
    table that fails to load is SKIPPED with a warning instead of failing
    the whole catalog — a query actually using it still errors, with the
    root cause attached, but unrelated queries keep working.
    """
    cache: dict[str, dict[str, DataFrame]] = getattr(spark, "_graft_table_cache", None) or {}
    key = os.path.abspath(sf_dir)
    if key in cache:
        return dict(cache[key])  # shallow copy: callers may mutate the dict
    _ensure_session_confs(spark)
    out: dict[str, DataFrame] = {}
    errors: dict[str, Exception] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            try:
                df = spark.read.parquet(path)
                for col in _nanos_ts_columns(path):
                    df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
                out[name] = df
            except Exception as exc:  # noqa: BLE001 - isolate per-table failures
                errors[name] = exc
    if errors:
        if not out:
            # Every table failed: that's an environment/session problem (bad
            # conf, wrong dir), not one corrupt file — failing fast here beats
            # 50 confusing "table not found" errors downstream.
            raise RuntimeError(
                f"catalog: ALL tables under {sf_dir} failed to load; first error "
                f"({next(iter(errors))}): {next(iter(errors.values()))!r}"
            ) from next(iter(errors.values()))
        import warnings

        warnings.warn(
            "catalog: skipped unreadable tables "
            + "; ".join(f"{n}: {e!r}" for n, e in errors.items()),
            stacklevel=2,
        )
    if not errors:
        # Only cache fully-clean loads so a transient failure isn't sticky.
        cache[key] = dict(out)
        spark._graft_table_cache = cache
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view and return the frames.

    View registration is skipped when this session's views already point at
    ``sf_dir`` (tracked via an attribute on the session) — re-registering 10
    identical views per query is driver-side churn. Switching sf_dir in the
    same session re-registers, so views always reflect the last dir asked for.
    """
    tables = load_tables(spark, sf_dir)
    key = os.path.abspath(sf_dir)
    if getattr(spark, "_graft_views_for", None) != key:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
        # Only mark registration complete when every on-disk table loaded:
        # after a PARTIAL load (transient read failure) the next call must
        # retry registration, or the failed table's view would be missing
        # for the whole session (round-4 review finding — would regress the
        # round-1 failure-isolation lesson).
        expected = sum(
            os.path.exists(os.path.join(sf_dir, f"{n}.parquet"))
            for n in TABLES
        )
        if len(tables) == expected:
            spark._graft_views_for = key
    return tables
