"""Streaming window aggregations (SURVEY §2.4 group-window / window-TVF).

The window *expressions* are shared with the batch module
(operators/time_windows.py) — `F.window` / `F.session_window` are valid in
both modes, Flink's unified TVF story. This module binds them to watermarks
and output modes:

  * append mode + watermark → emit once when the window closes
    (Flink: EventTimeTriggers.afterEndOfWindow, the SQL default)
  * update mode → emit refinements per micro-batch
    (Flink: early-fire enabled / OnElement trigger)

CUMULATE reuses the explode-based assigner from the batch module; with a
watermark it behaves like the reference's cumulative windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.operators.time_windows import cumulate  # noqa: F401  (re-export)


def _windowed_agg(df: DataFrame, window_expr: Column, keys: list[str], aggs: list[Column]) -> DataFrame:
    out = df.groupBy(window_expr.alias("w"), *keys).agg(*aggs)
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), *rest
    )


def tumble_agg(df: DataFrame, ts_col: str, size: str, keys: list[str],
               aggs: list[Column], delay: str = "0 seconds") -> DataFrame:
    """TUMBLE windowed aggregate with watermark."""
    return _windowed_agg(df.withWatermark(ts_col, delay), F.window(ts_col, size), keys, aggs)


def hop_agg(df: DataFrame, ts_col: str, size: str, slide: str, keys: list[str],
            aggs: list[Column], delay: str = "0 seconds") -> DataFrame:
    """HOP (sliding) windowed aggregate with watermark."""
    return _windowed_agg(df.withWatermark(ts_col, delay), F.window(ts_col, size, slide), keys, aggs)


def session_agg(df: DataFrame, ts_col: str, gap: str, keys: list[str],
                aggs: list[Column], delay: str = "0 seconds") -> DataFrame:
    """SESSION windowed aggregate with watermark (merging windows)."""
    return _windowed_agg(df.withWatermark(ts_col, delay), F.session_window(ts_col, gap), keys, aggs)


def session_agg_dynamic_gap(df: DataFrame, ts_col: str, gap_expr: Column,
                            keys: list[str], aggs: list[Column],
                            delay: str = "0 seconds") -> DataFrame:
    """SESSION window with a PER-ELEMENT gap (reference
    DynamicEventTimeSessionWindows / SessionWindowTimeGapExtractor in
    flink-streaming-java windowing/assigners): the merge gap is computed
    from each row — e.g. longer idle tolerance for high-value events.
    Spark's session_window accepts a Column gap natively (an interval
    expression per row), so this maps 1:1 with zero custom state."""
    return _windowed_agg(
        df.withWatermark(ts_col, delay), F.session_window(ts_col, gap_expr), keys, aggs
    )


def cascade_tumble_agg(
    df: DataFrame,
    ts_col: str,
    inner_size: str,
    outer_size: str,
    keys: list[str],
    inner_aggs: list[Column],
    outer_aggs: list[Column],
    delay: str = "0 seconds",
) -> DataFrame:
    """Hierarchical (cascading) window rollup: a fine tumble aggregate feeds
    a coarse one IN THE SAME streaming query — the standard Flink topology
    for multi-resolution dashboards (1-min panel rolled into 1-h panel),
    where the coarse level aggregates pre-aggregated rows instead of raw
    events (state and shuffle shrink by the fine-window fan-in).

    Flink chains these through retracting window operators; Spark supports
    chained stateful window aggregations in append mode when the outer
    groups on the inner's window STRUCT column (the event-time watermark
    propagates through it). Both levels emit once on window close.

    ``outer_aggs`` aggregate the inner's output columns (e.g. sum of the
    inner sums, sum of the inner counts)."""
    inner = (
        df.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, inner_size).alias("w"), *keys)
        .agg(*inner_aggs)
    )
    outer = inner.groupBy(F.window(F.col("w"), outer_size).alias("w2"), *keys).agg(
        *outer_aggs
    )
    rest = [c for c in outer.columns if c != "w2"]
    return outer.select(
        F.col("w2.start").alias("w_start"), F.col("w2.end").alias("w_end"), *rest
    )
