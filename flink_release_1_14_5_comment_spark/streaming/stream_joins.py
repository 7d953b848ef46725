"""Stream-stream joins (SURVEY §2.3 streaming rows) — Spark-native.

* Regular streaming inner/outer join with watermark-bounded state —
  reference StreamingJoinOperator.java:36; Spark keeps both sides' state and
  purges by watermark: same semantics when a time bound exists. The
  reference's *unbounded* full-history join with retractions has no bounded
  equivalent — documented non-goal (needs TTL to be safe at scale anyway).
* Interval join (TimeIntervalJoin.java:51) — natively a stream-stream join
  whose condition carries the time band; state is pruned to the band width.
* Window join (WindowJoinOperator.java:66) — equality on `window(ts, size)`
  structs: both sides' state purges when the window closes.

These are thin, typed wrappers that enforce the watermark prerequisites
Spark requires (and Flink implies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: Column,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    left_delay: str = "0 seconds",
    right_delay: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """right.ts ∈ [left.ts - lower, left.ts + upper] on an equi-key.

    Both sides get watermarks; Spark derives state-retention bounds from the
    band (the reference's cleanup timers, TimeIntervalJoin cleanUpState).
    """
    l = left.withWatermark(left_ts, left_delay)
    r = right.withWatermark(right_ts, right_delay)
    cond = (
        key
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)


def window_join_stream(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    size: str,
    delay: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join rows that fall in the same tumbling window (reference
    WindowJoinOperator): equality on the window struct + keys.

    Output: w_start, w_end, key cols, then both sides' payload columns.
    The raw event-time columns are dropped — after the join the output would
    otherwise carry TWO watermarked columns, which Spark's watermark
    propagation rejects ("more than one event time column").
    """
    l = left.withWatermark(left_ts, delay).withColumn("__w", F.window(left_ts, size))
    r = right.withWatermark(right_ts, delay).withColumn("__w", F.window(right_ts, size))
    joined = l.join(r, ["__w", *key_cols], how)
    payload = [
        c for c in joined.columns
        if c not in {"__w", left_ts, right_ts, *key_cols}
    ]
    return joined.select(
        F.col("__w.start").alias("w_start"), F.col("__w.end").alias("w_end"),
        *key_cols, *payload,
    )
