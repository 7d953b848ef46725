"""Rowtime / watermark translation (SURVEY §2.2 watermark assigner).

Flink: ``WATERMARK FOR ts AS ts - INTERVAL '5' SECOND`` declares an event-time
attribute with bounded out-of-orderness (WatermarkStrategy.java:154,
WatermarkAssignerOperator.java). Spark: ``df.withWatermark(col, delay)`` —
the delay string IS the bound. Monotonous timestamps = delay '0 seconds'.

Semantic differences (documented, by design):
  * Flink watermarks advance per-record and can be punctuated; Spark advances
    the watermark once per micro-batch from the batch's max event time.
    Punctuated emulation at micro-batch granularity: `PunctuatedSplitter`
    below derives the watermark from explicit marker rows in the stream
    itself (reference WatermarkGenerator.onEvent, WatermarkStrategy.java:133)
    instead of max-event-time-minus-delay.
  * Flink idleness (WatermarkStrategy.withIdleness,
    WatermarkStrategy.java:169): an idle SOURCE would stall the combined
    watermark (min across inputs, StatusWatermarkValve.java) until marked
    idle. Spark equivalent for the multi-input case:
    `idle_tolerant_union` below — `spark.sql.streaming.multipleWatermarkPolicy
    = max` makes the global watermark follow the FASTEST input, so an idle
    source stops holding back event-time progress, with the same caveat
    Flink documents (data later arriving on the idle source may be late).
    Within a single source Spark has no per-partition watermarks, so
    per-partition idleness is structurally moot (one combined watermark per
    source node).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_INTERVAL_RE = re.compile(
    r"WATERMARK\s+FOR\s+(\w+)\s+AS\s+\1\s*-\s*INTERVAL\s*'([\d.]+)'\s*(\w+)",
    re.IGNORECASE,
)


def with_rowtime(df: DataFrame, ts_col: str, delay: str = "0 seconds") -> DataFrame:
    """Declare `ts_col` as the event-time attribute with bounded lateness."""
    return df.withWatermark(ts_col, delay)


def parse_watermark_ddl(clause: str) -> tuple[str, str]:
    """Translate a Flink WATERMARK DDL clause into (col, spark_delay).

    >>> parse_watermark_ddl("WATERMARK FOR ts AS ts - INTERVAL '5' SECOND")
    ('ts', '5 second')
    """
    m = _INTERVAL_RE.search(clause)
    if not m:
        raise ValueError(f"unsupported WATERMARK clause: {clause!r}")
    col, n, unit = m.groups()
    return col, f"{n} {unit.lower()}"


def idle_tolerant_union(spark, *streams: DataFrame) -> DataFrame:
    """Union event-time streams so an IDLE input can't stall the watermark.

    Reference: ``WatermarkStrategy.withIdleness`` (WatermarkStrategy.java:169)
    — a source emitting no data is marked idle and excluded from the min
    combine (StatusWatermarkValve.java), letting the active sources' windows
    keep firing. Spark-first equivalent: each input keeps its own
    ``withWatermark`` node and the session's ``multipleWatermarkPolicy`` is
    set to ``max``, so the GLOBAL watermark tracks the fastest input rather
    than being pinned by the stalled one.

    The conf is read at QUERY START (it applies to every watermark combine
    in queries started afterwards) — call this before ``writeStream.start``.
    Trade-off is identical to Flink's idleness: rows that later arrive on
    the idle/slow input behind the advanced watermark are treated as late.

    Scale: a union is a no-shuffle narrow op; watermark combination is
    per-batch driver metadata, so this costs nothing at any input size.
    """
    if not streams:
        raise ValueError("idle_tolerant_union needs at least one stream")
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    return out


class PunctuatedSplitter:
    """Punctuated watermarks at micro-batch granularity (reference
    ``WatermarkGenerator.onEvent`` / punctuated strategy,
    WatermarkStrategy.java:133): the watermark comes from explicit MARKER
    rows carried in the stream itself, not from max-event-time-minus-delay.

    A ``foreachBatch`` handler (same driver-held-watermark pattern as
    `LateDataSplitter`): rows where ``marker_col`` is non-null punctuate —
    after each batch the watermark jumps to the max marker value seen; data
    rows older than the watermark established by PREVIOUS batches are routed
    to ``late_fn``, the rest (markers stripped) to ``on_time_fn``. With no
    markers the watermark never advances — exactly Flink's punctuated
    contract (no timers fire until a punctuation arrives).

    The marker max per batch is one JVM-side aggregate; the split is two
    filters on one persisted scan — no state store, no extra shuffle.
    """

    def __init__(self, marker_col: str, on_time_fn, late_fn, ts_col: str):
        self.marker_col = marker_col
        self.ts_col = ts_col
        self.on_time_fn = on_time_fn
        self.late_fn = late_fn
        self.watermark = None  # driver-held, from punctuation rows only

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import pyspark.sql.functions as F  # local: foreachBatch pickles self

        mk, ts = self.marker_col, self.ts_col
        batch_df.persist()
        try:
            data = batch_df.filter(F.col(mk).isNull()).drop(mk)
            if self.watermark is not None:
                late = data.filter(F.col(ts) < F.lit(self.watermark))
                on_time = data.filter(F.col(ts) >= F.lit(self.watermark))
            else:
                late, on_time = None, data
            if late is not None and not late.isEmpty():
                self.late_fn(late, batch_id)
            self.on_time_fn(on_time, batch_id)
            mx = batch_df.agg(F.max(mk)).first()[0]
            if mx is not None and (self.watermark is None or mx > self.watermark):
                self.watermark = mx
        finally:
            batch_df.unpersist()


class LateDataSplitter:
    """Late-data side output (reference `WindowedStream.sideOutputLateData` /
    `WindowOperator.java` late-element routing; SURVEY §2.9 "late
    side-output" row): Spark drops late rows silently inside stateful
    operators, so the split must happen BEFORE them — this is a
    `foreachBatch` handler that routes each micro-batch into on-time vs late
    against a driver-held watermark.

    Watermark semantics match BoundedOutOfOrdernessWatermarks at micro-batch
    granularity: after each batch, wm = max(event time seen) - delay; a row
    in a later batch is LATE iff its ts < the watermark BEFORE that batch
    (Flink advances watermarks between records; Spark between batches — the
    same rule Spark's own stateful operators apply when discarding input).

    `on_time_fn(df, batch_id)` and `late_fn(df, batch_id)` receive the two
    slices (late_fn only when late rows exist). The watermark is a single
    driver scalar — no state store, no extra shuffle; the max() per batch is
    a cheap JVM-side aggregate.

    Usage::

        splitter = LateDataSplitter("ts", "10 minutes", main_fn, late_fn)
        df.writeStream.foreachBatch(splitter).start()
    """

    def __init__(self, ts_col: str, delay: str, on_time_fn, late_fn):
        from flink_release_1_14_5_comment_spark.streaming.evictors import (
            _parse_seconds,
        )

        self.ts_col = ts_col
        self.delay_s = _parse_seconds(delay)
        self.on_time_fn = on_time_fn
        self.late_fn = late_fn
        self.watermark = None  # event-time watermark (a datetime), driver-held

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import pyspark.sql.functions as F  # local: foreachBatch pickles self

        ts = self.ts_col
        # one scan: the split + both callbacks + the max() would otherwise
        # each re-read the batch's source files
        batch_df.persist()
        try:
            if self.watermark is not None:
                late = batch_df.filter(F.col(ts) < F.lit(self.watermark))
                on_time = batch_df.filter(F.col(ts) >= F.lit(self.watermark))
            else:
                late, on_time = None, batch_df
            if late is not None and not late.isEmpty():
                self.late_fn(late, batch_id)
            self.on_time_fn(on_time, batch_id)
            import datetime

            mx = batch_df.agg(F.max(ts)).first()[0]
            if mx is not None:
                new_wm = mx - datetime.timedelta(seconds=self.delay_s)
                if self.watermark is None or new_wm > self.watermark:
                    self.watermark = new_wm
        finally:
            batch_df.unpersist()
