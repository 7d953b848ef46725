"""Rowtime / watermark translation (SURVEY §2.2 watermark assigner).

Flink: ``WATERMARK FOR ts AS ts - INTERVAL '5' SECOND`` declares an event-time
attribute with bounded out-of-orderness (WatermarkStrategy.java:154,
WatermarkAssignerOperator.java). Spark: ``df.withWatermark(col, delay)`` —
the delay string IS the bound. Monotonous timestamps = delay '0 seconds'.

Semantic differences (documented, by design):
  * Flink watermarks advance per-record and can be punctuated; Spark advances
    the watermark once per micro-batch from the batch's max event time.
  * Flink idleness (WatermarkStrategy.withIdleness) has no Spark equivalent —
    an idle partition stalls the watermark until data arrives.
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
