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
