"""Idleness + punctuated-watermark emulations (SURVEY §2.9 watermark rows;
reference WatermarkStrategy.java:133,169, StatusWatermarkValve.java).

`idle_tolerant_union`: empirical proof that with the default min-combine an
idle input pins the global watermark (no windows close — Flink's exact
pre-idleness pathology), and with the max policy the active input's windows
fire — the behavior withIdleness restores.

`PunctuatedSplitter`: watermark advances ONLY on marker rows; data behind a
punctuated watermark routes to the late side.
"""

from __future__ import annotations

import datetime
import sys
import uuid

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.streaming.watermarks import (
    PunctuatedSplitter,
    idle_tolerant_union,
)

TS = datetime.datetime


def _file_stream(spark, rows, path: str):
    spark.createDataFrame(rows, "ts timestamp, v int").write.parquet(path)
    return spark.readStream.schema("ts timestamp, v int").parquet(path)


def _run_windowed(spark, sdf, timeout_s: int = 120):
    agg = (sdf.groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count(F.lit(1)).alias("n")))
    name = "iq" + uuid.uuid4().hex[:10]
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(timeout_s)
    return {(r["w"]["start"].hour, r["n"])
            for r in spark.table(name).collect()}


@pytest.fixture()
def two_sources(spark, tmp_path):
    """Active source: hours 10 and 11. Idle source: one old row at hour 0
    (its watermark stalls at 00:xx, like a Flink source gone quiet)."""
    active = _file_stream(
        spark,
        [(TS(2024, 1, 1, 10, 5), 1), (TS(2024, 1, 1, 10, 45), 2),
         (TS(2024, 1, 1, 11, 10), 3), (TS(2024, 1, 1, 11, 50), 4)],
        str(tmp_path / "active"))
    idle = _file_stream(spark, [(TS(2024, 1, 1, 0, 10), 9)],
                        str(tmp_path / "idle"))
    return (active.withWatermark("ts", "0 seconds"),
            idle.withWatermark("ts", "0 seconds"))


def test_min_policy_idle_source_stalls_watermark(spark, two_sources):
    """Baseline pathology: min-combine pins the watermark at the idle
    source's 00:10, so NO window (not even the active source's hour-10) has
    end <= watermark — append mode emits nothing."""
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "min")
    try:
        active, idle = two_sources
        assert _run_windowed(spark, active.unionByName(idle)) == set()
    finally:
        spark.conf.unset("spark.sql.streaming.multipleWatermarkPolicy")


def test_idle_tolerant_union_lets_active_windows_fire(spark, two_sources):
    """With the idleness emulation the watermark follows the ACTIVE input
    (11:50): hour-10 closes and emits; hour-11 stays open (end 12:00 >
    watermark) exactly as Flink would hold the in-flight window; the idle
    source's old hour-0 row emits too (behind the advanced watermark —
    Flink's documented idleness trade-off applies to later arrivals)."""
    active, idle = two_sources
    try:
        union = idle_tolerant_union(spark, active, idle)
        assert _run_windowed(spark, union) == {(10, 2), (0, 1)}
    finally:
        spark.conf.unset("spark.sql.streaming.multipleWatermarkPolicy")


def test_punctuated_splitter(spark, tmp_path):
    """Watermark advances only on marker rows; between punctuations it is
    frozen regardless of data timestamps (WatermarkGenerator.onEvent)."""
    on_time: list[tuple[int, int]] = []
    late: list[tuple[int, int]] = []
    split = PunctuatedSplitter(
        "wm",
        lambda df, bid: on_time.extend((bid, r["v"]) for r in df.collect()),
        lambda df, bid: late.extend((bid, r["v"]) for r in df.collect()),
        ts_col="ts",
    )
    schema = "ts timestamp, v int, wm timestamp"

    def batch(rows, bid):
        split(spark.createDataFrame(rows, schema), bid)

    # batch 0: data + a punctuation at 10:00
    batch([(TS(2024, 1, 1, 9, 0), 1, None),
           (None, 0, TS(2024, 1, 1, 10, 0))], 0)
    # batch 1: 9:30 is behind the punctuated 10:00 watermark -> late;
    # 10:30 on time; no new marker, so watermark stays 10:00
    batch([(TS(2024, 1, 1, 9, 30), 2, None),
           (TS(2024, 1, 1, 10, 30), 3, None)], 1)
    # batch 2: still 10:00 watermark (frozen without punctuation): 9:45 late
    batch([(TS(2024, 1, 1, 9, 45), 4, None)], 2)

    assert on_time == [(0, 1), (1, 3)]
    assert late == [(1, 2), (2, 4)]
    assert split.watermark == TS(2024, 1, 1, 10, 0)
