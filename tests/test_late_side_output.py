"""Late-data side output (streaming/watermarks.LateDataSplitter; reference
WindowedStream.sideOutputLateData) — scripted replay where a later
micro-batch carries an event older than the advanced watermark."""

from __future__ import annotations

import datetime
import sys

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.watermarks import LateDataSplitter


def _ts(minute):
    return datetime.datetime(2024, 6, 1, 10, minute)


def test_late_rows_routed_to_side_output(spark):
    # chunk 1: events at 10:00..10:30  → wm after batch = 10:20 (10m delay)
    # chunk 2: event at 10:05 (LATE: < 10:20) + event at 10:40 (on time)
    rows = [
        (1, _ts(0), 1), (2, _ts(30), 1),     # ordered first by __seq
        (3, _ts(5), 2), (4, _ts(40), 2),     # second batch
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, __seq long")
    stream, tmp = sources.replay_as_stream(spark, df, n_chunks=2, order_col="__seq")
    main, late = [], []
    splitter = LateDataSplitter(
        "ts", "10 minutes",
        on_time_fn=lambda d, _i: main.extend(r.event_id for r in d.collect()),
        late_fn=lambda d, _i: late.extend(r.event_id for r in d.collect()),
    )
    try:
        q = (stream.writeStream.foreachBatch(splitter)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert sorted(late) == [3]
        assert sorted(main) == [1, 2, 4]
        # watermark ended at max ts - delay
        assert splitter.watermark == _ts(30)
    finally:
        sources.cleanup(tmp)


def test_no_late_when_in_order(spark):
    rows = [(i, _ts(i), i) for i in range(0, 50, 10)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, __seq long")
    stream, tmp = sources.replay_as_stream(spark, df, n_chunks=3, order_col="__seq")
    main, late = [], []
    splitter = LateDataSplitter(
        "ts", "0 seconds",
        on_time_fn=lambda d, _i: main.extend(r.event_id for r in d.collect()),
        late_fn=lambda d, _i: late.extend(r.event_id for r in d.collect()),
    )
    try:
        q = (stream.writeStream.foreachBatch(splitter)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert late == []
        assert sorted(main) == [0, 10, 20, 30, 40]
    finally:
        sources.cleanup(tmp)
