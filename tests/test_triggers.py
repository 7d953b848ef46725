"""DeltaTrigger / PurgingTrigger emulations (streaming/evictors.py;
reference DeltaTrigger.java, PurgingTrigger.java, CountTrigger.java) —
scripted-arrival harness tests asserting the exact fire sequence."""

from __future__ import annotations

import datetime
import sys
import uuid

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.evictors import (
    delta_trigger_stream,
    tumble_agg_purging_count_trigger,
)


def _mem(sdf):
    name = "t" + uuid.uuid4().hex[:10]
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return sdf.sparkSession.table(name)


def _ts(sec):
    return datetime.datetime(2024, 5, 1, 0, 0, 0) + datetime.timedelta(seconds=sec)


def _stream(spark, rows, n_chunks=2):
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double")
    return sources.replay_as_stream(spark, df, n_chunks=n_chunks, order_col="ts")


DELTA_ROWS = [
    (1, _ts(0), 10.0), (1, _ts(10), 11.0), (1, _ts(20), 15.0),
    (1, _ts(30), 16.0), (1, _ts(40), 22.0),
]


def test_delta_trigger_fires_on_threshold(spark):
    s, tmp = _stream(spark, DELTA_ROWS)
    try:
        out = delta_trigger_stream(s, ["k"], "ts", "value", threshold=4.0)
        rows = sorted(_mem(out).collect(), key=lambda r: r.fire_ts)
        # fires at 15 (|15-10|=5) over [10,11,15], then at 22 (|22-15|=7)
        # over the full un-purged buffer [10,11,15,16,22]
        assert [(r.n_buffered, r.sum_value, r.trigger_value) for r in rows] == \
            [(3, 36.0, 15.0), (5, 74.0, 22.0)]
    finally:
        sources.cleanup(tmp)


def test_delta_trigger_with_purge(spark):
    s, tmp = _stream(spark, DELTA_ROWS)
    try:
        out = delta_trigger_stream(s, ["k"], "ts", "value", threshold=4.0,
                                   purge=True)
        rows = sorted(_mem(out).collect(), key=lambda r: r.fire_ts)
        # purge clears the buffer at each fire: second fire covers [16,22]
        assert [(r.n_buffered, r.sum_value, r.trigger_value) for r in rows] == \
            [(3, 36.0, 15.0), (2, 38.0, 22.0)]
    finally:
        sources.cleanup(tmp)


def test_purging_count_trigger_partial_and_final_fires(spark):
    rows = [
        (1, _ts(0), 1.0), (1, _ts(10), 2.0), (1, _ts(20), 3.0),
        (1, _ts(30), 4.0), (1, _ts(50), 5.0),
        (1, _ts(300), 99.0),  # later window: advances the watermark
    ]
    s, tmp = _stream(spark, rows, n_chunks=2)
    try:
        out = tumble_agg_purging_count_trigger(
            s, ["k"], "ts", "value", size="60 seconds", n_fire=2)
        got = sorted(
            ((r.fire_seq, r.n_in_fire, r.sum_value, r.final)
             for r in _mem(out).collect() if r.w_start == _ts(0)),
        )
        # fires every 2 elements (purged), remainder fires at window close
        assert got == [(1, 2, 3.0, False), (2, 2, 7.0, False),
                       (3, 1, 5.0, True)]
    finally:
        sources.cleanup(tmp)


def test_purging_count_trigger_empty_final_suppressed(spark):
    """A window whose every element was consumed by count-fires must NOT
    emit an empty final row."""
    rows = [
        (1, _ts(0), 1.0), (1, _ts(10), 2.0),   # exactly one count-fire
        (1, _ts(300), 9.0),                    # watermark push
    ]
    s, tmp = _stream(spark, rows, n_chunks=2)
    try:
        out = tumble_agg_purging_count_trigger(
            s, ["k"], "ts", "value", size="60 seconds", n_fire=2)
        got = [(r.fire_seq, r.n_in_fire, r.final)
               for r in _mem(out).collect() if r.w_start == _ts(0)]
        assert got == [(1, 2, False)]
    finally:
        sources.cleanup(tmp)


def test_purging_count_trigger_fired_count_survives_empty_batches(spark):
    """Round-4 review finding: a window emptied by a count-fire must keep
    its fired count across micro-batches with no rows for that window, so a
    late-but-in-watermark straggler continues fire_seq instead of
    restarting at 1."""
    rows = [
        (1, _ts(0), 1.0, 1), (1, _ts(10), 2.0, 2),   # W0: count-fire, purged
        (1, _ts(70), 10.0, 3),                       # other window, W0 empty
        (1, _ts(50), 5.0, 4),                        # straggler back into W0
        (1, _ts(300), 99.0, 5),                      # watermark push
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double, __seq long")
    s, tmp = sources.replay_as_stream(spark, df, n_chunks=3, order_col="__seq")
    try:
        out = tumble_agg_purging_count_trigger(
            s, ["k"], "ts", "value", size="60 seconds", n_fire=2,
            delay="2 minutes")
        got = sorted(
            (r.fire_seq, r.n_in_fire, r.sum_value, r.final)
            for r in _mem(out).collect() if r.w_start == _ts(0))
        assert got == [(1, 2, 3.0, False), (2, 1, 5.0, True)]
    finally:
        sources.cleanup(tmp)
