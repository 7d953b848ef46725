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


def test_continuous_event_time_trigger(spark):
    """ContinuousEventTimeTrigger: early fires at aligned interval
    boundaries as the watermark crosses them, accumulating contents, then a
    purging final fire at window close."""
    from flink_release_1_14_5_comment_spark.streaming.evictors import (
        tumble_agg_continuous_event_time_trigger,
    )

    # window 60s, early-fire interval 20s; batches split by ts so the
    # watermark steps 25 -> 55 -> 70 -> 130 across four micro-batches
    rows = [
        (1, _ts(5), 1.0), (1, _ts(25), 2.0),     # batch 1 (wm after: 25)
        (1, _ts(55), 4.0),                       # batch 2 (wm after: 55)
        (1, _ts(70), 8.0),                       # batch 3 (wm after: 70)
        (1, _ts(130), 16.0),                     # batch 4 (wm after: 130)
    ]
    s, tmp = _stream(spark, rows, n_chunks=4)
    try:
        out = tumble_agg_continuous_event_time_trigger(
            s, ["k"], "ts", "value", size="1 minute", interval="20 seconds")
        got = sorted(
            ((r.w_start - _ts(0)).total_seconds(),
             (r.fire_time - _ts(0)).total_seconds(),
             r.n_elems, r.sum_value, r.final)
            for r in _mem(out).collect())
        assert got == [
            # window [0,60): the batch carrying row 55 runs under wm=25
            # (the watermark trails the data by one batch) so the 20s
            # boundary fires with contents {1,2,4} — same as Flink, where
            # the wm=25 watermark arrives after the ts=55 element; then
            # wm=55 crosses 40, and wm=70 closes the window
            (0.0, 20.0, 3, 7.0, False),
            (0.0, 40.0, 3, 7.0, False),
            (0.0, 60.0, 3, 7.0, True),
            # window [60,120): first element 70 -> timer 80; the final
            # watermark (130) reaches the key via the event-time TIMEOUT
            # (no further rows): fires 80/100 of {8}, then closes
            (60.0, 80.0, 1, 8.0, False),
            (60.0, 100.0, 1, 8.0, False),
            (60.0, 120.0, 1, 8.0, True),
            # window [120,180) never closes (stream ends) — no output
        ]
    finally:
        sources.cleanup(tmp)


def test_processing_timeout_trigger_fires_on_idle(spark, tmp_path):
    """ProcessingTimeoutTrigger: keys flush after wall-clock idleness.
    Content is asserted exactly; the firing INSTANT is wall-clock (that's
    the trigger's definition), so the test polls with a generous bound."""
    import time

    from flink_release_1_14_5_comment_spark.streaming.evictors import (
        processing_timeout_agg,
    )

    rows = [(1, _ts(0), 10.0), (1, _ts(1), 11.0), (2, _ts(2), 5.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, value double")
    d = str(tmp_path / "pt_src")
    df.coalesce(1).write.parquet(d)
    stream = spark.readStream.schema(df.schema).parquet(d)
    out = processing_timeout_agg(stream, ["k"], "value", timeout_ms=1500)
    name = "pt" + uuid.uuid4().hex[:8]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(processingTime="500 milliseconds")
         .start())
    try:
        deadline = time.time() + 120
        got = {}
        while time.time() < deadline and len(got) < 2:
            got = {r.k: (r.n_rows, r.sum_value)
                   for r in spark.table(name).collect()}
            time.sleep(1)
        assert got == {1: (2, 21.0), 2: (1, 5.0)}
        # idle keys cleared on timeout: nothing fires twice
        time.sleep(4)
        assert spark.table(name).count() == 2
    finally:
        q.stop()
