"""Kafka DDL translation contract tests (VERDICT r3 next-round #3).

No broker/jar in this env, so these assert the TRANSLATION outputs exactly:
readStream/writeStream option maps per startup mode, value decode/encode
projections, and the upsert tombstone chain driven end-to-end on a
kafka-shaped static frame (key/value binary + partition/offset/timestamp),
composing into changelog_normalize (the reference's upsert-kafka →
ChangelogNormalize topology)."""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_release_1_14_5_comment_spark.streaming.kafka_translate import (
    apply_source_decode,
    decode_value,
    encode_value,
    sink_options,
    source_options,
    upsert_decode,
)

BASE = {
    "connector": "kafka",
    "topic": "orders",
    "properties.bootstrap.servers": "broker1:9092,broker2:9092",
    "format": "json",
}


def test_source_options_startup_modes():
    assert source_options(BASE) == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "orders",
        "startingOffsets": "latest",  # Flink default for plain kafka
    }
    o = source_options({**BASE, "scan.startup.mode": "earliest-offset"})
    assert o["startingOffsets"] == "earliest"
    o = source_options({**BASE, "scan.startup.mode": "timestamp",
                        "scan.startup.timestamp-millis": "1700000000000"})
    assert o["startingTimestamp"] == "1700000000000"
    o = source_options({
        **BASE, "scan.startup.mode": "specific-offsets",
        "scan.startup.specific-offsets": "partition:0,offset:42;partition:1,offset:300",
    })
    assert json.loads(o["startingOffsets"]) == {"orders": {"0": 42, "1": 300}}


def test_source_options_group_and_passthrough():
    o = source_options({
        **BASE, "scan.startup.mode": "group-offsets",
        "properties.group.id": "g1",
        "properties.max.poll.records": "250",
    })
    assert o["kafka.group.id"] == "g1"
    assert o["startingOffsets"] == "latest"  # checkpoint is the resume point
    assert o["kafka.max.poll.records"] == "250"


def test_upsert_kafka_defaults_to_earliest():
    o = source_options({**BASE, "connector": "upsert-kafka"})
    assert o["startingOffsets"] == "earliest"


def test_source_options_errors():
    with pytest.raises(ValueError, match="bootstrap"):
        source_options({"connector": "kafka", "topic": "t"})
    with pytest.raises(NotImplementedError):
        source_options({**BASE, "scan.startup.mode": "bogus-mode"})
    with pytest.raises(ValueError, match="not a kafka"):
        source_options({"connector": "filesystem"})


def test_sink_options_and_guarantee():
    assert sink_options(BASE) == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "topic": "orders",
    }
    with pytest.raises(NotImplementedError, match="exactly-once"):
        sink_options({**BASE, "sink.delivery-guarantee": "exactly-once"})
    # producer properties pass through like the source side (review finding)
    o = sink_options({**BASE, "properties.security.protocol": "SASL_SSL"})
    assert o["kafka.security.protocol"] == "SASL_SSL"


SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("amount", T.DoubleType()),
])


def _kafka_shaped(spark, rows):
    """(key_json, value_json_or_None, offset) → kafka source schema frame."""
    return spark.createDataFrame(
        [(k.encode() if k else None, v.encode() if v else None,
          "orders", 0, off, None) for k, v, off in rows],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp")


def test_json_value_decode_roundtrip(spark):
    raw = _kafka_shaped(spark, [
        ('{"id":1}', '{"id":1,"name":"a","amount":2.5}', 0),
        ('{"id":2}', '{"id":2,"name":"b","amount":-1.0}', 1),
    ])
    out = apply_source_decode(raw, SCHEMA, "json")
    assert out.columns == ["id", "name", "amount", "kafka_ts"]
    got = {(r.id, r.name, r.amount) for r in out.collect()}
    assert got == {(1, "a", 2.5), (2, "b", -1.0)}
    # encode inverts decode
    enc = out.select(encode_value(["id", "name", "amount"], "json"))
    back = {json.loads(bytes(r.value).decode())["name"] for r in enc.collect()}
    assert back == {"a", "b"}


def test_upsert_tombstone_chain(spark):
    """upsert records incl. a null-value tombstone → op column → keyed
    normalize (latest per key, deletes drop) — the full reference chain."""
    key_schema = T.StructType([T.StructField("id", T.LongType())])
    val_schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ])
    raw = _kafka_shaped(spark, [
        ('{"id":1}', '{"name":"a","amount":1.0}', 0),
        ('{"id":2}', '{"name":"b","amount":2.0}', 1),
        ('{"id":1}', '{"name":"a2","amount":9.0}', 2),  # update id=1
        ('{"id":2}', None, 3),                          # tombstone id=2
    ])
    chg = upsert_decode(raw, key_schema, val_schema)
    assert {"id", "name", "amount", "op", "kafka_offset", "kafka_ts"} <= set(chg.columns)
    rows = sorted(chg.collect(), key=lambda r: r.kafka_offset)
    assert [r.op for r in rows] == ["+U", "+U", "+U", "-D"]
    # materialize: latest +U per key wins; -D removes the key
    from flink_release_1_14_5_comment_spark.streaming.changelog import (
        changelog_normalize,
    )

    final = changelog_normalize(
        chg.withColumnRenamed("op", "__rowkind"), ["id"], "kafka_offset")
    got = {(r.id, r.name, r.amount) for r in final.collect()}
    assert got == {(1, "a2", 9.0)}


def test_csv_and_raw_formats(spark):
    raw = _kafka_shaped(spark, [(None, "7,x,1.5", 0)])
    out = apply_source_decode(raw, SCHEMA, "csv")
    r = out.collect()[0]
    assert (r.id, r.name, r.amount) == (7, "x", 1.5)
    one = T.StructType([T.StructField("body", T.StringType())])
    out = apply_source_decode(_kafka_shaped(spark, [(None, "hello", 0)]), one, "raw")
    assert out.collect()[0].body == "hello"
    with pytest.raises(NotImplementedError, match="avro"):
        decode_value(SCHEMA, "avro")
