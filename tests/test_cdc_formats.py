"""CDC changelog-format decoders (streaming/cdc_formats.py; reference
flink-json debezium/canal/maxwell DeserializationSchemas) — crafted
envelope fixtures asserting the exact emitted changelog, plus the chain
into changelog_normalize (decode → normalize == current table state)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.streaming.cdc_formats import (
    canal_decode,
    debezium_decode,
    maxwell_decode,
)

SCHEMA = "id BIGINT, name STRING"


def _rows(df):
    return [(r["__rowkind"], r["id"], r["name"]) for r in df.collect()]


def test_debezium_decode_ops(spark):
    payloads = [
        '{"before": null, "after": {"id": 1, "name": "a"}, "op": "c"}',
        '{"before": null, "after": {"id": 2, "name": "b"}, "op": "r"}',
        '{"before": {"id": 1, "name": "a"}, "after": {"id": 1, "name": "a2"}, "op": "u"}',
        '{"before": {"id": 2, "name": "b"}, "after": null, "op": "d"}',
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "value string")
    got = _rows(debezium_decode(df, "value", SCHEMA))
    assert got == [
        ("+I", 1, "a"), ("+I", 2, "b"),
        ("-U", 1, "a"), ("+U", 1, "a2"),
        ("-D", 2, "b"),
    ]


def test_debezium_schema_include_envelope(spark):
    wrapped = (
        '{"schema": {"type": "struct"}, "payload": '
        '{"before": null, "after": {"id": 7, "name": "x"}, "op": "c"}}'
    )
    df = spark.createDataFrame([(wrapped,)], "value string")
    assert _rows(debezium_decode(df, "value", SCHEMA)) == [("+I", 7, "x")]


def test_canal_decode_with_partial_old(spark):
    """canal's `old` rows carry only CHANGED fields — the -U row patches
    them onto the new row (id unchanged → null in old → taken from data)."""
    payloads = [
        '{"data": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}], '
        '"old": null, "type": "INSERT"}',
        '{"data": [{"id": 1, "name": "a2"}], '
        '"old": [{"name": "a"}], "type": "UPDATE"}',
        '{"data": [{"id": 2, "name": "b"}], "old": null, "type": "DELETE"}',
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "value string")
    got = _rows(canal_decode(df, "value", SCHEMA))
    assert got == [
        ("+I", 1, "a"), ("+I", 2, "b"),
        ("-U", 1, "a"), ("+U", 1, "a2"),
        ("-D", 2, "b"),
    ]


def test_maxwell_decode(spark):
    payloads = [
        '{"data": {"id": 1, "name": "a"}, "old": null, "type": "insert"}',
        '{"data": {"id": 1, "name": "a2"}, "old": {"name": "a"}, "type": "update"}',
        '{"data": {"id": 1, "name": "a2"}, "old": null, "type": "delete"}',
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "value string")
    got = _rows(maxwell_decode(df, "value", SCHEMA))
    assert got == [
        ("+I", 1, "a"),
        ("-U", 1, "a"), ("+U", 1, "a2"),
        ("-D", 1, "a2"),
    ]


def test_decode_chains_into_changelog_normalize(spark):
    """decode → changelog_normalize reproduces the table's current state —
    the reference's upsert-source → ChangelogNormalize chain, CDC edition."""
    from pyspark.sql import functions as F

    from flink_release_1_14_5_comment_spark.streaming.changelog import (
        changelog_normalize,
    )

    payloads = [
        '{"before": null, "after": {"id": 1, "name": "a"}, "op": "c"}',
        '{"before": null, "after": {"id": 2, "name": "b"}, "op": "c"}',
        '{"before": {"id": 1, "name": "a"}, "after": {"id": 1, "name": "a2"}, "op": "u"}',
        '{"before": {"id": 2, "name": "b"}, "after": null, "op": "d"}',
        '{"before": null, "after": {"id": 3, "name": "c"}, "op": "c"}',
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "seq long, value string")
    decoded = debezium_decode(df.select("value"), "value", SCHEMA) \
        .withColumn("seq", F.monotonically_increasing_id())
    state = {(r.id, r.name)
             for r in changelog_normalize(decoded, ["id"], "seq").collect()}
    assert state == {(1, "a2"), (3, "c")}


def test_canal_parameterized_types(spark):
    """ADVICE r4: parameterized types (DECIMAL(10,2), ARRAY<...>) in the
    payload schema must not mis-split field names (the reference's Canal
    decoder takes a real RowType, so any DDL-expressible type works)."""
    schema = "id BIGINT, price DECIMAL(10,2), tags ARRAY<STRING>, name STRING"
    payloads = [
        '{"data": [{"id": 1, "price": 9.50, "tags": ["x"], "name": "a"}], '
        '"old": null, "type": "INSERT"}',
        '{"data": [{"id": 1, "price": 10.25, "tags": ["x"], "name": "a"}], '
        '"old": [{"price": 9.50}], "type": "UPDATE"}',
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "value string")
    got = [(r["__rowkind"], r["id"], str(r["price"]), r["tags"], r["name"])
           for r in canal_decode(df, "value", schema).collect()]
    assert got == [
        ("+I", 1, "9.50", ["x"], "a"),
        ("-U", 1, "9.50", ["x"], "a"),
        ("+U", 1, "10.25", ["x"], "a"),
    ]


def test_maxwell_parameterized_types(spark):
    schema = "id BIGINT, m MAP<STRING, INT>"
    payloads = ['{"data": {"id": 1, "m": {"k": 2}}, "type": "insert"}']
    df = spark.createDataFrame([(p,) for p in payloads], "value string")
    got = [(r["__rowkind"], r["id"], dict(r["m"]))
           for r in maxwell_decode(df, "value", schema).collect()]
    assert got == [("+I", 1, {"k": 2})]


def test_unknown_op_raises_by_default(spark):
    """ADVICE r4: malformed/unknown envelopes must surface, not vanish —
    the reference deserializers throw unless ignore-parse-errors is set."""
    import pytest

    bad = '{"before": null, "after": {"id": 1, "name": "a"}, "op": "zz"}'
    df = spark.createDataFrame([(bad,)], "value string")
    with pytest.raises(Exception) as ei:
        debezium_decode(df, "value", SCHEMA).collect()
    assert "unknown or unparseable envelope" in str(ei.value)
    # opt-out matches the reference's ignore-parse-errors: record dropped
    assert debezium_decode(df, "value", SCHEMA,
                           ignore_parse_errors=True).count() == 0


def test_unknown_op_raises_canal_maxwell(spark):
    import pytest

    df = spark.createDataFrame(
        [('{"data": [{"id": 1, "name": "a"}], "old": null, "type": "TRUNCATE"}',)],
        "value string")
    with pytest.raises(Exception) as ei:
        canal_decode(df, "value", SCHEMA).collect()
    assert "unknown or unparseable envelope" in str(ei.value)
    assert canal_decode(df, "value", SCHEMA, ignore_parse_errors=True).count() == 0

    df2 = spark.createDataFrame(
        [('{"data": {"id": 1, "name": "a"}, "type": "bootstrap-start"}',)],
        "value string")
    with pytest.raises(Exception):
        maxwell_decode(df2, "value", SCHEMA).collect()
    assert maxwell_decode(df2, "value", SCHEMA, ignore_parse_errors=True).count() == 0
