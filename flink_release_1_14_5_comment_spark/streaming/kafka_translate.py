"""Kafka DDL → Structured Streaming translation (SURVEY §2.1 Kafka rows).

Reference: flink-connectors/flink-connector-kafka
`KafkaDynamicTableFactory.java` (option surface), `KafkaSource.java:81`
(startup modes), `UpsertKafkaDynamicTableFactory.java:75` (upsert-kafka's
key/value formats + tombstone semantics).

No Kafka broker (nor the spark-sql-kafka jar) ships in this environment, so
the translation layer is factored PURE: given the WITH(...) options of a
Flink `CREATE TABLE`, produce (a) the exact option map for
``spark.readStream.format("kafka")`` / ``writeStream.format("kafka")`` and
(b) the decode/encode projections between Kafka's binary key/value columns
and the declared row schema. Contract tests assert these outputs byte-for-
byte; on a rig with a broker the wiring is one line:
``spark.readStream.format("kafka").options(**source_options(o)).load()``.

Startup-mode mapping (KafkaSource startup modes → Spark source options):
  earliest-offset   → startingOffsets=earliest
  latest-offset     → startingOffsets=latest        (default, like Flink)
  group-offsets     → startingOffsets=latest + kafka.group.id passthrough.
                      Spark's Kafka source does NOT resume from committed
                      group offsets (it tracks progress in the checkpoint) —
                      the group id only names the consumer; the checkpoint
                      is the real resume point. Documented divergence.
  timestamp         → startingTimestamp=<millis>
  specific-offsets  → startingOffsets={"<topic>": {"<p>": <off>}} JSON

Upsert-kafka semantics: every record is keyed; a null value is a DELETE
tombstone. ``upsert_decode`` surfaces that as a +U/-D op column; feed it to
``streaming.changelog.changelog_normalize_stream`` (keyed latest-row state),
the exact chain the reference builds (upsert source → ChangelogNormalize).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _require(opts: dict, key: str) -> str:
    if key not in opts:
        raise ValueError(f"kafka DDL: required option {key!r} missing")
    return opts[key]


def _parse_specific_offsets(spec: str, topic: str) -> str:
    """'partition:0,offset:42;partition:1,offset:300' →
    '{"topic": {"0": 42, "1": 300}}' (Spark startingOffsets JSON)."""
    per_part: dict[str, int] = {}
    for chunk in spec.split(";"):
        if not chunk.strip():
            continue
        kv = dict(p.split(":", 1) for p in chunk.split(","))
        per_part[kv["partition"].strip()] = int(kv["offset"])
    return json.dumps({topic: per_part})


def source_options(opts: dict) -> dict:
    """Flink WITH(...) map → Spark readStream.format("kafka") option map."""
    connector = opts.get("connector", "kafka")
    if connector not in ("kafka", "upsert-kafka"):
        raise ValueError(f"not a kafka connector: {connector!r}")
    topic = _require(opts, "topic")
    out = {
        "kafka.bootstrap.servers": _require(opts, "properties.bootstrap.servers"),
        "subscribe": topic,
    }
    if "properties.group.id" in opts:
        out["kafka.group.id"] = opts["properties.group.id"]
    mode = opts.get(
        "scan.startup.mode",
        # upsert-kafka always reads the full compacted history (its state IS
        # the topic) — Flink hard-codes earliest; plain kafka defaults latest
        "earliest-offset" if connector == "upsert-kafka" else "latest-offset",
    )
    if mode == "earliest-offset":
        out["startingOffsets"] = "earliest"
    elif mode == "latest-offset":
        out["startingOffsets"] = "latest"
    elif mode == "group-offsets":
        out["startingOffsets"] = "latest"  # checkpoint, not group, resumes
    elif mode == "timestamp":
        out["startingTimestamp"] = _require(opts, "scan.startup.timestamp-millis")
    elif mode == "specific-offsets":
        out["startingOffsets"] = _parse_specific_offsets(
            _require(opts, "scan.startup.specific-offsets"), topic)
    else:
        raise NotImplementedError(f"scan.startup.mode {mode!r}")
    # passthrough of raw consumer properties (Flink properties.* → kafka.*)
    for k, v in opts.items():
        if k.startswith("properties.") and k not in (
                "properties.bootstrap.servers", "properties.group.id"):
            out["kafka." + k[len("properties."):]] = v
    return out


def sink_options(opts: dict) -> dict:
    """Flink WITH(...) map → Spark writeStream.format("kafka") option map.

    Spark's Kafka sink is at-least-once under checkpointing;
    'sink.delivery-guarantee' = 'exactly-once' (Flink's transactional
    producer) has no Spark equivalent — raise rather than silently weaken.
    """
    if opts.get("sink.delivery-guarantee", "at-least-once") == "exactly-once":
        raise NotImplementedError(
            "kafka sink: exactly-once (transactional producer) is not "
            "available in Spark's Kafka sink; use at-least-once + "
            "idempotent/upsert consumers")
    out = {
        "kafka.bootstrap.servers": _require(opts, "properties.bootstrap.servers"),
        "topic": _require(opts, "topic"),
    }
    # producer properties pass through exactly like the source side
    # (security/SASL/compression configs must reach the writer too)
    for k, v in opts.items():
        if k.startswith("properties.") and k != "properties.bootstrap.servers":
            out["kafka." + k[len("properties."):]] = v
    return out


def decode_value(schema: T.StructType, fmt: str, col: str = "value") -> Column:
    """Projection decoding Kafka's binary ``value`` column into the declared
    row struct (reference value-format deserializer chain)."""
    raw = F.col(col).cast("string")
    if fmt == "json":
        return F.from_json(raw, schema)
    if fmt == "csv":
        return F.from_csv(raw, schema.simpleString()[len("struct<"):-1].replace(":", " "))
    if fmt == "raw":
        if len(schema.fields) != 1:
            raise ValueError("raw format requires a single-column schema")
        return F.struct(raw.cast(schema.fields[0].dataType).alias(schema.fields[0].name))
    if fmt == "avro":
        raise NotImplementedError(
            "kafka value format 'avro': wire avro_format.decode_container "
            "through mapInPandas (single-record Avro framing differs from "
            "the OCF files avro_format implements)")
    if fmt in ("debezium-json", "canal-json", "maxwell-json"):
        # changelog formats expand ONE envelope into MULTIPLE RowKind-tagged
        # rows — a frame-level transform, not a column projection
        name = fmt.split("-")[0]
        raise ValueError(
            f"changelog format {fmt!r}: apply streaming.cdc_formats."
            f"{name}_decode(df, 'value', <schema DDL>) to the loaded frame "
            "instead of decode_value")
    raise NotImplementedError(f"kafka value format {fmt!r}")


def encode_value(cols: list[str], fmt: str) -> Column:
    """Projection encoding row columns into the sink's binary value."""
    if fmt == "json":
        return F.to_json(F.struct(*cols)).cast("binary").alias("value")
    if fmt == "csv":
        return F.concat_ws(",", *[F.col(c).cast("string") for c in cols]) \
            .cast("binary").alias("value")
    raise NotImplementedError(f"kafka sink format {fmt!r}")


def apply_source_decode(raw: DataFrame, schema: T.StructType,
                        fmt: str = "json") -> DataFrame:
    """kafka source frame (key/value binary + topic/partition/offset/
    timestamp) → declared row schema; keeps the Kafka timestamp as
    ``kafka_ts`` (Flink's metadata column `timestamp`)."""
    decoded = raw.select(
        decode_value(schema, fmt).alias("__row"),
        F.col("timestamp").alias("kafka_ts"),
    )
    return decoded.select("__row.*", "kafka_ts")


def upsert_decode(raw: DataFrame, key_schema: T.StructType,
                  value_schema: T.StructType,
                  key_format: str = "json",
                  value_format: str = "json") -> DataFrame:
    """upsert-kafka record → changelog row with an ``op`` column:
    value == null (tombstone) → '-D', else '+U'
    (UpsertKafkaDynamicTableFactory.java:75 + DynamicKafkaDeserializationSchema
    upsert mode). Feed the result to changelog_normalize_stream(pk, offset).
    """
    key = decode_value(key_schema, key_format, col="key")
    val = decode_value(value_schema, value_format, col="value")
    return raw.select(
        key.alias("__key"),
        F.when(F.col("value").isNull(), F.lit("-D")).otherwise(F.lit("+U")).alias("op"),
        val.alias("__val"),
        F.col("offset").alias("kafka_offset"),
        F.col("timestamp").alias("kafka_ts"),
    ).select("__key.*", "__val.*", "op", "kafka_offset", "kafka_ts")
