"""Flink → Spark type mapping (SURVEY §1.3; reference LogicalTypeRoot.java:54-142).

Translates Flink SQL DDL type strings into Spark types, following the
SURVEY mapping table. Conventions for the gap types:

  * TIME (no Spark type)        → LongType micros-of-day
  * TIMESTAMP (no tz)           → TimestampType (LTZ). Semantically Flink's
                                  TIMESTAMP is NTZ, but this ENGINE's
                                  convention is LTZ-under-UTC everywhere:
                                  parquet reads infer LTZ
                                  (inferTimestampNTZ=false, catalog.py),
                                  streaming watermarks require LTZ, and the
                                  oracle suite was validated under LTZ —
                                  mapping DDL TIMESTAMP to NTZ made
                                  DDL-declared and file-inferred schemas
                                  disagree for the same data (ADVICE r3).
                                  Under the engine's pinned UTC session the
                                  wall-clock values are identical.
  * TIMESTAMP_LTZ               → TimestampType
  * MULTISET<T>                 → MapType(T, IntegerType) (Flink's own repr)
  * RAW / BYTES                 → BinaryType
  * INTERVAL YEAR TO MONTH      → YearMonthIntervalType
  * INTERVAL DAY TO SECOND      → DayTimeIntervalType
  * CHAR/VARCHAR lengths        → unenforced (StringType); enforce at the
                                  sink like SinkNotNullEnforcer if needed
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_SIMPLE = {
    "BOOLEAN": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "REAL": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "DATE": T.DateType(),
    "TIME": T.LongType(),  # micros-of-day convention
    "TIMESTAMP": T.TimestampType(),  # LTZ: engine-wide convention, see above
    "TIMESTAMP_LTZ": T.TimestampType(),
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
    "BINARY": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
    "RAW": T.BinaryType(),
    "NULL": T.NullType(),
    "INTERVAL YEAR TO MONTH": T.YearMonthIntervalType(),
    "INTERVAL DAY TO SECOND": T.DayTimeIntervalType(),
}

_PARAM_RE = re.compile(r"^(\w+)\s*\((\d+)(?:\s*,\s*(\d+))?\)$")


def flink_type_to_spark(type_str: str) -> T.DataType:
    """Parse a Flink DDL type string into a Spark DataType."""
    s = type_str.strip().rstrip()
    upper = s.upper()
    if upper.endswith(" NOT NULL"):
        # nullability is carried by StructField; the bare type is the same
        return flink_type_to_spark(s[: -len(" NOT NULL")])
    if upper in _SIMPLE:
        return _SIMPLE[upper]
    m = _PARAM_RE.match(upper)
    if m:
        name, p1, p2 = m.groups()
        if name in ("CHAR", "VARCHAR"):
            return T.StringType()
        if name in ("BINARY", "VARBINARY"):
            return T.BinaryType()
        if name == "DECIMAL" or name == "NUMERIC":
            return T.DecimalType(int(p1), int(p2 or 0))
        if name == "TIMESTAMP":
            return T.TimestampType()
        if name == "TIMESTAMP_LTZ":
            return T.TimestampType()
        if name == "TIME":
            return T.LongType()
    if upper.startswith("ARRAY<"):
        return T.ArrayType(flink_type_to_spark(s[6:-1]))
    if upper.startswith("MULTISET<"):
        return T.MapType(flink_type_to_spark(s[9:-1]), T.IntegerType())
    if upper.startswith("MAP<"):
        k, v = _split_two(s[4:-1])
        return T.MapType(flink_type_to_spark(k), flink_type_to_spark(v))
    if upper.startswith("ROW<"):
        fields = []
        for item in _split_fields(s[4:-1]):
            fname, ftype = item.split(" ", 1)
            fields.append(T.StructField(fname.strip("`"), flink_type_to_spark(ftype), True))
        return T.StructType(fields)
    raise ValueError(f"unsupported Flink type: {type_str!r}")


def _split_two(s: str) -> tuple[str, str]:
    items = _split_fields(s)
    assert len(items) == 2, s
    return items[0], items[1]


def _split_fields(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            depth += ch == "<"
            depth -= ch == ">"
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out
