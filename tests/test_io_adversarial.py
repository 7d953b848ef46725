"""Adversarial-content round-trips for the file formats: the table-data
round-trips (test_io_formats.py) and the oracle-graded chains
(operators/io_queries.py) exercise well-behaved TPC-H text; these tests feed
each format the strings that actually break serializers — delimiters inside
values, quotes, embedded newlines, unicode, leading zeros, empty vs NULL —
mirroring the reference's format test corpora (flink-csv
CsvRowDataSerDeSchemaTest, flink-json JsonRowDataSerDeSchemaTest)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.io_formats import read_table, write_table

SCHEMA = "id bigint, s string, v double"

ROWS = [
    (1, "plain", 1.5),
    (2, "comma, inside", -0.25),
    (3, 'quote " inside', 0.0),
    (4, "both \", and , comma", 1e300),
    (5, "newline\ninside", 1e-300),
    (6, "tab\tinside", float("inf")),
    (7, "unicode: 中文 éß🚀", float("-inf")),
    (8, "", 42.0),          # empty string (CSV must keep it distinct from NULL)
    (9, None, None),        # SQL NULLs
    (10, "0007", 7.0),      # leading zeros must stay text
    (11, "   padded   ", 3.25),
    (12, "semicolon;pipe|backslash\\", -1.0),
]


def _sortable(rows):
    return sorted((r[0], r[1], repr(r[2])) for r in rows)


@pytest.mark.parametrize("fmt", ["parquet", "json", "orc", "avro", "csv"])
def test_adversarial_strings_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    dest = str(tmp_path / f"adv_{fmt}")
    write_table(df, dest, fmt=fmt)
    back = read_table(spark, dest, fmt=fmt, schema=SCHEMA)
    got = [(r["id"], r["s"], r["v"]) for r in back.collect()]
    # CSV included: write_table's \N null literal (the reference's
    # csv.null-literal) keeps NULL distinct from empty string, and
    # read_table's multiLine keeps quoted embedded newlines one record.
    assert _sortable(got) == _sortable(list(ROWS))


def test_csv_multiline_roundtrip_and_optout(spark, tmp_path):
    """Embedded newlines survive CSV because write quotes them and read
    defaults to multiLine; the splittable opt-out (csv_multiline=False)
    visibly BREAKS such records — proving the default is what carries the
    correctness, not reader luck."""
    df = spark.createDataFrame([(5, "newline\ninside", 0.5)], SCHEMA)
    dest = str(tmp_path / "adv_csv_nl")
    write_table(df, dest, fmt="csv")
    back = read_table(spark, dest, fmt="csv", schema=SCHEMA)
    assert back.collect()[0]["s"] == "newline\ninside"
    broken = read_table(spark, dest, fmt="csv", schema=SCHEMA,
                        csv_multiline=False)
    assert broken.count() != 1
