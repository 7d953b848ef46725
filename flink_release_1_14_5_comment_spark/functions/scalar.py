"""Shims for Flink scalar functions Spark lacks (SURVEY §2.8 flagged gaps).

Reference implementations live in the reference's codegen
(flink-table-planner .../codegen/calls/StringCallGen.scala,
ScalarOperatorGens.scala) backed by SqlFunctionUtils-style Java runtime
helpers; semantics below follow the Flink 1.14 docs for each function.

Everything is a Column-expression composition — stays inside whole-stage
codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_index(col: Column | str, sep: str, index: int) -> Column:
    """SPLIT_INDEX(str, sep, index) — Flink is 0-based; returns NULL when the
    index is out of range (element_at is 1-based, null-safe via try_element_at)."""
    return F.try_element_at(F.split(col, _re_escape(sep)), F.lit(index + 1))


def is_decimal(col: Column | str) -> Column:
    """IS_DECIMAL(str): can the string be parsed as a decimal number."""
    return _as_col(col).rlike(r"^[+-]?(\d+(\.\d*)?|\.\d+)$")


def is_digit(col: Column | str) -> Column:
    """IS_DIGIT(str): every character a digit (false for empty/null)."""
    return _as_col(col).rlike(r"^\d+$")


def is_alpha(col: Column | str) -> Column:
    """IS_ALPHA(str): every character a letter (false for empty/null)."""
    return _as_col(col).rlike(r"^[A-Za-z]+$")


def truncate_numeric(col: Column | str, digits: int = 0) -> Column:
    """TRUNCATE(x, d): toward-zero truncation to d decimal digits (Spark's
    `trunc` is date-only; round(x, d) rounds instead of truncating)."""
    scale = 10 ** digits
    c = _as_col(col)
    scaled = c * scale
    return (
        F.when(c >= 0, F.floor(scaled)).otherwise(F.ceil(scaled)) / scale
    )


def hash_code(col: Column | str) -> Column:
    """HASH_CODE(str) — Flink returns String.hashCode(). Spark's `hash` is
    Murmur3, a DIFFERENT value; documented divergence (any stable int hash
    satisfies the use cases: bucketing, sampling, salting)."""
    return F.hash(_as_col(col))


def regexp(col: Column | str, pattern: str) -> Column:
    """REGEXP(str, pattern) — partial-match boolean (Flink semantics: find,
    not full match); Spark rlike already searches unanchored."""
    return _as_col(col).rlike(pattern)


def similar_to(col: Column | str, pattern: str) -> Column:
    """SQL `SIMILAR TO`: SQL-regex dialect → Java regex, full-string anchored.
    Handles %, _, and passes through [] classes and ()|* quantifiers."""
    java = (
        pattern.replace("%", ".*").replace("_", ".")
    )
    return _as_col(col).rlike(f"^(?:{java})$")


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _re_escape(sep: str) -> str:
    import re

    return re.escape(sep)
