"""MATCH_RECOGNIZE front door (SURVEY §2.9; reference StreamExecMatch.java:89,
SQL bridge over the CEP NFA — here over streaming/cep.py).

Supported clause subset (the common core of Flink's MATCH_RECOGNIZE):

    match_recognize(
        df,
        partition_by=["user_id"],
        order_by="ts",
        pattern="V C+ P",                  # sequence with one-or-more quantifier
        define={"V": "event_type = 'view'",
                "C": "event_type = 'click'",
                "P": "event_type = 'purchase'"},
        within_seconds=3600,
        id_col="event_id",
    )

DEFINE predicates accept either a Python callable (row -> bool) or a simple
SQL boolean expression over row columns: comparisons (= <> < <= > >=) of a
column vs a literal, combined with AND. AFTER MATCH SKIP PAST LAST ROW and
final-ONE ROW PER MATCH (start/end/step ids) follow the CEP op's semantics.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame

from flink_release_1_14_5_comment_spark.streaming.cep import Pattern, cep

_CMP_RE = re.compile(
    r"^\s*(\w+)\s*(=|<>|!=|<=|>=|<|>)\s*('([^']*)'|[-+]?\d+(?:\.\d+)?)\s*$"
)

_OPS = {
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


def compile_predicate(expr: str | Callable[[pd.Series], bool]) -> Callable[[pd.Series], bool]:
    """SQL-ish boolean expression → row predicate (AND-combined comparisons)."""
    if callable(expr):
        return expr
    clauses = []
    for part in re.split(r"\s+AND\s+", expr, flags=re.IGNORECASE):
        m = _CMP_RE.match(part)
        if not m:
            raise ValueError(f"unsupported DEFINE expression: {part!r} "
                             "(use a Python callable for complex predicates)")
        col, op, raw, strval = m.groups()
        value = strval if strval is not None else float(raw) if "." in raw else int(raw)
        clauses.append((col, _OPS[op], value))

    def pred(row: pd.Series) -> bool:
        return all(op(row[col], value) for col, op, value in clauses)

    return pred


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    pattern: str,
    define: dict[str, str | Callable[[pd.Series], bool]],
    id_col: str,
    within_seconds: float | None = None,
) -> DataFrame:
    """Run a MATCH_RECOGNIZE-style pattern; returns one row per match:
    partition cols + match_start + match_end + step_ids."""
    steps = pattern.split()
    if not steps:
        raise ValueError("empty PATTERN")
    built: Pattern | None = None
    for s in steps:
        one_or_more = s.endswith("+")
        name = s.rstrip("+")
        if name not in define:
            raise ValueError(f"PATTERN variable {name!r} missing from DEFINE")
        pred = compile_predicate(define[name])
        built = Pattern.begin(name, pred) if built is None else built.followed_by(name, pred)
        if one_or_more:
            built = built.one_or_more()
    if within_seconds is not None:
        built = built.within(within_seconds)
    return cep(df, built, partition_by, order_by, id_col)
