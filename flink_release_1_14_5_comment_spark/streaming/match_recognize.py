"""MATCH_RECOGNIZE front door (SURVEY §2.9; reference StreamExecMatch.java:89,
SQL bridge over the CEP NFA — here over streaming/cep.py).

Supported clause subset (the common core of Flink's MATCH_RECOGNIZE):

    match_recognize(
        df,
        partition_by=["user_id"],
        order_by="ts",
        pattern="V C+ P?",                 # quantifiers: + ? {n} {n,m}
        define={"V": "event_type = 'view'",
                "C": "event_type = 'click'",
                "P": "event_type = 'purchase'"},
        measures={"n_clicks": "COUNT(C)",
                  "first_click_val": "FIRST(C.value)"},
        after_match="SKIP TO LAST C",      # or SKIP PAST LAST ROW / NO SKIP /
                                           # SKIP TO NEXT ROW / SKIP TO FIRST V
        within_seconds=3600,
        id_col="event_id",
    )

DEFINE predicates accept either a Python callable (row -> bool) or a simple
SQL boolean expression over row columns: comparisons (= <> < <= > >=) of a
column vs a literal, combined with AND. MEASURES aggregates
(FIRST/LAST/MIN/MAX/SUM/COUNT/AVG over a pattern variable's captured rows)
are evaluated at match completion; output is final ONE ROW PER MATCH
(start/end/step ids + measures), per the CEP op's semantics.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame

from flink_release_1_14_5_comment_spark.streaming.cep import (
    NO_SKIP,
    SKIP_PAST_LAST,
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
    SKIP_TO_NEXT,
    Pattern,
    cep,
)

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


_QUANT_RE = re.compile(r"^(\w+)(\+|\?|\{(\d+)(?:,(\d+))?\})?$")

_MEASURE_RE = re.compile(
    r"^\s*(FIRST|LAST|MIN|MAX|SUM|COUNT|AVG)\s*\(\s*(\w+)(?:\.(\w+|\*))?\s*\)\s*$",
    re.IGNORECASE,
)

_SKIP_MAP = {
    "SKIP PAST LAST ROW": SKIP_PAST_LAST,
    "SKIP TO NEXT ROW": SKIP_TO_NEXT,
    "NO SKIP": NO_SKIP,
}


def parse_measure(expr: str) -> tuple[str, str, str | None]:
    """'SUM(C.value)' → ('sum', 'C', 'value'); 'COUNT(C)' → ('count', 'C', None)."""
    m = _MEASURE_RE.match(expr)
    if not m:
        raise ValueError(f"unsupported MEASURES expression: {expr!r}")
    agg, var, col = m.group(1).lower(), m.group(2), m.group(3)
    if col in (None, "*"):
        col = None
        if agg != "count":
            raise ValueError(f"{agg.upper()} needs a column: {expr!r}")
    return agg, var, col


def parse_after_match(clause: str) -> str | tuple[str, str]:
    """'SKIP TO FIRST C' → (skip_to_first, 'C'); fixed forms via _SKIP_MAP."""
    norm = " ".join(clause.upper().split())
    if norm in _SKIP_MAP:
        return _SKIP_MAP[norm]
    m = re.match(r"^SKIP TO (FIRST|LAST) (\w+)$", norm)
    if m:
        strat = SKIP_TO_FIRST if m.group(1) == "FIRST" else SKIP_TO_LAST
        # variable case comes from the original clause, not the upper-cased norm
        var = clause.split()[-1]
        return (strat, var)
    raise ValueError(f"unsupported AFTER MATCH clause: {clause!r}")


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    pattern: str,
    define: dict[str, str | Callable[[pd.Series], bool]],
    id_col: str,
    within_seconds: float | None = None,
    measures: dict[str, str] | None = None,
    after_match: str = "SKIP PAST LAST ROW",
) -> DataFrame:
    """Run a MATCH_RECOGNIZE-style pattern; returns one row per match:
    partition cols + match_start + match_end + step_ids + measures."""
    steps = pattern.split()
    if not steps:
        raise ValueError("empty PATTERN")
    built: Pattern | None = None
    for s in steps:
        m = _QUANT_RE.match(s)
        if not m:
            raise ValueError(f"unsupported PATTERN token: {s!r}")
        name, quant, n, mx = m.group(1), m.group(2), m.group(3), m.group(4)
        if name not in define:
            raise ValueError(f"PATTERN variable {name!r} missing from DEFINE")
        pred = compile_predicate(define[name])
        built = Pattern.begin(name, pred) if built is None else built.followed_by(name, pred)
        if quant == "+":
            built = built.one_or_more()
        elif quant == "?":
            built = built.optional()
        elif quant:  # {n} or {n,m}
            built = built.times(int(n), int(mx) if mx else None)
    # SQL MATCH_RECOGNIZE quantifiers are greedy by default (the Pattern API
    # default is branching/non-greedy); like the reference, greediness cannot
    # apply to the final pattern element, so the trailing step stays reluctant.
    for st in built.steps[:-1]:
        if st.max_occurs is None or st.max_occurs > st.min_occurs or st.min_occurs == 0:
            st.greedy = True
    if within_seconds is not None:
        built = built.within(within_seconds)
    parsed_measures = {k: parse_measure(v) for k, v in (measures or {}).items()}
    return cep(df, built, partition_by, order_by, id_col,
               after_match=parse_after_match(after_match),
               measures=parsed_measures)
