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


# quantifiers incl. the RELUCTANT forms (+? ?? {n,m}?) — reference
# MATCH_RECOGNIZE grammar; greedy is the SQL default, trailing ? flips it
_QUANT_RE = re.compile(r"^(\w+)(\+\??|\?\??|\{(\d+)(?:,(\d+))?\}\??)?$")

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
    reluctant: list[bool] = []
    for s in steps:
        m = _QUANT_RE.match(s)
        if not m:
            raise ValueError(f"unsupported PATTERN token: {s!r}")
        name, quant, n, mx = m.group(1), m.group(2), m.group(3), m.group(4)
        if name not in define:
            raise ValueError(f"PATTERN variable {name!r} missing from DEFINE")
        pred = compile_predicate(define[name])
        built = Pattern.begin(name, pred) if built is None else built.followed_by(name, pred)
        reluctant.append(bool(quant) and quant.endswith("?") and quant != "?")
        if quant and quant.startswith("+"):
            built = built.one_or_more()
        elif quant in ("?", "??"):
            built = built.optional()
        elif quant:  # {n} or {n,m}, optionally reluctant
            built = built.times(int(n), int(mx) if mx else None)
    # SQL MATCH_RECOGNIZE quantifiers are greedy by default (the Pattern API
    # default is branching/non-greedy) unless written reluctant (+? ?? {n,m}?
    # — reference quantifier grammar); like the reference, greediness cannot
    # apply to the final pattern element, so the trailing step stays reluctant.
    for st, rel in zip(built.steps[:-1], reluctant):
        if rel:
            continue
        if st.max_occurs is None or st.max_occurs > st.min_occurs or st.min_occurs == 0:
            st.greedy = True
    if within_seconds is not None:
        built = built.within(within_seconds)
    parsed_measures = {k: parse_measure(v) for k, v in (measures or {}).items()}
    return cep(df, built, partition_by, order_by, id_col,
               after_match=parse_after_match(after_match),
               measures=parsed_measures)


# --- SQL-text front door ---------------------------------------------------
# Flink users write MATCH_RECOGNIZE as SQL (reference SQL bridge
# StreamExecMatch.java:89; grammar FlinkSqlOperatorTable.java:1153-1159
# aux functions). This parser maps the clause subset the API supports onto
# match_recognize(); anything richer raises with a pointer to the API.

_MR_OUTER = re.compile(
    r"^\s*SELECT\s+\*\s+FROM\s+(?P<tbl>\w+)\s+MATCH_RECOGNIZE\s*\("
    r"(?P<body>.*)\)\s*(?:AS\s+\w+)?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_MR_UNIT_S = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _mr_clause(body: str, name: str, stop: str) -> str | None:
    m = re.search(rf"\b{name}\s+(.*?)\s*(?={stop}|$)", body,
                  re.IGNORECASE | re.DOTALL)
    return m.group(1).strip() if m else None


def parse_match_recognize_sql(sql: str) -> dict:
    """SELECT * FROM t MATCH_RECOGNIZE (...) → kwargs for match_recognize()
    plus the source table name under 'table'."""
    outer = _MR_OUTER.match(sql.strip().rstrip(";"))
    if not outer:
        raise ValueError(
            "unsupported MATCH_RECOGNIZE shape: expected "
            "SELECT * FROM <table> MATCH_RECOGNIZE (...) [AS alias]")
    body = outer.group("body")

    part = _mr_clause(body, "PARTITION BY",
                      r"ORDER\s+BY|MEASURES|PATTERN|AFTER|DEFINE")
    order = _mr_clause(body, "ORDER BY",
                       r"MEASURES|ONE\s+ROW|AFTER|PATTERN|DEFINE")
    if not order:
        raise ValueError("MATCH_RECOGNIZE requires ORDER BY")
    measures_raw = _mr_clause(body, "MEASURES",
                              r"ONE\s+ROW|AFTER|PATTERN|DEFINE")
    after = _mr_clause(body, "AFTER MATCH", r"PATTERN|DEFINE")
    pat = re.search(r"PATTERN\s*\(\s*(.*?)\s*\)", body,
                    re.IGNORECASE | re.DOTALL)
    if not pat:
        raise ValueError("MATCH_RECOGNIZE requires PATTERN (...)")
    within = re.search(
        r"WITHIN\s+INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?",
        body, re.IGNORECASE)
    define_raw = _mr_clause(body, "DEFINE", r"$")
    if not define_raw:
        raise ValueError("MATCH_RECOGNIZE requires DEFINE")

    # paren-aware split: DEFINE/MEASURES items may contain multi-arg
    # function calls (COALESCE(a, b), …) whose commas are not separators
    from flink_release_1_14_5_comment_spark.api.table_env import (
        _split_top_level,
    )

    define: dict[str, str] = {}
    for item in _split_top_level(define_raw):
        m = re.match(r"^\s*(\w+)\s+AS\s+(.*?)\s*$", item,
                     re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"unsupported DEFINE item: {item!r}")
        define[m.group(1)] = m.group(2)

    measures: dict[str, str] = {}
    if measures_raw:
        for item in _split_top_level(measures_raw):
            m = re.match(r"^\s*(.*?)\s+AS\s+(\w+)\s*$", item,
                         re.IGNORECASE | re.DOTALL)
            if not m:
                raise ValueError(f"unsupported MEASURES item: {item!r}")
            measures[m.group(2)] = m.group(1)

    out = {
        "table": outer.group("tbl"),
        "partition_by": ([c.strip() for c in part.split(",")] if part else []),
        "order_by": order,
        "pattern": " ".join(pat.group(1).split()),
        "define": define,
        "measures": measures or None,
    }
    if after:
        out["after_match"] = after
    if within:
        out["within_seconds"] = int(within.group(1)) * _MR_UNIT_S[
            within.group(2).upper()]
    return out


def match_recognize_sql(df: DataFrame, sql: str,
                        id_col: str | None = None) -> DataFrame:
    """Run SQL-text MATCH_RECOGNIZE against `df` (already resolved from the
    FROM table). `id_col`: unique row id used in the match output's
    step-id lists; when None a per-partition ROW_NUMBER over the ORDER BY
    column is synthesized (ties broken arbitrarily — pass a real id column
    when the order column is not unique per partition)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    kw = parse_match_recognize_sql(sql)
    kw.pop("table")
    if id_col is None:
        id_col = "__mr_id"
        w = Window.partitionBy(*(kw["partition_by"] or [F.lit(1)])).orderBy(
            kw["order_by"])
        df = df.withColumn(id_col, F.row_number().over(w).cast("long"))
    return match_recognize(df, id_col=id_col, **kw)
