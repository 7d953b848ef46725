"""Flink-SQL → Spark-SQL window-syntax translation (SURVEY §3/§4: stages
1-5 of the reference's lifecycle are Catalyst's job; OUR job is the
dialect translation layer — this module closes the windowing half, the
most idiomatic Flink SQL there is).

Covers both generations of Flink window SQL (reference:
flink-table-planner .../functions/sql/FlinkSqlOperatorTable.java:923-992
legacy group-window functions; SqlTumbleTableFunction / SqlCumulateTableFunction
window TVFs, StreamExecWindowTableFunction.java:64):

* LEGACY group windows — ``GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)`` →
  ``GROUP BY window(ts, '1 hour')``; ``HOP(ts, slide, size)`` →
  ``window(ts, size, slide)`` (argument order flips — Flink is
  (slide, size), Spark is (size, slide)); ``SESSION(ts, gap)`` →
  ``session_window(ts, gap)``. Auxiliary accessors ``TUMBLE_START/_END``
  (and HOP_) → ``window.start``/``window.end``; ``SESSION_START/_END`` →
  ``session_window.start``/``.end`` — Spark names the implicit
  group-window output column ``window`` / ``session_window``. ``*_ROWTIME``/
  ``*_PROCTIME`` → ``window.end - INTERVAL 1 MILLISECOND`` (Flink's window
  rowtime attribute is end − 1ms, TimeWindow.maxTimestamp()).

* WINDOW TVFs — ``TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1'
  HOUR))`` → a subquery computing ``window_start``/``window_end`` with
  pure epoch-micros floor arithmetic (codegen-friendly, no Python):
  tumble start = ⌊t/size⌋·size. HOP explodes the per-row window list via
  ``LATERAL VIEW explode(sequence(...))`` (first start = smallest slide
  multiple > t − size), CUMULATE likewise over the k·step window ends —
  the same assigner math as operators/time_windows.py, expressed in SQL.

Deliberately regex-scoped: these are syntax-directed rewrites of the
window constructs only — the surrounding query text passes through
untouched and lands in Catalyst as-is. Not handled (documented): nested
TVFs over subqueries (``TABLE(TUMBLE(TABLE (SELECT ...)``), SESSION TVF
(post-1.14), named-parameter TVF calls.
"""

from __future__ import annotations

import re

_UNIT_US = {
    "SECOND": 1_000_000,
    "MINUTE": 60_000_000,
    "HOUR": 3_600_000_000,
    "DAY": 86_400_000_000,
}

_INTERVAL = r"INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?"


def _micros(n: str, unit: str) -> int:
    return int(n) * _UNIT_US[unit.upper()]


def _duration(n: str, unit: str) -> str:
    return f"{n} {unit.lower()}"


# --- window TVFs (FROM TABLE(TUMBLE/HOP/CUMULATE(TABLE t, DESCRIPTOR(ts), …)))

_TVF_TUMBLE = re.compile(
    r"TABLE\s*\(\s*TUMBLE\s*\(\s*TABLE\s+(?P<tbl>\w+)\s*,\s*"
    r"DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*" + _INTERVAL + r"\s*\)\s*\)",
    re.IGNORECASE,
)

_TVF_HOP = re.compile(
    r"TABLE\s*\(\s*HOP\s*\(\s*TABLE\s+(?P<tbl>\w+)\s*,\s*"
    r"DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*" + _INTERVAL + r"\s*,\s*"
    + _INTERVAL + r"\s*\)\s*\)",
    re.IGNORECASE,
)

_TVF_CUMULATE = re.compile(
    r"TABLE\s*\(\s*CUMULATE\s*\(\s*TABLE\s+(?P<tbl>\w+)\s*,\s*"
    r"DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*" + _INTERVAL + r"\s*,\s*"
    + _INTERVAL + r"\s*\)\s*\)",
    re.IGNORECASE,
)


def _tumble_tvf(m: re.Match) -> str:
    tbl, ts = m.group("tbl"), m.group("ts")
    size = _micros(m.group(3), m.group(4))
    start = f"CAST(floor(unix_micros({ts}) / {size}) * {size} AS BIGINT)"
    return (
        f"(SELECT *, timestamp_micros({start}) AS window_start, "
        f"timestamp_micros({start} + {size}) AS window_end FROM {tbl})"
    )


def _hop_tvf(m: re.Match) -> str:
    # Flink argument order: slide, then size
    tbl, ts = m.group("tbl"), m.group("ts")
    slide = _micros(m.group(3), m.group(4))
    size = _micros(m.group(5), m.group(6))
    t = f"unix_micros({ts})"
    first = f"CAST(floor(({t} - {size}) / {slide}) * {slide} + {slide} AS BIGINT)"
    last = f"CAST(floor({t} / {slide}) * {slide} AS BIGINT)"
    # Gap windows (size < slide) leave some rows in NO window: first > last
    # there, and a bare sequence() would throw at runtime — guard with an
    # empty array so those rows drop, matching Flink's HOP semantics.
    seq = (f"CASE WHEN {first} <= {last} THEN sequence({first}, {last}, {slide}) "
           f"ELSE CAST(array() AS ARRAY<BIGINT>) END")
    return (
        f"(SELECT *, timestamp_micros(__ws) AS window_start, "
        f"timestamp_micros(__ws + {size}) AS window_end FROM {tbl} "
        f"LATERAL VIEW explode({seq}) __w AS __ws)"
    )


def _cumulate_tvf(m: re.Match) -> str:
    # Flink argument order: step, then max size; windows share the tumble
    # base start and grow by k·step until size
    tbl, ts = m.group("tbl"), m.group("ts")
    step = _micros(m.group(3), m.group(4))
    size = _micros(m.group(5), m.group(6))
    t = f"unix_micros({ts})"
    base = f"CAST(floor({t} / {size}) * {size} AS BIGINT)"
    kmin = f"CAST(floor(({t} - __base) / {step}) + 1 AS BIGINT)"
    kmax = size // step
    return (
        f"(SELECT *, timestamp_micros(__base) AS window_start, "
        f"timestamp_micros(__base + __k * {step}) AS window_end "
        f"FROM (SELECT *, {base} AS __base FROM {tbl}) "
        f"LATERAL VIEW explode(sequence({kmin}, {kmax})) __w AS __k)"
    )


# --- legacy group windows + auxiliary accessors ---------------------------

# Spark names the implicit group-window output column `window` for
# window() and `session_window` for session_window() — map accessors
# accordingly.
_ARGS = r"\s*\([^()]*(?:\([^()]*\)[^()]*)*\)"
_AUX_START = re.compile(r"\b(?:TUMBLE|HOP)_START" + _ARGS, re.IGNORECASE)
_AUX_END = re.compile(r"\b(?:TUMBLE|HOP)_END" + _ARGS, re.IGNORECASE)
_AUX_TIME = re.compile(
    r"\b(?:TUMBLE|HOP)_(?:ROWTIME|PROCTIME)" + _ARGS, re.IGNORECASE)
_AUX_SESSION_START = re.compile(r"\bSESSION_START" + _ARGS, re.IGNORECASE)
_AUX_SESSION_END = re.compile(r"\bSESSION_END" + _ARGS, re.IGNORECASE)
_AUX_SESSION_TIME = re.compile(
    r"\bSESSION_(?:ROWTIME|PROCTIME)" + _ARGS, re.IGNORECASE)

_LEGACY_TUMBLE = re.compile(
    r"\bTUMBLE\s*\(\s*(?P<col>[\w.]+)\s*,\s*" + _INTERVAL + r"\s*\)",
    re.IGNORECASE)
_LEGACY_HOP = re.compile(
    r"\bHOP\s*\(\s*(?P<col>[\w.]+)\s*,\s*" + _INTERVAL + r"\s*,\s*"
    + _INTERVAL + r"\s*\)",
    re.IGNORECASE)
_LEGACY_SESSION = re.compile(
    r"\bSESSION\s*\(\s*(?P<col>[\w.]+)\s*,\s*" + _INTERVAL + r"\s*\)",
    re.IGNORECASE)


def translate_flink_sql(sql: str) -> str:
    """Rewrite Flink window SQL (legacy group windows + window TVFs) into
    Spark SQL. Non-window text passes through untouched; applying to SQL
    with no Flink windowing is a no-op."""
    # TVFs first — their TUMBLE( token would otherwise be eaten by the
    # legacy rewrite
    sql = _TVF_TUMBLE.sub(_tumble_tvf, sql)
    sql = _TVF_HOP.sub(_hop_tvf, sql)
    sql = _TVF_CUMULATE.sub(_cumulate_tvf, sql)
    # auxiliary accessors before the bare window functions (TUMBLE_START
    # contains the substring TUMBLE)
    sql = _AUX_START.sub("window.start", sql)
    sql = _AUX_END.sub("window.end", sql)
    sql = _AUX_TIME.sub("window.end - INTERVAL 1 MILLISECOND", sql)
    sql = _AUX_SESSION_START.sub("session_window.start", sql)
    sql = _AUX_SESSION_END.sub("session_window.end", sql)
    sql = _AUX_SESSION_TIME.sub(
        "session_window.end - INTERVAL 1 MILLISECOND", sql)
    sql = _LEGACY_TUMBLE.sub(
        lambda m: f"window({m.group('col')}, '{_duration(m.group(2), m.group(3))}')",
        sql)
    sql = _LEGACY_HOP.sub(
        lambda m: (
            f"window({m.group('col')}, "
            f"'{_duration(m.group(4), m.group(5))}', "   # size
            f"'{_duration(m.group(2), m.group(3))}')"    # slide
        ),
        sql)
    sql = _LEGACY_SESSION.sub(
        lambda m: f"session_window({m.group('col')}, '{_duration(m.group(2), m.group(3))}')",
        sql)
    return sql
