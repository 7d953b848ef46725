"""Retraction-consuming aggregates (SURVEY §2.4; reference's *WithRetract
aggregate functions, e.g. MaxWithRetractAggFunction.java, and the
UPDATE_BEFORE/AFTER emission protocol of GroupAggFunction.java:179-201).

An aggregate over a changelog input must SUBTRACT on -U/-D rows. Two forms:

* ``retract_sum_expr`` — batch / foreachBatch: the signed-contribution
  expression (sum of +v for +I/+U, -v for -U/-D). Usable anywhere a plain
  column works; count = signed count of 1s.
* ``retract_agg_stream`` — keyed stateful op over a streaming changelog:
  state holds (sum, count) per key; every batch folds signed contributions
  and emits the refreshed aggregate with its own __rowkind (+I first, +U
  after) — aggregates compose over changelogs, the reference's chained
  retracting-agg topology.

MIN/MAX with retraction keep the full value multiset in state (the
reference's MaxWithRetractAggFunction keeps a sorted MapView value→count):
a retraction of the current extreme must fall back to the next value, which
no single-value accumulator can answer. State size is bounded by the number
of DISTINCT values per key, not rows — the same bound the reference accepts.

Per GroupAggFunction semantics, a group whose count returns to zero emits a
DELETE (-D) and clears its state instead of a zero-valued +U, so downstream
consumers drop the row rather than keeping a stale zero.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_release_1_14_5_comment_spark.streaming.changelog import ROWKIND

_NEGATIVE = ("-U", "-D")


def retract_sum_expr(value_col: str) -> Column:
    """Signed SUM over a changelog (+I/+U add, -U/-D subtract)."""
    sign = F.when(F.col(ROWKIND).isin(*_NEGATIVE), F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.sum(sign * F.col(value_col))


def retract_count_expr() -> Column:
    """Signed COUNT over a changelog."""
    sign = F.when(F.col(ROWKIND).isin(*_NEGATIVE), F.lit(-1)).otherwise(F.lit(1))
    return F.sum(sign)


def retract_agg_stream(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Streaming SUM/COUNT/AVG/MIN/MAX over a changelog input; emits a
    refreshed row per key per batch with its own __rowkind.

    MIN/MAX survive retractions via a value→count multiset kept in state as
    parallel arrays (reference MaxWithRetractAggFunction's MapView). When the
    signed count reaches zero the operator emits -D and clears state
    (GroupAggFunction.java:179-201's retract-to-empty path).
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["sum_value double", "cnt long", "avg_value double",
           "min_value double", "max_value double", "__rowkind string"]
    )
    state_schema = "acc double, cnt long, vals array<double>, cnts array<long>"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        had = state.exists
        acc, cnt, vals, cnts = state.get if had else (0.0, 0, [], [])
        ms = dict(zip(vals or [], cnts or []))
        neg = batch[ROWKIND].isin(_NEGATIVE)
        pos_v = batch.loc[~neg, value_col]
        neg_v = batch.loc[neg, value_col]
        acc += float(pos_v.sum()) - float(neg_v.sum())
        cnt += int((~neg).sum()) - int(neg.sum())
        for v, c in pos_v.value_counts().items():
            ms[float(v)] = ms.get(float(v), 0) + int(c)
        for v, c in neg_v.value_counts().items():
            left = ms.get(float(v), 0) - int(c)
            if left > 0:
                ms[float(v)] = left
            else:
                ms.pop(float(v), None)
        keyd = {key_cols[i]: key[i] for i in range(n_keys)}
        if cnt <= 0:
            # fully retracted group: delete downstream, clear state — but
            # only if the group was ever visible (insert+delete within one
            # batch emits nothing, matching mini-batch folding).
            if state.exists:
                state.remove()
            if had:
                yield pd.DataFrame([{
                    **keyd, "sum_value": 0.0, "cnt": 0, "avg_value": None,
                    "min_value": None, "max_value": None, "__rowkind": "-D",
                }])
            return
        state.update((acc, cnt, list(ms.keys()), [int(c) for c in ms.values()]))
        yield pd.DataFrame([{
            **keyd,
            "sum_value": acc,
            "cnt": cnt,
            "avg_value": acc / cnt,
            "min_value": min(ms) if ms else None,
            "max_value": max(ms) if ms else None,
            "__rowkind": "+U" if had else "+I",
        }])

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)
    )
