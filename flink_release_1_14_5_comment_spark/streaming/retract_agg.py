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

MIN/MAX with retraction need the full value multiset (the reference keeps a
sorted map in state); that variant is intentionally deferred — SUM/COUNT/AVG
cover the overwhelming majority of changelog aggregations.
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
    """Streaming SUM/COUNT/AVG over a changelog input; emits a refreshed row
    per key per batch with its own __rowkind."""
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["sum_value double", "cnt long", "avg_value double", "__rowkind string"]
    )
    state_schema = "acc double, cnt long"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        acc, cnt = state.get if state.exists else (0.0, 0)
        had = state.exists
        sign = batch[ROWKIND].isin(_NEGATIVE).map({True: -1.0, False: 1.0})
        acc += float((sign * batch[value_col]).sum())
        cnt += int(sign.sum())
        state.update((acc, cnt))
        yield pd.DataFrame([{
            **{key_cols[i]: key[i] for i in range(n_keys)},
            "sum_value": acc,
            "cnt": cnt,
            "avg_value": acc / cnt if cnt else None,
            "__rowkind": "+U" if had else "+I",
        }])

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)
    )
