"""Incremental streaming Top-N per key (SURVEY §2.6; reference
AppendOnlyTopNFunction.java:248 — append-only input, state = sorted top-N
buffer per key, emit on change).

Spark has no streaming rank; implemented as a keyed stateful op
(`applyInPandasWithState`): state keeps the current top-N (sort value +
payload); each micro-batch merges its rows, and rows that enter the top-N are
emitted with their (1-based) current rank. Emission policy matches the
reference's no-retraction "output only improvements" fast path: a row is
emitted when it joins the top-N; displaced rows are not retracted (use the
changelog module's conventions if a sink needs -U/-D).

Scale: state is N rows per key (bounded); shuffle is hash(key); identical to
the reference's keyed-state layout.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def window_topn(
    df: DataFrame,
    ts_col: str,
    size: str,
    key_cols: list[str],
    order_col: str,
    id_col: str,
    n: int,
    delay: str = "0 seconds",
) -> DataFrame:
    """Window Top-N (SURVEY §2.6; reference WindowRankProcessor.java:224):
    top-`n` rows per (tumbling window, key), emitted once when the window
    closes (append mode + watermark).

    Built entirely from built-in aggregates: collect the window's (order, id)
    pairs, sort descending, slice `n` — no Python, no custom state; Spark's
    window-state purge replaces the reference's watermark-triggered cleanup.
    State per (window, key) is the collected pair list — bounded by window
    row count; for heavy windows switch to the incremental streaming_topn
    keyed by (window, key).
    """
    pair = F.struct((-F.col(order_col)).alias("neg"), F.col(id_col).alias("id"))
    agg = (
        df.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, size).alias("w"), *key_cols)
        .agg(F.slice(F.sort_array(F.collect_list(pair)), 1, n).alias("top"))
    )
    return (
        agg.select(
            F.col("w.start").alias("w_start"), *key_cols,
            F.posexplode("top").alias("pos", "pair"),
        )
        .select(
            "w_start", *key_cols,
            (F.col("pos") + 1).cast("long").alias("rank"),
            F.col("pair.id").alias(id_col),
            (-F.col("pair.neg")).alias(order_col),
        )
    )


def streaming_topn(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    id_col: str,
    n: int,
    descending: bool = True,
) -> DataFrame:
    """Maintain top-`n` rows per key by `order_col` (ties → lower id wins).

    Output: key_cols + [id_col, order_col, rank] emitted whenever a row is
    (re)admitted to the top-N.
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + [f"{id_col} {dtypes[id_col]}", f"{order_col} {dtypes[order_col]}", "rank int"]
    )
    # State: parallel arrays of the current top-N (order values + ids).
    state_schema = f"vals array<{dtypes[order_col]}>, ids array<{dtypes[id_col]}>"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        if state.exists:
            vals, ids = state.get
            cur = pd.DataFrame({order_col: list(vals), id_col: list(ids)})
        else:
            cur = pd.DataFrame({order_col: [], id_col: []})
        merged = pd.concat([cur, batch[[order_col, id_col]]], ignore_index=True)
        merged = merged.sort_values(
            [order_col, id_col], ascending=[not descending, True], kind="stable"
        ).head(n)
        state.update((merged[order_col].tolist(), merged[id_col].tolist()))
        # Emit rows from this batch that made it into the current top-N.
        top_ids = set(merged[id_col])
        admitted = batch[batch[id_col].isin(top_ids)]
        if admitted.empty:
            return
        rank_of = {i: r + 1 for r, i in enumerate(merged[id_col].tolist())}
        out = admitted[[id_col, order_col]].copy()
        for i in range(n_keys):
            out[key_cols[i]] = key[i]
        out["rank"] = out[id_col].map(rank_of).astype("int32")
        yield out[key_cols + [id_col, order_col, "rank"]]

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)
    )
