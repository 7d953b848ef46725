"""Streaming OVER aggregates — SURVEY §2.5; reference
RowTimeRowsBoundedPrecedingFunction.java:56 (ROWS BETWEEN N PRECEDING AND
CURRENT ROW per key, event-time ordered).

Spark has no streaming window functions; this is a keyed stateful op:
state = the last N (ts, value) pairs per key (bounded ring buffer — exactly
the reference's per-key state layout); each arriving row emits the aggregate
over its preceding frame. Assumes in-order arrival per key within the
watermark (the reference buffers out-of-order rows until the watermark;
micro-batch replay in ts order gives the same guarantee per batch — rows are
sorted within each batch before stepping).

Output: key + id + ts + value + running_sum/running_avg/running_count over
the trailing `n_rows` frame (inclusive of the current row).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def rows_bounded_over(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    n_rows: int,
) -> DataFrame:
    """SUM/AVG/COUNT OVER (PARTITION BY key ORDER BY ts ROWS n_rows-1 PRECEDING)."""
    dtypes = dict(df.dtypes)
    out_schema = ", ".join([
        *[f"{c} {dtypes[c]}" for c in key_cols],
        f"{id_col} {dtypes[id_col]}",
        f"{ts_col} {dtypes[ts_col]}",
        f"{value_col} {dtypes[value_col]}",
        "running_sum double", "running_avg double", "running_count int",
    ])
    state_schema = "ts_micros array<bigint>, vals array<double>"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values([ts_col, id_col], kind="stable")
        if state.exists:
            ts_buf, val_buf = [list(x) for x in state.get]
        else:
            ts_buf, val_buf = [], []
        out_rows = []
        for _, row in batch.iterrows():
            ts_buf.append(int(pd.Timestamp(row[ts_col]).value // 1000))
            val_buf.append(float(row[value_col]))
            if len(val_buf) > n_rows:
                ts_buf.pop(0)
                val_buf.pop(0)
            out_rows.append({
                **{key_cols[i]: key[i] for i in range(n_keys)},
                id_col: row[id_col],
                ts_col: row[ts_col],
                value_col: row[value_col],
                "running_sum": sum(val_buf),
                "running_avg": sum(val_buf) / len(val_buf),
                "running_count": len(val_buf),
            })
        state.update((ts_buf, val_buf))
        yield pd.DataFrame(out_rows)

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )


def range_bounded_over(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    range_seconds: float,
) -> DataFrame:
    """SUM/AVG/COUNT OVER (PARTITION BY key ORDER BY ts RANGE INTERVAL
    `range_seconds` PRECEDING AND CURRENT ROW) — reference
    RowTimeRangeBoundedPrecedingFunction.java:63.

    State per key = only the (ts, value) pairs inside the trailing time
    range (evicted as the frame slides — the reference keeps the same
    retract-list state). RANGE frames are PEER-INCLUSIVE: every row sharing
    a timestamp sees a frame containing ALL its peers, so rows are stepped
    per distinct timestamp, peers added before any of them emits — the
    batch window's RANGE semantics exactly."""
    rng = int(range_seconds * 1_000_000)
    dtypes = dict(df.dtypes)
    out_schema = ", ".join([
        *[f"{c} {dtypes[c]}" for c in key_cols],
        f"{id_col} {dtypes[id_col]}",
        f"{ts_col} {dtypes[ts_col]}",
        f"{value_col} {dtypes[value_col]}",
        "running_sum double", "running_avg double", "running_count int",
    ])
    state_schema = "ts_micros array<bigint>, vals array<double>"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values([ts_col, id_col], kind="stable")
        if state.exists:
            ts_buf, val_buf = [list(x) for x in state.get]
        else:
            ts_buf, val_buf = [], []
        out_rows = []
        keyd = {key_cols[i]: key[i] for i in range(n_keys)}
        for ts_val, grp in batch.groupby(ts_col, sort=True):
            t = int(pd.Timestamp(ts_val).value // 1000)
            for _, row in grp.iterrows():  # all peers enter the frame first
                ts_buf.append(t)
                val_buf.append(float(row[value_col]))
            while ts_buf and ts_buf[0] < t - rng:
                ts_buf.pop(0)
                val_buf.pop(0)
            s, c = sum(val_buf), len(val_buf)
            for _, row in grp.iterrows():
                out_rows.append({
                    **keyd,
                    id_col: row[id_col], ts_col: row[ts_col],
                    value_col: row[value_col],
                    "running_sum": s, "running_avg": s / c, "running_count": c,
                })
        state.update((ts_buf, val_buf))
        yield pd.DataFrame(out_rows)

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )


def unbounded_preceding_over(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """SUM/AVG/COUNT/MIN/MAX OVER (PARTITION BY key ORDER BY ts ROWS
    UNBOUNDED PRECEDING) — reference RowTimeRowsUnboundedPrecedingFunction
    (flink-table-runtime operators/over/): per-key running aggregates since
    stream start. State is O(1) per key (count/sum/min/max scalars), the
    same accumulator layout the reference keeps in ValueState — no buffer,
    so this is the cheapest streaming over-agg at any scale."""
    dtypes = dict(df.dtypes)
    out_schema = ", ".join([
        *[f"{c} {dtypes[c]}" for c in key_cols],
        f"{id_col} {dtypes[id_col]}",
        f"{ts_col} {dtypes[ts_col]}",
        f"{value_col} {dtypes[value_col]}",
        "running_sum double", "running_avg double",
        "running_count long", "running_min double", "running_max double",
    ])
    state_schema = "cnt long, acc double, mn double, mx double"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values([ts_col, id_col], kind="stable")
        cnt, acc, mn, mx = state.get if state.exists else (0, 0.0, None, None)
        # Vectorized prefix scans (no per-row Python loop): cumsum/cummin/
        # cummax over the batch, offset by the carried accumulator state.
        v = batch[value_col].to_numpy(dtype=np.float64)
        # seed the scan with the carried accumulator so the FP association
        # ((acc+v1)+v2)... is identical to a row-at-a-time loop
        sums = np.cumsum(np.concatenate(([acc], v)))[1:]
        counts = np.arange(1, len(v) + 1, dtype=np.int64) + cnt
        mins = np.minimum.accumulate(v)
        maxs = np.maximum.accumulate(v)
        if mn is not None:
            mins = np.minimum(mins, mn)
        if mx is not None:
            maxs = np.maximum(maxs, mx)
        out = pd.DataFrame({
            **{key_cols[i]: key[i] for i in range(n_keys)},
            id_col: batch[id_col].to_numpy(),
            ts_col: batch[ts_col].to_numpy(),
            value_col: batch[value_col].to_numpy(),
            "running_sum": sums,
            "running_avg": sums / counts,
            "running_count": counts,
            "running_min": mins,
            "running_max": maxs,
        })
        state.update((int(counts[-1]), float(sums[-1]), float(mins[-1]), float(maxs[-1])))
        yield out

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )
