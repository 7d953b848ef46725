"""Streaming event-time sort (SURVEY §2.6; reference RowTimeSortOperator.java
— buffer rows, flush in timestamp order when the watermark passes).

Keyed variant: rows are ordered per key-partition (the reference's keyed
sort); for a total order use a single constant key and accept parallelism 1,
exactly the reference's global-sort caveat.

State = buffered (ts, id) rows per key above the watermark; each micro-batch
emits (in ts, id order) every buffered row whose ts <= current watermark,
with a monotonically increasing per-key sequence number so downstream
consumers can verify ordering.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def rowtime_sort(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    delay: str = "0 seconds",
) -> DataFrame:
    """Emit rows in event-time order per key once the watermark passes them.

    Output: key cols + id + ts + seq (per-key emission sequence, 0-based).
    Rows above the final watermark stay buffered (event-time semantics).
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + [f"{id_col} {dtypes[id_col]}", f"{ts_col} {dtypes[ts_col]}", "seq long"]
    )
    state_schema = "ts array<bigint>, ids array<bigint>, seq long"
    n_keys = len(key_cols)
    wm = df.withWatermark(ts_col, delay)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            ts_buf, id_buf, seq = state.get
            ts_buf, id_buf = list(ts_buf), list(id_buf)
        else:
            ts_buf, id_buf, seq = [], [], 0
        if not batch.empty:
            for _, r in batch.iterrows():
                ts_buf.append(int(pd.Timestamp(r[ts_col]).value // 1000))
                id_buf.append(int(r[id_col]))
        wm_micros = state.getCurrentWatermarkMs() * 1000
        pairs = sorted(zip(ts_buf, id_buf))
        emit = [(t, i) for t, i in pairs if t <= wm_micros]
        keep = [(t, i) for t, i in pairs if t > wm_micros]
        rows = []
        for t, i in emit:
            rows.append({
                **{key_cols[j]: key[j] for j in range(n_keys)},
                id_col: i, ts_col: pd.Timestamp(t * 1000), "seq": seq,
            })
            seq += 1
        state.update(([t for t, _ in keep], [i for _, i in keep], seq))
        if rows:
            yield pd.DataFrame(rows)

    return (
        wm.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )
