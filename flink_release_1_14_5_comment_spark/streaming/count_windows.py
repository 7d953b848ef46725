"""Count windows (SURVEY §2.9; reference KeyedStream.java:696,706 —
countWindow(size) tumbling / countWindow(size, slide) sliding).

No Spark builtin — a keyed stateful op: state = (elements seen in the open
window, running sum, window sequence number); a full window emits one
aggregate row and resets. Rows are processed in (ts-free) id order within a
batch for determinism; Flink's count windows are arrival-ordered, which
micro-batch replay approximates batch-by-batch.

State: O(1) per key (count + sum + seq) — the aggregate is folded
incrementally, not buffered (reference: ReducingState in the window
operator).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_count_window(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    size: int,
) -> DataFrame:
    """Emit (key, window_seq, n, sum_value) once per completed window of
    `size` elements per key."""
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["window_seq long", "n int", "sum_value double"]
    )
    state_schema = "seq long, cnt int, acc double"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(id_col, kind="stable")
        seq, cnt, acc = state.get if state.exists else (0, 0, 0.0)
        out = []
        for v in batch[value_col]:
            cnt += 1
            acc += float(v)
            if cnt == size:
                out.append({
                    **{key_cols[i]: key[i] for i in range(n_keys)},
                    "window_seq": seq, "n": cnt, "sum_value": acc,
                })
                seq, cnt, acc = seq + 1, 0, 0.0
        state.update((seq, cnt, acc))
        if out:
            yield pd.DataFrame(out)

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )


def sliding_count_window(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    size: int,
    slide: int,
) -> DataFrame:
    """countWindow(size, slide): every `slide`-th element per key emits an
    aggregate over the LAST `size` elements (reference: GlobalWindows +
    CountTrigger(slide) + CountEvictor(size), KeyedStream.java:706).

    State = ring buffer of the last `size` values + element counter —
    O(size) per key, independent of stream length. Fires at elements
    slide, 2*slide, …; early windows aggregate fewer than `size` elements
    (CountEvictor keeps what exists), matching the reference.
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["fire_seq long", "n int", "sum_value double"]
    )
    state_schema = "buf array<double>, seen long"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(id_col, kind="stable")
        buf, seen = (list(state.get[0]), state.get[1]) if state.exists else ([], 0)
        out = []
        for v in batch[value_col]:
            buf.append(float(v))
            if len(buf) > size:
                buf.pop(0)
            seen += 1
            if seen % slide == 0:
                out.append({
                    **{key_cols[i]: key[i] for i in range(n_keys)},
                    "fire_seq": seen // slide - 1,
                    "n": len(buf), "sum_value": sum(buf),
                })
        state.update((buf, seen))
        if out:
            yield pd.DataFrame(out)

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )
