"""Streaming deduplication (SURVEY §2.6; reference
flink-table-runtime/.../operators/deduplicate/ — keep-first/keep-last by
row-time or proc-time, DeduplicateFunctionHelper.java).

* keep-first — Spark's state-backed ``dropDuplicates`` emits the first row
  per key and drops the rest: exactly ProcTimeDeduplicateKeepFirstRowFunction.
  With a watermark, ``dropDuplicatesWithinWatermark`` bounds state (Flink's
  state-TTL'd variant).
* keep-last — needs retraction semantics (later row replaces earlier emit);
  implemented as a keyed stateful op via ``applyInPandasWithState``: state
  holds the current winner (max (ts, tiebreak)); each batch emits the new
  winner only when it changed — the +U stream of RowTimeDeduplicateFunction
  (emit-last, update mode).

Scale: state is one row per key; hash-partitioned by key; RocksDB state
store recommended at high key cardinality (config, not code).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_keep_first(df: DataFrame, keys: list[str], within_watermark: bool = False) -> DataFrame:
    """First row per key wins (streaming, state-backed)."""
    return df.dropDuplicatesWithinWatermark(keys) if within_watermark else df.dropDuplicates(keys)


def dedup_keep_first_rowtime(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """EVENT-TIME keep-first: the row with the smallest (rowtime, id) per key
    wins — reference RowTimeDeduplicateFunction keep-first (deduplicate/
    RowTimeDeduplicateFunction.java), vs `dedup_keep_first` above which is
    arrival-order (proc-time) semantics.

    Emits '+I' the first time a key is seen (the within-batch min), and a
    corrective '+U' if a LATER batch delivers an even earlier rowtime (late
    data) — the update-stream convention the reference uses when the input
    is not in rowtime order. Under in-order replay only +I rows appear, so
    the result is exactly `argmin_(ts,id)` per key and SQL-oracle-able.

    State per key = the winning (ts, id) pair — O(1), hash-partitioned by
    key; same layout as the reference's ValueState<RowData>.
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + [f"{id_col} {dtypes[id_col]}", f"{ts_col} {dtypes[ts_col]}",
           "__rowkind string"]
    )
    state_schema = "__ts_micros bigint, __id string"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        best = batch.sort_values([ts_col, id_col], kind="stable").iloc[0]
        best_micros = int(pd.Timestamp(best[ts_col]).value // 1000)
        best_key = (best_micros, str(best[id_col]))
        had_state = state.exists
        if had_state and best_key >= tuple(state.get):
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return  # stored winner is still earliest — drop the batch
        state.update(best_key)
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        row = {key_cols[i]: key[i] for i in range(n_keys)}
        row[id_col] = best[id_col]
        row[ts_col] = best[ts_col]
        row["__rowkind"] = "+U" if had_state else "+I"
        yield pd.DataFrame([row])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", timeout)
    )


def dedup_keep_last(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    ttl_ms: int | None = None,
) -> DataFrame:
    """Last row per key wins; emits an update whenever the winner changes.

    Output schema: key_cols + [ts_col] + value_cols + __rowkind ('+I' first
    emit, '+U' replacement) — the changelog convention from SURVEY §1.1.

    ``ttl_ms`` enables state TTL (StateTtlConfig.java:51 analog): keys idle
    longer than the TTL have their state cleared via a processing-time
    timeout, bounding state for evolving key spaces.
    """
    out_fields = (
        [f"{c} {t}" for c, t in df.select(*key_cols).dtypes]
        + [f"{ts_col} {dict(df.dtypes)[ts_col]}"]
        + [f"{c} {dict(df.dtypes)[c]}" for c in value_cols]
        + ["__rowkind string"]
    )
    out_schema = ", ".join(out_fields)
    # Timestamps round-trip poorly through state serialization — keep the
    # watermark-ish ordering value in state as epoch micros (bigint).
    state_schema = ", ".join(
        ["__ts_micros bigint"]
        + [f"{c} {dict(df.dtypes)[c]}" for c in value_cols]
    )
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # TTL expiry: forget the key (StateTtlConfig analog)
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        best = batch.sort_values(ts_col, kind="stable").iloc[-1]
        best_micros = int(pd.Timestamp(best[ts_col]).value // 1000)
        had_state = state.exists
        if had_state:
            prev = state.get
            # Strict <: an equal-rowtime row arriving later REPLACES the
            # stored winner — the same keep-last tie rule the within-batch
            # stable sort applies (latest arrival wins on equal ts), matching
            # the reference's keep-last deduplication.
            if best_micros < prev[0]:
                return
        state.update(tuple([best_micros] + [best[c] for c in value_cols]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        row = {key_cols[i]: key[i] for i in range(n_keys)}
        row[ts_col] = best[ts_col]
        for c in value_cols:
            row[c] = best[c]
        row["__rowkind"] = "+U" if had_state else "+I"
        yield pd.DataFrame([row])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", timeout)
    )
