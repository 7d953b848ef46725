"""Incremental streaming Top-N per key (SURVEY §2.6; reference
AppendOnlyTopNFunction.java:248, UpdatableTopNFunction.java,
RetractableTopNFunction.java; strategy choice RankProcessStrategy.java:54-110).

Spark has no streaming rank; implemented as keyed stateful ops
(`applyInPandasWithState`):

* ``streaming_topn`` — AppendOnly strategy: insert-only input, state is the
  bounded top-N buffer, emit on admission, no retractions.
* ``changelog_topn`` — Updatable + Retractable strategies: input is a
  changelog (+I/+U upsert by row key, -U/-D delete by row key); state keeps
  ALL live rows per key (the reference's RetractableTopNFunction keeps the
  same full TreeMap state — a retraction of a top row must promote the next
  best from below, which a bounded buffer cannot answer); output is itself a
  changelog of the top-N region (+I enter, +U rank/value change, -D leave).

Scale: AppendOnly state is N rows per key; changelog state is live-rows per
key (identical to the reference's retractable state bound). Shuffle is
hash(key) in both.
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


def _duration_seconds(size: str) -> int:
    """'N seconds|minutes|hours|days' → seconds (whole seconds only)."""
    qty, unit = size.strip().split()
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit.rstrip("s")]
    return int(qty) * mult


def window_topn_incremental(
    df: DataFrame,
    ts_col: str,
    size: str,
    key_cols: list[str],
    order_col: str,
    id_col: str,
    n: int,
    delay: str = "0 seconds",
) -> DataFrame:
    """Window Top-N for HEAVY windows (reference WindowRankProcessor.java:224
    pairs a bounded in-window top-N buffer with watermark-triggered emission;
    ``window_topn``'s collect_list state instead grows with the window's full
    row count — fine for small windows, a state bomb when one window holds
    millions of rows).

    State per (window, key) is exactly ``n`` (order, id) pairs: each batch
    merges into the bounded buffer and re-arms an event-time timeout at the
    window end; when the watermark passes it, the final ranked top-n is
    emitted once (append semantics) and state is dropped. Shuffle is
    hash(window, key) — same as the agg it replaces.

    Note: timeouts fire only when a later batch advances the watermark, so in
    a finite replay the last window(s) need a subsequent event past
    ``w_end + delay`` to flush; a continuous stream advances naturally.
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        ["w_start timestamp"]
        + [f"{c} {dtypes[c]}" for c in key_cols]
        + ["rank long", f"{id_col} {dtypes[id_col]}", f"{order_col} {dtypes[order_col]}"]
    )
    state_schema = f"vals array<{dtypes[order_col]}>, ids array<{dtypes[id_col]}>"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        w_start, w_end = key[0], key[1]
        if state.hasTimedOut:
            vals, ids = state.get
            state.remove()
            out = pd.DataFrame({order_col: list(vals), id_col: list(ids)})
            out = out.sort_values([order_col, id_col], ascending=[False, True],
                                  kind="stable").reset_index(drop=True)
            out["rank"] = out.index + 1
            out["w_start"] = w_start
            for i in range(n_keys):
                out[key_cols[i]] = key[2 + i]
            yield out[["w_start"] + key_cols + ["rank", id_col, order_col]]
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        if state.exists:
            vals, ids = state.get
            cur = pd.DataFrame({order_col: list(vals), id_col: list(ids)})
            merged = pd.concat([cur, batch[[order_col, id_col]]], ignore_index=True)
        else:
            merged = batch[[order_col, id_col]]
        merged = merged.sort_values([order_col, id_col], ascending=[False, True],
                                    kind="stable").head(n)
        state.update((merged[order_col].tolist(), merged[id_col].tolist()))
        # Fire when the watermark passes the window end; the engine requires a
        # timeout strictly ahead of the current watermark.
        w_end_ms = int(pd.Timestamp(w_end).value // 1_000_000)
        state.setTimeoutTimestamp(max(w_end_ms, state.getCurrentWatermarkMs() + 1))

    # F.window() only expands inside an Aggregate; for a stateful groupBy the
    # tumble assignment is plain epoch arithmetic (whole-second sizes).
    secs = _duration_seconds(size)
    start_s = F.floor(F.col(ts_col).cast("long") / secs) * secs
    return (
        df.withWatermark(ts_col, delay)
        .withColumn("__w_start", F.timestamp_seconds(start_s))
        .withColumn("__w_end", F.timestamp_seconds(start_s + secs))
        .groupBy("__w_start", "__w_end", *key_cols)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
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


def changelog_topn(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    id_col: str,
    n: int,
    descending: bool = True,
) -> DataFrame:
    """Top-N over a CHANGELOG input (reference UpdatableTopNFunction.java /
    RetractableTopNFunction.java; RankProcessStrategy picks by input trait).

    Input rows carry ``__rowkind``: '+I'/'+U' upsert the row keyed by
    ``id_col`` (Updatable path — no -U required), '-U'/'-D' remove it
    (Retractable path). State holds every live (id, value) per key: when a
    retraction evicts a top row, the next-best must be promoted from below,
    which only full state can answer (the reference stores the same).

    Output is a changelog of the top-N region: '+I' when a row enters,
    '+U' when its rank or value changes, '-D' when it leaves. Ties break to
    lower id, matching the batch rank operator.
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + [f"{id_col} {dtypes[id_col]}", f"{order_col} {dtypes[order_col]}",
           "rank int", "__rowkind string"]
    )
    state_schema = f"ids array<{dtypes[id_col]}>, vals array<{dtypes[order_col]}>"
    n_keys = len(key_cols)

    def top(live: dict) -> list:
        """[(id, val)] of the current top-n, rank order."""
        items = sorted(live.items(),
                       key=lambda kv: (-kv[1] if descending else kv[1], kv[0]))
        return items[:n]

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        if state.exists:
            ids, vals = state.get
            live = dict(zip(list(ids), list(vals)))
        else:
            live = {}
        old_top = top(live)
        for _, row in batch.iterrows():
            rid = row[id_col]
            if row["__rowkind"] in ("-U", "-D"):
                live.pop(rid, None)
            else:
                live[rid] = row[order_col]
        new_top = top(live)
        state.update((list(live.keys()), list(live.values())))
        old_rank = {i: (r + 1, v) for r, (i, v) in enumerate(old_top)}
        new_rank = {i: (r + 1, v) for r, (i, v) in enumerate(new_top)}
        out_rows = []
        keyd = {key_cols[i]: key[i] for i in range(n_keys)}
        for rid, (rk, v) in new_rank.items():
            if rid not in old_rank:
                out_rows.append({**keyd, id_col: rid, order_col: v,
                                 "rank": rk, "__rowkind": "+I"})
            elif old_rank[rid] != (rk, v):
                out_rows.append({**keyd, id_col: rid, order_col: v,
                                 "rank": rk, "__rowkind": "+U"})
        for rid, (rk, v) in old_rank.items():
            if rid not in new_rank:
                out_rows.append({**keyd, id_col: rid, order_col: v,
                                 "rank": rk, "__rowkind": "-D"})
        if out_rows:
            out = pd.DataFrame(out_rows)
            out["rank"] = out["rank"].astype("int32")
            yield out[key_cols + [id_col, order_col, "rank", "__rowkind"]]

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)
    )
