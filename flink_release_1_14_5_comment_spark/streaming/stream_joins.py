"""Stream-stream joins (SURVEY §2.3 streaming rows) — Spark-native.

* Regular streaming inner/outer join with watermark-bounded state —
  reference StreamingJoinOperator.java:36; Spark keeps both sides' state and
  purges by watermark: same semantics when a time bound exists. The
  reference's *unbounded* full-history join with retractions has no bounded
  equivalent — documented non-goal (needs TTL to be safe at scale anyway).
* Interval join (TimeIntervalJoin.java:51) — natively a stream-stream join
  whose condition carries the time band; state is pruned to the band width.
* Window join (WindowJoinOperator.java:66) — equality on `window(ts, size)`
  structs: both sides' state purges when the window closes.

These are thin, typed wrappers that enforce the watermark prerequisites
Spark requires (and Flink implies).
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: Column,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    left_delay: str = "0 seconds",
    right_delay: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """right.ts ∈ [left.ts - lower, left.ts + upper] on an equi-key.

    Both sides get watermarks; Spark derives state-retention bounds from the
    band (the reference's cleanup timers, TimeIntervalJoin cleanUpState).
    """
    l = left.withWatermark(left_ts, left_delay)
    r = right.withWatermark(right_ts, right_delay)
    cond = (
        key
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)


def window_join_stream(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    size: str,
    delay: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join rows that fall in the same tumbling window (reference
    WindowJoinOperator): equality on the window struct + keys.

    Output: w_start, w_end, key cols, then both sides' payload columns.
    The raw event-time columns are dropped — after the join the output would
    otherwise carry TWO watermarked columns, which Spark's watermark
    propagation rejects ("more than one event time column").
    """
    l = left.withWatermark(left_ts, delay).withColumn("__w", F.window(left_ts, size))
    r = right.withWatermark(right_ts, delay).withColumn("__w", F.window(right_ts, size))
    joined = l.join(r, ["__w", *key_cols], how)
    payload = [
        c for c in joined.columns
        if c not in {"__w", left_ts, right_ts, *key_cols}
    ]
    return joined.select(
        F.col("__w.start").alias("w_start"), F.col("__w.end").alias("w_end"),
        *key_cols, *payload,
    )


def co_group_stream(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    size: str,
    fn: Callable[[pd.DataFrame, pd.DataFrame], dict],
    extra_schema: str,
    delay: str = "0 seconds",
) -> DataFrame:
    """DataStream coGroup (reference CoGroupedStreams.java / DataStream
    coGroup entry at DataStream.java:730): per (key, tumbling window) the
    user fn sees ALL left rows and ALL right rows that fell in the window —
    the generalization of window join to arbitrary two-sided group logic
    (outer-ish joins, set math, asymmetric aggregates). Unlike window join,
    a (key, window) fires even when ONE side is empty.

    Spark-first shape: the two inputs (arbitrary, different schemas) ride a
    single tagged union — payloads packed to JSON so one union schema fits
    both — then one keyed stateful op buffers rows per open window and fires
    when the watermark passes window end (event-time timer as the
    no-more-rows fallback, reference WindowOperator.registerCleanupTimer).
    State per key = open windows only; fired windows are purged.

    ``fn(left_rows, right_rows) -> dict`` produces the extra output columns
    declared in ``extra_schema``; output rows are key cols + w_start +
    extras. Timestamps inside the packed payload arrive as ISO strings
    (to_json), which per-window logic rarely needs.
    """
    from flink_release_1_14_5_comment_spark.streaming.evictors import _parse_seconds

    size_us = _parse_seconds(size) * 1_000_000
    n_keys = len(key_cols)
    dtypes = dict(left.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["w_start timestamp", extra_schema]
    )
    state_schema = "wins array<bigint>, sides array<string>, payloads array<string>"

    def pack(df: DataFrame, ts: str, side: str) -> DataFrame:
        payload = F.to_json(F.struct(*[c for c in df.columns if c not in key_cols]))
        return (
            df.withWatermark(ts, delay)
            .select(*key_cols, F.col(ts).alias("__ts"),
                    F.lit(side).alias("__side"), payload.alias("__payload"))
        )

    u = pack(left, left_ts, "L").unionByName(pack(right, right_ts, "R"))

    def step(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        dfs = [p for p in pdfs if not p.empty]
        batch = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
        wins, sides, payloads = (
            (list(x) for x in state.get) if state.exists else ([], [], [])
        )
        wins, sides, payloads = list(wins), list(sides), list(payloads)
        if not batch.empty:
            for _, r in batch.iterrows():
                t = int(pd.Timestamp(r["__ts"]).value // 1000)
                wins.append((t // size_us) * size_us)
                sides.append(r["__side"])
                payloads.append(r["__payload"])
        by_win: dict[int, list[tuple[str, str]]] = {}
        for w, s, p in zip(wins, sides, payloads):
            by_win.setdefault(w, []).append((s, p))
        wm_micros = state.getCurrentWatermarkMs() * 1000
        out = []
        for w in sorted(by_win):
            if w + size_us <= wm_micros:  # window closed: fire + purge
                rows = by_win.pop(w)
                lpdf = pd.DataFrame([json.loads(p) for s, p in rows if s == "L"])
                rpdf = pd.DataFrame([json.loads(p) for s, p in rows if s == "R"])
                out.append({
                    **{key_cols[i]: key[i] for i in range(n_keys)},
                    "w_start": pd.Timestamp(w * 1000),
                    **fn(lpdf, rpdf),
                })
        if by_win:
            state.update((
                [w for w, rows in by_win.items() for _ in rows],
                [s for rows in by_win.values() for s, _ in rows],
                [p for rows in by_win.values() for _, p in rows],
            ))
            state.setTimeoutTimestamp(min(w + size_us for w in by_win) // 1000)
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return (
        u.groupBy(*key_cols)
        .applyInPandasWithState(step, out_schema, state_schema, "append",
                                GroupStateTimeout.EventTimeTimeout)
    )
