"""Stream-stream joins (SURVEY §2.3 streaming rows) — Spark-native.

* Regular streaming inner/outer join with watermark-bounded state —
  reference StreamingJoinOperator.java:36; Spark keeps both sides' state and
  purges by watermark: same semantics when a time bound exists.
* UNBOUNDED full-history regular join with retractions (the reference's
  actual StreamingJoinOperator semantics, no time bound) —
  ``regular_join_stream`` below: one keyed co-process holds both sides'
  full history in state, emits +I/-D changelog rows, honors -D retraction
  INPUTS, and clears idle keys by processing-time TTL (the reference's
  table.exec.state.ttl / JoinRecordStateViews).
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


def _join_transition(
    side: str,
    rowop: str,
    payload: str,
    lpay: list,
    rpay: list,
    pad_left: bool,
    pad_right: bool,
) -> list[tuple]:
    """Pure changelog transition for one arriving event of the full-history
    equi-join (factored out of the stateful step so the semantics are unit-
    and property-testable without a streaming runtime — see
    tests/test_property_based.py). Mutates lpay/rpay in place and returns
    the emissions as (op, left_payload | None, right_payload | None).

    One symmetric handler: `mine`/`other` are the arriving side's own and
    opposite state lists; pad_mine pads THIS side's unmatched rows,
    pad_other the opposite side's."""
    if side == "L":
        mine, other = lpay, rpay
        pad_mine, pad_other = pad_left, pad_right
        pair = lambda op, m, o: (op, m, o)  # noqa: E731
    else:
        mine, other = rpay, lpay
        pad_mine, pad_other = pad_right, pad_left
        pair = lambda op, m, o: (op, o, m)  # noqa: E731
    out: list[tuple] = []
    if rowop == "+I":
        if other:
            if pad_other and not mine:
                # the other side's rows were all unmatched → their pads
                # die with this first match
                out.extend(pair("-D", None, o) for o in other)
            out.extend(pair("+I", payload, o) for o in other)
        elif pad_mine:
            out.append(pair("+I", payload, None))
        mine.append(payload)
    else:  # -D: retract this row and everything it joined
        try:
            i = mine.index(payload)
        except ValueError:
            return out  # retraction for a row we never saw
        del mine[i]
        if other:
            out.extend(pair("-D", payload, o) for o in other)
            if pad_other and not mine:
                # this side drained: other rows unmatched again
                out.extend(pair("+I", None, o) for o in other)
        elif pad_mine:
            out.append(pair("-D", payload, None))
    return out


def _semi_anti_transition(
    side: str,
    rowop: str,
    payload: str,
    lpay: list,
    rpay: list,
    semi: bool,
) -> list[tuple]:
    """Pure changelog transition for the streaming semi/anti join: returns
    (op, left_payload) emissions; left-row liveness flips on the right
    side's 0→1 / 1→0 count transitions. Mutates lpay/rpay in place."""
    out: list[tuple] = []
    if side == "L":
        if rowop == "+I":
            if bool(rpay) == semi:
                out.append(("+I", payload))
            lpay.append(payload)
        else:
            try:
                i = lpay.index(payload)
            except ValueError:
                return out
            if bool(rpay) == semi:
                out.append(("-D", payload))
            del lpay[i]
    else:
        if rowop == "+I":
            if not rpay:  # 0→1: every left row flips liveness
                op = "+I" if semi else "-D"
                out.extend((op, lp) for lp in lpay)
            rpay.append(payload)
        else:
            try:
                i = rpay.index(payload)
            except ValueError:
                return out
            del rpay[i]
            if not rpay:  # 1→0: flip back
                op = "-D" if semi else "+I"
                out.extend((op, lp) for lp in lpay)
    return out


def regular_join_stream(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    how: str = "inner",
    ttl: str | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Unbounded full-history stream-stream equi-join with retractions — the
    reference's regular streaming join (StreamingJoinOperator.java:36 +
    JoinRecordStateViews): BOTH sides' complete history lives in keyed state
    (no watermark bound), and output is a changelog:

      * left +I row  → joins against every stored right row; under
        ``how="left"`` an unmatched left row emits a null-padded +I that is
        RETRACTED (-D) the moment its first right match arrives (the
        OuterJoinRecordStateView numOfAssociations dance). ``how="right"``
        mirrors this for unmatched right rows, and ``how="full"`` pads BOTH
        sides — when the first row arrives on a previously-empty side, every
        pad the other side had emitted is retracted, and when a side drains
        back to empty its partners' pads are re-emitted, matching the
        reference's AbstractStreamingJoinOperator outer bookkeeping.
      * -D input rows (an optional ``__op`` column, default "+I") remove the
        matching row from state and retract (-D) every join row it produced.
      * idle-key TTL: ``ttl`` (e.g. "1 hour") clears a key's state after that
        long without ANY row — the reference's table.exec.state.ttl. Expiry
        drops state silently (no retraction), exactly like Flink state TTL.

    Output schema: ``op string`` + key cols + left payload + right payload
    (right side null-padded for unmatched outer rows). Payload column names
    must be disjoint across sides. ``seq_col`` (present in both inputs, NOT
    emitted) orders rows WITHIN a micro-batch so interleavings replay
    deterministically — the micro-batch analogue of the single-record arrival
    order the reference sees; without it, batch order is arrival order.

    Scale: state is O(full history per hot key) by design — exactly the
    reference's cost. At 100 TB you cap it with ``ttl`` (the reference's own
    answer) or use interval/window joins when a time bound exists. State is
    partitioned by join key across executors; a skewed key concentrates on
    one task, same as the reference's keyed state.
    """
    if how not in ("inner", "left", "right", "full"):
        raise NotImplementedError(f"regular_join_stream: how={how!r}")
    pad_left = how in ("left", "full")    # unmatched LEFT rows null-padded
    pad_right = how in ("right", "full")  # unmatched RIGHT rows null-padded
    skip = {*key_cols, "__op"} | ({seq_col} if seq_col else set())
    lcols = [c for c in left.columns if c not in skip]
    rcols = [c for c in right.columns if c not in skip]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"payload columns must be disjoint: {sorted(overlap)}")
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    key_dt = [(c, ldt[c]) for c in key_cols]
    out_schema = ", ".join(
        ["op string"]
        + [f"{c} {t}" for c, t in key_dt]
        + [f"{c} {ldt[c]}" for c in lcols]
        + [f"{c} {rdt[c]}" for c in rcols]
    )
    ts_cols = [c for c in lcols if ldt[c].startswith("timestamp")] + \
              [c for c in rcols if rdt[c].startswith("timestamp")]
    # No per-left-row association counter (the reference's
    # OuterJoinRecordStateView numOfAssociations): for a pure equi-join
    # every stored left row joins every stored right row, so the count is
    # invariantly len(rpay) — "unmatched" is simply rpay being empty.
    state_schema = "lpay array<string>, rpay array<string>"
    ttl_ms = None
    if ttl is not None:
        from flink_release_1_14_5_comment_spark.streaming.evictors import _parse_seconds

        ttl_ms = int(_parse_seconds(ttl) * 1000)
    n_keys = len(key_cols)

    def pack(df: DataFrame, cols: list[str], side: str) -> DataFrame:
        op = F.col("__op") if "__op" in df.columns else F.lit("+I")
        seq = F.col(seq_col) if seq_col else F.lit(0)
        return df.select(
            *key_cols,
            F.lit(side).alias("__side"),
            op.alias("__rowop"),
            seq.cast("long").alias("__seq"),
            F.to_json(F.struct(*cols)).alias("__payload"),
        )

    u = pack(left, lcols, "L").unionByName(pack(right, rcols, "R"))

    def step(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # reference state-TTL semantics: silent drop, no retractions
            state.remove()
            return
        dfs = [p for p in pdfs if not p.empty]
        batch = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
        lpay, rpay = (
            (list(x) for x in state.get) if state.exists else ([], [])
        )
        lpay, rpay = list(lpay), list(rpay)
        keyvals = {key_cols[i]: key[i] for i in range(n_keys)}

        def emit(op: str, lp: str | None, rp: str | None) -> dict:
            row = dict(keyvals)
            row["op"] = op
            lvals = json.loads(lp) if lp is not None else {}
            rvals = json.loads(rp) if rp is not None else {}
            for c in lcols:
                row[c] = lvals.get(c)
            for c in rcols:
                row[c] = rvals.get(c)
            return row

        out: list[dict] = []
        if not batch.empty:
            if seq_col:
                batch = batch.sort_values("__seq", kind="stable")
            for side, rowop, payload in batch[
                ["__side", "__rowop", "__payload"]
            ].itertuples(index=False, name=None):
                out.extend(
                    emit(op, lp, rp)
                    for op, lp, rp in _join_transition(
                        side, rowop, payload, lpay, rpay, pad_left, pad_right)
                )
        if lpay or rpay:
            state.update((lpay, rpay))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
        elif state.exists:
            state.remove()
        if out:
            pdf = pd.DataFrame(out)
            for c in ts_cols:
                if c in pdf.columns:
                    pdf[c] = pd.to_datetime(pdf[c])
            yield pdf

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None else GroupStateTimeout.NoTimeout
    )
    return (
        u.groupBy(*key_cols)
        .applyInPandasWithState(step, out_schema, state_schema, "append", timeout)
    )


def semi_anti_join_stream(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    how: str = "semi",
    ttl: str | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Unbounded full-history streaming SEMI / ANTI join with retractions —
    the reference's StreamingSemiAntiJoinOperator: output is the LEFT rows
    only, as a changelog keyed on whether the right side currently holds
    ANY row for the key.

      * ``how="semi"``: a left row is live while the right side is
        non-empty. The right count's 0→1 transition births every stored
        left row (+I each); 1→0 (last right row retracted) kills them (-D).
      * ``how="anti"``: the exact mirror — live while the right side is
        EMPTY, so 0→1 retracts and 1→0 re-emits.
      * -D inputs on either side are honored (spurious retractions of
        never-seen rows are ignored, like JoinRecordStateView's no-op).
      * ``ttl`` / ``seq_col`` behave as in :func:`regular_join_stream`.

    Output schema: ``op string`` + key cols + left payload (right payload
    never appears — that is the semi/anti contract).

    Scale: right-side state could be just a per-key count, but retractable
    inputs need the payload multiset to drop spurious -Ds, so both sides
    keep their history (the reference stores both sides too); ``ttl`` is
    the unbounded-state answer, exactly as for the regular join.
    """
    if how not in ("semi", "anti"):
        raise NotImplementedError(f"semi_anti_join_stream: how={how!r}")
    semi = how == "semi"
    skip = {*key_cols, "__op"} | ({seq_col} if seq_col else set())
    lcols = [c for c in left.columns if c not in skip]
    rcols = [c for c in right.columns if c not in skip]
    ldt = dict(left.dtypes)
    out_schema = ", ".join(
        ["op string"]
        + [f"{c} {ldt[c]}" for c in key_cols]
        + [f"{c} {ldt[c]}" for c in lcols]
    )
    ts_cols = [c for c in lcols if ldt[c].startswith("timestamp")]
    state_schema = "lpay array<string>, rpay array<string>"
    ttl_ms = None
    if ttl is not None:
        from flink_release_1_14_5_comment_spark.streaming.evictors import _parse_seconds

        ttl_ms = int(_parse_seconds(ttl) * 1000)
    n_keys = len(key_cols)

    def pack(df: DataFrame, cols: list[str], side: str) -> DataFrame:
        op = F.col("__op") if "__op" in df.columns else F.lit("+I")
        seq = F.col(seq_col) if seq_col else F.lit(0)
        return df.select(
            *key_cols,
            F.lit(side).alias("__side"),
            op.alias("__rowop"),
            seq.cast("long").alias("__seq"),
            F.to_json(F.struct(*cols)).alias("__payload"),
        )

    u = pack(left, lcols, "L").unionByName(pack(right, rcols, "R"))

    def step(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        dfs = [p for p in pdfs if not p.empty]
        batch = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
        lpay, rpay = (
            (list(x) for x in state.get) if state.exists else ([], [])
        )
        lpay, rpay = list(lpay), list(rpay)
        keyvals = {key_cols[i]: key[i] for i in range(n_keys)}

        def emit(op: str, lp: str) -> dict:
            row = dict(keyvals)
            row["op"] = op
            row.update({c: json.loads(lp).get(c) for c in lcols})
            return row

        out: list[dict] = []
        if not batch.empty:
            if seq_col:
                batch = batch.sort_values("__seq", kind="stable")
            for side, rowop, payload in batch[
                ["__side", "__rowop", "__payload"]
            ].itertuples(index=False, name=None):
                out.extend(
                    emit(op, lp)
                    for op, lp in _semi_anti_transition(
                        side, rowop, payload, lpay, rpay, semi)
                )
        if lpay or rpay:
            state.update((lpay, rpay))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
        elif state.exists:
            state.remove()
        if out:
            pdf = pd.DataFrame(out)
            for c in ts_cols:
                if c in pdf.columns:
                    pdf[c] = pd.to_datetime(pdf[c])
            yield pdf

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None else GroupStateTimeout.NoTimeout
    )
    return (
        u.groupBy(*key_cols)
        .applyInPandasWithState(step, out_schema, state_schema, "append", timeout)
    )
