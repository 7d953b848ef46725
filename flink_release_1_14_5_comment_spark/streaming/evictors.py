"""Window evictors over event-time tumbling windows (SURVEY §2.9; reference
`CountEvictor.java` / `TimeEvictor.java` in flink-streaming-java
windowing/evictors — drop buffered elements before the window function runs).

Spark's built-in windowed aggregation is incremental (no element buffer), so
an evicting window needs the keyed-state path: buffer per (key, window),
evict on insert, aggregate at fire time when the watermark passes window end.

Divergence (documented): Flink evicts in ARRIVAL order; replayed
micro-batches have no stable arrival order, so eviction here uses EVENT-TIME
order ((ts, value) ascending — CountEvictor keeps the latest n, TimeEvictor
keeps the trailing `keep` span before window end). Deterministic under
replay, which Flink's arrival order is not.

Scale/state design:
* CountEvictor state is O(n_keep) per open (key, window) — eviction happens
  on INSERT, not at fire time, so state never exceeds the keep count
  (tighter than the reference, which buffers everything and evicts at fire).
* TimeEvictor prunes on insert too: anything older than window_end - keep
  can never survive, so state is bounded by the keep span's row density.
* Fired windows are removed from state; with watermark w, at most
  ceil(delay / size) + 1 windows per key are ever open.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _parse_seconds(spec: str) -> int:
    n, unit = spec.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
    return int(n) * mult


def _evicting_tumble(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    size: str,
    delay: str,
    evict,  # (rows: list[(ts_micros, value)], w_end_micros) -> kept rows
) -> DataFrame:
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["w_start timestamp", "n_kept int", "sum_value double"]
    )
    state_schema = "wins array<bigint>, ts array<bigint>, vals array<double>"
    size_us = _parse_seconds(size) * 1_000_000
    n_keys = len(key_cols)
    wm = df.withWatermark(ts_col, delay)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        dfs = [p for p in pdfs if not p.empty]
        batch = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
        if state.exists:
            wins, tss, vals = (list(x) for x in state.get)
        else:
            wins, tss, vals = [], [], []
        if not batch.empty:
            for _, r in batch.iterrows():
                t = int(pd.Timestamp(r[ts_col]).value // 1000)
                wins.append((t // size_us) * size_us)
                tss.append(t)
                vals.append(float(r[value_col]))
        # Re-evict every open window after the inserts (bounded state).
        by_win: dict[int, list[tuple[int, float]]] = {}
        for w, t, v in zip(wins, tss, vals):
            by_win.setdefault(w, []).append((t, v))
        by_win = {w: evict(sorted(rows), w + size_us) for w, rows in by_win.items()}
        wm_micros = state.getCurrentWatermarkMs() * 1000
        out = []
        for w in sorted(by_win):
            if w + size_us <= wm_micros:  # window closed: fire + purge
                rows = by_win.pop(w)
                out.append({
                    **{key_cols[i]: key[i] for i in range(n_keys)},
                    "w_start": pd.Timestamp(w * 1000),
                    "n_kept": len(rows),
                    "sum_value": sum(v for _, v in rows),
                })
        if by_win:
            state.update((
                [w for w, rows in by_win.items() for _ in rows],
                [t for rows in by_win.values() for t, _ in rows],
                [v for rows in by_win.values() for _, v in rows],
            ))
            # Event-time timer on the earliest open window end (reference:
            # WindowOperator.registerCleanupTimer) so the window fires even
            # if this key never receives another row. Always > watermark
            # here, else the window would have fired above.
            state.setTimeoutTimestamp(min(w + size_us for w in by_win) // 1000)
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return (
        wm.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.EventTimeTimeout)
    )


def processing_timeout_agg(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    timeout_ms: int,
    clear_on_timeout: bool = True,
) -> DataFrame:
    """ProcessingTimeoutTrigger emulation (reference
    `ProcessingTimeoutTrigger.java`: wrap an inner trigger and FIRE when a
    wall-clock timeout since the (first|latest) element expires — the
    classic "flush an idle key" trigger over GlobalWindows). Per key, rows
    buffer in state and each batch RESETS a processing-time timeout of
    ``timeout_ms`` (= resetTimerOnNewRecord=true); when the key goes idle
    past the timeout, Spark's no-data micro-batches (SPARK-24156: a
    stateful query with processing-time timeouts keeps scheduling batches)
    invoke the function with ``state.hasTimedOut`` and the buffered window
    fires. ``clear_on_timeout`` mirrors shouldClearOnTimeout.

    This is inherently WALL-CLOCK-driven — exactly why the remaining
    processing-time trigger family was long documented out; the emulation
    is still deterministic in WHAT it emits (the buffered rows per key),
    only WHEN is wall-clock, and the test asserts content, not timing.

    ContinuousProcessingTimeTrigger needs no custom operator at all:
    update-mode aggregation + ``trigger(processingTime=interval)`` IS
    repeated wall-clock firing of the current window contents — micro-batch
    cadence = firing cadence (documented ⚙️ config, COVERAGE §2.9).

    Scale: state per key = buffered scalars since last flush + Spark's
    timer; keys partition across executors, no extra shuffle.
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["n_rows int", "sum_value double"]
    )
    state_schema = "vals array<double>"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            vals = list(state.get[0]) if state.exists else []
            if clear_on_timeout:
                state.remove()
            else:
                state.setTimeoutDuration(timeout_ms)
            if vals:
                yield pd.DataFrame([{
                    **{key_cols[i]: key[i] for i in range(n_keys)},
                    "n_rows": len(vals),
                    "sum_value": float(sum(vals)),
                }])
            return
        dfs = [p for p in pdfs if not p.empty]
        batch = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
        vals = list(state.get[0]) if state.exists else []
        if not batch.empty:
            vals.extend(float(v) for v in batch[value_col])
        state.update((vals,))
        state.setTimeoutDuration(timeout_ms)
        return

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.ProcessingTimeTimeout)
    )


def tumble_agg_count_evictor(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    size: str,
    n_keep: int,
    delay: str = "0 seconds",
) -> DataFrame:
    """Tumbling event-time window keeping only the LATEST `n_keep` elements
    (by event time) before aggregating — CountEvictor semantics."""
    return _evicting_tumble(
        df, key_cols, ts_col, value_col, size, delay,
        evict=lambda rows, w_end: rows[-n_keep:],
    )


def tumble_agg_time_evictor(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    size: str,
    keep: str,
    delay: str = "0 seconds",
) -> DataFrame:
    """Tumbling event-time window keeping only elements in the trailing
    `keep` span before window end — TimeEvictor semantics."""
    keep_us = _parse_seconds(keep) * 1_000_000

    return _evicting_tumble(
        df, key_cols, ts_col, value_col, size, delay,
        evict=lambda rows, w_end: [r for r in rows if r[0] >= w_end - keep_us],
    )


def session_agg_count_evictor(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    gap: str,
    n_keep: int,
    delay: str = "0 seconds",
) -> DataFrame:
    """Merging SESSION windows composed with a CountEvictor — the reference's
    EventTimeSessionWindows.withGap(...) + CountEvictor.of(n) stack
    (SessionWindowAssigner + MergingWindowSet + WindowOperator
    evict-before-emit). Session BOUNDS come from the merging window set over
    ALL events ever assigned (eviction never shrinks a window), while the
    aggregate sees only the latest ``n_keep`` elements — exactly Flink's
    split between assigner state and the evicted window buffer.

    Merge rule matches Spark's session_window / the oracle convention:
    a gap of >= ``gap`` starts a new session.

    Scale: state per key = open sessions' bounds + at most ``n_keep`` rows
    each (eviction runs per batch, so the buffer is bounded); shuffle =
    hash(key), identical to the reference's keyed window state.
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["w_start timestamp", "w_end timestamp", "n_kept int",
           "sum_value double"]
    )
    state_schema = ("starts array<bigint>, lasts array<bigint>, "
                    "row_ts array<bigint>, row_val array<double>, "
                    "row_sess array<int>")
    gap_us = _parse_seconds(gap) * 1_000_000
    n_keys = len(key_cols)
    wm = df.withWatermark(ts_col, delay)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        dfs = [p for p in pdfs if not p.empty]
        batch = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
        sessions: list[list] = []  # [start, last, rows]
        if state.exists:
            starts, lasts, rts, rvs, rsi = (list(x) for x in state.get)
            sessions = [[starts[i], lasts[i], []] for i in range(len(starts))]
            for t, v, si in zip(rts, rvs, rsi):
                sessions[si][2].append((t, v))
        if not batch.empty:
            for _, r in batch.iterrows():
                t = int(pd.Timestamp(r[ts_col]).value // 1000)
                sessions.append([t, t, [(t, float(r[value_col]))]])
        # merge pass (MergingWindowSet): sorted by start, fold overlapping
        sessions.sort(key=lambda s: (s[0], s[1]))
        merged: list[list] = []
        for s in sessions:
            if merged and s[0] - merged[-1][1] < gap_us:
                m = merged[-1]
                m[1] = max(m[1], s[1])
                m[2].extend(s[2])
            else:
                merged.append(s)
        # evict AFTER merging: keep the latest n (ties by value, matching
        # the oracle's ORDER BY ts DESC, value DESC)
        for m in merged:
            m[2] = sorted(m[2])[-n_keep:]
        wm_micros = state.getCurrentWatermarkMs() * 1000
        out, open_sessions = [], []
        for m in merged:
            if m[1] + gap_us <= wm_micros:  # session closed: fire + purge
                out.append({
                    **{key_cols[i]: key[i] for i in range(n_keys)},
                    "w_start": pd.Timestamp(m[0] * 1000),
                    "w_end": pd.Timestamp((m[1] + gap_us) * 1000),
                    "n_kept": len(m[2]),
                    "sum_value": sum(v for _, v in m[2]),
                })
            else:
                open_sessions.append(m)
        if open_sessions:
            state.update((
                [m[0] for m in open_sessions],
                [m[1] for m in open_sessions],
                [t for m in open_sessions for t, _ in m[2]],
                [v for m in open_sessions for _, v in m[2]],
                [i for i, m in enumerate(open_sessions) for _ in m[2]],
            ))
            state.setTimeoutTimestamp(
                min(m[1] + gap_us for m in open_sessions) // 1000)
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return (
        wm.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.EventTimeTimeout)
    )


def delta_trigger_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    threshold: float,
    purge: bool = False,
) -> DataFrame:
    """DeltaTrigger emulation (reference `DeltaTrigger.java`: fire when
    delta(last_fired_element, current) > threshold, classically used over
    GlobalWindows). Per key, elements buffer in state; each element is
    compared to the element that caused the LAST firing (abs difference of
    ``value_col``) — crossing the threshold fires the window function over
    the buffered elements. ``purge=True`` composes PurgingTrigger semantics
    (`PurgingTrigger.java`: FIRE → FIRE_AND_PURGE, buffer cleared on fire).

    Output per fire: key cols, fire_ts (triggering element's event time),
    n_buffered, sum_value, trigger_value.

    Divergence (same as the evictors above): elements are processed in
    EVENT-TIME order within each micro-batch — deterministic under replay,
    where Flink's arrival order is not.

    Scale: state per key = buffered rows since last purge (or since start
    when purge=False — bound it upstream with an evictor) + one scalar. Keys
    partition across executors; no shuffle beyond the groupBy.
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["fire_ts timestamp", "n_buffered int", "sum_value double",
           "trigger_value double"]
    )
    state_schema = "ts array<bigint>, vals array<double>, last_fired double"
    n_keys = len(key_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        dfs = [p for p in pdfs if not p.empty]
        batch = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
        if state.exists:
            tss, vals, last_fired = state.get
            tss, vals = list(tss), list(vals)
        else:
            tss, vals, last_fired = [], [], None
        out = []
        if not batch.empty:
            batch = batch.sort_values(ts_col, kind="stable")
            for t, v in zip(batch[ts_col], batch[value_col]):
                t_us = int(pd.Timestamp(t).value // 1000)
                v = float(v)
                tss.append(t_us)
                vals.append(v)
                # DeltaTrigger.onElement: first element just seeds state
                if last_fired is None:
                    last_fired = v
                    continue
                if abs(v - last_fired) > threshold:
                    out.append({
                        **{key_cols[i]: key[i] for i in range(n_keys)},
                        "fire_ts": pd.Timestamp(t_us * 1000),
                        "n_buffered": len(vals),
                        "sum_value": float(sum(vals)),
                        "trigger_value": v,
                    })
                    last_fired = v
                    if purge:
                        tss, vals = [], []
        if tss or last_fired is not None:
            state.update((tss, vals, last_fired))
        if out:
            yield pd.DataFrame(out)

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.NoTimeout)
    )


def tumble_agg_continuous_event_time_trigger(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    size: str,
    interval: str,
    delay: str = "0 seconds",
) -> DataFrame:
    """ContinuousEventTimeTrigger emulation (reference
    `ContinuousEventTimeTrigger.java`): fire the window's CURRENT contents
    every `interval` of event time — early partial results for long windows
    — plus the final firing when the watermark closes the window.

    Mirrors the reference's timer protocol: the first element registers an
    aligned event-time timer at ``ceil(ts / interval) * interval``; when the
    watermark passes it, FIRE (no purge — contents accumulate) and register
    the next boundary. The final fire at window end purges. Fires happen on
    micro-batch watermark advancement (and via event-time timeout for keys
    with no further input), so contents = elements arrived when the
    watermark crossed the boundary — the reference's semantics at batch
    granularity.

    Output per fire: key cols, w_start, fire_time (the boundary), n_elems,
    sum_value, final.

    State per (key, open window) = full element buffer + one next-fire
    scalar; windows purge on close, so at most ceil(delay/size)+1 windows
    per key are open — same bound as the evictors above.
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["w_start timestamp", "fire_time timestamp", "n_elems int",
           "sum_value double", "final boolean"]
    )
    state_schema = ("wins array<bigint>, ts array<bigint>, vals array<double>, "
                    "nf_wins array<bigint>, nf_times array<bigint>")
    size_us = _parse_seconds(size) * 1_000_000
    interval_us = _parse_seconds(interval) * 1_000_000
    n_keys = len(key_cols)
    wm = df.withWatermark(ts_col, delay)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        dfs = [p for p in pdfs if not p.empty]
        batch = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
        if state.exists:
            wins, tss, vals, nf_wins, nf_times = (list(x) for x in state.get)
        else:
            wins, tss, vals, nf_wins, nf_times = [], [], [], [], []
        next_fire = dict(zip(nf_wins, nf_times))
        by_win: dict[int, list[tuple[int, float]]] = {}
        for w, t, v in zip(wins, tss, vals):
            by_win.setdefault(w, []).append((t, v))
        if not batch.empty:
            batch = batch.sort_values(ts_col, kind="stable")
            for t, v in zip(batch[ts_col], batch[value_col]):
                t_us = int(pd.Timestamp(t).value // 1000)
                w = (t_us // size_us) * size_us
                by_win.setdefault(w, []).append((t_us, float(v)))
                if w not in next_fire:
                    # ContinuousEventTimeTrigger.onElement: aligned boundary
                    # strictly above the first element's timestamp
                    next_fire[w] = (t_us // interval_us) * interval_us + interval_us
        wm_micros = state.getCurrentWatermarkMs() * 1000
        out = []

        def fire(w: int, boundary: int, rows: list, final: bool) -> None:
            out.append({
                **{key_cols[i]: key[i] for i in range(n_keys)},
                "w_start": pd.Timestamp(w * 1000),
                "fire_time": pd.Timestamp(boundary * 1000),
                "n_elems": len(rows),
                "sum_value": float(sum(v for _, v in rows)),
                "final": final,
            })

        for w in sorted(by_win):
            w_end = w + size_us
            nf = next_fire[w]
            while nf <= wm_micros and nf < w_end:
                fire(w, nf, by_win[w], final=False)
                nf += interval_us
            next_fire[w] = nf
            if w_end <= wm_micros:  # event-time close: final fire + purge
                fire(w, w_end, by_win.pop(w), final=True)
                next_fire.pop(w, None)
        if by_win:
            state.update((
                [w for w, rows in by_win.items() for _ in rows],
                [t for rows in by_win.values() for t, _ in rows],
                [v for rows in by_win.values() for _, v in rows],
                list(next_fire),
                [next_fire[w] for w in next_fire],
            ))
            # timer on the nearest pending boundary or window end, so fires
            # happen even if this key never receives another row
            state.setTimeoutTimestamp(
                min(min(next_fire[w], w + size_us) for w in by_win) // 1000)
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return (
        wm.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.EventTimeTimeout)
    )


def tumble_agg_purging_count_trigger(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    size: str,
    n_fire: int,
    delay: str = "0 seconds",
) -> DataFrame:
    """PurgingTrigger(CountTrigger.of(n)) over event-time tumbling windows
    (reference `PurgingTrigger.java` wrapping `CountTrigger.java`): every
    ``n_fire`` elements in a window, fire the aggregate of the buffer and
    PURGE it — so each fire covers only the elements since the last fire.
    The window's remainder (< n_fire elements) fires when the watermark
    closes the window (the same final firing Flink's event-time trigger
    contributes), with fire_seq counting fires within the window.

    State per (key, open window) is at most n_fire - 1 buffered elements —
    the purge is what makes count-triggered state bounded.
    """
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in key_cols]
        + ["w_start timestamp", "fire_seq int", "n_in_fire int",
           "sum_value double", "final boolean"]
    )
    state_schema = ("wins array<bigint>, ts array<bigint>, vals array<double>, "
                    "fired_wins array<bigint>, fired_counts array<int>")
    size_us = _parse_seconds(size) * 1_000_000
    n_keys = len(key_cols)
    wm = df.withWatermark(ts_col, delay)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        dfs = [p for p in pdfs if not p.empty]
        batch = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
        if state.exists:
            wins, tss, vals, fired_wins, fired_counts = (list(x) for x in state.get)
        else:
            wins, tss, vals, fired_wins, fired_counts = [], [], [], [], []
        n_fired = dict(zip(fired_wins, fired_counts))  # window -> fires so far
        by_win: dict[int, list[tuple[int, float]]] = {}
        for w, t, v in zip(wins, tss, vals):
            by_win.setdefault(w, []).append((t, v))
        out = []

        def fire(w: int, rows: list, final: bool) -> None:
            seq = n_fired.get(w, 0) + 1
            n_fired[w] = seq
            out.append({
                **{key_cols[i]: key[i] for i in range(n_keys)},
                "w_start": pd.Timestamp(w * 1000),
                "fire_seq": seq,
                "n_in_fire": len(rows),
                "sum_value": float(sum(v for _, v in rows)),
                "final": final,
            })

        if not batch.empty:
            batch = batch.sort_values(ts_col, kind="stable")
            for t, v in zip(batch[ts_col], batch[value_col]):
                t_us = int(pd.Timestamp(t).value // 1000)
                w = (t_us // size_us) * size_us
                buf = by_win.setdefault(w, [])
                buf.append((t_us, float(v)))
                if len(buf) >= n_fire:  # CountTrigger FIRE + purge
                    fire(w, buf, final=False)
                    by_win[w] = []
        wm_micros = state.getCurrentWatermarkMs() * 1000
        for w in sorted(list(by_win)):
            if w + size_us <= wm_micros:  # event-time close: final fire
                rows = by_win.pop(w)
                if rows or n_fired.get(w, 0) == 0:
                    fire(w, rows, final=True)
                n_fired.pop(w, None)  # fired-count state purges with window
        # windows emptied by a count-fire that never saw another row: their
        # fired-count entry must purge once the watermark passes window end
        for w in list(n_fired):
            if w not in by_win and w + size_us <= wm_micros:
                del n_fired[w]
        # Persist the fired count of EVERY un-closed window — including ones
        # with no buffered rows right now (emptied by a count-fire): a later
        # in-watermark row for that window must continue its fire_seq, not
        # restart at 1 (round-4 review finding).
        if by_win or n_fired:
            state.update((
                [w for w, rows in by_win.items() for _ in rows],
                [t for rows in by_win.values() for t, _ in rows],
                [v for rows in by_win.values() for _, v in rows],
                list(n_fired),
                [n_fired[w] for w in n_fired],
            ))
            state.setTimeoutTimestamp(
                min(w + size_us for w in (*by_win, *n_fired)) // 1000)
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return (
        wm.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.EventTimeTimeout)
    )
