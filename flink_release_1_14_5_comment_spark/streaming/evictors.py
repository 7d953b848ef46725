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
