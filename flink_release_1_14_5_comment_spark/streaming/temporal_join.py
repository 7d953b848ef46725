"""Streaming temporal (as-of) join — SURVEY §2.3; reference
TemporalProcessTimeJoinOperator.java:153 / TemporalRowTimeJoinOperator.java:78.

Processing-time semantics (the reference's `FOR SYSTEM_TIME AS OF proctime`):
each probe row joins the newest build-side version *seen so far* for its key.
One keyed stateful op over the tagged union of both streams:

  state per key = the build side's version history (ts-sorted, capped);
  build rows append a version; probe rows look up the latest version with
  version_ts <= probe_ts (falling back to latest seen for proctime mode).

Event-time (rowtime) temporal join needs probe-row buffering until the
watermark passes — that refinement is the documented gap vs the reference
(micro-batch replay in ts order gives the same result when streams are
in-order, which the tests exercise); the batch as-of join
(operators/temporal_joins.asof_join) provides exact rowtime semantics.

Scale: state = capped version list per key (`max_versions`, the reference's
state-retention knob); shuffle = hash(key), identical to the reference.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def temporal_join_stream(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    probe_payload: str,
    build_payload: str,
    max_versions: int = 64,
) -> DataFrame:
    """As-of join of two streams on `key`.

    probe/build must each have: key, ts, and ONE payload column (long).
    Output: key, probe payload, probe ts, matched build payload (null if no
    version yet), matched version ts.
    """
    p = probe.select(
        F.col(key).alias("k"), F.col(probe_ts).alias("ts"),
        F.col(probe_payload).alias("payload"), F.lit(1).alias("tag"),
    )
    b = build.select(
        F.col(key).alias("k"), F.col(build_ts).alias("ts"),
        F.col(build_payload).alias("payload"), F.lit(0).alias("tag"),
    )
    unioned = p.unionByName(b)
    out_schema = (
        f"{key} long, {probe_payload} long, {probe_ts} timestamp, "
        f"{build_payload} long, {build_ts} timestamp"
    )
    state_schema = "vts array<bigint>, vpayload array<bigint>"

    def fn(key_t: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        # build rows sort before probe rows at equal ts (AS OF <= semantics)
        batch = batch.sort_values(["ts", "tag"], kind="stable")
        if state.exists:
            vts, vpay = [list(x) for x in state.get]
        else:
            vts, vpay = [], []
        rows = []
        for _, r in batch.iterrows():
            t = int(pd.Timestamp(r["ts"]).value // 1000)
            if r["tag"] == 0:
                vts.append(t)
                vpay.append(int(r["payload"]))
                if len(vts) > max_versions:
                    vts.pop(0)
                    vpay.pop(0)
            else:
                # latest version with ts <= probe ts (versions are appended
                # in ts order under in-order replay)
                idx = None
                for i in range(len(vts) - 1, -1, -1):
                    if vts[i] <= t:
                        idx = i
                        break
                rows.append({
                    key: key_t[0],
                    probe_payload: int(r["payload"]),
                    probe_ts: r["ts"],
                    build_payload: int(vpay[idx]) if idx is not None else None,
                    build_ts: pd.Timestamp(vts[idx] * 1000) if idx is not None else pd.NaT,
                })
        state.update((vts, vpay))
        if rows:
            yield pd.DataFrame(rows)

    return (
        unioned.groupBy("k")
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )


def temporal_join_stream_rowtime(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    probe_payload: str,
    build_payload: str,
    delay: str = "0 seconds",
    max_versions: int = 256,
    flush: DataFrame | None = None,
) -> DataFrame:
    """Event-time (rowtime) temporal join — TemporalRowTimeJoinOperator.java:78.

    Exact AS-OF semantics under out-of-order arrival: probe rows are BUFFERED
    in state until the watermark passes their timestamp; only then are they
    matched against the version history, so any build version with
    version_ts <= probe_ts that arrives within the watermark delay is seen.
    Versions older than the watermark (beyond the newest such) are pruned —
    the reference's state-retention rule.

    Emission: on watermark advance (checked per micro-batch via
    state.getCurrentWatermarkMs). Probe rows still above the final watermark
    remain buffered — standard event-time semantics. `flush` (columns: key,
    ts) is an optional third stream of no-op marker rows: they carry no data
    but touch their key's group AFTER the watermark has advanced, forcing
    buffered probes to drain — the harness analog of the reference's
    end-of-input MAX_WATERMARK flush (StreamSource#close emits a final
    watermark so event-time operators fire everything pending).
    """
    p = probe.select(
        F.col(key).alias("k"), F.col(probe_ts).alias("ts"),
        F.col(probe_payload).alias("payload"), F.lit(1).alias("tag"),
    )
    b = build.select(
        F.col(key).alias("k"), F.col(build_ts).alias("ts"),
        F.col(build_payload).alias("payload"), F.lit(0).alias("tag"),
    )
    unioned = p.unionByName(b)
    if flush is not None:
        fl = flush.select(
            F.col(key).alias("k"), F.col(probe_ts).alias("ts"),
            F.lit(None).cast("long").alias("payload"), F.lit(2).alias("tag"),
        )
        unioned = unioned.unionByName(fl)
    unioned = unioned.withWatermark("ts", delay)
    out_schema = (
        f"{key} long, {probe_payload} long, {probe_ts} timestamp, "
        f"{build_payload} long, {build_ts} timestamp"
    )
    state_schema = (
        "vts array<bigint>, vpayload array<bigint>, "
        "pts array<bigint>, ppayload array<bigint>"
    )

    def fn(key_t: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            vts, vpay, pts, ppay = [list(x) for x in state.get]
        else:
            vts, vpay, pts, ppay = [], [], [], []
        if not batch.empty:
            for _, r in batch.iterrows():
                if r["tag"] == 2:
                    continue  # flush marker: only advances the group
                t = int(pd.Timestamp(r["ts"]).value // 1000)
                if r["tag"] == 0:
                    vts.append(t)
                    vpay.append(int(r["payload"]))
                else:
                    pts.append(t)
                    ppay.append(int(r["payload"]))
        wm_micros = state.getCurrentWatermarkMs() * 1000
        # versions must be ts-sorted for the as-of lookup (arrival can be disordered)
        order = sorted(range(len(vts)), key=lambda i: vts[i])
        vts = [vts[i] for i in order]
        vpay = [vpay[i] for i in order]
        rows = []
        keep_pts, keep_ppay = [], []
        for t, pay in sorted(zip(pts, ppay)):
            if t <= wm_micros:
                idx = None
                for i in range(len(vts) - 1, -1, -1):
                    if vts[i] <= t:
                        idx = i
                        break
                rows.append({
                    key: key_t[0],
                    probe_payload: pay,
                    probe_ts: pd.Timestamp(t * 1000),
                    build_payload: int(vpay[idx]) if idx is not None else None,
                    build_ts: pd.Timestamp(vts[idx] * 1000) if idx is not None else pd.NaT,
                })
            else:
                keep_pts.append(t)
                keep_ppay.append(pay)
        # prune versions: keep the newest version at-or-below the watermark
        # plus everything after it (earlier ones can never be matched again)
        cut = 0
        for i, t in enumerate(vts):
            if t <= wm_micros:
                cut = i
        vts, vpay = vts[cut:][-max_versions:], vpay[cut:][-max_versions:]
        state.update((vts, vpay, keep_pts, keep_ppay))
        if rows:
            yield pd.DataFrame(rows)

    return (
        unioned.groupBy("k")
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )
