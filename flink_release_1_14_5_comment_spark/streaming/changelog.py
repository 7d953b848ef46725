"""Changelog / RowKind semantics (SURVEY §1.1 dynamic tables, §2.2, §4.1
FlinkChangelogModeInferenceProgram — the reference's core novelty with no
Catalyst equivalent).

Convention: a changelog DataFrame carries a string `__rowkind` column with
values '+I', '-U', '+U', '-D' (RowKind.java:31-52). Insert-only frames may
omit it (implicitly all '+I').

Operators:
  * ``drop_update_before``   — StreamExecDropUpdateBefore.java:46 /
                               DropUpdateBeforeFunction.java: sinks that key
                               by PK don't need the retraction half.
  * ``changelog_normalize``  — StreamExecChangelogNormalize.java:61: collapse
                               a keyed changelog into clean last-value upserts.
  * ``upsert_sink``          — SinkUpsertMaterializer.java:57: foreachBatch
                               merge of a disordered changelog into a keyed
                               materialized table (parquet-backed here; MERGE
                               INTO Delta/Iceberg on a real deployment).
  * ``infer_output_mode``    — the planner decision of
                               FlinkChangelogModeInferenceProgram, mapped onto
                               Spark output modes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

ROWKIND = "__rowkind"
INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE = "+I", "-U", "+U", "-D"


def enforce_not_null(df: DataFrame, cols: list[str], mode: str = "error") -> DataFrame:
    """SinkNotNullEnforcer.java analog: pre-write validation of NOT NULL
    sink columns. mode='error' fails the job on violation (Flink ERROR
    behavior) via assert_true; mode='drop' silently filters (Flink DROP)."""
    if mode == "drop":
        out = df
        for c in cols:
            out = out.filter(F.col(c).isNotNull())
        return out
    out = df
    for c in cols:
        # assert_true evaluates to NULL on success and raises on violation;
        # keeping it inside the filter predicate stops Catalyst from pruning
        # the check as an unused column.
        out = out.filter(
            F.assert_true(F.col(c).isNotNull(), F.lit(f"NOT NULL violation: {c}")).isNull()
        )
    return out


def drop_update_before(df: DataFrame) -> DataFrame:
    """Remove -U rows (sink consumes upserts keyed by PK)."""
    if ROWKIND not in df.columns:
        return df
    return df.filter(F.col(ROWKIND) != UPDATE_BEFORE)


def changelog_normalize(df: DataFrame, pk: list[str], order_col: str) -> DataFrame:
    """Collapse a changelog to the live row per key: last +I/+U wins, a
    trailing -D removes the key. Batch/`foreachBatch` formulation of
    ChangelogNormalize (row_number over order desc = 1, then drop deletes)."""
    kind = F.col(ROWKIND) if ROWKIND in df.columns else F.lit(INSERT)
    w = W.partitionBy(*pk).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__kind", kind)
        .filter(F.col("__kind") != UPDATE_BEFORE)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("__kind") != DELETE))
        .drop("__rn", "__kind")
    )


def changelog_normalize_stream(df: DataFrame, pk: list[str], order_col: str) -> DataFrame:
    """STREAMING ChangelogNormalize (StreamExecChangelogNormalize.java:61 /
    ProcTimeMiniBatchDeduplicateKeepLastRowFunction): turn an UPSERT stream
    (+I/+U and -D only, the upsert-kafka contract — no -U ever arrives) into
    a full changelog by remembering the last row per key and emitting the
    missing UPDATE_BEFORE:

        first value for a key          → +I(new)
        new value for a known key      → -U(old), +U(new)
        -D for a known key             → -D(old); unknown key → dropped

    Downstream retract-consuming operators (retract_agg_stream, the
    changelog Top-N) need exactly this completion. State = one row per key,
    the same bound the reference's normalize keeps. Out-of-order rows within
    a batch are ordered by ``order_col``; a stale row (older than state) is
    ignored.
    """
    from typing import Iterator  # local: keep module import surface stable

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    dtypes = dict(df.dtypes)
    data_cols = [c for c in df.columns if c not in (*pk, ROWKIND)]
    out_schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in pk]
        + [f"{c} {dtypes[c]}" for c in data_cols]
        + [f"{ROWKIND} string"]
    )
    # order value kept as micros if timestamp-typed, else raw
    order_is_ts = dtypes[order_col].startswith("timestamp")
    state_order_t = "bigint" if order_is_ts else dtypes[order_col]
    state_schema = ", ".join(
        [f"__ord {state_order_t}"] + [f"{c} {dtypes[c]}" for c in data_cols]
    )
    n_pk = len(pk)

    def to_ord(v):
        return int(pd.Timestamp(v).value // 1000) if order_is_ts else v

    def fn(key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState) -> "Iterator[pd.DataFrame]":
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(order_col, kind="stable")
        prev = list(state.get) if state.exists else None  # [__ord, *data_cols]
        out = []
        keyd = {pk[i]: key[i] for i in range(n_pk)}
        for _, row in batch.iterrows():
            kind = row[ROWKIND] if ROWKIND in batch.columns else INSERT
            ordv = to_ord(row[order_col])
            if prev is not None and ordv < prev[0]:
                continue  # stale: older than the materialized row
            if kind == DELETE:
                if prev is not None:
                    out.append({**keyd, **{c: prev[1 + i] for i, c in enumerate(data_cols)},
                                ROWKIND: DELETE})
                    prev = None
                continue
            if kind == UPDATE_BEFORE:
                continue  # upsert contract: -U never arrives; drop defensively
            new_vals = [row[c] for c in data_cols]
            if prev is None:
                out.append({**keyd, **dict(zip(data_cols, new_vals)), ROWKIND: INSERT})
            else:
                out.append({**keyd, **{c: prev[1 + i] for i, c in enumerate(data_cols)},
                            ROWKIND: UPDATE_BEFORE})
                out.append({**keyd, **dict(zip(data_cols, new_vals)), ROWKIND: UPDATE_AFTER})
            prev = [ordv, *new_vals]
        if prev is None:
            if state.exists:
                state.remove()
        else:
            state.update(tuple(prev))
        if out:
            yield pd.DataFrame(out)[list(keyd) + data_cols + [ROWKIND]]

    return (
        df.groupBy(*pk)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)
    )


def upsert_sink(changelog: DataFrame, pk: list[str], order_col: str, target_path: str):
    """Materialize a streaming changelog into a keyed table at `target_path`
    via foreachBatch: per micro-batch, normalize the batch, union with the
    current table, and keep the newest row per key (SinkUpsertMaterializer
    semantics — tolerant of disordered -U/+U arrival)."""
    spark = changelog.sparkSession

    def merge(batch: DataFrame, batch_id: int) -> None:
        # Normalize ONCE over (current table ∪ raw batch) — never the batch
        # alone. Pre-normalizing the batch would drop a key whose newest row
        # in this batch is -D, and the delete could then never shadow an
        # insert materialized by an earlier batch (SinkUpsertMaterializer
        # propagates deletes across batches).
        try:
            current = spark.read.parquet(target_path)
            unioned = current.unionByName(batch, allowMissingColumns=True)
        except Exception:  # first batch: no table yet
            unioned = batch
        merged = changelog_normalize(unioned, pk, order_col)
        merged.write.mode("overwrite").parquet(target_path + "_tmp")
        spark.read.parquet(target_path + "_tmp").write.mode("overwrite").parquet(target_path)

    return (changelog.writeStream.outputMode("update").foreachBatch(merge)
            .option("checkpointLocation", target_path + "_ckpt").start())


def infer_output_mode(has_agg: bool, has_watermark: bool, append_only_source: bool = True) -> str:
    """The FlinkChangelogModeInferenceProgram decision, Spark-ified:
    insert-only plan → append; agg over watermarked windows → append
    (emit-on-close); unbounded agg → update (retracting stream)."""
    if not has_agg:
        return "append"
    return "append" if has_watermark else "update"


@dataclass
class ChangelogPlan:
    """The changelog classification of a (streaming) DataFrame — the
    decision surface of FlinkChangelogModeInferenceProgram.scala:46
    (ModifyKindSet: which RowKinds the plan can emit; UpdateKind: whether a
    consumer needs -U or can take upserts)."""

    output_mode: str                    # append | update | complete
    emits_updates: bool                 # plan can produce +U (= retract stream)
    needs_upsert_materializer: bool     # out-of-order upserts → SinkUpsertMaterializer
    drop_update_before_safe: bool       # sink keyed by PK → -U rows removable
    reasons: list[str]


def plan_changelog(df: DataFrame, sink_has_primary_key: bool = False) -> ChangelogPlan:
    """Classify a DataFrame's changelog behavior by inspecting its analyzed
    plan — Aggregate without watermark-bounded windows ⇒ update (retracting)
    stream; watermarked windowed aggs ⇒ append-on-close; pure pipelines ⇒
    insert-only append (the reference's ModifyKindSetTrait inference).
    """
    plan = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001 - no public accessor
    has_agg = "Aggregate" in plan
    has_watermark = "EventTimeWatermark" in plan
    has_dedup = "Deduplicate" in plan
    has_flatmap_state = "FlatMapGroupsInPandasWithState" in plan
    reasons: list[str] = []

    if not df.isStreaming:
        reasons.append("batch plan: insert-only by definition")
        return ChangelogPlan("append", False, False, True, reasons)

    if has_flatmap_state:
        reasons.append("custom stateful operator: operator declares its own mode (update assumed)")
        return ChangelogPlan("update", True, not sink_has_primary_key, sink_has_primary_key, reasons)

    if has_agg and has_watermark:
        reasons.append("windowed agg + watermark: finalized results emitted on window close")
        return ChangelogPlan("append", False, False, True, reasons)
    if has_agg:
        reasons.append("unbounded aggregate: results refine per batch (+U retract stream)")
        return ChangelogPlan(
            "update", True, not sink_has_primary_key, sink_has_primary_key, reasons
        )
    if has_dedup:
        reasons.append("streaming dropDuplicates: first-winner inserts only")
        return ChangelogPlan("append", False, False, True, reasons)
    reasons.append("stateless pipeline: insert-only")
    return ChangelogPlan("append", False, False, True, reasons)
