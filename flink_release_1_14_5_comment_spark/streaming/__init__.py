"""Structured-Streaming surface with Flink semantics (SURVEY.md §2.9, §7 Phase 2-3).

What Spark gives us free (configured, not built): micro-batch = Flink
mini-batch; watermarks; windowed aggs; stream-stream joins; checkpointing =
Flink's aligned barriers (WAL + state store; RocksDB provider at scale).

What we build here:
  * ``watermarks``  — rowtime/watermark translation (WATERMARK FOR … → withWatermark)
  * ``windows``     — streaming tumble/hop/session/cumulate aggs
  * ``dedup``       — keep-first (dropDuplicates) / keep-last (stateful)
  * ``topn``        — incremental per-key Top-N (AppendOnlyTopNFunction semantics)
  * ``changelog``   — RowKind (+I/-U/+U/-D) conventions, DropUpdateBefore,
                      ChangelogNormalize, SinkUpsertMaterializer-style upsert sink
  * ``sources``     — deterministic replay of testdata as a file stream

Emulated beyond the original non-goal list (see watermarks.py): punctuated
watermarks (marker-row driven, micro-batch granularity) and idle-source
tolerance (per-input watermarks + multipleWatermarkPolicy=max). Queryable
state is served by queryable_state.py over Spark's State Data Source;
savepoints (snapshot + fork/rewind) by savepoints.py.
Remaining documented non-goals: per-PARTITION idleness inside one source
(Spark keeps a single combined watermark per source node) and wall-clock
ProcessingTimeout/ContinuousProcessingTime triggers (nondeterministic under
replay).
"""
