"""Lookup (dimension-table) join — SURVEY §2.3; reference
LookupJoinRunner.java:34 / AsyncLookupJoinRunner.java / LookupTableSource.java:44.

Flink probes an external table per row (sync or async, with an LRU cache).
Spark-first equivalents, in preference order:

1. **Stream-static join** (`lookup_join`): Spark re-plans the static side
   every micro-batch, so a table-backed dimension (parquet/Delta/JDBC) is
   re-read per batch — the semantics of Flink's per-row lookup with a
   batch-interval-long cache, with the dim broadcast instead of probed row
   by row. This is the scalable default: one broadcast per batch, zero
   per-row latency.
2. **foreachBatch + refresh** (`lookup_join_foreach_batch`): when the dim
   needs explicit refresh logic (re-read, re-key, MERGE against a cache
   table), run the join inside foreachBatch where the dim loader is called
   per batch.
3. Async per-row lookups (AsyncLookupJoinRunner) map to `mapInPandas` with an
   async client batched per Arrow chunk — left as the documented pattern; no
   external service exists in this environment to exercise it.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_join(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static lookup join; dim is re-evaluated each micro-batch."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def lookup_join_foreach_batch(
    stream: DataFrame,
    dim_loader: Callable[[], DataFrame],
    on: list[str] | str,
    sink: Callable[[DataFrame, int], None],
    how: str = "left",
    checkpoint: str | None = None,
):
    """foreachBatch lookup join with per-batch dim refresh (reference's
    lookup-cache-TTL ≈ one micro-batch)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        dim = dim_loader()
        joined = batch.join(F.broadcast(dim), on, how)
        sink(joined, batch_id)

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
