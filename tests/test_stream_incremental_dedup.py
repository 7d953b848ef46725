"""stream_incremental_dedup semantics: the emitted candidate-pair set must
be invariant to how the stream is chunked (each pair appears exactly once,
when its later member arrives), and every pair must obey arrival order."""

from __future__ import annotations

import pandas as pd
import pytest

from flink_release_1_14_5_comment_spark.catalog import load_tables
from flink_release_1_14_5_comment_spark.pipeline.dedup import (
    minhash_signatures,
    shingle_frame,
)
from flink_release_1_14_5_comment_spark.streaming import sources
from flink_release_1_14_5_comment_spark.streaming.stream_queries import (
    q_stream_incremental_dedup,
)

SF = "/root/testdata/sf0.001"


def _batch_pairs(spark) -> set[tuple[int, int, int]]:
    sig = minhash_signatures(
        shingle_frame(load_tables(spark, SF)["documents"].select("doc_id", "text"))
    )
    a, b = sig.alias("a"), sig.alias("b")
    from pyspark.sql import functions as F

    rows = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.s0") == F.col("b.s0"))
            & (F.col("a.s1") == F.col("b.s1"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.band"), F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .collect()
    )
    return {(r[0], r[1], r[2]) for r in rows}


def test_pair_set_matches_batch_and_ordering(spark):
    got = {
        (r.band, r.a_id, r.b_id)
        for r in q_stream_incremental_dedup(spark, SF).collect()
    }
    assert got == _batch_pairs(spark)
    assert all(a < b for _, a, b in got), "pair must be (earlier, later)"


def test_pair_set_invariant_to_chunking(spark, monkeypatch):
    """Replaying in 5 chunks instead of 3 must produce the identical set —
    state handoff across micro-batch boundaries can't drop or double."""
    orig = sources.replay_as_stream

    def five_chunks(spark_, df, n_chunks=3, **kw):
        return orig(spark_, df, n_chunks=5, **kw)

    monkeypatch.setattr(sources, "replay_as_stream", five_chunks)
    got = {
        (r.band, r.a_id, r.b_id)
        for r in q_stream_incremental_dedup(spark, SF).collect()
    }
    assert got == _batch_pairs(spark)


def test_hot_bucket_cap_bounds_state_and_pairs(spark):
    """VERDICT r6 #6: 120 identical documents all hash into ONE bucket per
    band. With cap=8 the bucket indexes only the first 8 arrivals — every
    later doc pairs against those 8 and emits an overflow marker instead of
    growing state, so pairs stay linear (924/band) instead of quadratic
    (C(120,2) = 7140/band)."""
    from flink_release_1_14_5_comment_spark.streaming.stream_queries import (
        _incremental_dedup_fn,
        _run_to_memory,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    n, cap = 120, 8
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(n)],
        "doc_id long, text string",
    )
    stream, tmp = sources.replay_as_stream(spark, docs, n_chunks=4,
                                           order_col="doc_id")
    sig = minhash_signatures(shingle_frame(stream))
    try:
        out = sig.groupBy("band", "s0", "s1").applyInPandasWithState(
            _incremental_dedup_fn(cap),
            "band int, a_id long, b_id long",
            "ids array<bigint>, dropped long", "append",
            GroupStateTimeout.NoTimeout)
        rows = _run_to_memory(out, mode="append").collect()
    finally:
        sources.cleanup(tmp)
    n_bands = len({r.band for r in rows})
    assert n_bands == 4
    markers = [r for r in rows if r.b_id == -1]
    pairs = [r for r in rows if r.b_id != -1]
    per_band_pairs = cap * (cap - 1) // 2 + (n - cap) * cap
    assert len(pairs) == n_bands * per_band_pairs, len(pairs)
    assert len(markers) == n_bands * (n - cap), len(markers)
    # no pair's earlier member lies outside the retained (first-cap) index
    assert all(r.a_id < cap or r.b_id == -1 for r in rows)
