"""Plan-topology locks for the round-5 session operators — the oracle gate
proves values; these prove the 100 TB claims their docstrings make (no
cartesian products, bounded exchange counts, persisted-frame reuse,
broadcast sides broadcast)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.operators.scale import count_exchanges


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_corpus_mix_plan(spark, sf_dir):
    """One running-sum window per language + bounded-key aggs; the targets
    join must not be a cartesian product."""
    from flink_release_1_14_5_comment_spark.pipeline.text_analysis import (
        q_corpus_mix,
    )

    plan = _plan(q_corpus_mix(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    # documents scan feeds budget + window branches; everything else is
    # bounded-key (5 langs): a handful of exchanges, not a blowup
    assert count_exchanges(q_corpus_mix(spark, sf_dir)) <= 8


def test_pipeline_end_to_end_plan(spark, sf_dir):
    """The composed pipeline: near-dup drop is an ANTI join, shingle/sig
    frames are persisted (InMemoryTableScan reuse), no cartesian product."""
    from flink_release_1_14_5_comment_spark.pipeline.end_to_end import (
        q_pipeline_end_to_end,
    )

    plan = _plan(q_pipeline_end_to_end(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
    assert "InMemoryTableScan" in plan


def test_random_projection_plan(spark, sf_dir):
    """The projection is a pure map over a literal matrix: no join anywhere;
    exchanges are only the spread repartition + the final bounded agg."""
    from flink_release_1_14_5_comment_spark.pipeline.similarity import (
        q_embedding_random_projection,
    )

    df = q_embedding_random_projection(spark, sf_dir)
    plan = _plan(df)
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert count_exchanges(df) <= 3


def test_histogram_quantile_plan(spark, sf_dir):
    """The sketch is a bounded-cell histogram: the quantile VALUES cross
    join is a 2-row broadcast nested loop (fine), never a shuffled product;
    the only heavy operator is the per-language exact-percentile sort the
    audit column needs (dropped in production, per the docstring)."""
    from flink_release_1_14_5_comment_spark.pipeline.sketches import (
        q_histogram_quantile,
    )

    plan = _plan(q_histogram_quantile(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_stream_join_wrappers_reject_nothing_silently(spark, sf_dir):
    """interval/window join wrappers pass `how` through — a typo'd join type
    must raise at plan time, not silently fall back to inner."""
    import pytest
    from pyspark.sql import functions as F

    from flink_release_1_14_5_comment_spark.catalog import load_tables
    from flink_release_1_14_5_comment_spark.streaming.stream_joins import (
        interval_join_stream,
    )

    ev = load_tables(spark, sf_dir)["events"]
    left = ev.select(F.col("user_id").alias("lu"), F.col("ts").alias("lts"))
    right = ev.select(F.col("user_id").alias("ru"), F.col("ts").alias("rts"))
    with pytest.raises(Exception):
        interval_join_stream(left, right, F.col("lu") == F.col("ru"),
                             "lts", "rts", "1 hour", "0 seconds",
                             how="sideways").count()
