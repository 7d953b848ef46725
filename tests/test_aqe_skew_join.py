"""AQE skew-join posture (SCALE.md global-posture row 1): the repo's scale
story for most joins is "AQE splits skewed partitions at runtime, salting
code only for single-key pathologies AQE cannot touch" — this proves AQE
actually performs the split on an adversarially skewed shuffle join, so
the claim is CI, not documentation. (Reference analog: Flink handles the
same class via SplitAggregateRule / custom partitioners; Spark moves it
into the runtime re-optimizer.)"""

from __future__ import annotations

import re
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

_SKEW_CONFS = {
    # thresholds shrunk so a ~MB-scale hot partition triggers the rewrite
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    # force a shuffle join: no broadcast escape hatch
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # keep AQE from coalescing the skew away before the join rewrite
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_confs(spark):
    prev = {}
    for k, v in _SKEW_CONFS.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark, skew_confs):
    """90% of the probe side lands on ONE key; after execution the adaptive
    plan must mark the sort-merge join as skew-handled (skew=true +
    AQEShuffleRead skewed) and the result must equal the exact expected
    count. Two lessons encoded here: (1) the final plan must be read from
    the SAME Dataset that executed — count() builds a separate plan whose
    AdaptiveSparkPlan never finalizes the original; (2) the pad must be
    INCOMPRESSIBLE (md5 chains, not repeated literals) — skew detection
    runs on compressed shuffle-write bytes, and a constant pad compresses
    the hot partition below any realistic threshold, silently hiding the
    skew. Both mirror what a real 100 TB job sees: genuine entropy and an
    action on the join plan itself."""
    n = 200_000
    pad = F.concat(*[
        F.md5(F.concat(F.col("id").cast("string"), F.lit(str(i))))
        for i in range(4)])
    probe = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 1000)
        .cast("long").alias("k"),
        pad.alias("pad"))
    build = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    joined = probe.join(build, "k").select("k", "v", "pad")
    rows = joined.collect()
    assert len(rows) == n  # every key matches exactly one build row

    # the FINAL adaptive plan (post-execution) carries the skew markers
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert re.search(r"SortMergeJoin\(skew=true\)", plan), plan[:2000]
    assert "AQEShuffleRead skewed" in plan
