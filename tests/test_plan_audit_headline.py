"""Per-commit plan audit over the bench HEADLINE set: the two global
scale invariants (no CartesianProduct, no row-at-a-time BatchEvalPython)
checked on every headline query's physical plan at sf0.001. The
full-surface version is the ad-hoc tests/plan_audit_sweep.py (all 370
entries, run when adding queries); this in-suite subset keeps the
invariants enforced on the perf-tracked queries at every commit.
Planning only — nothing executes except the literal star's one-time
session materialization.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import bench
from tests.plan_audit_sweep import BATCH_EVAL_ALLOWED, CARTESIAN_ALLOWED


@pytest.mark.parametrize("name", bench.HEADLINE)
def test_headline_plan_invariants(spark, sf_dir, name):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if name not in qs:
        pytest.skip(f"{name} not in queries()")
    plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    if name not in CARTESIAN_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in BATCH_EVAL_ALLOWED:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in plan")
