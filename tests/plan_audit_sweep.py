"""Full-surface physical-plan audit: every queries() entry at sf0.001,
asserting the two scale-discipline invariants the per-family plan-lock
tests check locally but nothing enforces globally:

  1. no CartesianProduct anywhere (theta joins must ride a broadcastable
     side -> BroadcastNestedLoopJoin; a fact-x-fact cross product is a
     design bug at any SF);
  2. no row-at-a-time Python UDF (BatchEvalPython) in any query path —
     Python is allowed only through Arrow (ArrowEvalPython / mapInPandas /
     applyInPandas), except where a query deliberately grades the
     reference's general (non-vectorized) PyFlink UDF path.

The per-family plan-lock tests (test_plan_shapes_*.py) pin stronger,
shape-specific properties on the queries they cover; this sweep is the
backstop that keeps a NEW query (added after the grading freeze lifts)
from quietly shipping either smell. Streaming harness queries execute
their micro-batch run during construction — that is the same cost the
in-suite sf0.001 oracle sweep already pays.

Run ad hoc:  python tests/plan_audit_sweep.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

# Queries that deliberately exercise the row-at-a-time Python UDF path —
# the reference's general PyFlink scalar UDF is non-vectorized, and the
# gauntlet grades that exact mode alongside the Arrow ones.
BATCH_EVAL_ALLOWED = {"python_udf_gauntlet"}

# Adjudicated cartesian products: tpcds_lit_q77's REFERENCE text itself
# cross-joins the cs/cr CTEs (no join predicate) — both sides are grouped
# call-center-grained aggregates (<= #call centers rows at ANY SF), so the
# product is bounded by construction. Same exemption as the literal-suite
# plan lock (tests/test_tpcds_literal_staged.py).
CARTESIAN_ALLOWED = {"tpcds_lit_q77"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit.json"
    # Audit under the PRODUCTION session config (CBO + join reorder + AQE,
    # session.py), not a bare builder: the invariants gate the plans the
    # engine actually runs, and a CBO-reordered join could differ from the
    # default-config plan.
    from flink_release_1_14_5_comment_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=16)
    import __spark_entry__ as e

    qs = e.queries()
    report: dict[str, dict] = {}
    n_bad = n_err = 0
    for i, name in enumerate(qs):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            smells = []
            if "CartesianProduct" in plan and name not in CARTESIAN_ALLOWED:
                smells.append("CartesianProduct")
            if "BatchEvalPython" in plan and name not in BATCH_EVAL_ALLOWED:
                smells.append("BatchEvalPython")
            report[name] = {"smells": smells}
            if smells:
                n_bad += 1
            tag = "BAD " if smells else "ok  "
            print(f"[{i + 1}/{len(qs)}] {tag}{name} ({time.time() - t0:.1f}s)"
                  + (f" {smells}" if smells else ""), flush=True)
        except Exception as ex:  # noqa: BLE001 — report-all sweep
            n_err += 1
            report[name] = {"error": str(ex)[:300]}
            print(f"[{i + 1}/{len(qs)}] ERR {name}: {str(ex)[:200]}", flush=True)
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(f"\n{n_bad} with smells, {n_err} errors of {len(qs)} -> {out_path}")
    return 1 if (n_bad or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
