"""Results must not depend on the cluster shape: every determinism claim in
the docstrings (md5 ordering, literal sign matrices, integer-cents sums)
has to hold under a DIFFERENT partitioning than the one the oracle sweep
runs with. This drives representative queries in a subprocess whose session
uses local[3] and spark.sql.shuffle.partitions=7 (coprime with everything
the code repartitions by) and compares against the sf0.001 DuckDB oracle —
if any operator's output secretly leaned on partition count, task order, or
defaultParallelism, this catches it before a 1000-executor cluster does."""

from __future__ import annotations

import subprocess
import sys

# One per determinism mechanism: hash-ordered sampling windows (corpus_mix),
# LSH banding + verified pairs (dedup_minhash_lsh), literal-matrix array
# folds (embedding_random_projection), multi-stage composition
# (pipeline_end_to_end), rank windows with tiebreaks (topn), md5 bucketing
# (split_assign), global NTILE sort (quality_ntile_buckets).
QUERIES = [
    "corpus_mix",
    "dedup_minhash_lsh",
    "embedding_random_projection",
    "pipeline_end_to_end",
    "topn",
    "split_assign",
    "quality_ntile_buckets",
    # round-6 session-2 mechanisms: rounded-score+tiebreak rank fusion
    # (hybrid_rrf_fusion exercises bm25 + cosine ranking), dyadic-rational
    # HLL register sums, SCD2 window versioning
    "hybrid_rrf_fusion",
    "approx_distinct_hll",
    "scd2_build",
    # round-7 mechanisms: the two-phase topk_per_key split (prune set
    # depends on the partitioning, survivors must not), the literal
    # TPC-DS star derivation (integer-cents star sums + LIMIT tiebreaks),
    # and the row-level bucketed budget cut inside the composed pipeline
    # (already listed via pipeline_end_to_end)
    "ann_filtered_topk",
    "tpcds_lit_q89",
    "tpcds_lit_q65",
    # round-8 mechanisms: group sizes via groupBy+join (doc_fingerprint),
    # the q53 avg-over-sum window on the localCheckpoint-cached star, and
    # the returns-side star derivation (q85 exact-integer averages)
    "doc_fingerprint",
    "tpcds_lit_q53",
    "tpcds_lit_q85",
    # round-9 mechanism: q47's exact-integer window average (SUM/COUNT
    # windows + modulo-truncated micro-cents + cross-multiplied 10% filter
    # — the rewrite of r8's one official red row; no raw double anywhere)
    "tpcds_lit_q47",
]

SCRIPT = f"""
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[3]")
         .config("spark.sql.shuffle.partitions", "7")
         .config("spark.default.parallelism", "3")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
import __spark_entry__ as e
from tests.oracle_util import compare, duckdb_conn
Q, O = e.queries(), e.oracle_sql()
con = duckdb_conn("/root/testdata/sf0.001")
for name in {QUERIES!r}:
    compare(Q[name](spark, "/root/testdata/sf0.001"),
            con.execute(O[name]).fetchdf(), name)
    print("DETERMINISM_OK", name)
"""


def test_oracle_parity_under_odd_parallelism():
    r = subprocess.run([sys.executable, "-c", SCRIPT],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-4000:]
    for name in QUERIES:
        assert f"DETERMINISM_OK {name}" in r.stdout, name


# Round-8 staged literal mechanisms whose floating aggregates are the
# partition-order-sensitive kind: stddev_samp/cov 4dp rounds (q17, q39a),
# avg-of-double rollup under a NULLS FIRST LIMIT cut (q22), double return
# ratios feeding rank windows (q49), and the q64 cross-sales self-join's
# integer-cents sums. Same odd-shape subprocess, driving STAGED_QUERIES.
STAGED_REPS = ["tpcds_lit_q17", "tpcds_lit_q39a", "tpcds_lit_q22",
               "tpcds_lit_q49", "tpcds_lit_q64",
               # r9 float-hardening mechanisms: rank() ordered by an
               # explicit sum/count average (q44) and the cross-channel
               # HAVING > sum/count threshold (q14a)
               "tpcds_lit_q44", "tpcds_lit_q14a"]

STAGED_SCRIPT = f"""
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[3]")
         .config("spark.sql.shuffle.partitions", "7")
         .config("spark.default.parallelism", "3")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
from flink_release_1_14_5_comment_spark.operators import tpcds_literal as t
from tests.oracle_util import compare, duckdb_conn
con = duckdb_conn("/root/testdata/sf0.001")
for name in {STAGED_REPS!r}:
    compare(t.STAGED_QUERIES[name](spark, "/root/testdata/sf0.001"),
            con.execute(t.STAGED_ORACLE[name]).fetchdf(), name)
    print("DETERMINISM_OK", name)
"""


def test_staged_literal_under_odd_parallelism():
    r = subprocess.run([sys.executable, "-c", STAGED_SCRIPT],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-4000:]
    for name in STAGED_REPS:
        assert f"DETERMINISM_OK {name}" in r.stdout, name


# Literal TPC-H mechanisms: decimal-exact profit sums (q9), the
# FLOOR-exact supplycost correlated MIN (q2), the correlated 0.2×avg
# threshold (q17), and Q15's rounded-revenue MAX equality.
TPCH_REPS = ["tpch_lit_q2", "tpch_lit_q9", "tpch_lit_q15", "tpch_lit_q17"]

TPCH_SCRIPT = f"""
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[3]")
         .config("spark.sql.shuffle.partitions", "7")
         .config("spark.default.parallelism", "3")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
from flink_release_1_14_5_comment_spark.operators import tpch_literal as t
from tests.oracle_util import compare, duckdb_conn
con = duckdb_conn("/root/testdata/sf0.001")
for name in {TPCH_REPS!r}:
    compare(t.STAGED_QUERIES[name](spark, "/root/testdata/sf0.001"),
            con.execute(t.STAGED_ORACLE[name]).fetchdf(), name)
    print("DETERMINISM_OK", name)
"""


def test_tpch_literal_under_odd_parallelism():
    r = subprocess.run([sys.executable, "-c", TPCH_SCRIPT],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-4000:]
    for name in TPCH_REPS:
        assert f"DETERMINISM_OK {name}" in r.stdout, name
