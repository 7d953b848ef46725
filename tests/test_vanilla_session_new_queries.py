"""Driver-fidelity check for the round-5 query families: the driver grades
with its OWN vanilla SparkSession (none of session.get_spark's confs), so
every new query family must pass the oracle under one. This extends the
round-2 lesson (test_oracle_parity.test_driver_style_subprocess — one query)
to a representative of each round-5 addition: IO round-trips, the DDL /
TVF / MATCH_RECOGNIZE / legacy-CAST SQL front doors, the API facades, the
Arrow UDF paths, async I/O, stateful process functions, the outer stream
joins, and the composed pipeline."""

from __future__ import annotations

import subprocess
import sys

NAMES = [
    "io_roundtrip_csv", "ddl_filesystem_sql", "python_udf_gauntlet",
    "stream_interval_join_left", "keyed_process_state", "corpus_mix",
    "match_recognize_sql", "table_api_fluent", "async_io_enrich",
    "pipeline_end_to_end", "window_tvf_sql", "legacy_cast_sql",
    # round-6 additions: the adapted TPC-DS shape pack (one representative
    # per plan family: ROLLUP+rank, INTERSECT+rollup, cumulative-window)
    "tpcds_q67_topk_rollup", "tpcds_q14_cross_channel",
    "tpcds_q51_cumulative",
    # round-6 session-2 additions: retrieval + HLL + the TPC-DS extension
    # wave (q97's FULL OUTER overlap census is the new plan family)
    "bm25_topk", "hybrid_rrf_fusion", "approx_distinct_hll",
    "tpcds_q97_channel_overlap", "stream_incremental_dedup",
    "dedup_cluster_representatives", "stream_approx_distinct",
    "scd2_build", "tpcds_q17_sale_return_repurchase", "ann_filtered_topk", "contrastive_negatives",
    # round-7 additions: literal TPC-DS texts over the derived star schema
    # (one pure star-join, the 5-dim demographic join, the window-census)
    "tpcds_lit_q3", "tpcds_lit_q7", "tpcds_lit_q89",
    # round-8 batch 4: returns-side star (q85) + correlated-count (q41)
    "tpcds_lit_q85", "tpcds_lit_q41",
    # round-9 flip: one rep per flipped family — the q47 exact-integer
    # rewrite, an ext-table a/b pair, a staged-wave window-avg, and two
    # literal TPC-H texts (the exact-integer money convention)
    "tpcds_lit_q47", "tpcds_lit_q14a", "tpcds_lit_q63",
    "tpch_lit_q1", "tpch_lit_q22",
]

SCRIPT = f"""
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
from tests.oracle_util import compare, duckdb_conn
Q, O = e.queries(), e.oracle_sql()
con = duckdb_conn("/root/testdata/sf0.001")
for n in {NAMES!r}:
    compare(Q[n](spark, "/root/testdata/sf0.001"), con.execute(O[n]).fetchdf(), n)
    print("VANILLA_OK", n)
"""


def test_round5_queries_under_vanilla_session():
    r = subprocess.run([sys.executable, "-c", SCRIPT],
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-4000:]
    for n in NAMES:
        assert f"VANILLA_OK {n}" in r.stdout, n
