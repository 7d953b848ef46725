"""Guards on the driver grading contract (__spark_entry__): the first 50
queries() entries are the officially graded set — rotation mistakes here
silently drop operator families from official evidence."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def test_priority_window_shape():
    p = entry._PRIORITY
    assert len(p) == 50
    assert len(set(p)) == 50  # no duplicates


def test_priority_all_resolvable_with_oracles():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = [n for n in entry._PRIORITY if n not in qs]
    assert not missing, missing
    no_oracle = [n for n in entry._PRIORITY if n not in osql]
    assert not no_oracle, no_oracle
    # ordering: priority entries occupy exactly the first 50 slots
    assert list(qs)[:50] == entry._PRIORITY


# r7 window: rotation window 2 of 3 over the official-evidence backlog
# (VERDICT r6 #1). Families graded green in r2-r6 keep that multi-round
# official record plus the per-commit pytest sweep; the anchors below
# assert the r7 window's own family spread so a rotation edit can't
# silently drop one of the NEW evidence families.
FAMILY_ANCHORS = {
    "tpcds-cumulative": "tpcds_q51_cumulative",
    "tpcds-intersect-rollup": "tpcds_q14_cross_channel",
    "tpcds-correlated-returns": "tpcds_q1_returns_above_avg",
    "tpcds-rank-in-rollup": "tpcds_q67_topk_rollup",
    "tpcds-count-census": "tpcds_q88_count_census",
    "tpcds-multi-hop-exists": "tpcds_q95_multi_hop_exists",
    "tpcds-variance": "tpcds_q39_quantity_variance",
    "retrieval-bm25": "bm25_topk",
    "retrieval-fusion": "hybrid_rrf_fusion",
    "hll-batch": "approx_distinct_hll",
    "hll-streaming": "stream_approx_distinct",
    "scd2": "scd2_build",
    "stream-incr-dedup": "stream_incremental_dedup",
    "dedup-cluster-reps": "dedup_cluster_representatives",
    "ann-filtered": "ann_filtered_topk",
    "contrastive": "contrastive_negatives",
    "dedup-incremental": "dedup_incremental",
    "keyed-process": "keyed_process_state",
    "async-io": "async_io_enrich",
    "datastream-facade": "datastream_api_fluent",
    "scalar-collections": "scalar_collections",
    "multimodal-stream": "stream_multimodal_pipeline",
    "sketch-cms": "cms_heavy_hitters",
    "sketch-quantile": "histogram_quantile",
    "sketch-bloom": "bloom_contamination",
    "sampling-weighted": "weighted_sample",
    "pipeline-composed": "pipeline_end_to_end",
    "corpus-mix": "corpus_mix",
    "fuzzy-er": "fuzzy_entity_match",
    "zorder": "zorder_layout",
    "tpch-literal": "tpch_q1",
    "range-join": "range_join_tiers",
}


def test_every_family_anchor_in_window():
    missing = {f: a for f, a in FAMILY_ANCHORS.items()
               if a not in entry._PRIORITY}
    assert not missing, missing
