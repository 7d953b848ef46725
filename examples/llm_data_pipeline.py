"""End-to-end LLM training-data pipeline on this engine — the workflow a
data-curation team runs before every pretraining job, composed entirely
from the package's operators. Run directly:

    python examples/llm_data_pipeline.py

Stages (each is an oracle-gated operator — see pipeline/*.py):
  1. quality triage        — text_stats / lang_id / token_counts
  2. exact dedup           — md5 fingerprint groupBy
  3. near-dup dedup        — MinHash+LSH banding → verified Jaccard pairs
  4. duplicate clusters    — connected components over the pair graph
  5. embedding near-dup    — banded sign-LSH + exact cosine verify
  6. repetition filters    — Gopher dup-word/top-bigram signals
  7. boilerplate detection — cross-document 3-gram mining (C4-style)
  8. contamination audit   — train/eval 5-gram overlap
  9. train/val/test split  — deterministic md5-mod fold assignment
 10. chunking + packing    — 32/24 sliding windows, token-budget bins
 11. mixing                — deterministic stratified sampling
 12. source gating         — RefinedWeb-style per-domain keep/drop verdict
 13. banding audit         — LSH recall/precision vs exact-Jaccard truth
 14. semantic clustering   — mini-batch k-means over embeddings (scale knob)
 15. LM-perplexity filter  — CCNet-style corpus-trained bigram LM
 16. IVF-PQ serving        — codes-only ANN scan with ADC scoring
 17. sketch screens        — count-min heavy hitters, Bloom contamination
 18. sampling & mixing     — E-S weighted sample, NTILE decile planning
 19. budgeted mixture      — per-language char-budget greedy cut (corpus_mix)
 20. ONE composed job      — gate → exact → near-dup → mix as a single
                             oracle-graded query (pipeline/end_to_end.py)
 21. retrieval             — BM25 top-k + hybrid dense/sparse RRF fusion
 22. HLL distinct screens  — 64 md5-deterministic registers, exact-checkable
 23. cluster reps          — longest-member-wins dedup policy
 24. streaming ingest      — incremental near-dup pairs vs the keyed index
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flink_release_1_14_5_comment_spark import get_spark
from flink_release_1_14_5_comment_spark.pipeline import (
    dedup,
    graph,
    packing,
    quality,
    similarity,
    text_analysis,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("llm-pipeline-example")

    print("== 1. quality triage ==")
    text_analysis.q_text_stats(spark, SF_DIR).show(5, truncate=False)
    text_analysis.q_token_counts(spark, SF_DIR).show(5)

    print("== 2. exact dedup (dup groups >1) ==")
    dedup.q_dedup_exact(spark, SF_DIR).filter("n_dups > 1").show(5)

    print("== 3. near-dup pairs (MinHash b=4 r=2, Jaccard >= 0.4) ==")
    pairs = dedup.q_dedup_minhash_lsh(spark, SF_DIR)
    pairs.show(5)

    print("== 4. duplicate clusters (keep min doc_id per cluster) ==")
    graph.q_dedup_clusters(spark, SF_DIR).filter("cluster_size > 1").show(5)

    print("== 5. embedding near-dups (banded sign-LSH + cosine verify) ==")
    similarity.q_dedup_embedding(spark, SF_DIR).show(5)

    print("== 6. Gopher repetition signals (dup-word chars, top bigram) ==")
    quality.q_repetition_metrics(spark, SF_DIR).show(5)

    print("== 7. cross-document boilerplate 3-grams ==")
    quality.q_boilerplate_ngrams(spark, SF_DIR).show(5, truncate=False)

    print("== 8. contamination audit (eval 5-grams seen in train) ==")
    packing.q_contamination_overlap(spark, SF_DIR) \
        .orderBy("hit_ratio", ascending=False).show(5)

    print("== 9. deterministic train/val/test split (md5 mod 10) ==")
    quality.q_split_assign(spark, SF_DIR).orderBy("lang", "split").show(6)

    print("== 10. sliding-window chunking + 2048-token bin packing ==")
    quality.q_chunk_tokens(spark, SF_DIR).show(5)
    packing.q_pack_sequences(spark, SF_DIR).orderBy("shard", "bin").show(5)

    print("== 11. deterministic stratified sampling for the final mix ==")
    text_analysis.q_corpus_sample(spark, SF_DIR).show(5)

    print("== 12. source-level quality gate (RefinedWeb-style) ==")
    quality.q_source_quality_filter(spark, SF_DIR).filter("NOT keep").show(5)

    print("== 13. LSH banding audit: recall vs exact-Jaccard ground truth ==")
    dedup.q_dedup_recall_eval(spark, SF_DIR).show()

    print("== 14. mini-batch k-means cluster assignment (corpus-scale knob) ==")
    from flink_release_1_14_5_comment_spark.pipeline import clustering
    clustering.q_embedding_kmeans_minibatch(spark, SF_DIR).groupBy("cluster").count().orderBy("cluster").show()

    print("== 15. LM-perplexity filter (CCNet-style, corpus-trained bigram LM) ==")
    quality.q_lm_perplexity(spark, SF_DIR).orderBy("source").show(5)

    print("== 16. IVF-PQ similarity serving (codes-only scan, ADC scoring) ==")
    similarity.q_ann_ivfpq_topk(spark, SF_DIR).show(5)

    print("== 17. sketch screens: CMS heavy hitters + Bloom contamination ==")
    from flink_release_1_14_5_comment_spark.pipeline import sketches
    sketches.q_cms_heavy_hitters(spark, SF_DIR).show(5)
    sketches.q_bloom_contamination(spark, SF_DIR).show()

    print("== 18. sampling & mixing plans: E-S weighted sample, deciles ==")
    sketches.q_weighted_sample(spark, SF_DIR).show(6)
    sketches.q_quality_ntile_buckets(spark, SF_DIR).orderBy("decile").show()

    print("== 19. budgeted mixture cut: per-language fill ratios ==")
    text_analysis.q_corpus_mix(spark, SF_DIR).orderBy("lang").show()

    print("== 20. the composed pipeline as ONE job: training-set manifest ==")
    from flink_release_1_14_5_comment_spark.pipeline import end_to_end
    end_to_end.q_pipeline_end_to_end(spark, SF_DIR) \
        .orderBy("lang", "source").show(8)

    print("== 21. retrieval: BM25 top-k + hybrid dense/sparse RRF fusion ==")
    from flink_release_1_14_5_comment_spark.pipeline import retrieval
    retrieval.q_bm25_topk(spark, SF_DIR).orderBy("qid", "rn").show(8)
    retrieval.q_hybrid_rrf_fusion(spark, SF_DIR).orderBy("qid", "rn").show(8)

    print("== 22. HyperLogLog distinct screens (batch registers) ==")
    sketches.q_approx_distinct_hll(spark, SF_DIR).orderBy("event_type").show()

    print("== 23. cluster-representative policy (longest member wins) ==")
    graph.q_dedup_cluster_representatives(spark, SF_DIR) \
        .orderBy("cluster_id").show(5)

    print("== 24. streaming ingest: incremental near-dup pairs vs the index ==")
    from flink_release_1_14_5_comment_spark.streaming import stream_queries
    stream_queries.q_stream_incremental_dedup(spark, SF_DIR) \
        .orderBy("band", "a_id", "b_id").show(5)

    print("== cleaned-corpus summary (quality + exact + near-dup composed) ==")
    dedup.q_corpus_clean(spark, SF_DIR).show()

    print("PIPELINE OK")


if __name__ == "__main__":
    main()
