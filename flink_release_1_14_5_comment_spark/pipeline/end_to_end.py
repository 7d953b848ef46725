"""The composed LLM-training-data pipeline, end to end, as ONE oracle-graded
query: quality gate → exact dedup → MinHash-LSH near-dup removal → budgeted
mixture cut → training-set manifest.

Each stage exists (and is oracle-graded) standalone — gopher_quality /
dedup_exact / dedup_minhash_lsh / corpus_mix — but a real user never runs
them standalone: the pipeline IS the product, and stage composition is where
silent bugs hide (a dedup that recomputes shingles on pre-gate data, a mix
cut applied before dedup inflates a language's budget with rows that later
vanish). This query chains the SAME module functions the standalone queries
use, and the DuckDB oracle chains the SAME shared CTE fragments
(dedup.ORACLE_SH_CTE / ORACLE_SIG_CTE / ORACLE_CAND_CTE), so the graded
artifact proves the composition — stage boundaries, operand ordering, and
the final manifest — not just each stage in isolation.

Stage policies (all deterministic, engine-portable):
  1. Gate: ≥20 words and mean word length in [2, 12] chars — a Gopher-style
     structural filter cheap enough to run first (it prunes before the
     expensive shingling).
  2. Exact dedup: keep MIN(doc_id) per normalized-text md5 fingerprint.
  3. Near-dup: MinHash(b=4, r=2) candidates among the exact survivors,
     verified Jaccard ≥ 0.4 → drop every doc that has a SMALLER-id verified
     near-duplicate (the standard greedy keep-first policy; clusters are
     handled transitively by dedup_clusters, which this pipeline trades for
     one less distributed iteration — documented policy, not an accident).
  4. Mix: each language keeps its first 50% of surviving characters in
     md5(doc_id) order (the corpus_mix greedy budget cut).
  5. Manifest: (lang, source) → docs and characters shipped to training.

Scale design (100 TB): the gate is a pure codegen map (prunes ~first), the
exact dedup is one uniform-key shuffle, the LSH stage is the documented
~linear band-join (shingles+signatures persisted once, reused by candidate
AND verify branches), the drop set is an anti-join keyed by doc_id, and the
mix cut is one running-sum window per language — the same shapes as the
standalone operators, just pipelined; nothing materializes to the driver.

Reference anchor: the reference engine ships the relational operators this
composition rides on (multi-stage DAGs of agg/join/window —
flink-table-runtime BatchExec* operators); the pipeline itself is the
"beyond the reference" training-data surface of this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views
from flink_release_1_14_5_comment_spark.pipeline.text_analysis import (
    budget_cut_rows,
)
from flink_release_1_14_5_comment_spark.pipeline.dedup import (
    ORACLE_CAND_CTE,
    ORACLE_SH_CTE,
    ORACLE_SIG_CTE,
    _NORM,
    _TOKS,
    near_dup_pairs,
    shingle_frame,
)

_MIN_WORDS = 20
_MEAN_WLEN = (2.0, 12.0)
_MIX_SHARE = 0.5


def q_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir)["documents"]
    gated = (
        docs.withColumn("wc", F.size(F.expr(_TOKS)))
        .filter((F.col("wc") >= _MIN_WORDS)
                & (F.col("n_chars") / F.col("wc")).between(*_MEAN_WLEN))
    )
    keep_w = W.partitionBy(F.md5(F.expr(_NORM)))
    exact = (
        gated.withColumn("__keep", F.min("doc_id").over(keep_w))
        .filter(F.col("doc_id") == F.col("__keep"))
        .select("doc_id", "lang", "source", "n_chars", "text")
        .persist()
    )
    drops = (near_dup_pairs(shingle_frame(exact).persist())
             .select(F.col("doc_b").alias("doc_id")).distinct())
    # budget_cut_rows consumes `near` three times (bucket summary, the
    # fully-kept semi join, the straddling-bucket window) and targets makes
    # a fourth — persist so the LSH anti join runs once, not four times
    # (without this the composed query regressed 2.0 → 6.6 s at sf0.1).
    near = exact.join(drops, "doc_id", "left_anti").persist()
    targets = near.groupBy("lang").agg(
        F.floor(F.sum("n_chars") * _MIX_SHARE).cast("long").alias("__target"))
    # two-phase budget cut (text_analysis.budget_cut_rows): no window ever
    # partitions a whole language — the r6 corpus_mix rewrite, applied to
    # the composed pipeline's mixing stage too (membership bit-identical
    # to the exact per-language cumulative window the oracle runs).
    kept = budget_cut_rows(near, targets)
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"))


ORACLE_Q_PIPELINE_END_TO_END = rf"""
WITH base AS (
  SELECT doc_id, lang, source, n_chars, text,
         len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS wc
  FROM documents
), gated AS (
  SELECT doc_id, lang, source, n_chars, text FROM base
  WHERE wc >= {_MIN_WORDS} AND n_chars / wc BETWEEN {_MEAN_WLEN[0]} AND {_MEAN_WLEN[1]}
), exact AS (
  SELECT doc_id, lang, source, n_chars, text FROM (
    SELECT *, MIN(doc_id) OVER (
      PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS keep
    FROM gated)
  WHERE doc_id = keep
), docs AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM exact
), sh AS ({ORACLE_SH_CTE}), sig AS ({ORACLE_SIG_CTE}), cand AS ({ORACLE_CAND_CTE}),
verified AS (
  SELECT doc_a, doc_b FROM cand
  JOIN sh sa ON sa.doc_id = doc_a
  JOIN sh sb ON sb.doc_id = doc_b
  WHERE ROUND(len(list_intersect(sa.sh, sb.sh))
              / len(list_distinct(list_concat(sa.sh, sb.sh))), 4) >= 0.4
), near AS (
  SELECT e.* FROM exact e
  WHERE NOT EXISTS (SELECT 1 FROM verified v WHERE v.doc_b = e.doc_id)
), targets AS (
  SELECT lang, CAST(FLOOR(SUM(n_chars) * {_MIX_SHARE}) AS BIGINT) AS target
  FROM near GROUP BY lang
), ordered AS (
  SELECT lang, source, n_chars,
         SUM(n_chars) OVER (
           PARTITION BY lang
           ORDER BY md5('mix:' || doc_id::VARCHAR), doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM near
)
SELECT o.lang, o.source,
       CAST(COUNT(*) AS BIGINT)     AS n_docs,
       CAST(SUM(o.n_chars) AS BIGINT) AS total_chars
FROM ordered o JOIN targets t ON t.lang = o.lang
WHERE o.cum - o.n_chars < t.target
GROUP BY o.lang, o.source
"""


QUERIES = {"pipeline_end_to_end": q_pipeline_end_to_end}
ORACLE = {"pipeline_end_to_end": ORACLE_Q_PIPELINE_END_TO_END}
