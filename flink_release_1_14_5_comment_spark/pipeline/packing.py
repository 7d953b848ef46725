"""Training-batch assembly operators over the `documents` table: sequence
packing (token-budget bin packing) and train/eval contamination checking.

Both are pure DataFrame pipelines — no Python UDFs — mirroring how a
production pretraining pipeline assembles fixed-length batches and audits
benchmark leakage (reference's batch-assembly role: the bounded-blocking
shuffle stages of `flink-streaming-java` runtime; the analytics here are
new capability the reference's users run downstream of it).

Scale design:
- `pack_sequences` never does a GLOBAL sort: documents are sharded by a
  stable md5 bucket and packed within shards, so the only sort is
  per-shard (window partitionBy shard). On a 1000-executor cluster you
  raise N_SHARDS so each shard's token stream fits one task; packing
  quality is unaffected because bins never span shards by construction.
- `contamination_overlap` is explode + two distincts + one equi-join —
  every stage linear in corpus token count, shuffled by gram hash (no
  skew: 5-gram keys are near-unique).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views

# Tokens per packed training sequence (GPT-style fixed context window).
PACK_BUDGET = 2048
# Shard count bounds the per-task sort; raise on a real cluster
# (SPARK_GRAFT_PACK_SHARDS) so each shard ~= one executor task.
N_SHARDS = int(os.environ.get("SPARK_GRAFT_PACK_SHARDS", "16"))

_NORM_TOKS = "split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')"


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contiguous sequence packing: order documents by doc_id
    within an md5 shard, lay their token counts end-to-end, and cut bins
    every PACK_BUDGET tokens (a document's bin = its start offset div
    budget — the streaming-concat packing rule). Emits per-bin occupancy:
    docs packed, tokens, fill ratio."""
    t = register_views(spark, sf_dir)
    shard = F.expr(
        "cast(conv(substr(md5(concat('pack:', cast(doc_id as string))), 1, 8), 16, 10) as bigint)"
    ) % N_SHARDS
    n_tok = F.size(F.expr(_NORM_TOKS)).cast("long")
    base = t["documents"].select(
        "doc_id", shard.alias("shard"), n_tok.alias("n_tokens")
    )
    w = W.partitionBy("shard").orderBy("doc_id")
    binned = base.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn("bin", (F.col("start_off") / F.lit(PACK_BUDGET)).cast("long"))
    return (
        binned.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.sum("n_tokens") / F.lit(float(PACK_BUDGET)), 4).alias("fill"),
        )
    )


ORACLE_Q_PACK_SEQUENCES = rf"""
WITH d AS (
  SELECT doc_id,
         ('0x' || substr(md5('pack:' || doc_id::VARCHAR), 1, 8))::BIGINT % {N_SHARDS} AS shard,
         CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens
  FROM documents
), binned AS (
  SELECT shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
  FROM d
)
SELECT shard, CAST(start_off // {PACK_BUDGET} AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       ROUND(SUM(n_tokens) / {float(PACK_BUDGET)}, 4) AS fill
FROM binned
GROUP BY 1, 2
"""


def q_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: hold out a deterministic 5% eval split
    (md5 bucket of doc_id), build distinct word 5-grams per side, and for
    each eval document count how many of its distinct grams appear anywhere
    in the train split. The industry-standard n-gram leakage check run
    before any pretraining job."""
    t = register_views(spark, sf_dir)
    is_eval = (
        F.expr(
            "cast(conv(substr(md5(concat('eval:', cast(doc_id as string))), 1, 8), 16, 10) as bigint)"
        ) % 20 == 0
    )
    base = (
        t["documents"]
        .select("doc_id", F.expr(_NORM_TOKS).alias("t"), is_eval.alias("is_eval"))
        .withColumn(
            "gram",
            F.explode(F.expr(
                "CASE WHEN size(t) >= 5 THEN transform(sequence(1, size(t) - 4), "
                "i -> concat_ws(' ', slice(t, i, 5))) "
                "ELSE CAST(array() AS array<string>) END"
            )),
        )
    )
    eval_g = base.filter("is_eval").select("doc_id", "gram").distinct()
    train_g = base.filter("NOT is_eval").select("gram").distinct() \
        .withColumn("hit", F.lit(1))
    return (
        eval_g.join(train_g, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.sum("hit"), F.lit(0)) / F.count(F.lit(1)), 4
            ).alias("hit_ratio"),
        )
    )


ORACLE_Q_CONTAMINATION_OVERLAP = r"""
WITH base AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t,
         ('0x' || substr(md5('eval:' || doc_id::VARCHAR), 1, 8))::BIGINT % 20 = 0 AS is_eval
  FROM documents
), g AS (
  SELECT doc_id, is_eval,
         unnest(CASE WHEN len(t) >= 5
                     THEN list_transform(range(1, len(t) - 3),
                                         i -> array_to_string(t[i:i+4], ' '))
                     ELSE [] END) AS gram
  FROM base
), eg AS (SELECT DISTINCT doc_id, gram FROM g WHERE is_eval),
tg AS (SELECT DISTINCT gram FROM g WHERE NOT is_eval)
SELECT eg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       ROUND(SUM(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4) AS hit_ratio
FROM eg LEFT JOIN tg ON eg.gram = tg.gram
GROUP BY eg.doc_id
"""


QUERIES = {
    "pack_sequences": q_pack_sequences,
    "contamination_overlap": q_contamination_overlap,
}

ORACLE = {
    "pack_sequences": ORACLE_Q_PACK_SEQUENCES,
    "contamination_overlap": ORACLE_Q_CONTAMINATION_OVERLAP,
}
