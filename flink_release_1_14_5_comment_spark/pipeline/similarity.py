"""Similarity search over the `embeddings` table (`embedding: array<float>`).

* Brute-force cosine top-k — the exactness baseline. The query set is
  broadcast; similarity is a codegen'd zip_with/aggregate fold (no Python,
  no shuffle of the corpus); only (qid, id, sim) tuples shuffle for the
  per-query top-k window. At 100 TB this is a single corpus scan.
* LSH-bucketed ANN — the scale path: deterministic sign-projection buckets
  turn the cross join into an equi-join on bucket id. Recall trades off with
  bucket count; candidates within a bucket are scored exactly.

All arithmetic is done in DOUBLE after casting the float components, with
results rounded before ranking so the DuckDB oracle (list_cosine_similarity)
agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views

N_QUERIES = 5
TOP_K = 5

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)


def _cosine(a: str, b: str) -> F.Column:
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.expr(_DOT.format(a=a, b=a))
    nb = F.expr(_DOT.format(a=b, b=b))
    return dot / (F.sqrt(na) * F.sqrt(nb))


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors vec_id < 5."""
    t = register_views(spark, sf_dir)
    e = t["embeddings"]
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    sims = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine("qe", "embedding"), 4).alias("sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )


ORACLE_Q_KNN_COSINE = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
sims AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 4) AS sim
  FROM embeddings e, q
  WHERE e.vec_id <> q.qid
)
SELECT qid, neighbor_id, sim, CAST(rn AS BIGINT) AS rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rn
      FROM sims)
WHERE rn <= 5
"""


# Sign-projection LSH: 4 deterministic bits from component comparisons
# (1-based indexing in both engines).
_BUCKET_PAIRS = [(1, 2), (3, 4), (5, 6), (7, 8)]


def _bucket(col: str) -> F.Column:
    bits = [
        (F.element_at(F.col(col), i) > F.element_at(F.col(col), j)).cast("int") * (2 ** p)
        for p, (i, j) in enumerate(_BUCKET_PAIRS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket histogram for the sign-projection LSH index."""
    t = register_views(spark, sf_dir)
    return (
        t["embeddings"]
        .select(_bucket("embedding").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_Q_ANN_LSH_BUCKETS = """
SELECT CAST((embedding[1] > embedding[2])::INT
     + (embedding[3] > embedding[4])::INT * 2
     + (embedding[5] > embedding[6])::INT * 4
     + (embedding[7] > embedding[8])::INT * 8 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM embeddings
GROUP BY 1
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-3 per query, candidates restricted to the query's LSH bucket —
    the equi-join scale path (bucket join instead of cross join)."""
    t = register_views(spark, sf_dir)
    e = t["embeddings"].withColumn("bucket", _bucket("embedding"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), F.col("bucket")
    )
    sims = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine("qe", "embedding"), 4).alias("sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


ORACLE_Q_ANN_LSH_TOPK = """
WITH b AS (
  SELECT vec_id, embedding,
         (embedding[1] > embedding[2])::INT
       + (embedding[3] > embedding[4])::INT * 2
       + (embedding[5] > embedding[6])::INT * 4
       + (embedding[7] > embedding[8])::INT * 8 AS bucket
  FROM embeddings
), q AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM b WHERE vec_id < 5),
sims AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 4) AS sim
  FROM b e JOIN q ON e.bucket = q.bucket
  WHERE e.vec_id <> q.qid
)
SELECT qid, neighbor_id, sim, CAST(rn AS BIGINT) AS rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rn
      FROM sims)
WHERE rn <= 3
"""


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics (count, mean L2 norm)."""
    t = register_views(spark, sf_dir)
    norm = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    return (
        t["embeddings"]
        .select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("nrm"), 4).alias("avg_norm"))
    )


ORACLE_Q_EMBEDDING_STATS = """
SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 4) AS avg_norm
FROM embeddings
GROUP BY label
"""


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates restricted to the
    same LSH bucket (equi-join — never a cross join), verified by exact
    cosine ≥ 0.99. The embedding-space flavor of MinHash dedup; at corpus
    scale the bucket join keeps candidate pairs ~linear."""
    t = register_views(spark, sf_dir)
    e = t["embeddings"].withColumn("bucket", _bucket("embedding"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"), "bucket")
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(_cosine("ea", "eb"), 4))
        .filter(F.col("sim") >= 0.99)
        .select("id_a", "id_b", "sim")
    )


ORACLE_Q_DEDUP_EMBEDDING = """
WITH b AS (
  SELECT vec_id, embedding,
         (embedding[1] > embedding[2])::INT
       + (embedding[3] > embedding[4])::INT * 2
       + (embedding[5] > embedding[6])::INT * 4
       + (embedding[7] > embedding[8])::INT * 8 AS bucket
  FROM embeddings
)
SELECT a.vec_id AS id_a, e.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) AS sim
FROM b a JOIN b e ON a.bucket = e.bucket AND a.vec_id < e.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) >= 0.99
"""


QUERIES = {
    "knn_cosine": q_knn_cosine,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_lsh_topk": q_ann_lsh_topk,
    "embedding_stats": q_embedding_stats,
    "dedup_embedding": q_dedup_embedding,
}

ORACLE = {
    "knn_cosine": ORACLE_Q_KNN_COSINE,
    "ann_lsh_buckets": ORACLE_Q_ANN_LSH_BUCKETS,
    "ann_lsh_topk": ORACLE_Q_ANN_LSH_TOPK,
    "embedding_stats": ORACLE_Q_EMBEDDING_STATS,
    "dedup_embedding": ORACLE_Q_DEDUP_EMBEDDING,
}
